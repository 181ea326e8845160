package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Redis RDB snapshot ingestion — the reference's system-of-record is a
  * Redis sorted set (`Customer`) whose RDB dump ships with the repo
  * (/root/reference/dump.rdb; loaded by its Redis sidecar, then streamed
  * out as change events). SURVEY §1.1 argues the change-stream is the
  * real data feed; this loader covers the remaining artifact: BOOTSTRAP
  * reads of the snapshot itself, so a deployment can seed state without
  * replaying the full change history.
  *
  * Format notes (public RDB spec, v9): header `REDIS000N`, aux fields
  * (0xFA), select-db (0xFE), resizedb (0xFB), optional expiries
  * (0xFC/0xFD), then (type, key, value) records until EOF (0xFF).
  * Lengths are 6/14/32/64-bit big-endian; strings may be int-encoded
  * (0xC0/C1/C2) or LZF-compressed (0xC3). Sorted sets: type 1 (scores as
  * strings) and type 5 (ZSET_2, binary little-endian doubles).
  *
  * Scale: an RDB file is a single sequential artifact with no split
  * points (values are variable-length and possibly compressed), so the
  * parse is driver-side by nature, then `parallelize`d; cost is bounded
  * by snapshot size, not stream volume. The 100 TB path remains the
  * change-stream (`Stedi.decodeCustomers` over Kafka frames) — this is
  * the seed, not the feed.
  */
object RedisRdb {

  final case class ZSetEntry(db: Int, key: String, member: String, score: Double)

  /** Parse every sorted-set entry in an RDB snapshot (driver-side). */
  def parseZSets(bytes: Array[Byte]): Seq[ZSetEntry] = {
    val in = new Reader(bytes)
    val magic = new String(in.take(9), "US-ASCII")
    require(magic.startsWith("REDIS"), s"not an RDB file: $magic")
    val out = Vector.newBuilder[ZSetEntry]
    var db = 0
    var done = false
    while (!done && in.hasNext) {
      val op = in.u8()
      op match {
        case 0xFF => done = true // EOF (8-byte CRC trailer follows; ignored)
        case 0xFE => db = in.length().toInt // SELECTDB
        case 0xFB => in.length(); in.length(): Unit // RESIZEDB hints
        case 0xFA => in.string(); in.string(): Unit // aux key/value
        case 0xFD => in.take(4): Unit // expiry (seconds) — applies to next record
        case 0xFC => in.take(8): Unit // expiry (millis)
        case 0xF8 => in.length(): Unit // IDLE (LRU hint) — length-encoded
        case 0xF9 => in.take(1): Unit // FREQ (LFU counter) — ONE raw byte
        case t => readValue(t, in, db, out)
      }
    }
    out.result()
  }

  private def readValue(valueType: Int, in: Reader, db: Int,
      out: scala.collection.mutable.Builder[ZSetEntry, Vector[ZSetEntry]]): Unit = {
    val key = in.string()
    valueType match {
      case 1 | 5 => // ZSET (scores as strings) | ZSET_2 (binary doubles)
        val n = in.length()
        var i = 0L
        while (i < n) {
          val member = in.string()
          val score =
            if (valueType == 5) in.doubleLe()
            else in.scoreString()
          out += ZSetEntry(db, key, member, score)
          i += 1
        }
      case 0 => in.string(): Unit // plain string value — skip
      case other =>
        // other encodings (lists, hashes, ziplists, …) have no
        // fixed-length skip; refuse loudly rather than desync the stream
        throw new IllegalArgumentException(
          s"unsupported RDB value type $other for key '$key' " +
            "(loader covers strings and sorted sets)")
    }
  }

  /** Write a minimal RDB v9 snapshot holding one ZSET_2 sorted set —
    * the writer dual of [[parseZSets]], used to synthesize bootstrap
    * snapshots from fixture tables (op125 gates the full binary
    * round-trip: encode → parse → decode → join). Plain big-endian
    * lengths only (6/14/32-bit — no special string encodings), members
    * UTF-8, scores 8-byte little-endian doubles per the public RDB
    * format. A snapshot is inherently one serial file, so writing is
    * driver-side by nature, like parsing. */
  def writeZSet2(path: String, key: String,
      entries: Seq[(String, Double)], db: Int = 0): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    def len(n: Long): Unit = {
      require(n >= 0 && n <= Int.MaxValue, s"length out of range: $n")
      if (n < 64) out.write(n.toInt)
      else if (n < 16384) { out.write(0x40 | (n >> 8).toInt); out.write((n & 0xFF).toInt) }
      else {
        out.write(0x80)
        out.write((n >> 24).toInt); out.write(((n >> 16) & 0xFF).toInt)
        out.write(((n >> 8) & 0xFF).toInt); out.write((n & 0xFF).toInt)
      }
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8"); len(b.length.toLong); out.write(b)
    }
    out.write("REDIS0009".getBytes("US-ASCII"))
    out.write(0xFE); len(db.toLong) // SELECTDB
    out.write(5) // ZSET_2
    str(key)
    len(entries.size.toLong)
    entries.foreach { case (member, score) =>
      str(member)
      val bits = java.lang.Double.doubleToLongBits(score)
      var i = 0
      while (i < 8) { out.write(((bits >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    out.write(0xFF)
    out.write(new Array[Byte](8)) // CRC trailer (readers don't check it)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray): Unit
  }

  /** All sorted-set entries as a DataFrame: (db, key, member, score). */
  def readZSets(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val entries = parseZSets(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    spark.createDataset(entries).toDF()
  }

  /** Bootstrap twin of `Stedi.decodeCustomers`: members of the given zset
    * decoded as customer-record JSON → same (…, email, birthYear) shape
    * the change-stream decode emits, so downstream joins are agnostic to
    * whether customers arrived by snapshot or by stream. */
  def customers(spark: SparkSession, path: String,
      zsetKey: String = "Customer"): DataFrame = {
    val members = readZSets(spark, path)
      .filter(col("key") === zsetKey)
      .select(col("member"))
    members
      .select(from_json(col("member"), graft.model.Schemas.customerRecord).as("c"))
      .select(col("c.*"))
      .transform(graft.ops.Decode.requireNonNull(_, "email", "birthDay"))
      .withColumn("birthYear", graft.ops.Decode.yearOf(col("birthDay")))
  }

  /** Sequential byte reader implementing RDB primitives. */
  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def u8(): Int = { val v = bytes(pos) & 0xFF; pos += 1; v }
    def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(bytes, pos, pos + n); pos += n; a
    }

    /** RDB length: 2-bit tag then 6/14/32/64-bit big-endian. Returns -1-N
      * for the special string encodings (tag 3), which [[string]] handles. */
    def lengthOrSpecial(): Long = {
      val b = u8()
      (b >> 6) match {
        case 0 => (b & 0x3F).toLong
        case 1 => ((b & 0x3F).toLong << 8) | u8()
        case 2 =>
          if (b == 0x80) // 32-bit BE
            ((u8().toLong << 24) | (u8().toLong << 16) | (u8().toLong << 8) | u8())
          else { // 0x81: 64-bit BE
            var v = 0L; var i = 0
            while (i < 8) { v = (v << 8) | u8(); i += 1 }
            v
          }
        case _ => -1L - (b & 0x3F) // special encoding id
      }
    }

    def length(): Long = {
      val v = lengthOrSpecial()
      require(v >= 0, "expected a plain length, got a special string encoding")
      v
    }

    /** RDB string: plain, int-encoded (C0/C1/C2), or LZF (C3). */
    def string(): String = {
      val v = lengthOrSpecial()
      if (v >= 0) new String(take(v.toInt), "UTF-8")
      else intOrLzf((-v - 1).toInt)
    }

    private def intOrLzf(enc: Int): String = enc match {
      case 0 => // INT8
        val v = bytes(pos).toInt; pos += 1; v.toString
      case 1 => // INT16 little-endian
        val v = ((bytes(pos) & 0xFF) | (bytes(pos + 1) << 8)).toShort
        pos += 2; v.toString
      case 2 => // INT32 little-endian
        val v = (bytes(pos) & 0xFF) | ((bytes(pos + 1) & 0xFF) << 8) |
          ((bytes(pos + 2) & 0xFF) << 16) | (bytes(pos + 3) << 24)
        pos += 4; v.toString
      case 3 => // LZF: compressed-len, uncompressed-len, payload
        val clen = length().toInt
        val ulen = length().toInt
        new String(lzfDecompress(take(clen), ulen), "UTF-8")
      case other =>
        throw new IllegalArgumentException(s"unknown string encoding $other")
    }

    /** ZSET (type 1) score: length-prefixed ASCII double, with 253/254/255
      * sentinel lengths for NaN/+Inf/-Inf. */
    def scoreString(): Double = {
      val n = u8()
      n match {
        case 253 => Double.NaN
        case 254 => Double.PositiveInfinity
        case 255 => Double.NegativeInfinity
        case len => new String(take(len), "US-ASCII").toDouble
      }
    }

    /** 8-byte little-endian IEEE double (ZSET_2). */
    def doubleLe(): Double = {
      var bits = 0L; var i = 7
      while (i >= 0) { bits = (bits << 8) | (bytes(pos + i) & 0xFFL); i -= 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  /** LZF decompression (public-domain algorithm): control byte < 32 is a
    * literal run of ctrl+1 bytes; otherwise a back-reference of length
    * (ctrl>>5)+2 (7 ⇒ extended by the next byte) at offset
    * ((ctrl&0x1F)<<8 | next)+1 — copied byte-by-byte (may overlap). */
  private[graft] def lzfDecompress(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0
    var o = 0
    while (i < in.length) {
      val ctrl = in(i) & 0xFF
      i += 1
      if (ctrl < 32) {
        val run = ctrl + 1
        System.arraycopy(in, i, out, o, run)
        i += run; o += run
      } else {
        var len = ctrl >> 5
        if (len == 7) { len += in(i) & 0xFF; i += 1 }
        val ref = o - (((ctrl & 0x1F) << 8) | (in(i) & 0xFF)) - 1
        i += 1
        var j = 0
        while (j < len + 2) { out(o) = out(ref + j); o += 1; j += 1 }
      }
    }
    require(o == outLen, s"LZF length mismatch: got $o, expected $outLen")
    out
  }
}
