package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch over a token stream as a TYPED AGGREGATE — the
  * mergeable-accumulator shape a real 100 TB frequency sketch needs.
  *
  * Scale rationale: exact per-token counts cost a shuffle keyed on the
  * token (fine when the vocabulary is bounded, ruinous when it is an
  * open set — URLs, n-grams, user agents). The sketch is a FIXED
  * `depth × width` counter grid per aggregation buffer: map-side
  * partials absorb their partition's tokens locally, merge is
  * element-wise addition (commutative, associative — the classic
  * mergeable-summary property), so the shuffle moves `depth·width`
  * longs per partition regardless of corpus size or cardinality. The
  * estimate for any token is min over rows of its hashed counter —
  * always ≥ the true count (one-sided error ε ≈ e/width with
  * probability 1−(1/e)^depth).
  *
  * Determinism (the reason this is oracle-able): the row hashes are the
  * repo's cross-engine md5-60 convention ([[TextOps.md5Hash60]]) over
  * `"r:token"`, taken mod `width` — DuckDB replays the identical grid
  * with `('0x' || substring(md5(r || ':' || w), 1, 15))::BIGINT % width`
  * and integer group-by counts, so the sketch's counters (and therefore
  * every estimate) are exact integers on both engines.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CountMin.bucket(r, token, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {
  // thread-local digest: bucket() runs once per (row, depth) in the
  // aggregate hot path — per-call getInstance + hex formatting cost
  // ~10x the hash itself (the TrigramKmSigs lesson)
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Row-r bucket of a token: md5-60 of "r:token" mod width — the same
    * 60-bit value [[TextOps.md5Hash60]] computes in SQL, evaluated in
    * the JVM so the aggregate needs no per-row Column machinery.
    * First 15 hex chars of an md5 == big-endian first 8 bytes >>> 4
    * (60 bits), computed directly from the digest bytes. */
  def bucket(r: Int, token: String, width: Int): Int = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s"$r:$token".getBytes(StandardCharsets.UTF_8))
    val h60 = ((d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
      (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
      (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
      (d(6) & 0xffL) << 8 | (d(7) & 0xffL)) >>> 4
    (h60 % width).toInt
  }

  /** Column form: aggregate a string column into the flattened
    * depth×width counter sequence (row-major). */
  def sketch(depth: Int, width: Int)(token: Column): Column =
    udaf(new CountMinAgg(depth, width), Encoders.STRING)(token)
}
