package graft

import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Text-analysis operator semantics against driver-side reference
  * implementations. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("hello world, this is 42 spark!").toDF("text")
    val r = df.select(
      TextOps.tokenCountWs(col("text")).as("ws"),
      TextOps.tokenCountBpe(col("text")).as("bpe")).collect()(0)
    assert(r.getLong(0) == 6)
    // hello | world | , | this | is | 42 | spark | ! = 8
    assert(r.getLong(1) == 8)
  }

  test("rolling hash matches an independent Scala fold") {
    val texts = Seq("spark", "the quick brown fox", "", "a")
    val got = texts.toDF("text")
      .select(TextOps.rollingHash(col("text")).as("h")).as[Long].collect()
    val want = texts.map(t =>
      t.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toInt) % 1000000007L))
    assert(got.toSeq == want)
  }

  test("md5Hash60 matches JVM md5 prefix") {
    val got = Seq("hello").toDF("s")
      .select(TextOps.md5Hash60(col("s"))).as[Long].first()
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    val hex = md.map(b => f"$b%02x").mkString.take(15)
    assert(got == java.lang.Long.parseLong(hex, 16))
  }

  test("langId picks the dominant marker language with en-first tiebreak") {
    val df = Seq(
      "the cat and the dog of the house",  // en
      "el perro y la casa de la calle que", // es
      "der hund und die katze ist nicht da", // de
      "xyzzy plugh quux")                   // none → und
      .toDF("text")
    val out = df.select(TextOps.langId(col("text"), TextOps.defaultProfiles))
      .as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("quality score is monotone in stopword presence and length") {
    val stop = TextOps.defaultProfiles.head._2
    val df = Seq(
      ("short", "tiny doc"),
      ("stopwordy", "the cat is in the hat and that is that"),
      ("plain", "cat hat mat bat rat sat fat vat pat tat"))
      .toDF("name", "text")
    val scores = df.select(col("name"),
      TextOps.qualityScoreBp(col("text"), stop).as("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(scores("stopwordy") > scores("plain"))
    assert(scores("plain") > scores("short") - 2500) // length term dominates tiny docs
    assert(scores.values.forall(s => s >= 0 && s <= 10000))
  }
}
