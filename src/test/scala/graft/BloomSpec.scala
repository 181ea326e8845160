package graft

import org.apache.spark.sql.functions._

import graft.functions.{Bloom, Dedup}
import graft.queries.{DedupQueries, TrainQueries}

/** Bloom build/probe semantics and the op102 ≡ op82 identity, plus
  * duplicate-span scrubbing (op103) on planted boilerplate. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe has no false negatives and rejects most non-members") {
    val members = (0L until 2000L).map(_ * 7919L) // arbitrary spread longs
    val bf = Bloom.buildBytes(members.toDF("v"), col("v"), 2000L, 64L * 1024)
    assert(bf != null)
    val got = members.toDF("v")
      .filter(Bloom.mightContain(bf, col("v"))).count()
    assert(got == 2000L, "a member must never be rejected")
    // non-members: disjoint range; fpp at 32 bits/key is ~0, allow slack
    val nonMembers = (1L to 2000L).map(_ * 7919L + 3L).toDF("v")
    val fp = nonMembers.filter(Bloom.mightContain(bf, col("v"))).count()
    assert(fp <= 20L, s"expected <=1% false positives, saw $fp/2000")
  }

  test("empty build yields null bytes; probing null keeps nothing") {
    val bf = Bloom.buildBytes(
      Seq.empty[Long].toDF("v"), col("v"), 10L, 1024L)
    assert(bf == null)
    val kept = Seq(1L, 2L).toDF("v")
      .filter(Bloom.mightContain(bf, col("v"))).count()
    assert(kept == 0L, "member-of-empty-set must reject every row")
  }

  test("op102 bloom-prefiltered decontamination equals op82 exactly") {
    val a = DedupQueries.op82Decontaminate(spark, sfDir).collect().toSeq
    val b = DedupQueries.op102BloomDecontaminate(spark, sfDir).collect().toSeq
    assert(a.nonEmpty, "fixture must contain contaminated docs")
    assert(a == b)
  }

  // --- op103 duplicate-span scrubbing ---

  // spans are 4 tokens in these tests; "A B C D" is planted boilerplate
  private val boiler = "A B C D"
  private def corpus = Seq(
    (0L, s"$boiler u0 u1 u2 u3"),       // boiler at span 0
    (1L, s"$boiler v0 v1 v2 v3 v4"),    // boiler at span 0, short tail span
    (2L, "w0 w1 w2 w3 x0 x1 x2 x3"),    // unique everywhere
    (3L, boiler)                        // nothing but boiler
  ).toDF("doc_id", "text")

  test("scrubDuplicateSpans removes cross-doc spans and keeps the rest in order") {
    val out = Dedup.scrubDuplicateSpans(corpus, "doc_id", "text", 4, 2L)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(0L) == ((2L, 1L, "u0 u1 u2 u3")))
    assert(byId(1L) == ((3L, 1L, "v0 v1 v2 v3 v4")))
    assert(byId(2L) == ((2L, 0L, "w0 w1 w2 w3 x0 x1 x2 x3")))
    // fully-scrubbed doc keeps its row with empty text
    assert(byId(3L) == ((1L, 1L, "")))
    assert(out.length == 4)
  }

  test("within-doc repetition alone does not scrub (distinct-doc count)") {
    val self = Seq((0L, "A B C D A B C D"), (1L, "z0 z1 z2 z3")).toDF("doc_id", "text")
    val out = Dedup.scrubDuplicateSpans(self, "doc_id", "text", 4, 2L)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 0L, "a span repeated only inside one doc stays")
    assert(out(0).getString(3) == "A B C D A B C D")
  }

  test("kept spans reassemble in position order, not collection order") {
    val df = Seq(
      (0L, "k0 k1 k2 k3 A B C D m0 m1 m2 m3"),
      (1L, s"$boiler n0 n1 n2 n3")
    ).toDF("doc_id", "text")
    val out = Dedup.scrubDuplicateSpans(df, "doc_id", "text", 4, 2L)
      .filter(col("doc_id") === 0L).collect()(0)
    assert(out.getString(3) == "k0 k1 k2 k3 m0 m1 m2 m3")
  }
}
