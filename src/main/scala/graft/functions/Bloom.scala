package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Distributed Bloom-filter build + probe over Spark's own sketch
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, the
  * expressions behind runtime row-level join filtering).
  *
  * Shape at scale: the build is a map-side-partial aggregate — every
  * task fills a local filter over its partition and the partials merge
  * by OR, so the only data movement is one filter per task. The probe
  * is a per-row codegen'd predicate against a plan-constant filter —
  * zero shuffle. The point of the sketch: a set too big to BROADCAST
  * as rows (10⁹ n-grams ≈ 50 GB of joinable rows) still fits as a
  * filter (~1.2 GB at 10 bits/key), and a might-contain prefilter has
  * NO false negatives, so `prefilter → exact confirm join` returns
  * exactly the unfiltered join's rows while shuffling only the
  * survivors.
  */
object Bloom {

  /** Build a Bloom filter over `value` (a BIGINT column — hash wider
    * types first, e.g. `xxhash64`) and return the serialized filter, or
    * null when `df` has no rows (Spark's aggregate yields SQL NULL for
    * an empty build; `mightContain(null, _)` then rejects every row,
    * which is the right semantics for "member of the empty set").
    *
    * The single collected row is the filter itself — bounded index
    * metadata (numBits/8 bytes), the same class of driver action as the
    * ANN codebook collects, not a data-path collect. */
  def buildBytes(df: DataFrame, value: Column,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(value),
      Literal(expectedItems), Literal(numBits))
    df.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe: true when `value` MAY be in the set,
    * false only when it definitely is not (no false negatives). The
    * filter bytes embed as a plan literal and deserialize once per
    * task. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnBridge.expression(value)))
}
