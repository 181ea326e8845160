package graft.queries

import org.apache.spark.sql.{Column, DataFrame}

/** Determinism conventions for the oracle-checked query surface.
  *
  * The driver hash-compares Spark results against DuckDB running the same
  * SQL, sorting columns by name. Cross-engine rules used by every query:
  *  - derived integers (count, rank, length, floor, …) cast to BIGINT on
  *    both sides (Spark would otherwise emit INT where DuckDB emits BIGINT);
  *  - floating-point outputs cast to DECIMAL(18,4) on both sides — the
  *    decimal is exact, so comparison is bit-stable regardless of either
  *    engine's float formatting/rounding internals;
  *  - every result ORDER BYs a non-null unique key (avoids the engines'
  *    NULLS FIRST/LAST default divergence);
  *  - timestamps leave the query as formatted strings or DATEs, never raw
  *    TIMESTAMP columns.
  */
object Det {
  /** Exact 4-decimal fixed-point for any floating-point output. */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** Normalize derived integer width across engines. */
  def big(c: Column): Column = c.cast("bigint")

  /** Total order on the given (non-null, collectively unique) key columns. */
  def ordered(df: DataFrame, keys: String*): DataFrame =
    df.orderBy(keys.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
}
