package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The full crawl-edge ADMISSION CONTROLLER (op316): the composition a
  * pretraining ingest actually runs on every arriving URL, in ONE
  * streaming query —
  *
  *   1. robots gate ([[graft.expressions.RobotsAllowed]] — the op311
  *      longest-match decision as a map-side scalar over broadcast
  *      rule metadata; a disallowed URL does not exist for the
  *      pipeline and must never reach, or consume, admission state);
  *   2. URL dedup + per-domain quota
  *      ([[DomainQuota.UrlQuotaProcessor]] — admitted-canonical
  *      ListState bounded at k entries per domain BY CONSTRUCTION).
  *
  * Plan shape: stateless projection + filter, then the single
  * transformWithState — append-mode legal, and the only state anywhere
  * is the quota-bounded admitted list. The robots stage runs FIRST so
  * rejected URLs cannot occupy quota slots (gate-then-admit, the
  * composition order a crawler is obliged to use).
  *
  * Restart recovery (checkpointed RocksDB list + the stateless gate
  * re-applied to replayed offsets) is pinned in RecoverySpec; the
  * single-batch fixture drain replays in the op316 DuckDB oracle as
  * gate → first-occurrence-per-canonical → per-domain rank. */
object AdmissionGate {

  /** `arrivals` must carry (doc_id, domain, path, url_canon); emits
    * (doc_id, domain, url_canon, admit_seq) for admitted documents. */
  def robotsGatedAdmission(arrivals: DataFrame,
      rules: Map[String, Seq[(String, Boolean)]], k: Long): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import arrivals.sparkSession.implicits._
    val allowed = ColumnBridge.column(graft.expressions.RobotsAllowed(
      ColumnBridge.expression(col("domain")),
      ColumnBridge.expression(col("path")), rules))
    DomainQuota.urlAdmitted(
      arrivals.filter(allowed)
        .select(col("doc_id"), col("domain"), col("url_canon"))
        .as[DomainQuota.UrlArrival],
      k).toDF()
  }
}
