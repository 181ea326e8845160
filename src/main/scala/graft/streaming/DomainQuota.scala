package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming per-domain admission quota — the online form of the
  * domain-cap curation rule (op308's batch cap): a crawl firehose
  * admits at most `k` documents per registered domain across the whole
  * run, first-come-first-served, with the running count as the ONLY
  * state. The batch cap ranks a pinned snapshot; this is what the
  * ingest edge runs while the snapshot is still arriving.
  *
  * State shape at 100 TB: ONE counter per registered domain touched so
  * far (~10⁷-10⁸ domains ⇒ hundreds of MB across all state stores,
  * RocksDB-backed, keyed exactly like the shuffle), independent of
  * document volume. Admission within a trigger uses doc_id order as
  * the deterministic tie rule — cross-trigger order is arrival order,
  * which IS the production semantics (first crawled wins); the
  * single-batch fixture drain therefore replays as a per-domain
  * doc_id rank in the oracle, while cross-trigger quota depletion is
  * pinned by spec with controlled arrivals.
  */
object DomainQuota {

  case class DocArrival(doc_id: Long, domain: String)
  case class Admitted(doc_id: Long, domain: String, admit_seq: Long)

  /** transformWithState processor: one Long ValueState per domain —
    * the count of documents admitted so far. */
  class QuotaProcessor(k: Long)
      extends StatefulProcessor[String, DocArrival, Admitted] {
    @transient private var count:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(domain: String, rows: Iterator[DocArrival],
        timerValues: TimerValues): Iterator[Admitted] = {
      val c0 = if (count.exists()) count.get() else 0L
      val room = math.max(0L, k - c0)
      val take = rows.toSeq.sortBy(_.doc_id)
        .take(math.min(room, Int.MaxValue.toLong).toInt)
      count.update(c0 + take.size)
      take.iterator.zipWithIndex.map { case (a, i) =>
        Admitted(a.doc_id, domain, c0 + i + 1)
      }
    }
  }

  /** Append-mode admitted stream: one row per admitted document with
    * its per-domain admission sequence number. */
  def admitted(arrivals: Dataset[DocArrival], k: Long): Dataset[Admitted] = {
    implicit val outEnc = Encoders.product[Admitted]
    arrivals.groupByKey(_.domain)(Encoders.STRING)
      .transformWithState(new QuotaProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
