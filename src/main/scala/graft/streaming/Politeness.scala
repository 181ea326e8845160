package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

/** Streaming per-domain crawl POLITENESS — the robots `Crawl-delay`
  * semantics at the ingest edge (r15): consecutive admitted fetches of
  * one registered domain must sit at least `delayS` seconds apart in
  * EVENT time; a fetch scheduled closer than that to the last admitted
  * one is dropped (an admission gate like [[DomainQuota]], not a
  * deferral queue — the frontier re-enqueues, this stage only decides).
  * Greedy in event-time order, the crawl scheduler's rule: the first
  * arrival per domain admits, then each arrival admits iff its time is
  * ≥ last admitted + delay.
  *
  * State at 100 TB: TWO longs per registered domain (last admitted
  * second, admitted count) — RocksDB-backed, keyed like the shuffle,
  * independent of fetch volume; exactly [[DomainQuota]]'s state class.
  *
  * Per-trigger TRANSIENT memory is O(per-domain arrivals in the
  * trigger): the greedy decision at each arrival depends on every
  * smaller-timestamped arrival in the same trigger (a dropped row
  * consumes no state, so which rows admit is a sequential fold — the
  * r13 DomainQuota O(k) heap trick applies to selection-by-rank, not
  * to sequential spacing; no bounded-memory one-pass algorithm exists
  * because the admitted element of any delay-wide time bucket depends
  * on the fold's entry threshold, which can land anywhere in the
  * bucket). This is the same transient class as event-time
  * sessionization (Spark's own session windows materialize group
  * iterators); the production bound is the trigger cadence itself —
  * one domain contributes at most (fetcher rate × trigger seconds)
  * rows per trigger, and politeness exists precisely because that
  * rate is small.
  */
object Politeness {

  /** `delay_s` is the DOMAIN's Crawl-delay (robots metadata — constant
    * per domain), riding the row the way the op316 gate ships robots
    * verdicts: resolved map-side, no join in the stateful stage. */
  case class Fetch(doc_id: Long, domain: String, fetch_s: Long,
    delay_s: Long)
  case class Admitted(doc_id: Long, domain: String, fetch_s: Long,
    admit_seq: Long)

  /** transformWithState processor: (last admitted second, admitted
    * count) per domain. Within a trigger, arrivals are folded in
    * (fetch_s, doc_id) order — the deterministic event-time rule the
    * oracle replays. */
  class SpacingProcessor
      extends StatefulProcessor[String, Fetch, Admitted] {
    @transient private var lastAdm:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var count:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastAdm = getHandle.getValueState[Long]("last_adm",
        Encoders.scalaLong, TTLConfig.NONE)
      count = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(domain: String, rows: Iterator[Fetch],
        timerValues: TimerValues): Iterator[Admitted] = {
      val batch = rows.toArray
      java.util.Arrays.sort(batch,
        Ordering.by((f: Fetch) => (f.fetch_s, f.doc_id)))
      var have = lastAdm.exists()
      var last = if (have) lastAdm.get() else 0L
      var c = if (count.exists()) count.get() else 0L
      val c0 = c
      // fold in place: admitted fetches compact to the FRONT of the
      // (already materialized) input array, so the trigger's transient
      // memory is exactly that one array — no second admit buffer
      // (r15 advice). State updates stay EAGER, before the iterator is
      // handed back: transformWithState scopes the state handle to the
      // current grouping key, so a lazily-consumed iterator must not be
      // the thing that writes state.
      var n = 0
      batch.foreach { f =>
        if (!have || f.fetch_s >= last + f.delay_s) {
          have = true; last = f.fetch_s; c += 1
          batch(n) = f; n += 1
        }
      }
      if (n > 0) { lastAdm.update(last); count.update(c) }
      val admitted = n
      Iterator.range(0, admitted).map { i =>
        val f = batch(i)
        Admitted(f.doc_id, domain, f.fetch_s, c0 + i + 1)
      }
    }
  }

  /** Append-mode admitted stream: one row per admitted fetch with its
    * per-domain admission sequence number.
    *
    * Operational bound (r15 advice): the per-domain transient is ONE
    * array of that domain's arrivals in the trigger (admits emit as an
    * iterator over it, never a second buffer). Size the trigger cadence
    * so fetcher-rate × trigger-seconds rows per domain fit an executor —
    * a skewed domain in a large backfill trigger is the one shape that
    * can still grow it, and the cap is the trigger interval, not this
    * operator. */
  def admitted(arrivals: Dataset[Fetch]): Dataset[Admitted] = {
    implicit val outEnc = Encoders.product[Admitted]
    arrivals.groupByKey(_.domain)(Encoders.STRING)
      .transformWithState(new SpacingProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
