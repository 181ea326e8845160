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
      val room = math.min(math.max(0L, k - c0), Int.MaxValue.toLong).toInt
      // bounded selection: the `room` smallest doc_ids via a size-room
      // max-heap — O(room) memory however many rows the trigger
      // delivers. The old spelling (sort the materialized batch) was
      // O(arrivals-per-domain-per-trigger) transient memory: a hot
      // domain in a crawl firehose — the exact skew this operator
      // exists for — can put millions of rows in one trigger.
      val heap = scala.collection.mutable.PriorityQueue
        .empty[DocArrival](Ordering.by(_.doc_id))
      rows.foreach { a =>
        if (room > 0) {
          if (heap.size < room) heap += a
          else if (a.doc_id < heap.head.doc_id) {
            heap.dequeue(); heap += a
          }
        }
      }
      val take = heap.dequeueAll.reverse // ascending doc_id
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

  case class UrlArrival(doc_id: Long, domain: String, url_canon: String)
  case class UrlAdmitted(doc_id: Long, domain: String, url_canon: String,
    admit_seq: Long)

  /** URL-dedup + quota as ONE admission state (op315): a document is
    * admitted iff its canonical URL has not been admitted before AND
    * the domain's quota has room. The state is the ADMITTED canonical
    * list per domain — at most k strings, because only admissions
    * grow it: re-arrivals of admitted URLs hit the set, re-arrivals
    * of quota-rejected URLs hit the full counter. Bounded state is
    * the point — a naive "seen URL" dedup set grows with the crawl;
    * this one stops at the quota by construction. */
  class UrlQuotaProcessor(k: Long)
      extends StatefulProcessor[String, UrlArrival, UrlAdmitted] {
    @transient private var admittedUrls:
      org.apache.spark.sql.streaming.ListState[String] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      admittedUrls = getHandle.getListState[String]("admitted_urls",
        Encoders.STRING, TTLConfig.NONE)

    override def handleInputRows(domain: String, rows: Iterator[UrlArrival],
        timerValues: TimerValues): Iterator[UrlAdmitted] = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      if (admittedUrls.exists()) admittedUrls.get().foreach(seen += _)
      val room = math.min(math.max(0L, k - seen.size), Int.MaxValue.toLong)
        .toInt
      // Bounded first-per-URL selection, O(room) memory however many
      // rows the trigger delivers (the old spelling materialized and
      // sorted the whole per-domain batch). Sequential semantics —
      // walk arrivals in (doc_id, url_canon) order, admit each
      // not-yet-admitted canonical URL until the quota fills — is
      // equivalent to keeping the `room` smallest first-occurrence
      // keys over unseen URLs: candidates = TreeMap((doc_id, url) →
      // ()) + HashMap(url → its best key), both capped at `room`
      // entries. Keys are (doc_id, url) PAIRS, not bare doc_ids: two
      // distinct URLs sharing one doc_id (an upstream replay shape)
      // must occupy two slots, and the pair is also the deterministic
      // tie order. An evicted URL can only win via a later, strictly
      // smaller arrival (its observed min): eviction happens only when
      // `room` other URLs hold strictly smaller keys, and keys never
      // increase — so re-entry through the normal path is exact, not
      // an approximation.
      val byKey = new java.util.TreeMap[(Long, String), Unit](
        Ordering.Tuple2[Long, String])
      val best = scala.collection.mutable.HashMap.empty[String, Long]
      if (room > 0) rows.foreach { a =>
        if (!seen.contains(a.url_canon)) {
          best.get(a.url_canon) match {
            case Some(old) =>
              if (a.doc_id < old) {
                byKey.remove((old, a.url_canon))
                byKey.put((a.doc_id, a.url_canon), ())
                best(a.url_canon) = a.doc_id
              }
            case None =>
              if (byKey.size < room) {
                byKey.put((a.doc_id, a.url_canon), ())
                best(a.url_canon) = a.doc_id
              } else if (Ordering.Tuple2[Long, String]
                  .lt((a.doc_id, a.url_canon), byKey.lastKey())) {
                val evicted = byKey.pollLastEntry().getKey
                best.remove(evicted._2): Unit
                byKey.put((a.doc_id, a.url_canon), ())
                best(a.url_canon) = a.doc_id
              }
          }
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[UrlAdmitted]
      var seq = seen.size.toLong
      val it = byKey.keySet().iterator() // ascending (doc_id, url)
      while (it.hasNext) {
        val (docId, url) = it.next()
        seq += 1
        admittedUrls.appendValue(url)
        out += UrlAdmitted(docId, domain, url, seq)
      }
      out.iterator
    }
  }

  /** Append-mode stream of URL-level admissions (dedup + quota). */
  def urlAdmitted(arrivals: Dataset[UrlArrival],
      k: Long): Dataset[UrlAdmitted] = {
    implicit val outEnc = Encoders.product[UrlAdmitted]
    arrivals.groupByKey(_.domain)(Encoders.STRING)
      .transformWithState(new UrlQuotaProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
