package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig}

/** Snapshot-then-changelog bootstrap — the reference deployment's actual
  * system-of-record semantics: the customer dimension lives in Redis, a
  * job seeds itself from the RDB SNAPSHOT, then keeps the dimension
  * current by folding the live change stream, latest-wins per key
  * (/root/reference/kafka/connect-avro-standalone.properties:6-17 wires
  * the Redis source; sparkpykafkajoin.py consumes the change topic).
  * Batch twin: `StediQueries.op125RdbBootstrapJoin` (snapshot only).
  *
  * Spark-first shape: `transformWithState` WITH INITIAL STATE — the
  * parsed snapshot rows seed one ValueState per key before the first
  * micro-batch (`handleInitialState`), and each input batch folds risk
  * events into the held profile: every event counts; update-bearing
  * events replace the birth year if they post-date the held update in
  * the unique (ts_us, event_id) total order — so arrival order across
  * and within micro-batches cannot change the fixpoint (the
  * [[Changelog.fold]] argument). State is O(active keys), sharded by
  * the group key exactly as the state store shards; RocksDB provider
  * required by the API (also the 100 TB recommendation). Keys that
  * never receive an event hold their seed silently — identical to the
  * batch join's inner semantics (op125 emits only emails seen in
  * events).
  */
object RdbBootstrapStream {

  /** One change-stream row: a risk event for `email`, optionally
    * carrying a profile update (`birth_year_update` null otherwise). */
  case class ProfileEvent(email: String, event_id: Long, ts_us: Long,
      birth_year_update: String)

  /** One parsed RDB snapshot row (the seed dimension). */
  case class SnapshotRow(email: String, birthYear: String)

  /** Held per-key state: current birth year, the (ts_us, event_id)
    * stamp of the update that set it (Long.MinValue ⇒ still the
    * snapshot value), and the running event/update counters. */
  case class ProfileState(birthYear: String, upd_ts_us: Long,
      upd_event_id: Long, n_events: Long, n_updates: Long)

  case class ProfileRow(email: String, birthYear: String,
      n_events: Long, n_updates: Long)

  /** Seeds each key's state from its snapshot row, then folds event
    * batches: counters are additive; the birth year is latest-wins by
    * (ts_us, event_id) against the held stamp, so a straggler older
    * than the held update only counts, never regresses the value. */
  class BootstrapProcessor extends StatefulProcessorWithInitialState[
      String, ProfileEvent, ProfileRow, SnapshotRow] {
    @transient private var held:
      org.apache.spark.sql.streaming.ValueState[ProfileState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      held = getHandle.getValueState[ProfileState]("held",
        Encoders.product[ProfileState], TTLConfig.NONE)

    override def handleInitialState(email: String, seed: SnapshotRow,
        timerValues: TimerValues): Unit =
      held.update(ProfileState(seed.birthYear,
        Long.MinValue, Long.MinValue, 0L, 0L))

    override def handleInputRows(email: String,
        rows: Iterator[ProfileEvent],
        timerValues: TimerValues): Iterator[ProfileRow] = {
      val batch = rows.toSeq
      // an event for a key absent from the snapshot bootstraps a fresh
      // record (what a Redis SET does) — null until an update arrives
      var s = if (held.exists()) held.get()
        else ProfileState(null, Long.MinValue, Long.MinValue, 0L, 0L)
      var by = s.birthYear; var uts = s.upd_ts_us; var uid = s.upd_event_id
      var nUpd = s.n_updates
      batch.foreach { e =>
        if (e.birth_year_update != null) {
          nUpd += 1
          if (e.ts_us > uts || (e.ts_us == uts && e.event_id > uid)) {
            by = e.birth_year_update; uts = e.ts_us; uid = e.event_id
          }
        }
      }
      s = ProfileState(by, uts, uid, s.n_events + batch.size, nUpd)
      held.update(s)
      Iterator.single(ProfileRow(email, s.birthYear, s.n_events,
        s.n_updates))
    }
  }

  /** The bootstrapped, change-maintained dimension as an Update-mode
    * stream: one row per touched key per micro-batch with its current
    * state (a KV/compacted-topic sink applies rows in batch order, so
    * the last write per key IS the dimension). `snapshot` seeds state
    * before the first batch. */
  def bootstrappedProfiles(changes: Dataset[ProfileEvent],
      snapshot: Dataset[SnapshotRow]): Dataset[ProfileRow] = {
    implicit val outEnc = Encoders.product[ProfileRow]
    implicit val seedEnc = Encoders.product[SnapshotRow]
    changes.groupByKey(_.email)(Encoders.STRING)
      .transformWithState(new BootstrapProcessor, TimeMode.None(),
        OutputMode.Update(),
        snapshot.groupByKey(_.email)(Encoders.STRING))
  }
}
