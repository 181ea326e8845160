package graft

/** Guards the bench's streaming rows/s block: every probe must return a
  * positive rate (a failed probe reports −1 in the round artifact — this
  * catches the breakage at test time instead). */
class BenchStreamingSpec extends SparkSpec {

  test("streaming bench probes all report positive rates") {
    val rates = BenchStreaming.run(spark, sfDir).toMap
    assert(rates.keySet == Set("stedi_join_rows_per_sec",
      "incremental_dedup_rows_per_sec", "ann_probe_rows_per_sec",
      "ivf_probe_rows_per_sec",
      "pq_probe_rows_per_sec", "pq_flat_probe_rows_per_sec",
      "graph_probe_rows_per_sec", "hnsw_probe_rows_per_sec",
      "clustered_ingest_rows_per_sec", "ingest_gate_rows_per_sec"))
    rates.foreach { case (k, v) =>
      assert(v > 0, s"$k reported a non-positive rate: $v")
    }
  }
}
