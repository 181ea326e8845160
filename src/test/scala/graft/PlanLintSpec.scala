package graft

/** Plan lint over the whole query surface: catches accidental
  * worst-case physical operators that a correctness gate cannot see
  * (results stay right while cost explodes at scale).
  *
  * CartesianProduct = a non-broadcast cross product — O(n·m) rows
  * through a real shuffle-less nested loop. The only query allowed to
  * plan one is the deliberate small×small cross join (OP-35).
  * BroadcastNestedLoopJoin is NOT linted: with a broadcast (small) side
  * it is the correct plan for non-equi joins (range join, brute-force
  * scoring) at any scale.
  */
class PlanLintSpec extends SparkSpec {

  private val cartesianAllowed = Set("op35_join_cross")

  test("no query plans a CartesianProduct (except the deliberate cross join)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !cartesianAllowed(name))
          Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unexpected CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("tiny-dimension joins broadcast instead of sort-merging") {
    // queries whose every join side except the corpus scan is bounded
    // (per-source rates, 1-row K, quota tables): a SortMergeJoin there
    // means the corpus got sorted for a table of 20 rows
    val broadcastOnly = Seq("op89_mixture_cutoff", "op79_sample_stratified",
      "op88_mixture")
    val offenders = broadcastOnly.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (plan.contains("SortMergeJoin")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"bounded-side join fell back to SortMergeJoin in: ${offenders.mkString(", ")}")
  }
}
