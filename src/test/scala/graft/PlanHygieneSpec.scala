package graft

/** Blanket plan-hygiene gate over EVERY declared batch query: none may
  * plan a Cartesian product or a nested-loop join — the two shapes that
  * silently turn a working sf0.01 query into a 100 TB non-starter. Plans
  * are built (not executed), so the whole surface checks in seconds;
  * streaming gates are excluded (building their DataFrame RUNS the
  * stream) — their operators are stateful aggregates/joins with no
  * nested-loop risk, each oracle-gated separately.
  */
class PlanHygieneSpec extends SparkSpec {

  /** Queries whose BroadcastNestedLoopJoin is the DESIGN, not an accident:
    * a 1-row aggregate broadcast (scalar subquery / corpus totals — O(n)
    * regardless of join type), or the brute-force ANN baselines whose tiny
    * bounded query set is deliberately broadcast against the corpus (the
    * size-switched `Joins.maybeBroadcast` path, shuffle above the limit).
    */
  private val deliberateBnlj = Set(
    "q_subquery_scalar", // scalar subquery = 1-row broadcast
    "q_bm25", "q_tfidf", "q_bigram_pmi", // 1-row corpus-stats aggregates
    "q_lm_perplexity", // 1-row vocabulary-size aggregate
    "q_mixture_temperature", // 1-row Σ√n normalizer against |langs| rows
    "q_sim_topk", "q_sim_quant", "q_sim_pq", // bounded |Q| × corpus scoring
    "q_skew_join", // salt spine: 8-row broadcast replicating the small side
    "q_skew_join_sql") // the same salt spine via the graft_salted_join TVF

  test("no declared batch query plans CartesianProduct or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(_._1.startsWith("s_"))
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf("sf0.001")).queryExecution.executedPlan.toString
        val bad = (if (plan.contains("CartesianProduct"))
            Seq("CartesianProduct") else Nil) ++
          (if (plan.contains("BroadcastNestedLoopJoin") &&
              !deliberateBnlj(name)) Seq("BroadcastNestedLoopJoin") else Nil)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty,
      s"queries with product/nested-loop plans:\n${offenders.mkString("\n")}")
  }
}
