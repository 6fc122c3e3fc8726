package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.AsOf

/** The native whole-operator as-of join (custom LogicalPlan → Strategy →
  * sort-merge SparkPlan): semantics on hand-built edges, parity with the
  * composed join+window formulation, and the plan shape (one AsOfJoinExec,
  * two hash exchanges, no pair-materializing join, no window).
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right at or before each left time, per key") {
    val l = Seq(
      (1L, ts("2020-01-01 10:00:00"), "l1"),
      (1L, ts("2020-01-01 12:00:00"), "l2"),
      (2L, ts("2020-01-01 11:00:00"), "l3"),
      (3L, ts("2020-01-01 11:00:00"), "l4")) // key absent on the right
      .toDF("lk", "lt", "ltag")
    val r = Seq(
      (1L, ts("2020-01-01 09:00:00"), "r_early"),
      (1L, ts("2020-01-01 11:30:00"), "r_mid"),
      (1L, ts("2020-01-01 23:00:00"), "r_late"),
      (2L, ts("2020-01-01 11:00:00"), "r_exact")) // exact match included
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt")
      .select("ltag", "rtag").as[(String, String)].collect().toMap
    assert(got == Map(
      "l1" -> "r_early", // 23:00 and 11:30 are in the future of 10:00
      "l2" -> "r_mid",
      "l3" -> "r_exact", // rt == lt matches (<=)
      "l4" -> null)) // no key 3 on the right: null-extended
  }

  test("equal-time ties break by the tie columns: maximum wins") {
    val l = Seq((1L, ts("2020-01-01 10:00:00"))).toDF("lk", "lt")
    val r = Seq(
      (1L, ts("2020-01-01 09:00:00"), 7L),
      (1L, ts("2020-01-01 09:00:00"), 9L),
      (1L, ts("2020-01-01 09:00:00"), 8L)).toDF("rk", "rt", "rid")
    val got = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt", tie = Seq("rid"))
      .select("rid").as[Long].collect().toSeq
    assert(got == Seq(9L))
  }

  test("SQL null semantics: null keys and null times never match") {
    val l = Seq(
      (Option(1L), Option(ts("2020-01-01 10:00:00")), "ok"),
      (None: Option[Long], Option(ts("2020-01-01 10:00:00")), "nullkey"),
      (Option(1L), None: Option[Timestamp], "nulltime"))
      .toDF("lk", "lt", "ltag")
    val r = Seq(
      (Option(1L), Option(ts("2020-01-01 09:00:00")), "match"),
      (None: Option[Long], Option(ts("2020-01-01 09:00:00")), "rnullkey"),
      (Option(1L), None: Option[Timestamp], "rnulltime"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt")
      .select("ltag", "rtag").as[(String, String)].collect().toMap
    assert(got == Map("ok" -> "match", "nullkey" -> null, "nulltime" -> null))
  }

  test("tolerance bounds the lookback: stale matches null out") {
    val l = Seq((1L, ts("2020-01-01 10:00:00"), "recent"),
        (2L, ts("2020-01-01 10:00:00"), "stale"))
      .toDF("lk", "lt", "ltag")
    val r = Seq((1L, ts("2020-01-01 09:45:00"), "in_window"),
        (2L, ts("2020-01-01 08:00:00"), "too_old"))
      .toDF("rk", "rt", "rtag")
    val got = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt",
        tolerance = Some("30 minutes"))
      .select("ltag", "rtag").as[(String, String)].collect().toMap
    assert(got == Map("recent" -> "in_window", "stale" -> null))
    // boundary: exactly tol away still matches (>= lt - tol)
    val r2 = Seq((2L, ts("2020-01-01 09:30:00"), "at_bound")).toDF("rk", "rt", "rtag")
    val got2 = AsOf.join(l.filter($"lk" === 2L), r2, Seq("lk"), Seq("rk"),
        "lt", "rt", tolerance = Some("30 minutes"))
      .select("rtag").as[String].collect().toSeq
    assert(got2 == Seq("at_bound"))
  }

  test("forward direction: earliest right at or after, with tolerance cap") {
    val l = Seq((1L, ts("2020-01-01 10:00:00"))).toDF("lk", "lt")
    val r = Seq(
      (1L, ts("2020-01-01 09:00:00"), "past"),
      (1L, ts("2020-01-01 10:20:00"), "next"),
      (1L, ts("2020-01-01 12:00:00"), "later")).toDF("rk", "rt", "rtag")
    val fwd = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt",
        direction = "forward")
      .select("rtag").as[String].collect().toSeq
    assert(fwd == Seq("next"))
    assert(!AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt",
        direction = "forward").columns.exists(_.startsWith("__graft")))
    // tolerance caps the lookahead: 10 minutes excludes the 10:20 match
    val capped = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt",
        direction = "forward", tolerance = Some("10 minutes"))
      .select("rtag").as[String].collect().toSeq
    assert(capped == Seq(null))
  }

  test("planning without AQE: EnsureRequirements alone supplies the exchanges") {
    val d = sf()
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val q = SparkEntry.queries("q_join_asof_native")(spark, d)
      val composed = SparkEntry.queries("q_join_asof")(spark, d)
      assert(q.collect().toSeq == composed.collect().toSeq)
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin") &&
        "Exchange hashpartitioning".r.findAllIn(p).size == 2, s"plan:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("native as-of == composed join+window formulation on testdata") {
    val d = sf()
    val native = SparkEntry.queries("q_join_asof_native")(spark, d).collect()
    val composed = SparkEntry.queries("q_join_asof")(spark, d).collect()
    assert(native.nonEmpty)
    assert(native.toSeq == composed.toSeq)
  }

  test("optimizer rule: left-key filters push through the join to BOTH scans") {
    val d = sf()
    // user filter applied ABOVE the custom operator: without PushThroughAsOf
    // it would run after both full scans and both shuffles; with it, the
    // predicate lands in each side's parquet PushedFilters (mirrored onto
    // the right key), pruning before the exchange.
    val q = SparkEntry.queries("q_join_asof_native")(spark, d)
      .filter(col("e_user") < 500)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val pushedLeft = "PushedFilters: \\[[^\\]]*LessThan\\(user_id,500\\)".r
      .findAllIn(p).size
    assert(pushedLeft == 2,
      s"expected the key filter pushed into BOTH parquet scans, found $pushedLeft:\n$p")
    // and the result still matches the composed form under the same filter
    val composed = SparkEntry.queries("q_join_asof")(spark, d)
      .filter(col("e_user") < 500).collect()
    assert(q.collect().toSeq == composed.toSeq)
  }

  test("optimizer rule: unused right columns prune below the join") {
    val l = Seq((1L, ts("2020-01-01 10:00:00"))).toDF("lk", "lt")
    val r = Seq((1L, ts("2020-01-01 09:00:00"), "keepme", "wide_payload"))
      .toDF("rk", "rt", "rkeep", "rwide")
    val q = AsOf.join(l, r, Seq("lk"), Seq("rk"), "lt", "rt")
      .select("lk", "rkeep")
    q.collect()
    val asof = q.queryExecution.optimizedPlan.collectFirst {
      case a: graft.plans.AsOfJoin => a
    }.getOrElse(fail("AsOfJoin node missing from optimized plan"))
    val rightCols = asof.right.output.map(_.name)
    assert(!rightCols.contains("rwide"),
      s"unused right column not pruned: $rightCols")
    assert(rightCols.contains("rkeep") && rightCols.contains("rk") &&
      rightCols.contains("rt"))
    assert(q.collect().map(_.getString(1)).toSeq == Seq("keepme"))
  }

  test("plan: AsOfJoinExec, two exchanges, no SMJ pair-join, no window") {
    val d = sf()
    val q = SparkEntry.queries("q_join_asof_native")(spark, d)
    q.collect() // materialize so AQE finalizes the plan
    // the adaptive plan prints Final AND Initial trees — assert on the final
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), s"native operator missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"pair-materializing join crept in:\n$p")
    assert(!p.contains("Window"), s"window fallback crept in:\n$p")
    // two shuffles total: one hash exchange per side (plus AQE reads); the
    // final orderBy adds a range exchange — count only hashpartitioning
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 2, s"expected 2 hash exchanges, got $hashEx:\n$p")
  }
}
