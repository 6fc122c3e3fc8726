package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM probe for the DECLARATIVE deployment path: a session built
  * only with `spark.sql.extensions=graft.GraftExtensions` — no imperative
  * `register`/`bootstrap` calls — must resolve the native SQL functions
  * (check-rule injection), plan the custom as-of operator (strategy
  * injection), and push filters through it (optimizer-rule injection).
  * Run by ExtensionSpec in a fresh JVM so this session's extensions can't
  * be polluted by the suite-wide session.
  */
object ExtensionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1. native functions visible to plain SQL (injectCheckRule)
    val h = spark.sql(
        "SELECT graft_simhash64(split('hello world hello there', ' ')) AS h")
      .collect()(0).getLong(0)
    require(h != 0L, "graft_simhash64 returned 0 — function not registered?")

    // 2. the as-of strategy (injectPlannerStrategy): build the logical node
    //    directly, WITHOUT AsOf.register — only the extension can plan it
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, ts("2020-01-01 10:00:00")), (2L, ts("2020-01-01 10:00:00")))
      .toDF("lk", "lt")
    val r = Seq((1L, ts("2020-01-01 09:00:00"), "early"),
        (1L, ts("2020-01-01 09:30:00"), "late"),
        (2L, ts("2020-01-01 11:00:00"), "future"))
      .toDF("rk", "rt", "tag")
    val j = org.apache.spark.sql.graft.PlanGlue.ofRows(spark,
      graft.plans.AsOf.plan(l, r, Seq("lk"), Seq("rk"), "lt", "rt"))
    val got = j.select("lk", "tag").as[(Long, String)].collect().toMap
    require(got == Map(1L -> "late", 2L -> null),
      s"as-of through the extension returned $got")

    // 3. the pushdown rule (injectOptimizerRule): a left filter above the
    //    node must vanish from above it in the optimized plan
    val filtered = j.where($"lk" === 1L)
    filtered.collect()
    val opt = filtered.queryExecution.optimizedPlan
    val filterAboveAsOf = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[graft.plans.AsOfJoin] => f
    }
    require(filterAboveAsOf.isEmpty,
      s"filter did not push through AsOfJoin:\n$opt")

    println("EXTENSION_OK")
    spark.stop()
  }
}
