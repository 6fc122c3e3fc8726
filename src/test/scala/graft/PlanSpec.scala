package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions: the 100 TB claims in README/SURVEY §4, locked in
  * so a regression (lost pushdown, dropped broadcast, surprise shuffle) fails
  * CI rather than silently degrading at scale.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString

  test("q_scan_project prunes columns at the parquet scan") {
    val p = plan("q_scan_project")
    val scan = p.split("\n").find(_.contains("FileScan")).get
    assert(scan.contains("l_orderkey") && !scan.contains("l_shipdate"),
      s"scan not pruned: $scan")
  }

  test("q_filter_pred pushes predicates into the scan") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [Or(") || p.contains("PushedFilters: [In("),
      s"filters not pushed:\n${p.split("\n").find(_.contains("PushedFilters")).getOrElse("")}")
  }

  test("q_join_broadcast uses BroadcastHashJoin for all dimension joins") {
    val p = plan("q_join_broadcast")
    assert(p.split("BroadcastHashJoin").length - 1 >= 2,
      "expected 2+ broadcast joins (nation⋈region, supplier⋈dim)")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to SMJ")
  }

  test("q_timeseries_filtered pushes the raw-ns time range to the events scan") {
    val p = plan("q_timeseries_filtered")
    val scan = p.split("\n").find(_.contains("FileScan")).get
    assert(scan.contains("GreaterThanOrEqual(ts") || scan.contains("(ts#"),
      s"time range missing from scan: $scan")
  }

  test("q_timeseries_skip opens only store files overlapping the window") {
    val df = SparkEntry.queries("q_timeseries_skip")(spark, sf("sf0.01"))
    val opened = df.inputFiles
    // the store spans ~30 daily partitions; the 06:00→12:00 window touches
    // exactly two days — planning must open ONLY their files
    assert(opened.nonEmpty)
    assert(opened.forall(f => f.contains("logdate=2024-01-10") ||
      f.contains("logdate=2024-01-11")),
      s"non-overlapping files opened: ${opened.filterNot(f =>
        f.contains("logdate=2024-01-10") || f.contains("logdate=2024-01-11")).toSeq}")
    // and the values survive the store round-trip + skip (vs the plain scan)
    val direct = Tables.table(spark, sf("sf0.01"), "events")
      .filter(col("ts").between(lit("2024-01-10 06:00:00").cast("timestamp"),
        lit("2024-01-11 12:00:00").cast("timestamp"))).count()
    assert(df.agg(sum("cnt")).collect()(0).getLong(0) == direct && direct > 0)
  }

  test("ingest transform (parse→lookup→project) is a single narrow stage") {
    val df = graft.operators.AccessLog.project(
      Seq("""127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"""")
        .toDF("line"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle in ingest:\n$p")
  }

  test("month lookup constant-folds to a literal map (no join in the plan)") {
    val df = Seq("Apr").toDF("m")
      .select(graft.operators.AccessLog.monthLookup(col("m")))
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), "lookup should be a map literal, not a join")
  }

  test("file-backed lookup joins via broadcast and matches the literal map") {
    val months = graft.operators.AccessLog.monthMap.toSeq.toDF("month", "nxm")
    val facts = Seq("Apr", "Dec", "Foo").toDF("month")
    val joined = graft.operators.AccessLog
      .lookupJoin(facts, months, "month", "nxm", "unk", "nx")
    val got = joined.orderBy("month").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(got.toSeq == Seq("Apr" -> "04", "Dec" -> "12", "Foo" -> "unk"))
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"lookup not broadcast:\n$p")
  }

  test("q_sim_topk broadcasts the small query set, streams the candidate table") {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val exec = SparkEntry.queries("q_sim_topk")(spark, sf("sf0.01"))
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
    val bnlj = exec.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(bnlj.nonEmpty, "expected a BroadcastNestedLoopJoin for the non-equi scoring join")
    bnlj.foreach { j =>
      val build = if (j.buildSide == BuildLeft) j.left else j.right
      assert(build.toString.contains("< 5"),
        s"build side must be the filtered query set, got:\n$build")
    }
  }

  test("q_contamination broadcasts the eval shingle set") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"eval-set join must broadcast, corpus side stays shuffle-free:\n$p")
  }

  test("q_bm25 scan reads only the two columns it needs") {
    val p = plan("q_bm25")
    val scans = p.split("\n").filter(_.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(s =>
      !s.contains("lang") && !s.contains("n_chars")),
      s"bm25 scans must prune to (doc_id, text):\n${scans.mkString("\n")}")
  }

  test("q_sim_quant broadcasts the query side; QuantizeI8 stays in codegen") {
    val p = plan("q_sim_quant")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    // the quantize projection is codegen'd (a `*(n) Project` stage), not an
    // interpreted HOF transform
    graft.expressions.VectorOps.register(spark)
    val q = Tables.table(spark, sf("sf0.01"), "embeddings")
      .select(graft.expressions.VectorOps.quantizeI8(col("embedding")))
    val qp = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(qp).isDefined,
      s"QuantizeI8 fell out of codegen:\n$qp")
  }

  test("native expressions stay inside whole-stage codegen") {
    graft.operators.Dedup.register(spark)
    val df = Tables.table(spark, sf(), "documents")
      .select(graft.expressions.TextHashes.simhash64(split(col("text"), " ")))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen stage
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(p).isDefined,
      s"projection fell out of codegen:\n$p")
  }

  test("q_unpivot is one Expand over one scan, not a self-union rescan") {
    val p = SparkEntry.queries("q_unpivot")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), s"unpivot lost its Expand:\n$p")
    assert(!p.contains("Union"), s"unpivot fell back to self-union:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"unpivot scans the table more than once:\n$p")
  }

  test("q_timeseries_zerofill: spine join is not a nested-loop product") {
    val p = SparkEntry.queries("q_timeseries_zerofill")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"zerofill spine joined as a product:\n$p")
  }

  test("ANN query side: broadcast below the size switch, shuffle above it") {
    // auto-broadcast off isolates the HINT: below the limit the switch must
    // still produce a broadcast join; above it, the planner's shuffle path.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val e = queries.SimilarityOps.embWithNorm(spark, sf())
        .select(col("vec_id"), col("v"))
      val cents = graft.operators.VectorIvf.kmeans(e, "vec_id", "v", 4, 1)
      val small = graft.operators.VectorIvf.searchTopK(
        e, e.filter(col("vec_id") < 5), "vec_id", "v", cents,
        nProbe = 2, topK = 3)
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "small query side lost its broadcast hint")
      val qBig = spark.range(20).crossJoin(e)
        .select((col("vec_id") + col("id") * 1000000L).as("vec_id"), col("v"))
      val big = graft.operators.VectorIvf.searchTopK(
        e, qBig, "vec_id", "v", cents, nProbe = 2, topK = 3,
        broadcastRowLimit = 1000)
      assert(!big.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "over-limit query side still broadcast — the size switch is dead")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("persisted vector index: the probe set becomes partition filters — " +
    "the code scan opens only nProbe cell directories") {
    val e = queries.SimilarityOps.embWithNorm(spark, sf())
      .select(col("vec_id"), col("v"))
    val dir = graft.storage.VectorIndexStore.ensureIndex(e, "vec_id", "v",
      key = sf() + "#planspec", nCells = 8, m = 8, k = 16, iters = 1)
    val q = e.filter(col("vec_id") === 0)
    val df = graft.storage.VectorIndexStore.searchTopK(e, q, "vec_id", "v",
      dir, nProbe = 2, topK = 3)
    // inputFiles lists the whole table pre-pruning; the contract to pin is
    // that the literal probe-cell IN-list rides the scan as a PARTITION
    // filter (pruning is then the engine's guarantee), and that the index
    // genuinely has more cells on disk than the probe set
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN".r
        .findFirstIn(plan).nonEmpty,
      s"probe cells did not become partition filters:\n$plan")
    val total = new java.io.File(s"$dir/codes").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(total > 2, s"index degenerated to $total cells")
  }

  test("q_join_bucketed: the fact-fact join reads co-partitioned buckets, " +
    "no Exchange on either join input") {
    // AQE off for a stable plan string; broadcast off so the co-location
    // claim (not a broadcast fallback) is what's being pinned
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = plan("q_join_bucketed")
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      // the only Exchange allowed is the aggregate's (on o_orderpriority);
      // neither join input may shuffle on its key
      assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
        !p.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles an input:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scans not bucketed:\n$p")
      // r13: the layout writes ONE key-sorted file per bucket and the
      // catalog records SORTED BY, so the SMJ's inputs need no Sort
      // either — the per-query cost of the recurring join is the scan
      // itself (the final ORDER BY's Sort on o_orderpriority remains)
      assert(!p.contains("Sort [l_orderkey") && !p.contains("Sort [o_orderkey"),
        s"bucketed join still sorts an input:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
