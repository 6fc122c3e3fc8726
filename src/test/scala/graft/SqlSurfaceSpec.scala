package graft

/** R13: the ad-hoc SQL surface — after bootstrap, plain `spark.sql` works over
  * every table, including the graft native functions (the reason the reference
  * chose ClickHouse over Kibana was "regular SQL syntax", README.md:7).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("bootstrap exposes all tables to spark.sql") {
    Tables.bootstrap(spark, sf())
    val n = spark.sql(
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 4) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin).collect()
    assert(n.length == 5)
  }

  test("the Grafana R12 query runs verbatim through spark.sql") {
    Tables.bootstrap(spark, sf())
    val rows = spark.sql(
      """SELECT date_trunc('hour', ts) AS t, count(*) AS cnt
        |FROM events GROUP BY t ORDER BY t""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == 1000L)
  }

  test("native functions are SQL-callable after bootstrap") {
    Tables.bootstrap(spark, sf())
    val r = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS h,
        |       size(graft_shingles3(split(text, ' '))) AS n_sh,
        |       graft_parse_accesslog(
        |         '127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"'
        |       ).clientip AS ip
        |FROM documents LIMIT 1""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) > 0)
    assert(r.getString(2) == "127.0.0.1")
  }

  test("graft_asof_join TVF: pure SQL reaches the native as-of operator") {
    val d = sf()
    // the declared query builds its own temp views + registration
    val viaSql = SparkEntry.queries("q_join_asof_sql")(spark, d)
    val rows = viaSql.collect()
    assert(rows.toSeq == SparkEntry.queries("q_join_asof_native")(spark, d)
      .collect().toSeq)
    viaSql.queryExecution.executedPlan // force planning
    val p = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("AsOfJoin"), s"SQL path missed the native operator:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"SQL path fell back to the quadratic composition:\n$p")
  }

  test("graft_asof_join TVF: tie, tolerance and forward-direction arguments") {
    val d = sf()
    Tables.bootstrap(spark, d)
    import org.apache.spark.sql.functions._
    val ev = Tables.table(spark, d, "events")
    ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts")).createOrReplaceTempView("asof_sql_err")
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts")).createOrReplaceTempView("asof_sql_pur")
    val tol = spark.sql(
      """SELECT e_id, e_user, p_id FROM graft_asof_join(
        |  'asof_sql_err', 'asof_sql_pur', 'e_user', 'p_user', 'e_ts', 'p_ts',
        |  'p_id', '30 minutes') ORDER BY e_id""".stripMargin).collect()
    val tolDf = SparkEntry.queries("q_join_asof_tol")(spark, d).collect()
    assert(tol.toSeq == tolDf.toSeq, "SQL tolerance diverges from DataFrame API")
    val fwd = spark.sql(
      """SELECT e_id, e_user, p_id FROM graft_asof_join(
        |  'asof_sql_err', 'asof_sql_pur', 'e_user', 'p_user', 'e_ts', 'p_ts',
        |  'p_id', '', 'forward') ORDER BY e_id""".stripMargin).collect()
    val fwdDf = SparkEntry.queries("q_join_asof_fwd")(spark, d).collect()
    assert(fwd.toSeq == fwdDf.toSeq, "SQL forward diverges from DataFrame API")
  }

  test("graft_asof_join TVF: non-literal and malformed arguments fail clearly") {
    Tables.bootstrap(spark, sf())
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('a', 'b', 'k', 'k', 't')").collect())
    assert(e1.getMessage.contains("6-9"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """SELECT * FROM graft_asof_join('asof_sql_err', 'asof_sql_pur',
        |'e_user', 'p_user', 'e_ts', 'p_ts', '', '', 'sideways')""".stripMargin)
      .collect())
    assert(e2.getMessage.contains("backward or forward"), e2.getMessage)
  }

  test("graft_salted_join TVF: pure SQL gets the skew-safe salted plan") {
    val d = sf()
    // the declared query builds its own temp views + registration
    val viaSql = SparkEntry.queries("q_skew_join_sql")(spark, d)
    assert(viaSql.collect().toSeq ==
      SparkEntry.queries("q_skew_join")(spark, d).collect().toSeq,
      "SQL salted join diverges from the DataFrame operator")
    // plan shape: the salt column is live in the join (the hot key is
    // spread), and the salt spine is replicated by broadcast, not shuffle
    val p = viaSql.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("_salt"), s"salt column missing from the SQL plan:\n$p")
    assert(p.contains("Broadcast"), s"salt spine not broadcast:\n$p")
  }

  test("graft_salted_join TVF: malformed arguments fail clearly") {
    Tables.bootstrap(spark, sf())
    graft.plans.AsOf.register(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_salted_join('a', 'b', 'k', 'id')").collect())
    assert(e1.getMessage.contains("5 string-literal"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      """SELECT * FROM graft_salted_join('lineitem', 'part',
        |'l_partkey', 'l_orderkey', 'lots')""".stripMargin).collect())
    assert(e2.getMessage.contains("integer literal"), e2.getMessage)
  }

  test("vector-quantization functions are SQL-callable after bootstrap") {
    Tables.bootstrap(spark, sf())
    val r = spark.sql(
      """SELECT graft_quantize_i8(array(0.5D, -1.0D, 0.25D)) AS q,
        |  graft_nearest_centroid(array(0.9D, 0.1D),
        |    array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS cell""".stripMargin)
      .collect()(0)
    assert(r.getSeq[Double](0) == Seq(64.0, -127.0, 32.0))
    assert(r.getInt(1) == 0)
  }

  test("graft_ann_search TVF: pure SQL reaches the persisted-index ANN plan " +
    "with cell-partition pruning, rows match the DataFrame path") {
    import org.apache.spark.sql.functions.col
    val d = sf()
    plans.AsOf.register(spark)
    val emb = queries.SimilarityOps.embWithNorm(spark, d)
      .select(col("vec_id"), col("v"))
    emb.createOrReplaceTempView("ann_corpus")
    emb.filter(col("vec_id") < 5).createOrReplaceTempView("ann_queries")
    val viaSql = spark.sql(
      """SELECT * FROM graft_ann_search(
        |  'ann_corpus', 'ann_queries', 'vec_id', 'v', '5', '8')
        |ORDER BY q_id, rank""".stripMargin)
    // parity: the DataFrame path over ITS index (same auto-derived
    // geometry, same data — both sides call autoCells on the same count)
    val dir = storage.VectorIndexStore.ensureIndexAuto(emb, "vec_id", "v",
      key = d, m = 8, k = 16, iters = 3, trainSampleMod = 2)
    val viaDf = storage.VectorIndexStore.searchTopK(emb,
        emb.filter(col("vec_id") < 5), "vec_id", "v", dir,
        nProbe = 8, topK = 5, shortlistK = 150)
      .orderBy(col("q_id"), col("rank"))
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
    // plan pin: the codes scan under the TVF prunes to the probed cells
    // (the same contract PlanSpec pins for the DataFrame path)
    val p = viaSql.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN".r
        .findFirstIn(p).nonEmpty,
      s"no cell partition filter in TVF plan:\n$p")
    // geometry pin: the index that served the TVF carries the auto-derived
    // cell count for THIS corpus size (≈√N power-of-two)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_meta.json")), "UTF-8")
    val want = storage.VectorIndexStore.autoCells(emb.count())
    assert(meta.contains(s""""nCells":$want"""),
      s"index geometry not auto-sized: $meta (want nCells=$want)")
  }

  test("graft_ann_search auto-geometry derives scale-safe cell counts " +
    "across corpus sizes") {
    import storage.VectorIndexStore.autoCells
    // the gate corpus (200 vectors) keeps the historical 16-cell layout;
    // a 100×-scale corpus gets 512 cells instead of a degenerate 16
    assert(autoCells(200L) == 16)
    assert(autoCells(200000L) == 512)
    // clamps: tiny corpora never go below 4; the ceiling caps broadcast
    // size at any scale (√10⁹ ≈ 31623 → 4096)
    assert(autoCells(1L) == 4)
    assert(autoCells(1000000000L) == 4096)
    // exact powers of two are preserved, not doubled
    assert(autoCells(256L * 256L) == 256)
  }

  test("graft_ann_search TVF: malformed arguments fail clearly") {
    plans.AsOf.register(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_ann_search('a','b','id','v','5')").collect())
    assert(e1.getMessage.contains("6 string-literal arguments"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_ann_search('a','b','id','v','five','8')").collect())
    assert(e2.getMessage.contains("integer literal"))
  }

  test("graft_neardup TVF: pure SQL reaches the banded-LSH plans, rows " +
    "match the DataFrame operators for both methods") {
    val d = sf()
    plans.AsOf.register(spark)
    Tables.bootstrap(spark, d)
    val viaSqlMin = spark.sql(
      """SELECT * FROM graft_neardup(
        |  'documents', 'doc_id', 'text', 'minhash', '0.5')
        |ORDER BY a, b""".stripMargin)
    assert(viaSqlMin.columns.toSeq == Seq("a", "b", "jaccard"))
    assert(viaSqlMin.collect().toSeq ==
      SparkEntry.queries("q_dedup_near")(spark, d).collect().toSeq,
      "SQL minhash pairs diverge from the DataFrame operator")
    // plan shape: candidate generation is an equi-join on the band key,
    // never a cross join
    val p = viaSqlMin.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup TVF plan degenerated to all-pairs:\n$p")
    val viaSqlSim = spark.sql(
      """SELECT * FROM graft_neardup(
        |  'documents', 'doc_id', 'text', 'simhash', '3')
        |ORDER BY a, b""".stripMargin)
    assert(viaSqlSim.columns.toSeq == Seq("a", "b", "hamming"))
    assert(viaSqlSim.collect().toSeq ==
      SparkEntry.queries("q_dedup_simhash")(spark, d).collect().toSeq,
      "SQL simhash pairs diverge from the DataFrame operator")
  }

  test("graft_neardup TVF: malformed arguments fail clearly") {
    plans.AsOf.register(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_neardup('a','doc_id','text','minhash')").collect())
    assert(e1.getMessage.contains("5 string-literal arguments"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_neardup('a','doc_id','text','phash','3')").collect())
    assert(e2.getMessage.contains("minhash or simhash"))
    val e3 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_neardup('a','doc_id','text','minhash','tight')")
      .collect())
    assert(e3.getMessage.contains("jaccard threshold"))
    val e4 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_neardup('a','doc_id','text','simhash','99')")
      .collect())
    assert(e4.getMessage.contains("[0, 64]"))
  }

  test("graft_profile TVF: pure SQL profile matches the DataFrame operator " +
    "and runs as one scan (single aggregate, no join)") {
    val d = sf()
    plans.AsOf.register(spark)
    Tables.bootstrap(spark, d)
    val viaSql = spark.sql(
      "SELECT * FROM graft_profile('documents') ORDER BY col_name")
    assert(viaSql.columns.toSeq ==
      Seq("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s"))
    assert(viaSql.collect().toSeq ==
      SparkEntry.queries("q_profile_table")(spark, d).collect().toSeq,
      "SQL profile diverges from the DataFrame operator")
    // one-scan pin on the OPTIMIZED plan (the AQE plan string prints the
    // scan once per plan section, so string-counting over-counts)
    val opt = viaSql.queryExecution.optimizedPlan
    val rels = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(rels.size == 1, s"profile reads the table ${rels.size} times:\n$opt")
    assert(opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.isEmpty, s"profile plan grew a join:\n$opt")
  }

  test("graft_profile TVF: malformed arguments fail clearly") {
    plans.AsOf.register(spark)
    val e1 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_profile('a','b')").collect())
    assert(e1.getMessage.contains("1 string-literal argument"))
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM graft_profile(42)").collect())
    assert(e2.getMessage.contains("string literal"))
  }

  test("graft_snapshot TVF: SQL time travel matches the store API at both " +
    "versions; malformed versions fail clearly") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapsql").toString + "/st"
    graft.storage.SnapshotStore.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), dir, "p")
    graft.storage.SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0)).toDF("k", "p", "v"), "p", Seq("k"))
    def rows(q: String) = spark.sql(q).select("k", "v").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(s"SELECT * FROM graft_snapshot('$dir', '1')") ==
      Seq((1L, 10.0), (2L, 20.0)))
    assert(rows(s"SELECT * FROM graft_snapshot('$dir', '2')") ==
      Seq((1L, 11.0), (2L, 20.0)))
    assert(rows(s"SELECT * FROM graft_snapshot('$dir', 'head')") ==
      rows(s"SELECT * FROM graft_snapshot('$dir', '2')"))
    // the version catalog from SQL: one row per retained version
    val hist = spark.sql(s"SELECT * FROM graft_snapshot('$dir', 'history')")
      .collect().map(r => (r.getInt(0), r.getAs[String]("operation"),
        r.getAs[Int]("n_partitions"), r.getAs[Long]("n_rows"))).toSeq
    assert(hist.map(h => (h._1, h._3, h._4)) ==
      Seq((1, 2, 2L), (2, 2, 2L)), s"history: $hist")
    assert(hist.map(_._2).forall(_.nonEmpty), s"operations: $hist")
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot('$dir', 'vv')").collect())
    assert(e1.getMessage.contains("version must be a positive integer"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot('$dir')").collect())
    assert(e2.getMessage.contains("2 string-literal arguments"))
  }

  test("graft_snapshot_where TVF: the stats-pruned read from pure SQL — " +
    "rows match the store API, the scan opens only surviving gens, " +
    "malformed arguments fail clearly") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snapwsql").toString + "/st"
    def chunk(lo: Long, n: Int) =
      (0 until n).map(i => (lo + i, "p0", (lo + i) * 1.0)).toDF("k", "p", "v")
    graft.storage.SnapshotStore.write(chunk(0L, 5), dir, "p",
      statsCols = Seq("k"))
    graft.storage.SnapshotStore.append(chunk(100L, 5), dir, "p")
    graft.storage.SnapshotStore.append(chunk(200L, 5), dir, "p")
    val df = spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dir', 'head', 'k >= 100 AND k < 105')")
    assert(df.select("k").as[Long].collect().sorted.toSeq ==
      (100L to 104L))
    def gens(files: Array[String]) =
      files.flatMap(_.split("/data/").lift(1)).map(_.split("/").head).toSet
    assert(gens(df.inputFiles).size == 1,
      "the SQL rung must prune exactly like the DataFrame API")
    assert(spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dir', '1', 'k >= 100')")
      .count() == 0, "versioned: v1 has no such keys")
    // STRING bounds through the SQL rung: equality and pure-prefix LIKE
    val dirS = java.nio.file.Files
      .createTempDirectory("graft_snapwsqls").toString + "/st"
    def schunk(tag: String, lo: Long) =
      (0 until 5).map(i => (f"$tag${lo + i}%04d", "p0", lo + i))
        .toDF("sk", "p", "k")
    graft.storage.SnapshotStore.write(schunk("aa", 0L), dirS, "p",
      statsCols = Seq("sk"))
    graft.storage.SnapshotStore.append(schunk("bb", 100L), dirS, "p")
    val sEq = spark.sql(
      s"""SELECT * FROM graft_snapshot_where('$dirS', 'head', 'sk = "bb0102"')""")
    assert(sEq.select("k").as[Long].collect().toSeq == Seq(102L))
    assert(gens(sEq.inputFiles).size == 1, "string equality prunes via SQL")
    val sLike = spark.sql(
      s"""SELECT * FROM graft_snapshot_where('$dirS', 'head', 'sk LIKE "aa%"')""")
    assert(sLike.count() == 5)
    assert(gens(sLike.inputFiles).size == 1, "prefix LIKE prunes via SQL")
    // NULL-count pruning through the SQL rung (r15): a null-free gen
    // prunes under IS NULL, an all-NULL gen under IS NOT NULL, and the
    // partition-KEY restriction composes with a residual conjunct
    val dirN = java.nio.file.Files
      .createTempDirectory("graft_snapwsqln").toString + "/st"
    graft.storage.SnapshotStore.write(
      Seq((1L, "p0", Some("x")), (2L, "p0", Some("y")))
        .toDF("k", "p", "note"), dirN, "p", statsCols = Seq("note", "k"))
    graft.storage.SnapshotStore.append(
      Seq((10L, "p0", Option.empty[String]), (11L, "p1", Option.empty[String]))
        .toDF("k", "p", "note"), dirN, "p")
    val nl = spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dirN', 'head', 'note IS NULL')")
    assert(nl.select("k").as[Long].collect().sorted.toSeq == Seq(10L, 11L))
    assert(gens(nl.inputFiles).size == 1, "IS NULL prunes the null-free gen")
    val nn = spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dirN', 'head', 'note IS NOT NULL')")
    assert(nn.count() == 2 && gens(nn.inputFiles).size == 1,
      "IS NOT NULL prunes the all-NULL gen")
    val keyed = spark.sql(
      s"""SELECT * FROM graft_snapshot_where('$dirN', 'head', 'p = "p1" AND note IS NULL')""")
    assert(keyed.select("k").as[Long].collect().toSeq == Seq(11L))
    assert(keyed.inputFiles.forall(_.contains("_p=p1")),
      "the partition-key restriction composes through SQL")
    // the metadata aggregates from pure SQL
    val cnt = spark.sql(
      s"SELECT * FROM graft_count('$dirN', 'note IS NULL')").collect()(0)
    assert(cnt.getLong(1) == 2L && cnt.getLong(2) == 0L,
      "graft_count answers the null count from metadata alone")
    val mm = spark.sql(
      s"SELECT * FROM graft_minmax('$dirN', 'k', 'note IS NOT NULL')")
      .collect()(0)
    assert(mm.getLong(0) == 1L && mm.getLong(1) == 2L && mm.getLong(2) == 0L)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dir', 'vv', 'k > 0')").collect())
    assert(e1.getMessage.contains("positive integer, 'head' or 'branch:<name>'"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot_where('$dir', 'head')").collect())
    assert(e2.getMessage.contains("3 string-literal arguments"))
  }

  test("graft_changes TVF: the CDF feed matches the store API, supports " +
    "composite keys, and rejects malformed arguments") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_chsql").toString + "/st"
    graft.storage.SnapshotStore.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), dir, "p")
    graft.storage.SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0), (3L, "b", 30.0)).toDF("k", "p", "v"),
      "p", Seq("k"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).toSet
    val viaSql = canon(spark.sql(
      s"SELECT * FROM graft_changes('$dir', '1', '2', 'k')"))
    assert(viaSql == canon(
      graft.storage.SnapshotStore.changes(spark, dir, 1, 2, Seq("k"))))
    assert(viaSql == Set(("update_preimage", 1L, "a", 10.0),
      ("update_postimage", 1L, "a", 11.0), ("insert", 3L, "b", 30.0)))
    // composite key (k, p): same feed here, exercised through the parser
    assert(canon(spark.sql(
      s"SELECT * FROM graft_changes('$dir', '1', '2', 'k, p')")) == viaSql)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$dir', '0', '2', 'k')").collect())
    assert(e1.getMessage.contains("positive integer version"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$dir', '1', '2')").collect())
    assert(e2.getMessage.contains("4 string-literal arguments"))
    val e3 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$dir', '1', '2', ' ')").collect())
    assert(e3.getMessage.contains("at least one column"))
  }

  test("graft_compact / graft_rollback / graft_expire TVFs: the maintenance " +
    "verbs run through SQL with the same outcomes as the store API") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mntsql").toString + "/st"
    graft.storage.SnapshotStore.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), dir, "p")
    // two appends pile dirs onto partition a (fresh keys, insert-only)
    graft.storage.SnapshotStore.append(
      Seq((3L, "a", 30.0)).toDF("k", "p", "v"), dir, "p")
    graft.storage.SnapshotStore.append(
      Seq((4L, "a", 40.0)).toDF("k", "p", "v"), dir, "p")
    def headRows() = graft.storage.SnapshotStore.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val before = headRows()
    // compact via SQL: one status row, 1 partition compacted, head advanced
    val c = spark.sql(s"SELECT * FROM graft_compact('$dir', 'p')").collect()
    assert(c.length == 1)
    assert(c(0).getString(0) == "compact" && c(0).getLong(2) == 1L &&
      c(0).getLong(3) == 4L, s"compact status: ${c(0)}")
    assert(headRows() == before, "compaction is pure layout")
    assert(graft.storage.SnapshotStore
      .readManifest(spark, dir, 4)("a").size == 1, "partition a left uncompacted")
    // rollback via SQL to v1: new head (5) whose content is v1's
    val r = spark.sql(s"SELECT * FROM graft_rollback('$dir', '1')").collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "rollback" && r(0).getLong(2) == 1L &&
      r(0).getLong(3) == 5L, s"rollback status: ${r(0)}")
    assert(headRows() == Set((1L, "a", 10.0), (2L, "b", 20.0)))
    // expire via SQL (keep 2, age floor 0 — quiescent): versions 1-3 drop
    val x = spark.sql(s"SELECT * FROM graft_expire('$dir', '2', '0')").collect()
    assert(x.length == 1)
    assert(x(0).getString(0) == "expire" && x(0).getLong(2) == 2L &&
      x(0).getLong(3) == 5L, s"expire status: ${x(0)}")
    intercept[Exception](
      graft.storage.SnapshotStore.read(spark, dir, Some(3)).collect())
    assert(headRows() == Set((1L, "a", 10.0), (2L, "b", 20.0)),
      "head survives expiry")
    // eager CALL semantics: spark.sql alone (no action) runs the verb
    spark.sql(s"SELECT * FROM graft_rollback('$dir', '4')")
    assert(graft.storage.SnapshotStore.headVersion(spark, dir).contains(6),
      "maintenance TVFs execute at analysis (CALL semantics)")
    // …and the documented flip side of that contract: EXPLAIN analyzes,
    // so EXPLAIN EXECUTES a maintenance verb (there is no dry-run) — a
    // known contract pinned here, per the MaintenanceSql scaladoc
    spark.sql(s"EXPLAIN SELECT * FROM graft_rollback('$dir', '5')").collect()
    assert(graft.storage.SnapshotStore.headVersion(spark, dir).contains(7),
      "EXPLAIN on a maintenance TVF executes the verb (pinned contract)")
    // malformed arguments fail clearly
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_rollback('$dir', 'x')").collect())
    assert(e1.getMessage.contains("must be an integer"))
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_compact('$dir')").collect())
    assert(e2.getMessage.contains("takes (path, partCol"))
  }

  test("graft_merge / graft_append TVFs: the WRITE side of the SQL " +
    "surface — create-on-first-merge, upsert+delete, keyed append " +
    "idempotency, loud contract violations") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mergesql").toString + "/st"
    Seq((1L, "p0", 1.0), (2L, "p1", 2.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("msql_base")
    val r1 = spark.sql(
      s"SELECT * FROM graft_merge('$dir', 'msql_base', 'p', 'k')").collect()
    assert(r1(0).getString(0) == "merge" && r1(0).getLong(2) == 1L &&
      r1(0).getLong(3) == 1L, s"create-on-first-merge receipt: ${r1.toSeq}")
    // upsert k=1, delete k=2, insert k=3 — one CDC-shaped view
    Seq((1L, "p0", 10.0, false), (2L, "p1", 0.0, true),
      (3L, "p0", 3.0, false)).toDF("k", "p", "v", "_del")
      .createOrReplaceTempView("msql_cdc")
    spark.sql(s"SELECT * FROM graft_merge('$dir', 'msql_cdc', 'p', 'k', " +
      "'_del')").collect()
    def rows() = graft.storage.SnapshotStore.read(spark, dir)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getDouble(1))
      .toMap
    assert(rows() == Map(1L -> 10.0, 3L -> 3.0), s"got ${rows()}")
    // keyed append: the SAME statement replayed no-ops
    Seq((100L, "p0", 100.0)).toDF("k", "p", "v")
      .createOrReplaceTempView("msql_add")
    val appends = (1 to 2).map { _ =>
      spark.sql(s"SELECT * FROM graft_append('$dir', 'msql_add', 'p', " +
        "'batch-7')").collect()(0).getLong(2)
    }
    assert(appends == Seq(1L, 0L),
      s"receipt detail must carry versions-committed (replay = 0): $appends")
    assert(rows() == Map(1L -> 10.0, 3L -> 3.0, 100L -> 100.0),
      "replayed keyed append must no-op")
    assert(graft.storage.SnapshotStore.headVersion(spark, dir)
      .contains(3), "replay must not commit a version")
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_merge('$dir', 'msql_base', 'p')").collect())
    assert(e.getMessage.contains("keyCols"), e.getMessage)
  }

  test("graft_rename TVF: metadata-only column rename through SQL, same " +
    "outcome as the store API; unknown column fails clearly") {
    import spark.implicits._
    plans.AsOf.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rensql").toString + "/st"
    graft.storage.SnapshotStore.write(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v"), dir, "p")
    val r = spark.sql(
      s"SELECT * FROM graft_rename('$dir', 'v', 'score')").collect()
    assert(r.length == 1 && r(0).getString(0) == "rename" &&
      r(0).getLong(3) == 2L, s"rename receipt: ${r.toSeq}")
    assert(graft.storage.SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "p", "score"))
    assert(graft.storage.SnapshotStore.read(spark, dir, Some(1))
      .columns.toSeq == Seq("k", "p", "v"))
    // and the renamed store reads through graft_snapshot under new names
    assert(spark.sql(s"SELECT score FROM graft_snapshot('$dir', 'head')")
      .collect().map(_.getDouble(0)).toSet == Set(10.0, 20.0))
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_rename('$dir', 'nope', 'x')").collect())
    assert(e.getMessage.contains("unknown column"))
  }
}
