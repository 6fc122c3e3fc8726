package graft

import org.apache.spark.sql.functions._
import graft.storage.{SnapshotFileStats, SnapshotStore}

/** Pins the r18 footer-served gen-stats fast path to BYTE parity with
  * the full-scan aggregate codec, type by type — the blob text a commit
  * records must never depend on which path produced it — and pins that
  * the fast path actually FIRES for the store's common shapes (a fast
  * path that silently always falls back is a no-op optimization).
  */
class SnapshotFooterStatsSpec extends SparkSpec {
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def gensOf(dir: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(_.getPath.getName).filter(_.startsWith("gen-")).toSeq.sorted
  }

  private def assertParity(dir: String, cols: Seq[String]): Unit =
    gensOf(dir).foreach { g =>
      val fast = SnapshotFileStats.genBlobs(spark, dir, g, cols)
      val agg = SnapshotStore.genStatsAgg(spark, dir, g, cols)
      assert(fast.isDefined, s"footer path must serve gen $g")
      assert(fast.get === agg, s"footer/agg blob divergence at gen $g")
    }

  test("footer path matches the aggregate across every supported type, " +
    "escapes, truncation, and all-NULL slices") {
    import spark.implicits._
    val dir = tmp("graft_footer_types")
    val df = Seq(
      // (p, k, i, dbl, flt, s, longs, weird, alln)
      ("alpha", 1L, 10, 1.5, 2.5f, "ab", "x" * 40, "a:b;c%d", null: String),
      ("alpha", 2L, 20, -3.25, -0.5f, "zz", "y" * 70, "", null: String),
      ("beta%2F x", 3L, -7, 9.75, 1.25f, "m", "m" * 17, "%25", null: String)
    ).toDF("p", "k", "i", "dbl", "flt", "s", "longs", "weird", "alln")
      .withColumn("dt", to_date(lit("2024-03-01")))
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:34:56.789012")))
    val cols = Seq("k", "i", "dbl", "flt", "s", "longs", "weird", "alln",
      "dt", "ts", "ghost_absent")
    SnapshotStore.write(df, dir, "p", statsCols = cols)
    assertParity(dir, cols)
  }

  test("footer path matches the aggregate on types OUTSIDE the declared " +
    "set (boolean/decimal/binary → counts-only, both paths)") {
    import spark.implicits._
    val dir = tmp("graft_footer_oob")
    // not declarable as stats cols (validateStatsCols refuses), but the
    // backfill path may hand arbitrary columns to the codec — hand-laid
    // gen, direct two-path comparison
    val gen = "gen-00000000000b"
    Seq(("a", true, BigDecimal("12.34"), Array[Byte](1, 2)),
      ("a", false, BigDecimal("-1.00"), Array[Byte](3)),
      ("b", true, BigDecimal("0.01"), Array[Byte]()))
      .toDF("pp", "b", "dec", "bin")
      .withColumn("_p", col("pp"))
      .write.mode("overwrite").partitionBy("_p")
      .parquet(s"$dir/data/$gen")
    val cols = Seq("b", "dec", "bin")
    val fast = SnapshotFileStats.genBlobs(spark, dir, gen, cols)
    val agg = SnapshotStore.genStatsAgg(spark, dir, gen, cols)
    assert(fast.isDefined, "footer path must serve counts-only domains")
    assert(fast.get === agg)
  }

  test("footer path falls back on ZERO double boundaries " +
    "(PARQUET-1222 ±0.0 normalization) and genStats stays exact") {
    import spark.implicits._
    val dir = tmp("graft_footer_zero")
    val df = Seq(("a", 0.0, 1.0), ("a", 2.5, -0.0), ("b", 1.0, 2.0))
      .toDF("p", "zmin", "zmax")
    val cols = Seq("zmin", "zmax")
    SnapshotStore.write(df, dir, "p", statsCols = cols)
    gensOf(dir).foreach { g =>
      val agg = SnapshotStore.genStatsAgg(spark, dir, g, cols)
      assert(SnapshotStore.genStats(spark, dir, g, cols) === agg)
    }
  }

  test("footer path matches the aggregate on NaN / Infinity floats " +
    "(counts-only degradation, both paths)") {
    import spark.implicits._
    val dir = tmp("graft_footer_nan")
    val df = Seq(
      ("a", 1.0, 5.0f), ("a", Double.NaN, Float.NaN),
      ("b", Double.PositiveInfinity, 1.0f),
      ("c", 2.0, Float.NegativeInfinity),
      ("d", 3.5, 4.5f) // clean slice keeps exact bounds
    ).toDF("p", "dbl", "flt")
    val cols = Seq("dbl", "flt")
    SnapshotStore.write(df, dir, "p", statsCols = cols)
    assertParity(dir, cols)
    // the clean slice must carry real bounds (not blanket counts-only)
    val g = gensOf(dir).head
    val blob = SnapshotStore.genStats(spark, dir, g, cols)("d")
    assert(blob.contains("dbl=d:3.5:3.5"), blob)
  }

  test("footer path matches the aggregate on multi-file partition dirs") {
    import spark.implicits._
    val dir = tmp("graft_footer_multifile")
    // hand-laid gen: 3 shuffle tasks × shared keys → multiple files per
    // partition dir (writeGen's hash clustering never produces this, but
    // compaction inputs / externally-laid gens can)
    val gen = "gen-0123456789ab"
    val df = (1 to 300).map(n =>
      (s"p${n % 3}", n.toLong, s"v$n", if (n % 7 == 0) null else s"w$n"))
      .toDF("pp", "k", "s", "nills")
    df.withColumn("_p", col("pp")).repartition(3)
      .write.mode("overwrite").option("compression", "zstd")
      .partitionBy("_p").parquet(s"$dir/data/$gen")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oneDir = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/data/$gen"))
      .filter(_.getPath.getName.startsWith("_p="))
    assert(oneDir.exists(d =>
      fs.listStatus(d.getPath).count(_.getPath.getName
        .endsWith(".parquet")) > 1), "fixture must have multi-file dirs")
    val cols = Seq("k", "s", "nills")
    val fast = SnapshotFileStats.genBlobs(spark, dir, gen, cols)
    val agg = SnapshotStore.genStatsAgg(spark, dir, gen, cols)
    assert(fast.isDefined)
    assert(fast.get === agg)
  }

  test("footer path declines the Hive default-partition dir (NULL keys) " +
    "and genStats falls back to the aggregate") {
    import spark.implicits._
    val dir = tmp("graft_footer_nullkey")
    val df = Seq(("x", 1L), (null: String, 2L), ("y", 3L)).toDF("p", "k")
    SnapshotStore.write(df, dir, "p", statsCols = Seq("k"))
    val g = gensOf(dir).head
    assert(SnapshotFileStats.genBlobs(spark, dir, g, Seq("k")).isEmpty)
    // the public entry still produces the aggregate's answer
    val viaEntry = SnapshotStore.genStats(spark, dir, g, Seq("k"))
    val agg = SnapshotStore.genStatsAgg(spark, dir, g, Seq("k"))
    assert(viaEntry === agg)
  }

  test("footer path serves appended gens end-to-end (write + append, " +
    "store-declared stats) and the store's reads stay pinned") {
    import spark.implicits._
    val dir = tmp("graft_footer_e2e")
    val a = (1 to 100).map(n => (s"p${n % 2}", n.toLong, s"s$n"))
      .toDF("p", "k", "s")
    val b = (101 to 200).map(n => (s"p${n % 2}", n.toLong, s"s$n"))
      .toDF("p", "k", "s")
    SnapshotStore.write(a, dir, "p", statsCols = Seq("k", "s"))
    SnapshotStore.append(b, dir, "p")
    assertParity(dir, Seq("k", "s"))
    // metadata count over a gen-aligned range must stay scan-free
    val (n, scanned) = SnapshotStore.countWhereDetailed(spark, dir,
      col("k") <= 100L)
    assert(n === 100L)
    assert(scanned === 0)
  }
}
