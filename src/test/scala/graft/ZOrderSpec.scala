package graft

import org.apache.spark.sql.functions._

import graft.storage.ZOrderLayout

/** Pins the z-order layout's 100 TB claim at the level the scan actually
  * consults: parquet FOOTER min/max statistics. A 2-D box predicate over a
  * z-ordered table must touch far fewer files than over a table sorted by
  * one dimension alone — and the query result must be identical either way.
  */
class ZOrderSpec extends SparkSpec {

  private def events = Tables.table(spark, sf("sf0.01"), "events")
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  private val dir = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_zorder_spec").toString

  test("zValue interleaves bits (Morton order, x even / y odd)") {
    val rows = spark.range(1).select(
      ZOrderLayout.zValue(lit(0), lit(0)).as("z00"),
      ZOrderLayout.zValue(lit(1), lit(0)).as("z10"),
      ZOrderLayout.zValue(lit(0), lit(1)).as("z01"),
      ZOrderLayout.zValue(lit(3), lit(5)).as("z35"),
      ZOrderLayout.zValue(lit(65535), lit(65535)).as("zmax")).head()
    assert(rows.getLong(0) == 0L)
    assert(rows.getLong(1) == 1L)
    assert(rows.getLong(2) == 2L)
    // x=3 (011) spreads to 0b000101; y=5 (101) to 0b010001<<1 = 0b100010
    assert(rows.getLong(3) == (0x5L | (0x11L << 1)))
    assert(rows.getLong(4) == 0xFFFFFFFFL)
  }

  test("cellOf clamps to [0, cells-1] and maps bounds to edge cells") {
    val r = spark.range(1).select(
      ZOrderLayout.cellOf(lit(0.0), 0.0, 10.0, 16).as("lo"),
      ZOrderLayout.cellOf(lit(10.0), 0.0, 10.0, 16).as("hi"),
      ZOrderLayout.cellOf(lit(-5.0), 0.0, 10.0, 16).as("under"),
      ZOrderLayout.cellOf(lit(99.0), 0.0, 10.0, 16).as("over"),
      ZOrderLayout.cellOf(lit(5.0), 0.0, 10.0, 16).as("mid")).head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 15)
    assert(r.getInt(2) == 0 && r.getInt(3) == 15)
    assert(r.getInt(4) == 8)
  }

  test("2-D box touches far fewer files under z-order than single-dim sort") {
    val nFiles = 32
    val zDir = s"$dir/z"
    val linDir = s"$dir/lin"
    ZOrderLayout.write(events, zDir, "user_id", "value", nFiles)
    // the single-dimension strawman: same file count, sorted by user_id only
    events.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(linDir)

    val zStats = ZOrderLayout.fileStats(spark, zDir, "user_id", "value")
    val linStats = ZOrderLayout.fileStats(spark, linDir, "user_id", "value")
    assert(zStats.size >= nFiles / 2, s"z layout wrote ${zStats.size} files")

    // the q_zorder_skip box: ~1/5 of user space × ~2/5 of value space.
    // The single-dim layout prunes this one too (its sort key is in the box),
    // so the bar here is "z-order is at least as good on the sorted dim's
    // home turf".
    val zTouch = ZOrderLayout.filesTouched(zStats, 30, 60, 100.0, 200.0)
    val linTouch = ZOrderLayout.filesTouched(linStats, 30, 60, 100.0, 200.0)
    assert(zTouch <= linTouch,
      s"z-order touched $zTouch of ${zStats.size}, single-dim $linTouch of ${linStats.size}")

    // the case single-dim sort CANNOT serve: a slice narrow in the OTHER
    // dimension (all users, value in a 1/16 band). Every single-dim file
    // spans the full value range → all files touched; z-order's rectangles
    // prune most of them. This is the 2-D claim.
    val zSlice = ZOrderLayout.filesTouched(zStats, 0, 149, 100.0, 130.0)
    val linSlice = ZOrderLayout.filesTouched(linStats, 0, 149, 100.0, 130.0)
    assert(zSlice * 2 <= linSlice,
      s"value-slice: z-order touched $zSlice of ${zStats.size}, " +
        s"single-dim $linSlice of ${linStats.size}")
    // and the layout is pure access-path: identical box-query results
    val agg = (p: String) => spark.read.parquet(p)
      .filter(col("user_id").between(30, 60) && col("value").between(100.0, 200.0))
      .agg(count(lit(1)), round(sum("value"), 4)).head()
    assert(agg(zDir) == agg(linDir))
  }

  test("per-file rectangles tile the space: stats cover all rows (no nulls lost)") {
    val zDir = s"$dir/z"
    val total = spark.read.parquet(zDir).count()
    assert(total == events.count())
    val stats = ZOrderLayout.fileStats(spark, zDir, "user_id", "value")
    // every file's rectangle is inside the global bounds
    stats.foreach { case (f, lx, hx, ly, hy) =>
      assert(lx >= 0 && hx <= 149 && ly >= 0.0 && hy <= 491.0, s"bad stats in $f")
    }
  }
}
