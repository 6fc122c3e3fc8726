package graft

import org.apache.spark.sql.functions._
import graft.storage.MergeStore

/** MergeStore: MERGE semantics (upsert/insert/delete, latest-wins) plus the
  * 100 TB claim — untouched partitions are neither read nor rewritten
  * (pinned at the filesystem level: their files stay byte-stable across a
  * merge).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_mergespec").toString + "/st"

  private def baseRows = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))

  private def writeBase(dir: String) =
    MergeStore.write(baseRows.toDF("k", "p", "v"), dir, "p")

  private def snapshot(dir: String, part: String): Seq[(String, Long, Long)] = {
    val d = new java.io.File(s"$dir/p=$part")
    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => (f.getName, f.length, f.lastModified)).toSeq
  }

  private def readAll(dir: String): Map[Long, (String, Double)] =
    MergeStore.read(spark, dir).select("k", "p", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("upsert replaces, insert adds, delete removes; untouched rows survive") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq(
      (1L, "a", 11.0, false),  // update
      (5L, "b", 50.0, false),  // insert
      (3L, "b", 0.0, true))    // delete
      .toDF("k", "p", "v", "_del")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    assert(readAll(dir) == Map(
      1L -> ("a", 11.0), 2L -> ("a", 20.0), 5L -> ("b", 50.0),
      4L -> ("c", 40.0)))
  }

  test("a merge touching p=a,b leaves partition p=c byte-stable on disk") {
    val dir = freshDir(); writeBase(dir)
    val before = snapshot(dir, "c")
    assert(before.nonEmpty)
    val batch = Seq((1L, "a", 99.0, false), (3L, "b", 0.0, true))
      .toDF("k", "p", "v", "_del")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    assert(snapshot(dir, "c") == before,
      s"untouched partition rewritten: ${snapshot(dir, "c")} vs $before")
    assert(readAll(dir)(1L) == ("a", 99.0) && !readAll(dir).contains(3L))
  }

  test("latest-wins within a batch via the precedence column") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq(
      (2L, "a", 21.0, false, 1L),
      (2L, "a", 22.0, false, 2L), // newer version wins
      (2L, "a", 23.0, true, 0L))  // stale delete loses
      .toDF("k", "p", "v", "_del", "ver")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"),
      deleteCol = Some("_del"), precedenceCol = Some("ver"))
    assert(readAll(dir)(2L) == ("a", 22.0))
  }

  test("update beats delete for the same key in one unversioned batch") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((4L, "c", 41.0, false), (4L, "c", 0.0, true))
      .toDF("k", "p", "v", "_del")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    assert(readAll(dir)(4L) == ("c", 41.0))
  }

  test("empty batch is a filesystem no-op; insert into a NEW partition value works") {
    val dir = freshDir(); writeBase(dir)
    val before = Seq("a", "b", "c").map(snapshot(dir, _))
    MergeStore.merge(spark, dir,
      Seq.empty[(Long, String, Double, Boolean)].toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    assert(Seq("a", "b", "c").map(snapshot(dir, _)) == before)
    MergeStore.merge(spark, dir,
      Seq((9L, "z", 90.0, false)).toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    assert(readAll(dir)(9L) == ("z", 90.0))
    assert(Seq("a", "b", "c").map(snapshot(dir, _)) == before,
      "existing partitions rewritten by a new-partition insert")
  }

  test("deleting a partition's last row removes the partition directory " +
    "(dynamic overwrite alone cannot empty a partition)") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((3L, "b", 0.0, true)).toDF("k", "p", "v", "_del")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    assert(!new java.io.File(s"$dir/p=b").exists(),
      "fully-deleted partition directory survived the merge")
    assert(readAll(dir) == Map(
      1L -> ("a", 10.0), 2L -> ("a", 20.0), 4L -> ("c", 40.0)))
  }

  test("sequential merges: a later batch's update of the same key wins") {
    val dir = freshDir(); writeBase(dir)
    MergeStore.merge(spark, dir,
      Seq((1L, "a", 11.0, false)).toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    MergeStore.merge(spark, dir,
      Seq((1L, "a", 12.0, false)).toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    assert(readAll(dir)(1L) == ("a", 12.0))
  }

  test("NULL is a legal partition value: merging into it keeps its " +
    "unmatched rows (isin(null) matches nothing — regression)") {
    val dir = freshDir()
    val base: Seq[(Long, Option[String], Double)] =
      Seq((1L, None, 10.0), (2L, None, 20.0), (3L, Some("b"), 30.0))
    MergeStore.write(base.toDF("k", "p", "v"), dir, "p")
    val batch: Seq[(Long, Option[String], Double, Boolean)] =
      Seq((1L, None, 11.0, false))
    MergeStore.merge(spark, dir, batch.toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    val got = MergeStore.read(spark, dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0),
      s"NULL partition's unmatched rows lost: $got")
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((1L, "a", 11.0, false), (3L, "b", 0.0, true))
      .toDF("k", "p", "v", "_del")
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    val once = readAll(dir)
    MergeStore.merge(spark, dir, batch, "p", Seq("k"), deleteCol = Some("_del"))
    assert(readAll(dir) == once)
  }

  test("the base scan carries the batch's partition values as " +
    "PartitionFilters — untouched partitions are pruned, not filtered") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((1L, "a", 12.0, false), (3L, "b", 0.0, true))
      .toDF("k", "p", "v", "_del")
    val (view, parts) = MergeStore.mergedView(spark, dir, batch, "p",
      Seq("k"), Some("_del"), None).get
    assert(parts.toSet == Set("a", "b"))
    val plan = view.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*p#\\d+[^\\]]* IN \\(a,b\\)".r
        .findFirstIn(plan).nonEmpty,
      s"batch partitions did not become partition filters:\n$plan")
  }
}
