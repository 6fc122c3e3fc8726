package graft

import graft.storage.SnapshotStore

/** Column RENAME as a metadata-only commit (the Iceberg field-ID idea,
  * minimally): physical column names in data files never change — a
  * rename updates the `_renames-<v>` mapping, writers map logical names
  * back to physical, readers apply the version's mapping. Each version
  * time-travels under ITS OWN names; `changes` diffs under the TO
  * version's names; additive evolution and every maintenance verb compose
  * with an active rename; the one reserved case (a new column reusing a
  * retired physical name) fails fast.
  */
class SnapshotRenameSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ren_$tag").toString + "/st"

  private val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))

  test("rename is metadata-only: new version reads under the new name, " +
    "old versions keep theirs, data files are untouched") {
    val dir = newDir("basic")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    val filesBefore = SnapshotStore.read(spark, dir).inputFiles.toSet
    SnapshotStore.renameColumn(spark, dir, "v", "score")
    assert(SnapshotStore.headVersion(spark, dir).contains(2))
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "p", "score"))
    assert(SnapshotStore.read(spark, dir, Some(1)).columns.toSeq ==
      Seq("k", "p", "v"), "time travel must read v1 under v1's names")
    assert(SnapshotStore.read(spark, dir).inputFiles.toSet == filesBefore,
      "rename touched data files")
    assert(SnapshotStore.read(spark, dir).select("k", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      base.map(r => (r._1, r._3)).toSet)
  }

  test("writes after a rename use the NEW name and land under the stable " +
    "physical name; merge, append, compact and readPartitions compose") {
    val dir = newDir("write")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "v", "score")
    // merge with the new logical name (upsert k=1, insert k=4)
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0), (4L, "b", 40.0)).toDF("k", "p", "score"),
      "p", Seq("k"))
    def headMap() = SnapshotStore.read(spark, dir).select("k", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(headMap() == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0, 4L -> 40.0))
    // the new gen physically stores the ORIGINAL name
    val newGen = SnapshotStore.read(spark, dir).inputFiles
      .filterNot(SnapshotStore.read(spark, dir, Some(1)).inputFiles.toSet)
    assert(newGen.nonEmpty)
    assert(spark.read.parquet(newGen.head).columns.contains("v") &&
      !spark.read.parquet(newGen.head).columns.contains("score"),
      "post-rename gens must keep the stable physical column name")
    // append + compact + pruned read under the rename
    SnapshotStore.append(Seq((5L, "a", 50.0)).toDF("k", "p", "score"),
      dir, "p")
    assert(SnapshotStore.compactPartitions(spark, dir, "p") == 1)
    assert(headMap() + (5L -> 50.0) == headMap(), "append lost under rename")
    assert(SnapshotStore.readPartitions(spark, dir, Seq("a"))
      .columns.contains("score"))
    // history still counts every version
    assert(SnapshotStore.history(spark, dir).count() == 5L)
  }

  test("changes across a rename boundary diffs the FIELD, not the label: " +
    "both sides surface under the TO version's names") {
    val dir = newDir("cdf")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "v", "score") // v2
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0)).toDF("k", "p", "score"), "p", Seq("k")) // v3
    val feed = SnapshotStore.changes(spark, dir, 1, 3, Seq("k"))
    assert(feed.columns.contains("score") && !feed.columns.contains("v"))
    val rows = feed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("score")))
      .toSet
    assert(rows == Set(("update_preimage", 1L, 10.0),
      ("update_postimage", 1L, 11.0)),
      s"rename-crossing feed wrong: $rows")
  }

  test("rollback restores the target's names; chained renames collapse to " +
    "one mapping; rename-back works") {
    val dir = newDir("chain")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "v", "score")   // v2
    SnapshotStore.renameColumn(spark, dir, "score", "value") // v3
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "p", "value"))
    assert(SnapshotStore.readRenames(spark, dir, 3) == Map("v" -> "value"),
      "chained renames must collapse to original-physical -> latest-logical")
    SnapshotStore.rollback(spark, dir, 2) // v4 = v2's names
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "p", "score"))
    SnapshotStore.renameColumn(spark, dir, "score", "v") // rename BACK
    assert(SnapshotStore.read(spark, dir).columns.toSeq == Seq("k", "p", "v"))
    assert(SnapshotStore.readRenames(spark, dir, 5).isEmpty ||
      SnapshotStore.readRenames(spark, dir, 5) == Map.empty,
      "identity mapping must not accumulate")
  }

  test("renaming the partition column: later operations pass the new name") {
    val dir = newDir("pcol")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "p", "bucket")
    SnapshotStore.merge(spark, dir,
      Seq((4L, "c", 40.0)).toDF("k", "bucket", "v"), "bucket", Seq("k"))
    assert(SnapshotStore.readPartitions(spark, dir, Seq("c"))
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(4L))
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "bucket", "v"))
  }

  test("fail-fast set: unknown column, duplicate target, retired physical " +
    "name reuse (rename and new-column), additive evolution still works") {
    val dir = newDir("fail")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "v", "score")
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumn(spark, dir, "nope", "x"))
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumn(spark, dir, "k", "score"))
    // "v" is now a RETIRED physical name: neither a rename target nor a
    // new column may take it
    intercept[IllegalArgumentException](
      SnapshotStore.renameColumn(spark, dir, "k", "v"))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.merge(spark, dir,
        Seq((9L, "a", 1.0, "boom")).toDF("k", "p", "score", "v"),
        "p", Seq("k")))
    assert(e.getMessage.contains("retired by a rename"))
    // additive evolution under an active rename: a genuinely NEW column
    SnapshotStore.append(
      Seq((6L, "c", 60.0, "extra")).toDF("k", "p", "score", "note"),
      dir, "p")
    val head = SnapshotStore.read(spark, dir)
    assert(head.columns.toSeq == Seq("k", "p", "score", "note"))
    assert(head.filter("k = 1").select("note").collect()(0).isNullAt(0),
      "legacy rows must read NULL for the post-rename added column")
  }

  test("rename composes with the segmented manifest tier: metadata-only " +
    "on a segmented store (head text verbatim, no segment touched), and " +
    "post-rename merges use the new name") {
    val Thresh = "graft.snapshot.segmentThreshold"
    val prior = sys.props.get(Thresh)
    sys.props(Thresh) = "4"
    try {
      val dir = newDir("seg")
      val wide = (0 until 6).map(i => (i.toLong, s"p$i", i * 1.0))
      SnapshotStore.write(wide.toDF("k", "p", "v"), dir, "p")
      def headText(v: Int): String = new String(java.nio.file.Files
        .readAllBytes(java.nio.file.Paths.get(dir, s"_manifest-$v")), "UTF-8")
      assert(headText(1).startsWith("\u0001graft-segments\t"),
        "fixture must be segmented")
      SnapshotStore.renameColumn(spark, dir, "v", "score") // v2
      assert(headText(2) == headText(1),
        "segmented rename must copy the head text verbatim")
      SnapshotStore.merge(spark, dir,
        Seq((2L, "p2", 99.0)).toDF("k", "p", "score"), "p", Seq("k")) // v3
      // the merge changed exactly one bucket ref vs the rename head
      val refs2 = headText(2).split("\n").drop(1).toSet
      val refs3 = headText(3).split("\n").drop(1).toSet
      assert((refs2 -- refs3).size == 1 && (refs3 -- refs2).size == 1,
        "post-rename merge must stay touched-bucket-only")
      assert(SnapshotStore.read(spark, dir).select("k", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
        (wide.map(r => r._1 -> r._3).toMap + (2L -> 99.0)))
      assert(SnapshotStore.readPartitions(spark, dir, Seq("p2"))
        .columns.contains("score"))
    } finally prior match {
      case Some(v) => sys.props(Thresh) = v
      case None => sys.props -= Thresh
    }
  }

  test("expire drops _renames files of expired versions and keeps the " +
    "retained ones") {
    val dir = newDir("gc")
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "v", "score") // v2
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0)).toDF("k", "p", "score"), "p", Seq("k")) // v3
    SnapshotStore.expire(spark, dir, keep = 1, minAgeMs = 0L)
    assert(!new java.io.File(dir, "_renames-2").isFile,
      "expired version's renames file leaked")
    assert(new java.io.File(dir, "_renames-3").isFile,
      "retained head lost its renames file")
    assert(SnapshotStore.read(spark, dir).columns.toSeq ==
      Seq("k", "p", "score"))
  }
}
