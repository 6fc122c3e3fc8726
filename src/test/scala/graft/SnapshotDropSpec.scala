package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.SnapshotStore

/** Column DROP as a metadata-only commit (the logical-name layer's second
  * verb): the recorded schema loses the column, data files are untouched,
  * the physical name is retired forever. Pins metadata-only-ness, time
  * travel, the changes feed across a drop boundary, the retired-name
  * rules (re-add, rename-onto), rollback restoration, physical shrink
  * through compaction, and the SQL verb.
  */
class SnapshotDropSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft_drop_$tag").toString + "/st"

  private def headText(dir: String, v: Int): String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, s"_manifest-$v")), "UTF-8")

  test("drop is metadata-only: head text verbatim, no data touched; the " +
    "head reads without the column, old versions keep it, writes after " +
    "the drop compose") {
    val dir = newDir("basic")
    SnapshotStore.write(
      Seq((1L, "p0", 1.0, "a"), (2L, "p1", 2.0, "b"))
        .toDF("k", "p", "v", "note"), dir, "p")
    val dataBefore = new java.io.File(s"$dir/data").listFiles().map(_.getName).toSet
    SnapshotStore.dropColumn(spark, dir, "note") // v2
    assert(headText(dir, 2) == headText(dir, 1),
      "drop must copy the head text verbatim")
    assert(new java.io.File(s"$dir/data").listFiles().map(_.getName).toSet ==
      dataBefore, "drop must not touch a data dir")
    assert(SnapshotStore.read(spark, dir).columns.toSeq == Seq("k", "p", "v"))
    assert(SnapshotStore.read(spark, dir, Some(1)).columns.contains("note"),
      "time travel reads v1 under v1's schema")
    SnapshotStore.merge(spark, dir,
      Seq((3L, "p0", 3.0)).toDF("k", "p", "v"), "p", Seq("k")) // v3
    assert(SnapshotStore.read(spark, dir).count() == 3)
    assert(!SnapshotStore.read(spark, dir).columns.contains("note"))
  }

  test("the changes feed diffs under the TO version's schema across a " +
    "drop: copied-over rows still cancel (no spurious update pairs from " +
    "the dropped column), and the feed carries the pruned schema") {
    val dir = newDir("cdc")
    SnapshotStore.write(
      (0L to 3L).map(k => (k, "p0", k * 1.0, s"n$k"))
        .toDF("k", "p", "v", "note"), dir, "p")
    SnapshotStore.dropColumn(spark, dir, "note") // v2
    SnapshotStore.merge(spark, dir, // v3: one real update in p0
      Seq((1L, "p0", 11.0)).toDF("k", "p", "v"), "p", Seq("k"))
    val feed = SnapshotStore.changes(spark, dir, 1, 3, Seq("k"))
    assert(!feed.columns.contains("note"))
    val got = feed.select("_change_type", "k")
      .as[(String, Long)].collect().toSet
    assert(got == Set(("update_preimage", 1L), ("update_postimage", 1L)),
      s"rows 0/2/3 were copied unchanged and must cancel; got $got")
    assert(SnapshotStore.changes(spark, dir, 1, 2, Seq("k")).count() == 0,
      "the drop itself is an empty feed (no partition differs)")
  }

  test("the retired-name set: re-adding the dropped name fails, renaming " +
    "onto it fails, the dropped column is not renamable or re-droppable, " +
    "the last column cannot drop") {
    val dir = newDir("retired")
    SnapshotStore.write(
      Seq((1L, "p0", 1.0, "a")).toDF("k", "p", "v", "note"), dir, "p")
    SnapshotStore.dropColumn(spark, dir, "note")
    val e1 = intercept[IllegalArgumentException] {
      SnapshotStore.merge(spark, dir,
        Seq((2L, "p0", 2.0, "x")).toDF("k", "p", "v", "note"), "p", Seq("k"))
    }
    assert(e1.getMessage.contains("DROPPED"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(spark, dir, "v", "note")
    }
    assert(e2.getMessage.contains("retired"), e2.getMessage)
    intercept[IllegalArgumentException] {
      SnapshotStore.renameColumn(spark, dir, "note", "note2") // unknown now
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.dropColumn(spark, dir, "note") // unknown now
    }
    // a RENAMED column's drop retires the PHYSICAL name
    SnapshotStore.renameColumn(spark, dir, "v", "score")
    SnapshotStore.dropColumn(spark, dir, "score")
    val e3 = intercept[IllegalArgumentException] {
      SnapshotStore.merge(spark, dir,
        Seq((2L, "p0", 9.9)).toDF("k", "p", "v"), "p", Seq("k"))
    }
    assert(e3.getMessage.contains("DROPPED"),
      s"physical name v must be retired: ${e3.getMessage}")
    // live columns now k, p: the PARTITION column is refused while others
    // remain (the recorded _partcol guard) …
    val e4 = intercept[IllegalArgumentException] {
      SnapshotStore.dropColumn(spark, dir, "p")
    }
    assert(e4.getMessage.contains("partition column"),
      s"the recorded _partcol must guard the layout column: ${e4.getMessage}")
    // … and after dropping k, the LAST column is refused regardless
    SnapshotStore.dropColumn(spark, dir, "k")
    val e5 = intercept[IllegalArgumentException] {
      SnapshotStore.dropColumn(spark, dir, "p")
    }
    assert(e5.getMessage.contains("last column"), e5.getMessage)
  }

  test("rollback to a pre-drop version restores the column (the target's " +
    "mapping IS its dropped set); compaction after a drop shrinks the " +
    "physical space") {
    val dir = newDir("rb")
    SnapshotStore.write(
      Seq((1L, "p0", 1.0, "a")).toDF("k", "p", "v", "note"), dir, "p")
    SnapshotStore.append(
      Seq((2L, "p0", 2.0, "b")).toDF("k", "p", "v", "note"), dir, "p") // v2
    SnapshotStore.dropColumn(spark, dir, "note") // v3
    SnapshotStore.rollback(spark, dir, 2) // v4: note lives again
    val head = SnapshotStore.read(spark, dir)
    assert(head.columns.contains("note") &&
      head.filter(col("k") === 2L).select("note").as[String]
        .collect().toSeq == Seq("b"),
      "rollback must restore the dropped column with its values")
    SnapshotStore.dropColumn(spark, dir, "note") // v5
    // compaction rewrites through the pruned schema: the new gen's files
    // physically lack the column
    assert(SnapshotStore.compactPartitions(spark, dir, "p") == 1)
    val files = SnapshotStore.read(spark, dir).inputFiles
    val physical = spark.read.parquet(files: _*)
    assert(!physical.columns.contains("note"),
      "the compacted generation must not store the dropped column")
  }

  test("SQL verb: graft_drop_column receipt, head reads pruned, schema " +
    "slices hash the same data") {
    plans.AsOf.register(spark)
    val dir = newDir("sql")
    SnapshotStore.write(
      Seq((1L, "p0", 1.0, "a"), (2L, "p0", 2.0, "b"))
        .toDF("k", "p", "v", "note"), dir, "p")
    val r = spark.sql(s"SELECT * FROM graft_drop_column('$dir', 'note')")
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "drop_column" &&
      r(0).getLong(3) == 2L, s"receipt: ${r.toSeq}")
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', 'head')")
      .columns.toSeq == Seq("k", "p", "v"))
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', '1')")
      .columns.contains("note"))
  }
}
