package graft

import org.apache.spark.sql.functions._
import graft.storage.SnapshotStore

/** SnapshotStore: snapshot isolation and time travel, manifest-pruned
  * merge reads, single-CAS commit atomicity, partition sharing across
  * versions, retention.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_snapspec").toString + "/st"

  private def baseRows = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "c", 40.0))

  private def writeBase(dir: String) =
    SnapshotStore.write(baseRows.toDF("k", "p", "v"), dir, "p")

  private def readV(dir: String, v: Int): Map[Long, (String, Double)] =
    SnapshotStore.read(spark, dir, Some(v)).select("k", "p", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("merge produces v2; v1 stays byte-identical (snapshot isolation)") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((1L, "a", 11.0, false), (5L, "b", 50.0, false),
      (3L, "b", 0.0, true)).toDF("k", "p", "v", "_del")
    SnapshotStore.merge(spark, dir, batch, "p", Seq("k"),
      deleteCol = Some("_del"))
    assert(SnapshotStore.headVersion(spark, dir).contains(2))
    assert(readV(dir, 1) == baseRows.map(r => r._1 -> (r._2, r._3)).toMap)
    assert(readV(dir, 2) == Map(1L -> ("a", 11.0), 2L -> ("a", 20.0),
      5L -> ("b", 50.0), 4L -> ("c", 40.0)))
  }

  test("merge reads ONLY the touched partitions' directories") {
    val dir = freshDir(); writeBase(dir)
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0)).toDF("k", "p", "v"), "p", Seq("k"))
    // v2 must SHARE v1's untouched partition dirs by reference: the only
    // new directory is partition a's rewrite
    val fs = new java.io.File(s"$dir/data")
    val gens = fs.listFiles().map(_.getName).sorted
    assert(gens.length == 2, s"expected 2 gens, got ${gens.toSeq}")
    val newGen = fs.listFiles().map(_.getName)
      .map(g => g -> new java.io.File(s"$dir/data/$g").listFiles()
        .map(_.getName).filter(_.startsWith("_p=")).toSet)
      .toMap
    assert(newGen.values.toSet.contains(Set("_p=a")),
      s"merge gen should hold only partition a: $newGen")
    assert(readV(dir, 2)(1L) == ("a", 11.0))
  }

  test("fully-deleted partition leaves the manifest; its files survive " +
    "for the old version") {
    val dir = freshDir(); writeBase(dir)
    SnapshotStore.merge(spark, dir,
      Seq((3L, "b", 0.0, true)).toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    assert(!readV(dir, 2).contains(3L))
    assert(readV(dir, 2).size == 3)
    assert(readV(dir, 1)(3L) == ("b", 30.0), "v1 lost the deleted partition")
  }

  test("latest-wins precedence and insert into a new partition value") {
    val dir = freshDir(); writeBase(dir)
    val batch = Seq((9L, "z", 90.0, false, 2L), (9L, "z", 91.0, false, 1L))
      .toDF("k", "p", "v", "_del", "ver")
    SnapshotStore.merge(spark, dir, batch, "p", Seq("k"),
      deleteCol = Some("_del"), precedenceCol = Some("ver"))
    assert(readV(dir, 2)(9L) == ("z", 90.0))
  }

  test("a second committer of the same version loses the CAS and aborts " +
    "with its garbage removed") {
    val dir = freshDir(); writeBase(dir)
    val gensBefore = new java.io.File(s"$dir/data").listFiles().length
    intercept[java.util.ConcurrentModificationException] {
      SnapshotStore.merge(spark, dir,
        Seq((1L, "a", 11.0)).toDF("k", "p", "v"), "p", Seq("k"),
        // the race lands between the loser's gen write and its commit
        beforeCommit = () => java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, "_manifest-2"), "a\tdata/won/_p=a"))
    }
    assert(new java.io.File(s"$dir/data").listFiles().length == gensBefore,
      "loser's gen dir not cleaned up")
  }

  test("expire keeps the newest versions and deletes unreferenced gens") {
    val dir = freshDir(); writeBase(dir)
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 11.0)).toDF("k", "p", "v"), "p", Seq("k"))
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 12.0)).toDF("k", "p", "v"), "p", Seq("k"))
    assert(SnapshotStore.headVersion(spark, dir).contains(3))
    SnapshotStore.expire(spark, dir, keep = 1)
    intercept[IllegalArgumentException] { readV(dir, 1) }
    assert(readV(dir, 3)(1L) == ("a", 12.0))
    // v1's partition-a gen is unreferenced by v3 (a was rewritten twice),
    // but b/c partitions' original gen is still referenced and must stay
    val gens = new java.io.File(s"$dir/data").listFiles().map(_.getName)
    assert(gens.length == 2, s"expected base gen + final-a gen: ${gens.toSeq}")
  }

  test("partition values containing tab/newline round-trip the manifest " +
    "(values are path-escaped — regression)") {
    val dir = freshDir()
    SnapshotStore.write(
      Seq((1L, "a\tb", 10.0), (2L, "c\nd", 20.0)).toDF("k", "p", "v"),
      dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a\tb", 11.0)).toDF("k", "p", "v"), "p", Seq("k"))
    val got = readV(dir, 2)
    assert(got == Map(1L -> ("a\tb", 11.0), 2L -> ("c\nd", 20.0)), got)
  }

  test("rollback commits the old manifest as a NEW head; history intact; " +
    "expire still GCs correctly afterwards") {
    val dir = freshDir(); writeBase(dir)
    SnapshotStore.merge(spark, dir,
      Seq((1L, "a", 99.0)).toDF("k", "p", "v"), "p", Seq("k"))
    assert(readV(dir, 2)(1L) == ("a", 99.0))
    SnapshotStore.rollback(spark, dir, toVersion = 1)
    assert(SnapshotStore.headVersion(spark, dir).contains(3))
    // head now reads as the original; the bad v2 stays inspectable
    assert(SnapshotStore.read(spark, dir).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      .get(1L).contains(10.0))
    assert(readV(dir, 2)(1L) == ("a", 99.0))
    // rolling back to the current head is a no-op
    SnapshotStore.rollback(spark, dir, toVersion = 3)
    assert(SnapshotStore.headVersion(spark, dir).contains(3))
    // expire keep=1: v3 references only v1's gens, so v2's gen dies
    SnapshotStore.expire(spark, dir, keep = 1)
    assert(new java.io.File(s"$dir/data").listFiles().length == 1)
    assert(SnapshotStore.read(spark, dir).count() == 4)
  }

  test("declared gate q_merge_snapshot returns both versions") {
    val out = SparkEntry.queries("q_merge_snapshot")(
      spark, "/root/testdata/sf0.001").collect()
    val versions = out.map(_.getAs[Int]("version")).toSet
    assert(versions == Set(1, 2), s"got versions $versions")
  }
}
