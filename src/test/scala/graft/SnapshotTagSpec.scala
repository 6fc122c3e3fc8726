package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.storage.SnapshotStore

/** Named tags on the snapshot store: immutable version refs that pin a
  * version against retention. Pins tag/read/catalog semantics, expire
  * retention (and release after deleteTag), the append-idempotency scan
  * across a tagged ISLAND below the contiguous retained suffix (the
  * duplicate-append hazard tags introduce), rollback to a tagged version
  * after the window expired, and the SQL surface.
  */
class SnapshotTagSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft_tag_$tag").toString + "/st"

  private def manifests(dir: String): Set[Int] =
    new java.io.File(dir).listFiles().map(_.getName)
      .collect { case n if n.startsWith("_manifest-") =>
        n.stripPrefix("_manifest-").toInt }.toSet

  test("tag / readTag / tags / read-by-tag; tags are immutable until " +
    "deleted; names escape to safe filenames") {
    val dir = newDir("basic")
    SnapshotStore.write(Seq((1L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((2L, "p0", 2.0)).toDF("k", "p", "v"), "p", Seq("k")) // v2
    assert(SnapshotStore.tag(spark, dir, "gold") == 2, "default = head")
    assert(SnapshotStore.tag(spark, dir, "run=7:v1", Some(1)) == 1,
      "names with reserved path chars escape into the filename")
    assert(SnapshotStore.readTag(spark, dir, "gold") == 2)
    assert(SnapshotStore.tags(spark, dir) ==
      Map("gold" -> 2, "run=7:v1" -> 1))
    assert(SnapshotStore.read(spark, dir,
      Some(SnapshotStore.readTag(spark, dir, "run=7:v1")))
      .count() == 1)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.tag(spark, dir, "gold", Some(1))
    }
    assert(e.getMessage.contains("immutable"))
    assert(SnapshotStore.deleteTag(spark, dir, "gold"))
    assert(!SnapshotStore.deleteTag(spark, dir, "gold"), "already gone")
    assert(SnapshotStore.tag(spark, dir, "gold", Some(1)) == 1,
      "deleted name is reusable")
    intercept[IllegalArgumentException] {
      SnapshotStore.tag(spark, dir, "nope", Some(99))
    }
    intercept[IllegalArgumentException] {
      SnapshotStore.tag(spark, dir, "a/b", Some(1))
    }
  }

  test("expire retains a tagged version, its metadata files, and its gens; " +
    "deleteTag releases it to the next sweep") {
    val dir = newDir("keep")
    SnapshotStore.write(Seq((1L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.merge(spark, dir, // v2: rewrites p0 — v1's gen unshared
      Seq((1L, "p0", 1.5)).toDF("k", "p", "v"), "p", Seq("k"))
    SnapshotStore.renameColumn(spark, dir, "v", "score") // v3: has _renames
    SnapshotStore.merge(spark, dir,
      Seq((2L, "p0", 4.0)).toDF("k", "p", "score"), "p", Seq("k")) // v4
    SnapshotStore.merge(spark, dir,
      Seq((3L, "p0", 5.0)).toDF("k", "p", "score"), "p", Seq("k")) // v5
    SnapshotStore.tag(spark, dir, "gold", Some(3))
    SnapshotStore.expire(spark, dir, keep = 1, minAgeMs = 0L)
    assert(manifests(dir) == Set(3, 5),
      "retained = head window + the tagged version")
    val v3 = SnapshotStore.read(spark, dir, Some(3))
    assert(v3.columns.contains("score"), "tagged version keeps its renames")
    assert(v3.count() == 1, "tagged version's gens survived the sweep")
    // changes(tag -> head) stays computable forever
    assert(SnapshotStore.changes(spark, dir, 3, 5, Seq("k"))
      .filter(col("_change_type") === "insert").count() == 2)
    // rollback to the tagged version works after the window expired
    SnapshotStore.rollback(spark, dir, 3) // v6
    assert(SnapshotStore.read(spark, dir).count() == 1)
    SnapshotStore.deleteTag(spark, dir, "gold")
    SnapshotStore.expire(spark, dir, keep = 1, minAgeMs = 0L)
    assert(manifests(dir) == Set(6), "untagged version re-enters retention")
  }

  test("append idempotency survives a tagged ISLAND: a gen whose only " +
    "retained reference is a tagged old version must not re-append") {
    val dir = newDir("island")
    SnapshotStore.write(Seq((0L, "p0", 0.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.append(Seq((100L, "p0", 100.0)).toDF("k", "p", "v"),
      dir, "p", idempotencyKey = Some("b1")) // v2: the pinned gen
    SnapshotStore.tag(spark, dir, "island", Some(2))
    // rewrite p0 (carries k=100 into a NEW gen; the appended gen leaves
    // the head manifest), then push the keep window past v2
    SnapshotStore.merge(spark, dir,
      Seq((0L, "p0", 1.0)).toDF("k", "p", "v"), "p", Seq("k")) // v3
    SnapshotStore.merge(spark, dir,
      Seq((0L, "p0", 2.0)).toDF("k", "p", "v"), "p", Seq("k")) // v4
    SnapshotStore.merge(spark, dir,
      Seq((0L, "p0", 3.0)).toDF("k", "p", "v"), "p", Seq("k")) // v5
    SnapshotStore.expire(spark, dir, keep = 2, minAgeMs = 0L)
    assert(manifests(dir) == Set(2, 4, 5),
      "v3 must be GONE — the tagged v2 is an island below a real gap")
    // the hazard: the dir exists (tag-retained), the contiguous suffix
    // scan (v5, v4) stops at missing v3 and never reaches v2's reference
    // — v2 is retained only through the tag. A redelivery must still
    // no-op (without the island-aware scan this duplicates the row).
    SnapshotStore.append(Seq((100L, "p0", 100.0)).toDF("k", "p", "v"),
      dir, "p", idempotencyKey = Some("b1"))
    assert(SnapshotStore.headVersion(spark, dir).contains(5),
      "redelivered append must not commit a new version")
    assert(SnapshotStore.read(spark, dir).filter(col("k") === 100L)
      .count() == 1, "redelivery across the tagged island duplicated a row")
  }

  test("timestamp time travel: legacy versions (no _op stamp) resolve by " +
    "manifest mtime, the SQL 'asof:' rung reads it, out-of-range is loud") {
    plans.AsOf.register(spark)
    val dir = newDir("asof")
    SnapshotStore.write(Seq((1L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    val f1 = new java.io.File(dir, "_manifest-1")
    SnapshotStore.merge(spark, dir,
      Seq((2L, "p0", 2.0)).toDF("k", "p", "v"), "p", Seq("k")) // v2
    val f2 = new java.io.File(dir, "_manifest-2")
    // simulate a pre-stamp store: the r16 carrier is the _op stamp, and
    // the mtime path must keep serving versions recorded before it
    new java.io.File(dir, "_op-1").delete()
    new java.io.File(dir, "_op-2").delete()
    assert(SnapshotStore.committedAtOf(spark, dir, 1).isEmpty)
    // pin deterministic, distinct commit times (same mechanism Delta
    // trusts: the commit file's mtime)
    f1.setLastModified(1000000000000L)
    f2.setLastModified(1000000100000L)
    assert(SnapshotStore.versionAsOf(spark, dir, 1000000000000L) == 1)
    assert(SnapshotStore.versionAsOf(spark, dir, 1000000099999L) == 1)
    assert(SnapshotStore.versionAsOf(spark, dir, 1000000100000L) == 2)
    assert(SnapshotStore.versionAsOf(spark, dir, Long.MaxValue) == 2)
    intercept[IllegalArgumentException] {
      SnapshotStore.versionAsOf(spark, dir, 999999999999L)
    }
    assert(spark.sql(
      s"SELECT * FROM graft_snapshot('$dir', 'asof:1000000000000')")
      .count() == 1)
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', " +
      "'asof:2001-09-09T01:48:20Z')") // 1000000100000 ms
      .count() == 2)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot('$dir', 'asof:not-a-time')").collect())
    assert(e.getMessage.contains("epoch millis or an ISO-8601"))
  }

  test("commit stamps: strictly increasing committed_at, versionAsOf " +
    "prefers the stamp over mtime, readAsOf straddles a commit") {
    val dir = newDir("stamp")
    SnapshotStore.write(Seq((1L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.append(Seq((2L, "p0", 2.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((3L, "p0", 3.0)).toDF("k", "p", "v"), "p", Seq("k")) // v3
    val ts = (1 to 3).map(v => SnapshotStore.committedAtOf(spark, dir, v))
    assert(ts.forall(_.isDefined), s"every commit must stamp: $ts")
    assert(ts(0).get < ts(1).get && ts(1).get < ts(2).get,
      s"stamps must be STRICTLY increasing (AS OF must never be " +
        s"ambiguous): $ts")
    // stamp beats mtime: shove every manifest mtime into the far future —
    // resolution must not move
    (1 to 3).foreach(v =>
      new java.io.File(dir, s"_manifest-$v").setLastModified(9999999999999L))
    assert(SnapshotStore.versionAsOf(spark, dir, ts(0).get) == 1)
    assert(SnapshotStore.versionAsOf(spark, dir, ts(1).get - 1) == 1,
      "one millisecond before v2's stamp must still see v1")
    assert(SnapshotStore.versionAsOf(spark, dir, ts(1).get) == 2)
    assert(SnapshotStore.versionAsOf(spark, dir, Long.MaxValue) == 3)
    assert(SnapshotStore.readAsOf(spark, dir, ts(1).get).count() == 2)
    val e = intercept[IllegalArgumentException](
      SnapshotStore.versionAsOf(spark, dir, ts(0).get - 1))
    assert(e.getMessage.contains("expire keep window"),
      "a timestamp older than retention must fail LOUD, not resolve " +
        "to the oldest survivor")
    // the catalog carries the stamps
    val h = SnapshotStore.history(spark, dir).orderBy("version")
      .select("committed_at").collect().map(_.getLong(0))
    assert(h.toSeq == ts.map(_.get),
      "history's committed_at must be the _op stamps verbatim")
  }

  test("SQL surface: graft_tag / graft_drop_tag receipts, " +
    "graft_snapshot(path, 'tag:...') and the 'tags' catalog") {
    plans.AsOf.register(spark)
    val dir = newDir("sql")
    SnapshotStore.write(Seq((1L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((2L, "p0", 2.0)).toDF("k", "p", "v"), "p", Seq("k"))
    val r = spark.sql(s"SELECT * FROM graft_tag('$dir', 'Gold', '1')")
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "tag" &&
      r(0).getLong(2) == 1L && r(0).getLong(3) == 2L)
    assert(spark.sql(s"SELECT * FROM graft_snapshot('$dir', 'tag:Gold')")
      .count() == 1, "tag names stay case-sensitive through the SQL rung")
    val cat = spark.sql(s"SELECT * FROM graft_snapshot('$dir', 'tags')")
      .collect().map(x => (x.getString(0), x.getInt(1))).toSeq
    assert(cat == Seq(("Gold", 1)))
    val d = spark.sql(s"SELECT * FROM graft_drop_tag('$dir', 'Gold')")
      .collect()
    assert(d(0).getString(0) == "drop_tag" && d(0).getLong(2) == 1L)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_snapshot('$dir', 'tag:Gold')").collect())
    assert(e.getMessage.contains("no tag"))
  }
}
