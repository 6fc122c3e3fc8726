package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.storage.SnapshotStore
import graft.streaming.ChangesSourceProvider

/** The `graft-changes` streaming source: a SnapshotStore as a Structured
  * Streaming SOURCE (the read side of the CDC loop). Pins per-version
  * attribution, rate limiting via admission control, checkpoint restart
  * exactly-once, the fixed-schema contract under store evolution, and
  * composition with the segmented manifest tier.
  */
class ChangesSourceSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft_chsrc_$tag").toString + "/st"

  private def ck(tag: String): String =
    Files.createTempDirectory(s"graft_chsrc_ck_$tag").toString

  /** v1: keys 0..5. v2: update k=1 (+10), insert k=6. v3: delete k=2. */
  private def buildStore(dir: String): Unit = {
    val base = (0L to 5L).map(k => (k, s"p${k % 2}", k * 1.0))
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((1L, "p1", 11.0), (6L, "p0", 6.0)).toDF("k", "p", "v"), "p", Seq("k"))
    SnapshotStore.merge(spark, dir,
      Seq((2L, "p0", 0.0)).toDF("k", "p", "v")
        .withColumn("_del", lit(true)), "p", Seq("k"),
      deleteCol = Some("_del"))
  }

  private def readFeed(dir: String, checkpoint: String, name: String,
                       options: Map[String, String]): DataFrame = {
    val reader = spark.readStream.format(classOf[ChangesSourceProvider].getName)
      .option("path", dir).option("keys", "k")
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Runs one AvailableNow drain into `rows` via foreachBatch (the memory
    * sink cannot RESUME from a checkpoint; foreachBatch can — restart
    * scenarios go through here).
    */
  private def drainFeed(dir: String, checkpoint: String,
                        options: Map[String, String],
                        rows: java.util.concurrent.ConcurrentLinkedQueue[
                          org.apache.spark.sql.Row]): Seq[org.apache.spark.sql.Row] = {
    val reader = spark.readStream.format(classOf[ChangesSourceProvider].getName)
      .option("path", dir).option("keys", "k")
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(rows.add)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    rows.iterator().asScala.toSeq
  }

  test("startingVersion=0 emits the initial snapshot as inserts plus " +
    "per-version CDF, each row tagged with its _commit_version") {
    val dir = newDir("full"); buildStore(dir)
    val got = readFeed(dir, ck("full"), "chsrc_full",
      Map("startingVersion" -> "0"))
      .select("_commit_version", "_change_type", "k", "v")
      .as[(Int, String, Long, Double)].collect().toSet
    val want = (0L to 5L).map(k => (1, "insert", k, k * 1.0)).toSet ++ Set(
      (2, "update_preimage", 1L, 1.0), (2, "update_postimage", 1L, 11.0),
      (2, "insert", 6L, 6.0),
      (3, "delete", 2L, 2.0))
    assert(got == want)
  }

  test("default baseline is head-at-start: a stream opened on a built " +
    "store emits nothing until new versions commit, then exactly those") {
    val dir = newDir("tail"); buildStore(dir)
    val c = ck("tail")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    assert(drainFeed(dir, c, Map.empty, rows).isEmpty,
      "no commits after stream start: empty feed")
    SnapshotStore.merge(spark, dir,
      Seq((7L, "p1", 7.0)).toDF("k", "p", "v"), "p", Seq("k")) // v4
    val got = drainFeed(dir, c, Map.empty, rows)
      .map(r => (r.getInt(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("k")))).toSet
    assert(got == Set((4, "insert", 7L)))
  }

  test("maxVersionsPerTrigger=1 paces one version per micro-batch " +
    "(admission control), and the union equals the unpaced feed") {
    val dir = newDir("pace"); buildStore(dir)
    val cPaced = ck("pace")
    val paced = readFeed(dir, cPaced, "chsrc_paced",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "1"))
    val versions = paced.select("_commit_version").distinct()
      .as[Int].collect().sorted
    assert(versions.toSeq == Seq(1, 2, 3))
    // pacing pin through the offset log: 3 versions → 3 committed batches
    val offsetFiles = Option(new java.io.File(cPaced, "offsets").listFiles())
      .getOrElse(Array.empty).map(_.getName).filterNot(_.startsWith("."))
    assert(offsetFiles.toSet == Set("0", "1", "2"),
      s"want 3 one-version batches, got offsets ${offsetFiles.mkString(",")}")
    val unpaced = readFeed(dir, ck("pace2"), "chsrc_unpaced",
      Map("startingVersion" -> "0"))
    assert(paced.select("_commit_version", "_change_type", "k", "v")
      .as[(Int, String, Long, Double)].collect().toSet ==
      unpaced.select("_commit_version", "_change_type", "k", "v")
        .as[(Int, String, Long, Double)].collect().toSet)
  }

  test("checkpoint restart resumes exactly after the consumed prefix: no " +
    "version re-emitted, later versions picked up") {
    val dir = newDir("resume")
    SnapshotStore.write(
      (0L to 3L).map(k => (k, "p0", k * 1.0)).toDF("k", "p", "v"), dir, "p")
    val c = ck("resume")
    val q1 = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val first = drainFeed(dir, c, Map("startingVersion" -> "0"), q1)
    assert(first.map(_.getInt(1)).distinct == Seq(1))
    SnapshotStore.merge(spark, dir,
      Seq((9L, "p0", 9.0)).toDF("k", "p", "v"), "p", Seq("k")) // v2
    SnapshotStore.merge(spark, dir,
      Seq((0L, "p0", 100.0)).toDF("k", "p", "v"), "p", Seq("k")) // v3
    val q2 = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val got = drainFeed(dir, c, Map("startingVersion" -> "0"), q2)
      .map(r => (r.getInt(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("k")))).toSet
    assert(got == Set((2, "insert", 9L),
      (3, "update_preimage", 0L), (3, "update_postimage", 0L)),
      "restart must emit exactly v2..v3 — v1 already consumed")
  }

  test("additive store evolution BETWEEN runs is adopted: the restarted " +
    "stream reads the new column, legacy feed rows surface NULL") {
    val dir = newDir("evolve")
    SnapshotStore.write(
      Seq((0L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    val c = ck("ev")
    val q1 = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val first = drainFeed(dir, c, Map("startingVersion" -> "0"), q1)
    assert(!first.head.schema.fieldNames.contains("extra"))
    SnapshotStore.merge(spark, dir,
      Seq((1L, "p0", 2.0, "x")).toDF("k", "p", "v", "extra"), "p", Seq("k"))
    val q2 = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.Row]()
    val got = drainFeed(dir, c, Map("startingVersion" -> "0"), q2)
    assert(got.head.schema.fieldNames.contains("extra"),
      "a restart adopts additive evolution — no fresh checkpoint needed")
    val v2ins = got.filter(r =>
      r.getInt(r.fieldIndex("_commit_version")) == 2 &&
        r.getLong(r.fieldIndex("k")) == 1L)
    assert(v2ins.map(_.getString(v2ins.head.fieldIndex("extra"))) == Seq("x"))
  }

  /** Drives a ProcessingTime stream and evolves the store WHILE it runs. */
  private def midRunEvolve(mode: Option[String], name: String)
                          (check: (org.apache.spark.sql.streaming.StreamingQuery,
                                   String) => Unit): Unit = {
    val dir = newDir(s"mid$name")
    SnapshotStore.write(
      Seq((0L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    val reader = spark.readStream.format(classOf[ChangesSourceProvider].getName)
      .option("path", dir).option("keys", "k").option("startingVersion", "0")
    val q = mode.foldLeft(reader)((r, m) => r.option("onSchemaEvolution", m))
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ck(s"mid$name"))
      .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
    try {
      // wait for v1 to land, then evolve the store mid-run
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table(name).isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(!spark.table(name).isEmpty, "v1 never arrived")
      SnapshotStore.merge(spark, dir,
        Seq((1L, "p0", 2.0, "x")).toDF("k", "p", "v", "extra"), "p", Seq("k"))
      check(q, name)
    } finally if (q.isActive) q.stop()
  }

  test("store evolution WITHIN a run: fail (default) stops loudly") {
    midRunEvolve(None, "chsrc_midfail") { (q, _) =>
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(30000)
        throw new AssertionError("stream survived a mid-run schema change")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).map(x => x.getMessage +: msgs(x.getCause))
          .getOrElse(Nil).filter(_ != null)
      assert(msgs(e).exists(_.contains("changed schema after stream")),
        s"want the schema-evolution error, got: ${msgs(e)}")
    }
  }

  test("store evolution WITHIN a run: project keeps the run's schema") {
    midRunEvolve(Some("project"), "chsrc_midproj") { (q, name) =>
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table(name).filter(col("_commit_version") === 2).isEmpty &&
        System.currentTimeMillis() < deadline) {
        assert(q.isActive, s"stream died: ${Option(q.exception).flatten}")
        Thread.sleep(50)
      }
      val got = spark.table(name)
      assert(got.columns.toSeq ==
        Seq("_change_type", "_commit_version", "k", "p", "v"),
        "project mode keeps the run's start schema")
      assert(got.filter(col("_commit_version") === 2).count() == 1)
    }
  }

  test("startingVersion accepts a TAG: the stream replays exactly the " +
    "delta since the named baseline") {
    val dir = newDir("tagbase"); buildStore(dir) // v1..v3
    SnapshotStore.tag(spark, dir, "run1", Some(2))
    val got = readFeed(dir, ck("tagbase"), "chsrc_tag",
      Map("startingVersion" -> "tag:run1"))
      .select("_commit_version", "_change_type", "k")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((3, "delete", 2L)),
      "baseline tag:run1 (v2) means the feed is exactly v3's delta")
  }

  test("composes with the segmented manifest tier: the feed over a " +
    "segmented store diffs only changed buckets and streams correctly") {
    val Thresh = "graft.snapshot.segmentThreshold"
    val prior = sys.props.get(Thresh)
    sys.props(Thresh) = "4"
    try {
      val dir = newDir("seg")
      SnapshotStore.write(
        (0L to 7L).map(k => (k, s"p$k", k * 1.0)).toDF("k", "p", "v"),
        dir, "p")
      SnapshotStore.merge(spark, dir,
        Seq((3L, "p3", 33.0)).toDF("k", "p", "v"), "p", Seq("k")) // v2
      val got = readFeed(dir, ck("seg"), "chsrc_seg",
        Map("startingVersion" -> "1"))
        .select("_commit_version", "_change_type", "k", "v")
        .as[(Int, String, Long, Double)].collect().toSet
      assert(got == Set((2, "update_preimage", 3L, 3.0),
        (2, "update_postimage", 3L, 33.0)))
    } finally prior match {
      case Some(v) => sys.props(Thresh) = v
      case None => sys.props -= Thresh
    }
  }

  /** One AvailableNow drain capturing PER-BATCH rows (batchId → rows). */
  private def drainBatches(dir: String, checkpoint: String,
                           options: Map[String, String],
                           trigger: Trigger = Trigger.AvailableNow())
      : Map[Long, Seq[org.apache.spark.sql.Row]] = {
    val batches = scala.collection.concurrent.TrieMap[
      Long, Seq[org.apache.spark.sql.Row]]()
    val reader = spark.readStream.format(classOf[ChangesSourceProvider].getName)
      .option("path", dir).option("keys", "k")
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        batches(id) = b.collect().toSeq
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger).start()
    q.awaitTermination()
    batches.toMap
  }

  test("a version-atomic multi-dir MERGE under a byte budget is ANNOUNCED " +
    "before it lands: the source reports (version, dir count, bytes) in " +
    "its progress description — merges do not split, so the operator " +
    "sees the batch coming") {
    val dir = newDir("announce")
    // v1: 4 partitions; v2: a merge touching ALL of them (a backfill
    // shape) — 8 differing dirs, version-atomic under any budget
    SnapshotStore.write(
      (0L to 7L).map(k => (k, s"p${k % 4}", k * 1.0)).toDF("k", "p", "v"),
      dir, "p")
    SnapshotStore.merge(spark, dir,
      (0L to 7L).map(k => (k, s"p${k % 4}", k + 100.0)).toDF("k", "p", "v"),
      "p", Seq("k"))
    val src = new graft.streaming.ChangesSource(spark.sqlContext,
      ck("announce") + "/meta",
      Map("path" -> dir, "keys" -> "k", "startingVersion" -> "1",
        "maxBytesPerTrigger" -> "1"))
    val end = src.latestOffset(null,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(end.json.trim == "2", "the atomic merge admits whole (v2)")
    val ann = src.announcedAtomic
    assert(ann.isDefined, "a multi-dir atomic batch must be announced")
    val (v, nDirs, bytes) = ann.get
    assert(v == 2 && nDirs == 8 && bytes > 0L,
      s"announcement must carry the real size: got v$v/$nDirs dirs/$bytes B")
    assert(src.toString.contains(s"atomicBatch=v2:8dirs:"),
      "the announcement rides the progress description")
    // an insert-only next version announces nothing
    SnapshotStore.append(Seq((100L, "p0", 1.0)).toDF("k", "p", "v"), dir, "p")
    src.latestOffset(end,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(src.announcedAtomic.isEmpty || src.announcedAtomic.get._1 == 2,
      "insert-only admission must not forge an atomic announcement")
  }

  test("maxBytesPerTrigger splits a multi-dir append across micro-batches " +
    "(one dir per trigger under a tiny budget) with _commit_version " +
    "attribution intact; the union equals the unsplit feed") {
    val dir = newDir("bytes")
    SnapshotStore.write(
      Seq((0L, "p0", 0.0), (1L, "p1", 1.0)).toDF("k", "p", "v"), dir, "p")
    // ONE bulk append touching 4 partitions = 4 new manifest dirs
    SnapshotStore.append(
      (10L to 13L).map(k => (k, s"q$k", k * 1.0)).toDF("k", "p", "v"),
      dir, "p")
    val batches = drainBatches(dir, ck("bytes"),
      Map("startingVersion" -> "0", "maxBytesPerTrigger" -> "1"))
    val nonEmpty = batches.values.filter(_.nonEmpty).toSeq
    assert(nonEmpty.size == 6,
      s"2 dirs of v1 + 4 dirs of v2, one per trigger; got " +
        s"${nonEmpty.size} non-empty batches")
    assert(nonEmpty.forall(b =>
      b.map(_.getInt(b.head.fieldIndex("_commit_version")))
        .distinct.size == 1),
      "a split batch never mixes commit versions")
    val got = nonEmpty.flatten.map(r => (
      r.getInt(r.fieldIndex("_commit_version")),
      r.getString(r.fieldIndex("_change_type")),
      r.getLong(r.fieldIndex("k")),
      r.getDouble(r.fieldIndex("v")))).toSet
    val want = Set((1, "insert", 0L, 0.0), (1, "insert", 1L, 1.0)) ++
      (10L to 13L).map(k => (2, "insert", k, k * 1.0))
    assert(got == want, "the split union must equal the unsplit feed")
  }

  test("merge commits stay VERSION-ATOMIC under the byte budget: a " +
    "delta-folding consumer must see update pairs in one batch") {
    val dir = newDir("atomic")
    SnapshotStore.write(
      (0L to 3L).map(k => (k, s"p${k % 2}", k * 1.0)).toDF("k", "p", "v"),
      dir, "p")
    SnapshotStore.merge(spark, dir,
      Seq((1L, "p1", 11.0, false), (9L, "p0", 9.0, false),
        (2L, "p0", 0.0, true)).toDF("k", "p", "v", "_del"),
      "p", Seq("k"), deleteCol = Some("_del"))
    val batches = drainBatches(dir, ck("atomic"),
      Map("startingVersion" -> "1", "maxBytesPerTrigger" -> "1"))
    val nonEmpty = batches.values.filter(_.nonEmpty).toSeq
    assert(nonEmpty.size == 1,
      s"the merge's feed must land whole; got ${nonEmpty.size} batches")
    val types = nonEmpty.head.map(r =>
      r.getString(r.fieldIndex("_change_type"))).toSet
    assert(types == Set("insert", "delete",
      "update_preimage", "update_postimage"))
  }

  test("a checkpoint stopped MID-SPLIT resumes without loss or " +
    "duplication — even when the budget option is removed on restart") {
    val dir = newDir("resume")
    SnapshotStore.write(
      Seq((0L, "p0", 0.0), (1L, "p1", 1.0)).toDF("k", "p", "v"), dir, "p")
    SnapshotStore.append(
      (10L to 12L).map(k => (k, s"q$k", k * 1.0)).toDF("k", "p", "v"),
      dir, "p")
    val checkpoint = ck("resume")
    // Trigger.Once: exactly ONE micro-batch — under the tiny budget that
    // is the first dir of v1, leaving a {"v":0,"split":1} offset in the log
    val run1 = drainBatches(dir, checkpoint,
      Map("startingVersion" -> "0", "maxBytesPerTrigger" -> "1"),
      Trigger.Once())
    assert(run1.values.flatten.size == 1, "one dir's rows in run 1")
    // restart WITHOUT the budget: the split position finishes its
    // version first, then version-granular pacing drains the rest
    val run2 = drainBatches(dir, checkpoint, Map("startingVersion" -> "0"))
    val all = (run1.values.flatten ++ run2.values.flatten).map(r => (
      r.getInt(r.fieldIndex("_commit_version")),
      r.getLong(r.fieldIndex("k")))).toSeq
    assert(all.size == all.distinct.size, "no duplication across restart")
    assert(all.toSet ==
      (Set((1, 0L), (1, 1L)) ++ (10L to 12L).map(k => (2, k))),
      "no loss across the mid-split restart")
  }

  test("fail-fast set: missing path/keys options, bad startingVersion, " +
    "shortName registration resolves format(\"graft-changes\")") {
    val dir = newDir("ff"); buildStore(dir)
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes").load()
    }
    // bad startingVersion surfaces from the stream run (source construction
    // happens on the stream thread) with the range message intact
    val e = intercept[Throwable] {
      readFeed(dir, ck("ff1"), "chsrc_ff1", Map("startingVersion" -> "99"))
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).map(x => x.getMessage +: msgs(x.getCause))
        .getOrElse(Nil).filter(_ != null)
    assert(msgs(e).exists(_.contains("out of range")), s"got: ${msgs(e)}")
    // shortName path: resolves through META-INF/services
    val q = spark.readStream.format("graft-changes")
      .option("path", dir).option("keys", "k")
      .option("startingVersion", "0")
      .load()
      .writeStream.format("memory").queryName("chsrc_ff2")
      .option("checkpointLocation", ck("ff2"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("chsrc_ff2").count() > 0)
  }

  test("startingTimestamp baselines on the TIME axis: newest version " +
    "committed at or before the instant; expired instants fail loud; " +
    "combining with startingVersion is refused") {
    val dir = newDir("ts"); buildStore(dir)
    // baseline = v2's own commit stamp -> feed carries ONLY v3's delete
    val t2 = SnapshotStore.committedAtOf(spark, dir, 2).get
    val got = readFeed(dir, ck("ts"), "chsrc_ts",
      Map("startingTimestamp" -> t2.toString))
      .select("_commit_version", "_change_type", "k")
      .as[(Int, String, Long)].collect().toSet
    assert(got == Set((3, "delete", 2L)), s"got $got")
    // ISO form resolves through the same parser as batch AS OF
    val iso = java.time.Instant.ofEpochMilli(t2).toString
    val got2 = readFeed(dir, ck("ts2"), "chsrc_ts2",
      Map("startingTimestamp" -> iso))
      .select("_commit_version").as[Int].collect().toSet
    assert(got2 == Set(3), s"got $got2")
    // an instant older than the oldest retained stamp fails LOUD
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      readFeed(dir, ck("ts3"), "chsrc_ts3",
        Map("startingTimestamp" -> "1")))
    assert(e.getMessage.contains("committed at or before") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "committed at or before")), e.getMessage)
    // both axes at once is ambiguous -> refused
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      readFeed(dir, ck("ts4"), "chsrc_ts4",
        Map("startingTimestamp" -> t2.toString,
          "startingVersion" -> "0")))
    assert(e2.getMessage.contains("not both") ||
      Option(e2.getCause).exists(_.getMessage.contains("not both")),
      e2.getMessage)
  }

  test("atomicSpill stages a giant atomic MERGE under a tiny byte " +
    "budget: slice triggers emit EMPTY batches while spilling, ONE fold " +
    "batch carries the whole version's feed (update pairs intact, " +
    "cross-slice moves re-attributed), and the spill is reclaimed") {
    val dir = newDir("spill")
    // v1: 6 partitions; v2: one merge touching ALL of them (backfill
    // shape) — updates in every partition, one DELETE, one INSERT, and
    // one key that MOVES partitions (p-value change: delete from p1,
    // insert into q9 under the per-partition sliced diff)
    SnapshotStore.write(
      (0L to 5L).map(k => (k, s"p$k", k * 1.0)).toDF("k", "p", "v"),
      dir, "p")
    SnapshotStore.merge(spark, dir,
      ((0L to 4L).map(k => (k, if (k == 1L) "q9" else s"p$k", k + 100.0))
        :+ ((5L, "p5", 0.0)) :+ ((60L, "p0", 60.0)))
        .toDF("k", "p", "v")
        .withColumn("_del", col("k") === 5L),
      "p", Seq("k"), deleteCol = Some("_del"))
    val ckDir = ck("spill")
    val batches = drainBatches(dir, ckDir,
      Map("startingVersion" -> "1", "maxBytesPerTrigger" -> "1",
        "atomicSpill" -> "true"))
    val nonEmpty = batches.values.filter(_.nonEmpty).toSeq
    assert(nonEmpty.size == 1,
      s"the staged version must FOLD into exactly one non-empty batch, " +
        s"got ${nonEmpty.size} of ${batches.size} total")
    assert(batches.size > 2,
      s"a tiny budget must stage in multiple slice triggers, got " +
        s"${batches.size} batches")
    val feed = nonEmpty.head.map(r => (
      r.getString(r.fieldIndex("_change_type")),
      r.getLong(r.fieldIndex("k")),
      r.getDouble(r.fieldIndex("v")))).toSet
    // parity pin: the folded feed must equal the UNSLICED diff exactly
    // (note the store's merge contract: a batch row with a NEW partition
    // value does not relocate the key's old image — k=1 surfaces as a
    // plain insert in q9, and the fold preserves that verdict)
    val want = SnapshotStore.changes(spark, dir, 1, 2, Seq("k"))
      .select("_change_type", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(feed == want, s"the folded feed must equal the unsliced " +
      s"diff:\n$feed\nvs\n$want")
    assert(feed.contains(("update_preimage", 0L, 0.0)) &&
      feed.contains(("delete", 5L, 5.0)) &&
      feed.contains(("insert", 60L, 60.0)), s"shape sanity: $feed")
    // the _commit_version is uniformly the merge's
    assert(nonEmpty.head.forall(r =>
      r.getInt(r.fieldIndex("_commit_version")) == 2))
    // the spill is reclaimed once the engine acknowledges the fold —
    // Spark delivers Source.commit one batch behind, so a follow-up
    // drain (any later commit) sweeps it
    SnapshotStore.append(Seq((70L, "p0", 70.0)).toDF("k", "p", "v"),
      dir, "p")
    drainBatches(dir, ckDir,
      Map("startingVersion" -> "1", "maxBytesPerTrigger" -> "1",
        "atomicSpill" -> "true"))
    val spillRoot = new java.io.File(s"$ckDir/sources/0/graft-changes-spill")
    assert(!spillRoot.exists() ||
      spillRoot.listFiles() == null ||
      spillRoot.listFiles().forall(!_.getName.equals("v2")),
      s"folded slices must be reclaimed: " +
        s"${Option(spillRoot.listFiles()).map(_.toSeq)}")
  }
}
