package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.storage.SnapshotStore

/** Structured Streaming SOURCE over a [[graft.storage.SnapshotStore]]'s
  * version history — the read side of the CDC loop (the write side being
  * the `s_merge_cdc` / `s_append_compact` foreachBatch gates): every
  * committed snapshot version becomes one unit of streaming progress, and
  * the stream emits that version's row-level CHANGES feed
  * ([[SnapshotStore.changes]]: `_change_type` ∈ insert / delete /
  * update_preimage / update_postimage) tagged with `_commit_version`. A
  * downstream consumer — an IVM rollup, a search-index updater, a replica
  * — processes each commit's DELTA instead of rescanning a 100 TB head,
  * with Structured Streaming's checkpointed offsets providing restart
  * exactly-once. This is the Delta/Iceberg "table as a streaming source"
  * capability (a public concept, re-derived here on the store's
  * manifest-diff feed through Spark's public source-provider seam); it
  * generalizes the reference's tail-follow ingest
  * (`/root/reference/nginx.conf:48-64`) from files to a versioned table.
  *
  * Usage:
  * {{{
  * spark.readStream
  *   .format("graft-changes")            // or classOf[ChangesSourceProvider].getName
  *   .option("path", storeDir)
  *   .option("keys", "o_orderkey")       // the store's merge keys
  *   .option("startingVersion", "0")     // 0 = initial snapshot as inserts;
  *                                       //   N>=1 = baseline (exclusive);
  *                                       //   "tag:<name>" = tagged baseline;
  *                                       //   default = head at stream start
  *   .option("startingTimestamp",        // OR the time axis: baseline =
  *     "2026-08-15T10:00:00Z")           //   newest version committed at or
  *                                       //   before the instant (epoch ms or
  *                                       //   ISO-8601; versionAsOf's loud
  *                                       //   expired-window contract)
  *   .option("maxVersionsPerTrigger", "1") // optional rate limit
  *   .load()
  * }}}
  *
  * Offsets are store VERSIONS (monotonic by construction — even rollback
  * commits a NEW head version), so the engine's offset log composes with
  * the store's manifest chain: re-running a batch after a crash re-derives
  * the exact same feed because [[SnapshotStore.changes]] is a pure
  * function of two retained manifests. Batches are emitted PER VERSION
  * (a batch spanning versions unions one feed per commit) so
  * `_commit_version` attribution survives trigger coalescing — net-effect
  * collapsing across commits would be cheaper but silently merges
  * insert+delete pairs away; attribution-faithful is the CDC contract.
  * Rate limiting implements [[SupportsAdmissionControl]] (the engine hands
  * the restart position to `latestOffset`, so a resumed stream paces
  * correctly without source-side offset bookkeeping).
  *
  * The BASELINE version is fixed at first start and persisted under the
  * checkpoint (`metadataPath`), so a restart resumes the same feed even if
  * the first run never completed a batch. The schema is the store's head
  * schema at each RUN's start (analysis time): a RESTART adopts additive
  * evolution naturally (no Delta-style fresh-checkpoint requirement —
  * physical names are stable, so the wider schema reads every version);
  * evolution WITHIN a run is surfaced per `onSchemaEvolution`: `fail`
  * (default — stop loudly; restarting adopts the wider schema) or
  * `project` (keep the run's schema until restart). A version EXPIRED past
  * the stream's read position fails loudly mid-batch (the store's
  * missing-version error) — retention must exceed maximum consumer lag,
  * the same contract as any log-compacted transport. One narrow race is
  * documented rather than closed: a commit that lands between `load()`'s
  * schema derivation and the run's first batch can widen the store before
  * the run starts; it surfaces as the same loud `onSchemaEvolution` error.
  */
class ChangesSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-changes derives its schema from the snapshot store; " +
        "a user-supplied schema is not supported")
    val path = ChangesSource.pathOf(parameters)
    (shortName(), ChangesSource.feedSchema(
      ChangesSource.storeSchema(sqlContext, path)))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new ChangesSource(sqlContext, metadataPath, parameters)
}

object ChangesSource {

  private[streaming] def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-changes requires 'path'"))

  /** The store's logical schema (post-rename names) at its current head. */
  private[streaming] def storeSchema(sqlContext: SQLContext,
                                     path: String): StructType = {
    val spark = sqlContext.sparkSession
    require(SnapshotStore.headVersion(spark, path).isDefined,
      s"graft-changes: no snapshot store at $path — the source needs at " +
        "least one committed version to derive its schema")
    SnapshotStore.read(spark, path).schema
  }

  /** `_change_type`, `_commit_version`, then the store's columns. */
  private[streaming] def feedSchema(store: StructType): StructType =
    StructType(
      StructField("_change_type", StringType, nullable = false) +:
      StructField("_commit_version", IntegerType, nullable = false) +:
      store.fields.toSeq)
}

/** A sub-version offset for the size-split feed: versions ≤ `v` fully
  * consumed plus the first `split` dirs of version v+1's insert set.
  * Serializes as JSON so the engine's offset log round-trips it; plain
  * integer offsets (pre-split checkpoints, LongOffset) stay readable.
  */
case class ChangesSplitOffset(v: Int, split: Int) extends Offset {
  override val json: String = s"""{"v":$v,"split":$split}"""
}

object ChangesSplitOffset {
  private val Pat = """\{\s*"v"\s*:\s*(\d+)\s*,\s*"split"\s*:\s*(\d+)\s*\}""".r
  def parse(txt: String): (Int, Int) = txt.trim match {
    case Pat(v, s) => (v.toInt, s.toInt)
    case other => throw new IllegalArgumentException(
      s"malformed graft-changes offset: '$other'")
  }
}

/** Offset inside a STAGED atomic admission (`atomicSpill`): slices
  * `1..step` (of `of`) of version `v`'s feed are spilled under the
  * checkpoint; the version itself is NOT yet consumed — the fold batch
  * that follows emits the whole feed atomically.
  */
case class ChangesSpillOffset(v: Int, step: Int, of: Int) extends Offset {
  override val json: String = s"""{"v":$v,"spill":$step,"of":$of}"""
}

object ChangesSpillOffset {
  private val Pat =
    ("""\{\s*"v"\s*:\s*(\d+)\s*,\s*"spill"\s*:\s*(\d+)\s*,""" +
      """\s*"of"\s*:\s*(\d+)\s*\}""").r
  def tryParse(txt: String): Option[(Int, Int, Int)] = txt.trim match {
    case Pat(v, k, n) => Some((v.toInt, k.toInt, n.toInt))
    case _ => None
  }
}

class ChangesSource(sqlContext: SQLContext, metadataPath: String,
                    parameters: Map[String, String])
    extends Source with SupportsTriggerAvailableNow
    with org.apache.spark.internal.Logging {

  private val spark = sqlContext.sparkSession
  private val path = ChangesSource.pathOf(parameters)
  private val keyCols: Seq[String] = parameters.getOrElse("keys",
    throw new IllegalArgumentException(
      "graft-changes requires 'keys' (comma-separated merge key columns)"))
    .split(",").map(_.trim).filter(_.nonEmpty).toSeq
  private val maxVersionsPerTrigger: Option[Int] =
    parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.toInt
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n"); n
    }

  /** Size-aware admission: with `maxBytesPerTrigger` set, an INSERT-ONLY
    * commit (an append — its dir set is a superset of the previous
    * version's) is split across micro-batches at gen-dir granularity, at
    * least one dir per trigger (progress under any budget), so one bulk
    * backfill commit cannot stall the consumer behind an unbounded
    * batch. Merge / compact / rollback commits stay VERSION-ATOMIC
    * regardless of the budget — their feeds carry delete+insert and
    * update pre/post pairs that a delta-folding consumer must see in one
    * batch, or it observes a state that never existed (a key deleted in
    * batch N and re-inserted in N+1). Split batches read the admitted
    * gen dirs directly as inserts (sound under append's new-keys-only
    * contract) under the version's schema and names, tagged with their
    * `_commit_version` — attribution survives the split. With the
    * budget set, each micro-batch advances at most one version.
    *
    * CONTRACT for atomic commits: merges do NOT split — size your
    * retention and executors for your largest merge. With the budget
    * set, an upcoming multi-dir atomic batch is ANNOUNCED before it
    * lands (dir count + byte estimate in the progress description, a
    * warning log when it exceeds the budget) — see [[announcedAtomic]].
    */
  private val maxBytesPerTrigger: Option[Long] =
    parameters.get("maxBytesPerTrigger").map { v =>
      val n = v.toLong
      require(n >= 1, s"maxBytesPerTrigger must be >= 1, got $n"); n
    }
  /** STAGED atomic admission (r18): with `atomicSpill=true` (requires
    * `maxBytesPerTrigger`), a version-atomic commit (merge / compact /
    * rollback) whose feed exceeds the budget is consumed in TWO phases
    * instead of one unbounded batch: first the feed is computed in
    * byte-bounded PARTITION SLICES, one slice per trigger, each written
    * to a checkpoint-local spill (`<checkpoint>/graft-changes-spill/`)
    * while the stream emits EMPTY batches; then one FOLD batch reads
    * the spilled slices back and emits the ENTIRE version's feed
    * atomically — version-atomicity stays observable (a delta-folding
    * consumer still sees the whole commit in exactly one batch), but no
    * single trigger does unbounded diff work. A key whose row moved
    * across slice boundaries surfaces as delete+insert in different
    * slices; the fold re-attributes such pairs to the exact
    * update_preimage/update_postimage the unsliced diff emits.
    */
  private val atomicSpill: Boolean =
    parameters.get("atomicSpill").exists(_.trim.toBoolean)
  require(!atomicSpill || maxBytesPerTrigger.isDefined,
    "atomicSpill requires maxBytesPerTrigger (the slice budget)")

  private val onEvolution: String = {
    val v = parameters.getOrElse("onSchemaEvolution", "fail")
    require(v == "fail" || v == "project",
      s"onSchemaEvolution must be 'fail' or 'project', got '$v'")
    v
  }

  /** Baseline version (exclusive), decided at FIRST start and persisted
    * under the checkpoint so a restart resumes the same feed even when the
    * first run completed no batch. Written build-then-rename; the engine
    * constructs one source per checkpoint run, so the rename is
    * crash-atomicity, not a CAS.
    */
  private val baseline: Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(metadataPath), spark.sparkContext.hadoopConfiguration)
    val init = new org.apache.hadoop.fs.Path(metadataPath, "graft-changes-init")
    if (fs.exists(init)) {
      val in = fs.open(init)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.trim.toInt
    } else {
      val head = SnapshotStore.headVersion(spark, path).getOrElse(
        throw new IllegalArgumentException(
          s"graft-changes: no snapshot store at $path"))
      require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
        "graft-changes takes startingVersion OR startingTimestamp, " +
          "not both")
      val base = parameters.get("startingVersion").map(_.trim) match {
        case Some(t) if t.toLowerCase.startsWith("tag:") =>
          // start CDC from a TAGGED baseline ("everything since the
          // run-N corpus"). The tag pins the BASELINE version itself;
          // the per-version feed still needs the intermediate manifests,
          // so the standing retention >= consumer-lag contract applies
          // from the tag forward (an expired intermediate fails loud).
          SnapshotStore.readTag(spark, path, t.substring(4))
        case Some(s) =>
          val v = s.toInt
          require(v >= 0 && v <= head,
            s"startingVersion $v out of range [0, $head] at $path")
          v
        case None => parameters.get("startingTimestamp") match {
          // the TIME-axis baseline (Delta's startingTimestamp, same
          // resolution as batch AS OF): the newest retained version
          // committed at or before the instant — loud when the window
          // has expired past it (versionAsOf's lag contract; resolving
          // to the oldest survivor would silently skip changes)
          case Some(ts) => SnapshotStore.versionAsOf(spark, path,
            graft.sources.GraftSnapshotSource.parseTs(ts))
          case None => head // only changes committed AFTER stream start
        }
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(metadataPath))
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".graft-changes-init.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(base.toString.getBytes("UTF-8"))
      finally out.close()
      require(fs.rename(tmp, init), s"could not publish $init")
      base
    }
  }

  /** The RUN's schema: the store head's at source construction — matches
    * what `sourceSchema` handed the analyzer at `load()` (both read the
    * head; see the documented narrow race in the class doc).
    */
  private val fixedSchema: StructType = ChangesSource.feedSchema(
    ChangesSource.storeSchema(sqlContext, path))

  override def schema: StructType = fixedSchema

  override def getOffset: Option[Offset] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  /** Trigger.AvailableNow bound: the head frozen at run start — the run
    * drains up to here (paced by `maxVersionsPerTrigger`) and stops,
    * ignoring commits that land while it drains.
    */
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(
      SnapshotStore.headVersion(spark, path).getOrElse(baseline))

  /** Next batch ceiling: the store head, capped to `start +
    * maxVersionsPerTrigger` (and to the AvailableNow freeze point when
    * set); under `maxBytesPerTrigger`, to the byte-budgeted dir position
    * inside the next insert-only version. Returning the start itself
    * signals no data. The engine hands back the restart position as
    * `startOffset`, so a resumed stream paces from where it actually is.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val pos = Option(startOffset).map(srcPosOf)
      .getOrElse(SrcPos(baseline, 0, 0, 0))
    val (fv, fs) = (pos.v, pos.split)
    // mid-STAGED-spill: one slice per trigger, then the atomic fold
    if (pos.spillOf > 0) {
      val u = pos.v + 1
      return if (pos.spill < pos.spillOf)
        ChangesSpillOffset(u, pos.spill + 1, pos.spillOf)
      else offsetFor(u, 0) // all slices staged: the FOLD batch
    }
    val head = availableNowCap.getOrElse(
      SnapshotStore.headVersion(spark, path).getOrElse(baseline))
    maxBytesPerTrigger match {
      case None =>
        // a split position left by a previous byte-budgeted run finishes
        // its version first; version-granular pacing from there on
        if (fs > 0) offsetFor(fv + 1, 0)
        else {
          val capped = maxVersionsPerTrigger
            .map(m => math.min(head, fv + m)).getOrElse(head)
          offsetFor(math.max(capped, fv), 0)
        }
      case Some(budget) =>
        if (fv >= head && fs == 0) return offsetFor(fv, fs)
        val u = fv + 1
        SnapshotStore.insertOnlyDirs(spark, path, u) match {
          case None => // merge/compact: version-atomic — announce it
            announceAtomic(u, budget)
            if (atomicSpill) {
              val n = spillSliceCount(u, budget)
              if (n > 1) return ChangesSpillOffset(u, 1, n)
            }
            offsetFor(u, 0)
          case Some(dirs) =>
            val remaining = dirs.drop(fs)
            if (remaining.isEmpty) offsetFor(u, 0)
            else {
              val fsys = org.apache.hadoop.fs.FileSystem.get(
                new java.net.URI(path),
                spark.sparkContext.hadoopConfiguration)
              var taken = 0
              var bytes = 0L
              // at least one dir per trigger: progress under any budget
              while (taken < remaining.size &&
                (taken == 0 || bytes < budget)) {
                bytes += fsys.getContentSummary(
                  new org.apache.hadoop.fs.Path(path,
                    SnapshotStore.dirOf(remaining(taken)))).getLength
                taken += 1
              }
              // overshoot rollback: the dir that crossed the budget waits
              // for the next trigger (unless it is the only one)
              if (taken > 1 && bytes > budget) taken -= 1
              if (fs + taken >= dirs.size) offsetFor(u, 0)
              else offsetFor(fv, fs + taken)
            }
        }
    }
  }

  /** The last version-atomic batch ANNOUNCED under a byte budget:
    * (version, differing dirs, byte estimate). Merges/compacts/rollbacks
    * do not split — their feeds carry delete+insert and update pre/post
    * pairs a delta-folding consumer must see in one batch, or it
    * observes a state that never existed — so the operational contract
    * is "size retention and executors for your largest merge". This
    * surfaces the size BEFORE the batch lands: rendered into the
    * source's progress `description` (toString) and logged as a warning
    * when it exceeds `maxBytesPerTrigger` (ChangesSourceSpec pins it).
    */
  @volatile private[graft] var announcedAtomic: Option[(Int, Int, Long)] =
    None

  private def announceAtomic(u: Int, budget: Long): Unit =
    try {
      val dirs = SnapshotStore.versionDiffDirs(spark, path, u)
      if (dirs.size > 1) {
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        var bytes = 0L
        dirs.foreach { d =>
          try bytes += fsys.getContentSummary(
            new org.apache.hadoop.fs.Path(path, d)).getLength
          catch { case _: java.io.FileNotFoundException => () } // swept dir
        }
        announcedAtomic = Some((u, dirs.size, bytes))
        if (bytes > budget)
          logWarning(s"graft-changes at $path: version $u is " +
            s"version-atomic (merge/compact/rollback) and will arrive as " +
            s"ONE micro-batch over ${dirs.size} dirs (~$bytes bytes), " +
            s"exceeding maxBytesPerTrigger=$budget — atomic commits do " +
            "not split; size retention and executors for the largest merge")
      } else announcedAtomic = None
    } catch { // the announcement is best-effort; admission never fails on it
      case scala.util.control.NonFatal(_) => announcedAtomic = None
    }

  override def initialOffset(): OffsetV2 = LongOffset(baseline.toLong)

  private def offsetFor(v: Int, split: Int): OffsetV2 =
    if (split == 0) LongOffset(v.toLong) else ChangesSplitOffset(v, split)

  /** Offset position: versions ≤ `v` fully consumed, plus EITHER the
    * first `split` dirs of version v+1's insert set OR `spill` of
    * `spillOf` staged slices of version v+1's atomic feed. Plain
    * integers (LongOffset and pre-r14 checkpoint logs) parse as
    * (v, 0, 0, 0).
    */
  private case class SrcPos(v: Int, split: Int, spill: Int, spillOf: Int)

  private def posOf(o: OffsetV2): (Int, Int) = {
    val p = srcPosOf(o); (p.v, p.split)
  }

  private def srcPosOf(o: OffsetV2): SrcPos = o match {
    case LongOffset(v) => SrcPos(v.toInt, 0, 0, 0)
    case ChangesSplitOffset(v, s) => SrcPos(v, s, 0, 0)
    case ChangesSpillOffset(v, k, n) => SrcPos(v - 1, 0, k, n)
    case other =>
      val txt = other.json.trim
      if (txt.startsWith("{"))
        ChangesSpillOffset.tryParse(txt) match {
          case Some((v, k, n)) => SrcPos(v - 1, 0, k, n)
          case None =>
            val (v, sp) = ChangesSplitOffset.parse(txt)
            SrcPos(v, sp, 0, 0)
        }
      else SrcPos(txt.toInt, 0, 0, 0)
  }

  /** The admitted dirs of version `v` read directly as inserts — the
    * split-batch feed (see `maxBytesPerTrigger`): sound because only
    * insert-only commits split, and deterministic across crash replays
    * because the dir list is a sorted pure function of two immutable
    * manifests.
    */
  private def dirInserts(v: Int, dirs: Seq[String]): Option[DataFrame] =
    if (dirs.isEmpty) None
    else Some(SnapshotStore.readDirs(spark, path, v, dirs)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v)))

  // ---- staged atomic admission (r18) -----------------------------------

  private def spillRoot: String = s"$metadataPath/graft-changes-spill"

  /** The spill plan for version `u`: changed partitions with their
    * both-sides byte estimates, sorted — cached per version (the
    * manifests and dirs are immutable, so the plan is a pure function).
    */
  @volatile private var spillPlanCache: Option[(Int, Seq[(String, Long)])] =
    None

  private def spillPlan(u: Int): Seq[(String, Long)] =
    spillPlanCache match {
      case Some((v, plan)) if v == u => plan
      case _ =>
        val fsys = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
        val plan = SnapshotStore.changedPartitionDirs(spark, path,
          u - 1, u).map { case (part, dirs) =>
          part -> dirs.map { d =>
            try fsys.getContentSummary(
              new org.apache.hadoop.fs.Path(path, d)).getLength
            catch { case _: java.io.FileNotFoundException => 0L }
          }.sum
        }
        spillPlanCache = Some((u, plan))
        plan
    }

  /** Slice count for version `u` under `budget` — 1 means "fits, no
    * staging". Deterministic from immutable inputs.
    */
  private def spillSliceCount(u: Int, budget: Long): Int = {
    val plan = spillPlan(u)
    if (plan.size <= 1) return 1
    val total = plan.map(_._2).sum
    if (total <= budget) 1
    else math.min(plan.size,
      ((total + budget - 1) / budget).toInt)
  }

  /** The k-th (1-based) of `n` slices: the sorted changed partitions
    * split contiguously into n byte-balanced groups — a pure function
    * of (u, n), so a crash replay re-derives identical slices whatever
    * the budget is NOW.
    */
  private def sliceParts(u: Int, k: Int, n: Int): Set[String] = {
    val plan = spillPlan(u)
    val total = math.max(1L, plan.map(_._2).sum)
    var cum = 0L
    plan.flatMap { case (part, b) =>
      val slice = math.min(n - 1, (cum * n / total).toInt) + 1
      cum += b
      if (slice == k) Some(part) else None
    }.toSet
  }

  private def sliceDir(u: Int, k: Int): String =
    s"$spillRoot/v$u/slice-$k"

  /** Computes slice `k` of version `u`'s feed and spills it under the
    * checkpoint (overwrite — deterministic content makes crash replays
    * idempotent). Returns an EMPTY batch: the data flows only at the
    * fold.
    */
  private def spillSlice(u: Int, k: Int, n: Int): DataFrame = {
    val feed = align(
      SnapshotStore.changesImpl(spark, path, u - 1, u, keyCols,
        Some(sliceParts(u, k, n)))
        .withColumn("_commit_version", lit(u)))
    feed.write.mode("overwrite").parquet(sliceDir(u, k))
    spark.createDataFrame(java.util.Collections.emptyList[Row](),
      fixedSchema)
  }

  /** The atomic FOLD: slices 1..staged read back, any remaining slices
    * (a run whose budget was removed mid-spill) computed inline, keys
    * that moved across slice boundaries re-attributed from
    * delete+insert to the exact update pair the unsliced diff emits.
    */
  private def foldSpill(u: Int, staged: Int, n: Int): DataFrame = {
    val stagedDf =
      if (staged == 0) None
      else Some(spark.read.schema(fixedSchema)
        .parquet((1 to staged).map(sliceDir(u, _)): _*))
    val rest =
      if (staged >= n) None
      else {
        val parts = (staged + 1 to n).flatMap(sliceParts(u, _, n)).toSet
        Some(align(SnapshotStore.changesImpl(spark, path, u - 1, u,
          keyCols, Some(parts)).withColumn("_commit_version", lit(u))))
      }
    val all = (stagedDf.toSeq ++ rest.toSeq)
      .reduceLeft(_.unionByName(_))
    // cross-slice MOVES: a key with BOTH a delete and an insert in this
    // version's feed is one row that changed partitions. The unsliced
    // diff pairs the two sides by key — identical images emit NOTHING
    // (a compaction migration), differing images emit the exact update
    // pair — so the fold applies the same verdict to exactly those keys
    val movedKeys = all
      .filter(col("_change_type").isin("insert", "delete"))
      .groupBy(keyCols.map(col): _*)
      .agg(countDistinct(col("_change_type")).as("_nct"))
      .filter(col("_nct") === 2)
      .select(keyCols.map(col): _*)
    val still = all.join(movedKeys, keyCols, "left_anti")
    val dataCols = fixedSchema.fieldNames.toSeq
      .filterNot(c => c == "_change_type" || c == "_commit_version")
      .filterNot(keyCols.contains)
    def img = if (dataCols.isEmpty) struct(lit(true).as("_present"))
      else struct(dataCols.map(col): _*)
    val mv = all.join(movedKeys, keyCols, "left_semi")
    val pre = mv.filter(col("_change_type") === "delete")
      .select(keyCols.map(col) :+ img.as("_pre"): _*)
    val post = mv.filter(col("_change_type") === "insert")
      .select(keyCols.map(col) :+ img.as("_post"): _*)
    val movedFeed = pre.join(post, keyCols)
      .select(keyCols.map(col) :+
        when(!(col("_pre") <=> col("_post")),
          array(
            struct(lit("update_preimage").as("t"), col("_pre").as("img")),
            struct(lit("update_postimage").as("t"),
              col("_post").as("img"))))
          .otherwise(lit(null)).as("_ch"): _*)
      .select(keyCols.map(col) :+ explode(col("_ch")).as("_e"): _*)
      .select(fixedSchema.fieldNames.map {
        case "_change_type" => col("_e.t").as("_change_type")
        case "_commit_version" =>
          lit(u).cast("int").as("_commit_version")
        case c if keyCols.contains(c) => col(c)
        case c => col("_e.img").getField(c).as(c)
      }.toIndexedSeq: _*)
    still.select(fixedSchema.fieldNames.map(col).toIndexedSeq: _*)
      .unionByName(movedFeed)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val pa = start.map(o => srcPosOf(o: OffsetV2))
      .getOrElse(SrcPos(baseline, 0, 0, 0))
    val pb = srcPosOf(end: OffsetV2)
    if (pb.spillOf > 0) // a staging trigger: spill one slice, emit empty
      return org.apache.spark.sql.graftshim.StreamingBatchShim
        .asStreamingBatch(spillSlice(pb.v + 1, pb.spill, pb.spillOf))
    if (pa.spillOf > 0) // the atomic fold of the staged version
      return org.apache.spark.sql.graftshim.StreamingBatchShim
        .asStreamingBatch(foldSpill(pa.v + 1, pa.spill, pa.spillOf))
    val (va, sa) = (pa.v, pa.split)
    val (vb, sb) = (pb.v, pb.split)
    if ((vb, sb) == (va, sa) || vb < va)
      return org.apache.spark.sql.graftshim.StreamingBatchShim.asStreamingBatch(
        spark.createDataFrame(java.util.Collections.emptyList[Row](), fixedSchema))
    def perVersionFeed(v: Int): DataFrame = {
      val feed =
        if (v == 1) // changes(0 -> 1): the initial snapshot, all inserts
          SnapshotStore.read(spark, path, Some(1))
            .withColumn("_change_type", lit("insert"))
        else SnapshotStore.changes(spark, path, v - 1, v, keyCols)
      feed.withColumn("_commit_version", lit(v))
    }
    val pieces = Seq.newBuilder[DataFrame]
    var fullFrom = va + 1
    if (sa > 0) {
      // finish (or continue) the partially-consumed version va+1
      val u = va + 1
      val dirs = SnapshotStore.insertOnlyDirs(spark, path, u).getOrElse(
        throw new IllegalStateException(
          s"graft-changes: offset ($va,$sa) splits version $u but the " +
            "commit is not insert-only — offset log corrupted?"))
      val upto = if (vb == va) sb else dirs.size
      dirInserts(u, dirs.slice(sa, upto)).foreach(pieces += _)
      fullFrom = u + 1
    }
    if (vb >= fullFrom)
      (fullFrom to vb).foreach(v => pieces += perVersionFeed(v))
    if (sb > 0 && !(vb == va && sa > 0)) {
      // the partially-admitted head of version vb+1
      val dirs = SnapshotStore.insertOnlyDirs(spark, path, vb + 1).getOrElse(
        throw new IllegalStateException(
          s"graft-changes: offset ($vb,$sb) splits version ${vb + 1} but " +
            "the commit is not insert-only — offset log corrupted?"))
      dirInserts(vb + 1, dirs.take(sb)).foreach(pieces += _)
    }
    val built = pieces.result()
    val raw =
      if (built.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[Row](),
          fixedSchema)
      else built.reduceLeft(_.unionByName(_, allowMissingColumns = true))
    org.apache.spark.sql.graftshim.StreamingBatchShim.asStreamingBatch(align(raw))
  }

  /** Conform a batch to the run's schema. A run-schema column MISSING from
    * the feed is either a legacy-version batch (the engine re-derives the
    * last committed batch on restart, and that version predates an
    * adopted evolution — padded NULL, the store's own additive-evolution
    * read semantics) or a mid-run DROP/RENAME; the two are told apart by
    * the store's CURRENT head schema — a column still in the head is a
    * legacy replay, one gone from the head was dropped or renamed mid-run
    * and is ALWAYS loud (`project` would silently null real values). A
    * column the feed has that the run does NOT is mid-run additive
    * evolution, surfaced per `onSchemaEvolution`.
    */
  private def align(df: DataFrame): DataFrame = {
    val extra = df.columns.filterNot(c => fixedSchema.fieldNames.contains(c))
    val missing = fixedSchema.fieldNames.filterNot(df.columns.contains)
    val gone = // missing from the feed AND from the store's head = removed
      if (missing.isEmpty) Array.empty[String]
      else {
        val headCols = ChangesSource.feedSchema(
          ChangesSource.storeSchema(sqlContext, path)).fieldNames.toSet
        missing.filterNot(headCols.contains)
      }
    if (gone.nonEmpty || (extra.nonEmpty && onEvolution == "fail"))
      throw new IllegalStateException(
        s"graft-changes: the store at $path changed schema after stream " +
          s"start (new: ${extra.mkString(", ")}" +
          (if (gone.nonEmpty)
            s"; removed: ${gone.mkString(", ")} — a drop or rename?"
          else "") +
          "). Restart the stream to adopt the evolved schema" +
          (if (gone.isEmpty)
            ", or set onSchemaEvolution=project to keep this run's schema"
          else ""))
    df.select(fixedSchema.map(f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  override def commit(end: Offset): Unit = {
    // staged slices of folded versions are durable-batch history now —
    // reclaim them (best-effort; the spill is re-derivable regardless)
    val done = srcPosOf(end: OffsetV2)
    try {
      val fsys = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(metadataPath),
        spark.sparkContext.hadoopConfiguration)
      val root = new org.apache.hadoop.fs.Path(spillRoot)
      if (fsys.exists(root))
        fsys.listStatus(root).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("v") &&
            n.drop(1).forall(_.isDigit) && n.drop(1).toInt <= done.v)
            fsys.delete(st.getPath, true)
        }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangesSource[$path, baseline=$baseline" +
    announcedAtomic.map { case (v, n, b) =>
      s", atomicBatch=v$v:${n}dirs:${b}B" }.getOrElse("") + "]"
}
