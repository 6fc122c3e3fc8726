package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not, when}

/** The [[SnapshotStore]]'s predicate-DML layer — `DELETE ... WHERE` and
  * `UPDATE ... SET ... WHERE` as store verbs (the Delta/Iceberg
  * copy-on-write DML shape, a public concept re-derived on the store's
  * own primitives). [[SnapshotStore.merge]] already covers KEYED
  * mutation (a CDC batch that names its rows); these cover the
  * predicate-driven operations a corpus operator actually types —
  * "purge the bad crawl date", "redact the flagged source", the
  * right-to-be-forgotten delete — where enumerating keys first would
  * mean a full scan just to build the batch.
  *
  * Scale story (the reason this is a store verb and not
  * `read().filter().overwrite()`): the tri-state stats evaluator
  * ([[SnapshotStore.evalPrune]]) runs per manifest FIELD — one
  * (partition, gen) slice — BEFORE any file is listed:
  *
  *  - NoMatch slices (provably zero matching rows) are untouched: their
  *    manifest fields copy forward verbatim, stats blob and all, and
  *    their files are never opened. A date-ranged delete over an
  *    append-heavy 100 TB store rewrites the two gens that overlap the
  *    range, not the partition.
  *  - AllMatch slices (provably EVERY row matches — three-valued logic
  *    priced in: comparisons require a recorded null count of zero) are
  *    DELETED as pure metadata: the field leaves the manifest, no file
  *    is read or written (Iceberg's "metadata delete"). A gen-aligned
  *    purge commits in manifest-rewrite time regardless of data size.
  *  - Ambiguous MULTI-FILE slices split at FILE grain (r16): the same
  *    tri-state verdict re-runs per file from parquet footers
  *    ([[SnapshotFileStats]]) — NoMatch files re-enter the manifest as
  *    first-class FILE fields with footer-derived blobs (never opened),
  *    AllMatch files drop as metadata (delete), and only genuinely
  *    ambiguous FILES pay the rewrite. One needle row in a 20-file
  *    slice rewrites one file, not the slice — Iceberg's per-file-stats
  *    rewrite scope, recovered lazily so the manifest stays gen-grained.
  *    A dropped file's bytes linger inside its (still-referenced) gen
  *    dir until compaction collapses the file fields — space, not
  *    correctness.
  *  - What remains pays copy-on-write: read, filtered/updated, rewritten
  *    as ONE fresh gen per partition (stats re-derived, declared sort
  *    applied), so repeated DML doubles as compaction of the touched
  *    slices.
  *
  * History is never rewritten: old versions keep referencing the old
  * gens (time travel sees pre-DML data until [[SnapshotStore.expire]]
  * ages them out — the GDPR caveat is the same as Delta's: a delete is
  * logical until retention physically drops the old files). The commit
  * goes through the same single-winner manifest CAS as every write, and
  * [[SnapshotStore.changes]] reconstructs the row-level delta of a DML
  * commit exactly like a merge's (replaced partition entries diff into
  * delete / update_pre+postimage rows).
  *
  * BRANCH DML ([[deleteBranchWhere]]/[[updateBranchWhere]], r16): the
  * same planner runs against a WAP branch TIP, staging the result as the
  * branch's next version — a failed audit fixes the candidate corpus in
  * place ("redact the flagged docs", "drop the bad crawl") instead of
  * drop-and-restage. Staged entries carry the same blobs, so the same
  * pruning applies; the staged-CAS loser retries like a branch append.
  */
private[graft] object SnapshotDml {
  import SnapshotStore._
  import SnapshotFormat.{dirOf, statsOf, parseStats, StatsSep,
    dvOf, baseOf, withDv, DvRef}

  /** One DML commit's receipt. `version` is the committed head — or, for
    * the branch verbs, the branch's staged tip counter — (the prior one
    * when the predicate provably touched nothing: a no-op commits no
    * version). `droppedDirs` = (partition, gen) slices deleted as pure
    * metadata (AllMatch); `rewrittenDirs` = ambiguous slices — or, after
    * the r16 file split, individual FILES — that paid copy-on-write;
    * `keptDirs` = NoMatch slices inside touched partitions whose fields
    * copied forward verbatim (slices of untouched partitions are not
    * counted — they were never resolved). `keptFiles`/`droppedFiles` =
    * files of ambiguous multi-file slices the footer verdict kept as
    * manifest FILE fields (never opened) / dropped as pure metadata
    * (delete only).
    */
  case class DmlReceipt(version: Int, droppedDirs: Int,
                        rewrittenDirs: Int, keptDirs: Int,
                        keptFiles: Int = 0, droppedFiles: Int = 0,
                        dvDirs: Int = 0, dvRows: Long = 0L)

  /** Analyzes `pred` against the version's logical schema — a zero-row
    * analysis (no I/O): literals arrive typed in Catalyst's internal
    * forms, implicit casts land explicitly, unknown columns fail as
    * loudly as `read().filter` would.
    */
  private def analyzed(spark: SparkSession,
      logicalSchema: org.apache.spark.sql.types.StructType,
      pred: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      logicalSchema).filter(pred)
      .queryExecution.analyzed match {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
      case _ => org.apache.spark.sql.catalyst.expressions.Literal(true)
    }

  /** Resolves the head's entries, restricted to the partition values an
    * equality/IN conjunct on the partition column provably confines the
    * predicate to (partitions outside the set satisfy it for no row —
    * sound to leave untouched without resolving their fields). On a
    * segmented head the restricted resolve parses O(touched buckets).
    */
  private def touchedEntries(spark: SparkSession, path: String, head: Int,
      renames: Map[String, String],
      logicalSchema: org.apache.spark.sql.types.StructType,
      expr: org.apache.spark.sql.catalyst.expressions.Expression)
      : Map[String, Seq[String]] =
    partitionValuesOf(spark, path, renames, logicalSchema, expr) match {
      case Some(values) => forWrite(path, head)(
        readManifestValues(spark, path, head, values.toSeq))
      case None =>
        // partial composite constraint ("day = X" over day×tenant):
        // untouched partitions are excluded before any field resolves —
        // sound for DML exactly like the exact-key restriction; rides
        // the head's component index where one exists (r18)
        forWrite(path, head)(
          partialEntries(spark, path, head, renames, logicalSchema, expr)
            .getOrElse(readManifest(spark, path, head)))
    }

  /** The shared DML planning pass over `entries`: the field-level
    * tri-state verdict with needle (bloom) demotion, then the r16
    * per-FILE split of ambiguous multi-file slices. `metadataDrop` is
    * delete's AllMatch-drops-as-metadata rule (update rewrites those
    * rows instead — their content changes).
    */
  private case class DmlPlan(removed: Set[String],
      keptByPart: Map[String, Seq[String]],
      fileKept: Map[String, Vector[String]],
      rewrite: Seq[String],
      ambByPart: Map[String, Seq[String]],
      origCount: Map[String, Int],
      dropped: Int, kept: Int, keptFiles: Int, droppedFiles: Int) {
    def touched: Boolean = removed.nonEmpty
    /** Rebuilds the touched partitions' field lists around the freshly
      * written per-partition entries.
      */
    def rebuild(newEntries: Map[String, String]): Map[String, Seq[String]] =
      removed.flatMap { p =>
        val fields = keptByPart.getOrElse(p, Nil) ++
          fileKept.getOrElse(p, Vector.empty) ++ newEntries.get(p).toSeq
        if (fields.isEmpty) None else Some(p -> fields)
      }.toMap
  }

  private def planDml(spark: SparkSession, path: String,
      entries: Map[String, Seq[String]],
      expr: org.apache.spark.sql.catalyst.expressions.Expression,
      logicalToPhysical: Map[String, String],
      statsCols: Seq[String],
      physSchema: org.apache.spark.sql.types.StructType,
      metadataDrop: Boolean,
      fileGrain: Boolean = true): DmlPlan = {
    // the needle pass serves DML's pruning too: a gen whose bloom filter
    // proves an equality probe absent holds no matching row — NoMatch,
    // copied forward verbatim ("delete THIS document id" rewrites the one
    // gen that holds it, not every gen whose k-range happens to overlap)
    val probes = SnapshotBloom.probesOf(expr, logicalToPhysical,
      SnapshotBloom.bloomColsOf(spark, path).toSet)
    // gen-level memo: sidecars are per-gen, so rejection is gen-uniform
    // and each gen's filters are read at most once
    val bloomMemo = scala.collection.mutable.Map.empty[String, Boolean]
    def bloomNoMatch(f: String): Boolean = probes.nonEmpty && {
      val dir = dirOf(f)
      bloomMemo.getOrElseUpdate(dir.split("/").lift(1).getOrElse(""),
        SnapshotBloom.prune(spark, path, Seq(dir), probes).isEmpty)
    }
    var dropped = 0
    var kept = 0
    val removed = Set.newBuilder[String]
    val keptByPart = Map.newBuilder[String, Seq[String]]
    val origCount = Map.newBuilder[String, Int]
    val ambiguous = Seq.newBuilder[(String, String)]
    entries.foreach { case (p, fields) =>
      val vs = fields.map { f =>
        val v0 = statsOf(f).map(b =>
          evalPrune(expr, parseStats(b), logicalToPhysical))
          .getOrElse(MightMatch)
        // needle demotion. (An AllMatch verdict cannot coexist with a
        // needle rejection on sound metadata — a rows>0 slice can't both
        // all-match an equality and lack its key — so the demotion is
        // unreachable for AllMatch; it stays on the conservative side,
        // keeping data, if metadata were ever wrong.)
        val v1 = if (v0 != NoMatch && bloomNoMatch(f)) NoMatch else v0
        // update has no metadata path: all-match rows still change
        f -> (if (v1 == AllMatch && !metadataDrop) MightMatch else v1)
      }
      if (vs.exists(_._2 != NoMatch)) {
        removed += p
        keptByPart += p -> vs.collect { case (f, NoMatch) => f }
        origCount += p -> fields.size
        ambiguous ++= vs.collect { case (f, MightMatch) => (p, f) }
        dropped += vs.count(_._2 == AllMatch)
        kept += vs.count(_._2 == NoMatch)
      }
    }
    // FILE-granular split of the ambiguous multi-file slices (object doc).
    // A deletion-vector'd field skips the split and rewrites WHOLE (read
    // through its DVs by the central reader): footer blobs describe the
    // files' physical rows, and re-entering a file as its own manifest
    // field would sever it from the DV suffix — resurrecting deleted
    // rows. The rewrite collapses the DV debt instead (the fresh gen is
    // clean, the old refs drop with the replaced field).
    val fileKept = scala.collection.mutable.Map.empty[String, Vector[String]]
    var keptFiles = 0
    var droppedFiles = 0
    val rewritePaths = Seq.newBuilder[String]
    val ambByPart = scala.collection.mutable.Map.empty[String, Vector[String]]
    def rewriteWhole(p: String, f: String): Unit = {
      rewritePaths += f
      ambByPart(p) = ambByPart.getOrElse(p, Vector.empty) :+ f
    }
    ambiguous.result().foreach { case (p, f) =>
      val dir = dirOf(f)
      if (!fileGrain || dir.endsWith(".parquet") || dvOf(f).nonEmpty)
        rewriteWhole(p, f)
      else {
        val blobs = SnapshotFileStats.fileBlobs(spark, path, dir,
          statsCols, physSchema)
        if (blobs.size <= 1) rewriteWhole(p, f)
        else blobs.foreach { case (fp, blob) =>
          blob.map(b => evalPrune(expr, parseStats(b), logicalToPhysical))
            .getOrElse(MightMatch) match {
            case NoMatch =>
              keptFiles += 1
              fileKept(p) = fileKept.getOrElse(p, Vector.empty) :+
                blob.map(b => s"$fp$StatsSep$b").getOrElse(fp)
            case AllMatch if metadataDrop => droppedFiles += 1
            case _ => rewritePaths += fp
          }
        }
      }
    }
    DmlPlan(removed.result(), keptByPart.result(), fileKept.toMap,
      rewritePaths.result().distinct.sorted,
      ambByPart.view.mapValues(_.toSeq).toMap, origCount.result(),
      dropped, kept, keptFiles, droppedFiles)
  }

  /** DELETE the rows satisfying `pred` (rows where it is FALSE or NULL
    * survive — SQL DELETE semantics) as one new version. See the object
    * doc for the three-way slice treatment; a predicate that provably
    * matches nothing commits NO version and returns the prior head.
    */
  def deleteWhere(spark: SparkSession, path: String, pred: Column,
                  beforeCommit: () => Unit = () => ()): DmlReceipt = {
    requireAtomicRename(path)
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val logicalToPhysical = renames.map(_.swap)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    val expr = analyzed(spark, logicalSchema, pred)
    val entries = touchedEntries(spark, path, head, renames, logicalSchema,
      expr)
    // the restricted resolution consumed the partition conjuncts — the
    // verdict treats them as TRUE ("delete day X" drops as metadata);
    // only when a restriction actually APPLIED (a blown-out IN-list
    // falls through both paths and must keep its conjuncts)
    val vexpr =
      if (partitionValuesOf(spark, path, renames, logicalSchema,
          expr).isDefined ||
        partitionKeyPredOf(spark, path, renames, logicalSchema,
          expr).isDefined)
        stripPartConjuncts(expr,
          consumedPartComps(spark, path, renames, logicalSchema, expr))
      else expr
    val statsCols = statsColsOf(spark, path)
    val plan = planDml(spark, path, entries, vexpr, logicalToPhysical,
      statsCols, physSchema, metadataDrop = true)
    if (!plan.touched) return DmlReceipt(head, 0, 0, 0)
    // copy-on-write for the ambiguous slices: survivors are the rows the
    // predicate does NOT hold for (NULL survives — three-valued DELETE)
    val newEntries: Map[String, String] =
      if (plan.rewrite.isEmpty) Map.empty
      else {
        val base = applyRenames(
          readFields(spark, path, head, plan.rewrite), renames)
        val survivors = base.filter(not(coalesce(pred, lit(false))))
        val physPartCol = partColOf(spark, path).getOrElse(
          throw new IllegalStateException(
            s"store at $path records no partition column"))
        writeGen(toPhysical(survivors, renames), path, physPartCol,
          statsCols = statsCols)
      }
    beforeCommit() // test seam: a concurrent committer lands here
    // foldNewEntries: a rewrite gen's key may have MIGRATED eras under
    // an evolved partition spec — merge it into any untouched entry at
    // that key; single-spec stores hit the identity path
    val (removedF, addedF) = foldNewEntries(plan.removed,
      plan.rebuild(Map.empty), newEntries,
      cross => forWrite(path, head)(
        readManifestValues(spark, path, head, cross.toSeq)))
    commitDelta(spark, path, head + 1, head,
      removed = removedF, added = addedF,
      newEntries.values.map(_.split("/").take(2).mkString("/"))
        .toSeq.distinct,
      Some(physSchema), renames, op = "delete")
    DmlReceipt(head + 1, plan.dropped, plan.rewrite.size, plan.kept,
      keptFiles = plan.keptFiles, droppedFiles = plan.droppedFiles)
  }

  /** UPDATE: rows satisfying `pred` get `assignments` applied (each RHS
    * cast to the column's existing logical type — UPDATE never evolves
    * the schema); all other rows of the touched slices copy through
    * unchanged. Every RHS sees the PRE-update row (one `select`, not a
    * chain of `withColumn` — `SET a = b, b = a` swaps), matching SQL
    * UPDATE semantics. NoMatch slices are untouched (the stats-pruned
    * copy-on-write argument); there is no metadata-only path — an update
    * always writes the rows it changes. Assigning the partition column
    * is refused (moving rows across partitions is [[SnapshotStore.merge]]'s
    * job: a delete-bearing CDC batch names the moves row by row).
    */
  def updateWhere(spark: SparkSession, path: String,
                  assignments: Seq[(String, Column)], pred: Column,
                  beforeCommit: () => Unit = () => ()): DmlReceipt = {
    requireAtomicRename(path)
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val physPartCol = partColOf(spark, path).getOrElse(
      throw new IllegalStateException(
        s"store at $path records no partition column"))
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    validateAssignments(assignments, logicalSchema,
      logicalPartCol(physPartCol, renames), "updateWhere")
    val logicalToPhysical = renames.map(_.swap)
    val expr = analyzed(spark, logicalSchema, pred)
    val entries = touchedEntries(spark, path, head, renames, logicalSchema,
      expr)
    // the restricted resolution consumed the partition conjuncts — the
    // verdict treats them as TRUE ("delete day X" drops as metadata);
    // only when a restriction actually APPLIED (a blown-out IN-list
    // falls through both paths and must keep its conjuncts)
    val vexpr =
      if (partitionValuesOf(spark, path, renames, logicalSchema,
          expr).isDefined ||
        partitionKeyPredOf(spark, path, renames, logicalSchema,
          expr).isDefined)
        stripPartConjuncts(expr,
          consumedPartComps(spark, path, renames, logicalSchema, expr))
      else expr
    val statsCols = statsColsOf(spark, path)
    val plan = planDml(spark, path, entries, vexpr, logicalToPhysical,
      statsCols, physSchema, metadataDrop = false)
    if (!plan.touched) return DmlReceipt(head, 0, 0, 0)
    val base = applyRenames(
      readFields(spark, path, head, plan.rewrite), renames)
    val updated = applyAssignments(base, assignments, pred, logicalSchema,
      spark, path, "update")
    val newEntries = writeGen(toPhysical(updated, renames), path,
      physPartCol, statsCols = statsCols)
    beforeCommit() // test seam: a concurrent committer lands here
    // foldNewEntries: a rewrite gen's key may have MIGRATED eras under
    // an evolved partition spec — merge it into any untouched entry at
    // that key; single-spec stores hit the identity path
    val (removedF, addedF) = foldNewEntries(plan.removed,
      plan.rebuild(Map.empty), newEntries,
      cross => forWrite(path, head)(
        readManifestValues(spark, path, head, cross.toSeq)))
    commitDelta(spark, path, head + 1, head,
      removed = removedF, added = addedF,
      newEntries.values.map(_.split("/").take(2).mkString("/"))
        .toSeq.distinct,
      Some(physSchema), renames, op = "update")
    DmlReceipt(head + 1, 0, plan.rewrite.size, plan.kept,
      keptFiles = plan.keptFiles)
  }

  /** MERGE-ON-READ DELETE (deletion vectors — the Delta/Iceberg DV
    * concept re-derived on the store's own manifest): rows satisfying
    * `pred` are deleted by RECORDING THEIR POSITIONS, never rewriting a
    * data file. The same tri-state plan as [[deleteWhere]] decides per
    * slice — NoMatch copies forward, AllMatch drops as pure metadata —
    * but the ambiguous slices, instead of paying copy-on-write, are read
    * ONCE (through any existing DVs), the matching rows' (file-key,
    * row-index) pairs land in one parquet sidecar (`data/dv-<hex>`), and
    * each touched field gains a DV ref carrying its exact deleted count
    * (so the metadata COUNT stays exact: live = physical − DV'd). The
    * write cost is proportional to the MATCHED rows, not the touched
    * slices — the needle delete in a 10 GB slice writes kilobytes.
    *
    * The debt: every later read of a DV'd slice pays one anti-join
    * against the (tiny) sidecar, and `minMaxWhere` stops serving the
    * slice from metadata (its physical bounds may be attained only by
    * deleted rows). [[SnapshotStore.compactPartitions]] is the debt
    * collector — a DV'd partition qualifies regardless of dir count and
    * rewrites clean. History is never rewritten (time travel sees
    * pre-delete rows until expire; the sidecar is swept when no retained
    * field references it). A provable no-op — or an ambiguous plan whose
    * scan finds zero matching rows and whose metadata pass dropped
    * nothing — commits NO version.
    */
  def deleteWhereMor(spark: SparkSession, path: String, pred: Column,
                     beforeCommit: () => Unit = () => ()): DmlReceipt = {
    requireAtomicRename(path)
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val logicalToPhysical = renames.map(_.swap)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    val expr = analyzed(spark, logicalSchema, pred)
    val entries = touchedEntries(spark, path, head, renames, logicalSchema,
      expr)
    // the restricted resolution consumed the partition conjuncts — the
    // verdict treats them as TRUE ("delete day X" drops as metadata);
    // only when a restriction actually APPLIED (a blown-out IN-list
    // falls through both paths and must keep its conjuncts)
    val vexpr =
      if (partitionValuesOf(spark, path, renames, logicalSchema,
          expr).isDefined ||
        partitionKeyPredOf(spark, path, renames, logicalSchema,
          expr).isDefined)
        stripPartConjuncts(expr,
          consumedPartComps(spark, path, renames, logicalSchema, expr))
      else expr
    val statsCols = statsColsOf(spark, path)
    // no file-grain split: positions are finer than files, so probing
    // footers to shrink the slice buys nothing the sidecar doesn't
    val plan = planDml(spark, path, entries, vexpr, logicalToPhysical,
      statsCols, physSchema, metadataDrop = true, fileGrain = false)
    if (!plan.touched) return DmlReceipt(head, 0, 0, 0)
    val (dvRel, counts) =
      if (plan.rewrite.isEmpty) (None, Map.empty[String, Long])
      else {
        val physPartCol = partColOf(spark, path).getOrElse(
          throw new IllegalStateException(
            s"store at $path records no partition column"))
        val tagged = applyRenames(
          readFieldsTagged(spark, path, plan.rewrite, Some(physSchema)),
          renames)
        writeDv(spark, path, tagged.filter(coalesce(pred, lit(false))))
      }
    val dvRows = counts.values.sum
    if (plan.dropped == 0 && counts.isEmpty)
      return DmlReceipt(head, 0, 0, plan.kept) // scan refuted the stats
    // rebuild ONLY the partitions something actually happened to: an
    // AllMatch drop, or an ambiguous field that took positions. A
    // partition whose ambiguous fields all scanned clean keeps its entry
    // (identical re-add would be harmless, but the identity diff should
    // not even have to cancel it). A partition whose EVERY field left
    // (all-AllMatch delete) maps to Nil — removed, never re-added.
    val annotated = annotate(plan, dvRel, counts)
    beforeCommit() // test seam: a concurrent committer lands here
    commitDelta(spark, path, head + 1, head,
      removed = annotated.keySet,
      added = annotated.filter(_._2.nonEmpty),
      dvRel.toSeq, Some(physSchema), renames, op = "delete")
    DmlReceipt(head + 1, plan.dropped, 0, plan.kept,
      dvDirs = dvDirCount(counts), dvRows = dvRows)
  }

  /** MERGE-ON-READ UPDATE: rows satisfying `pred` are deletion-vector'd
    * out of their slices (like [[deleteWhereMor]]) and their UPDATED
    * images — each RHS evaluated against the pre-update row, cast to the
    * column's logical type, CHECK-constraint-gated — are APPENDED as one
    * fresh gen per touched partition. The write cost is proportional to
    * the MATCHED rows (Delta's DV-based UPDATE shape): the untouched
    * 99% of an ambiguous slice is never rewritten, where the
    * copy-on-write [[updateWhere]] copies it through. Same debt and
    * same compaction story as the MoR delete.
    */
  def updateWhereMor(spark: SparkSession, path: String,
                     assignments: Seq[(String, Column)], pred: Column,
                     beforeCommit: () => Unit = () => ()): DmlReceipt = {
    requireAtomicRename(path)
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val physPartCol = partColOf(spark, path).getOrElse(
      throw new IllegalStateException(
        s"store at $path records no partition column"))
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    validateAssignments(assignments, logicalSchema,
      logicalPartCol(physPartCol, renames), "updateWhereMor")
    val logicalToPhysical = renames.map(_.swap)
    val expr = analyzed(spark, logicalSchema, pred)
    val entries = touchedEntries(spark, path, head, renames, logicalSchema,
      expr)
    // the restricted resolution consumed the partition conjuncts — the
    // verdict treats them as TRUE ("delete day X" drops as metadata);
    // only when a restriction actually APPLIED (a blown-out IN-list
    // falls through both paths and must keep its conjuncts)
    val vexpr =
      if (partitionValuesOf(spark, path, renames, logicalSchema,
          expr).isDefined ||
        partitionKeyPredOf(spark, path, renames, logicalSchema,
          expr).isDefined)
        stripPartConjuncts(expr,
          consumedPartComps(spark, path, renames, logicalSchema, expr))
      else expr
    val statsCols = statsColsOf(spark, path)
    val plan = planDml(spark, path, entries, vexpr, logicalToPhysical,
      statsCols, physSchema, metadataDrop = false, fileGrain = false)
    if (!plan.touched) return DmlReceipt(head, 0, 0, 0)
    val tagged = applyRenames(
      readFieldsTagged(spark, path, plan.rewrite, Some(physSchema)),
      renames)
    val hits = tagged.filter(coalesce(pred, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val assigned = assignments.toMap
      val updated = hits.select(logicalSchema.fieldNames.toSeq.map { c =>
        assigned.get(c) match {
          case Some(e) => e.cast(logicalSchema(c).dataType).as(c)
          case None => col(c)
        }
      }: _*)
      SnapshotConstraints.enforce(spark, path, updated, "update")
      val (dvRel, counts) = writeDv(spark, path, hits)
      if (counts.isEmpty)
        return DmlReceipt(head, 0, 0, plan.kept) // scan refuted the stats
      val newEntries = writeGen(toPhysical(updated, renames), path,
        physPartCol, statsCols = statsCols)
      val annotated = annotate(plan, dvRel, counts)
      // image gens fold at their OWN keys — on an evolved store an
      // updated row's current-spec key may differ from its pre-image's
      // era key (the pre-image stays DV'd in place either way)
      val (removedF, addedF) = foldNewEntries(annotated.keySet,
        annotated.filter(_._2.nonEmpty), newEntries,
        cross => forWrite(path, head)(
          readManifestValues(spark, path, head, cross.toSeq)))
      beforeCommit() // test seam: a concurrent committer lands here
      commitDelta(spark, path, head + 1, head,
        removed = removedF,
        added = addedF,
        dvRel.toSeq ++ newEntries.values
          .map(_.split("/").take(2).mkString("/")).toSeq.distinct,
        Some(physSchema), renames, op = "update")
      DmlReceipt(head + 1, 0, newEntries.size, plan.kept,
        dvDirs = dvDirCount(counts), dvRows = counts.values.sum)
    } finally hits.unpersist()
  }

  /** Writes `hits`' (file-key, row-index) pairs as ONE deletion-vector
    * sidecar dir and returns (its store-relative path, per-DIR deleted
    * counts keyed like `dirOf`). Zero hits: the empty dir is removed and
    * nothing is referenced. The counts read back from the just-written
    * (page-hot) sidecar, not a recompute.
    *
    * `partValue` is the partition column (logical name): the dir KEY for
    * the counts is rebuilt from the VALUE through the same
    * `getPartitionPathString` discipline the writer's `partitionBy("_p")`
    * uses — NEVER parsed out of `_gk`, whose `_metadata.file_path`
    * segments are URI-encoded (a partition value with a space reads
    * `%20` there but sits escaped-but-unencoded in the manifest; the
    * anti-join is immune — both of its sides come from `_metadata` — but
    * a string-matched dir key would silently miss the field, leaving its
    * positions recorded and unreferenced). The value rides the sidecar
    * as a third column readers never select (their explicit two-column
    * schema prunes it at the parquet footer).
    */
  private[storage] def writeDv(spark: SparkSession, path: String,
      hits: DataFrame): (Option[String], Map[String, Long]) = {
    val rel = "data/dv-" +
      java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    hits.select(col("_gk"), col("_gi"))
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$path/$rel")
    // counts are keyed per FILE (`data/<gen>/<frag>/<file>`), not per
    // dir: manifests may hold FILE-grain fields (a prior copy-on-write's
    // file split re-enters kept files as first-class fields), and a
    // dir-keyed count would never match their `dirOf` — the positions
    // would sit recorded in the sidecar while annotate() left the field
    // un-annotated, silently resurrecting the "deleted" rows. Every
    // segment rides straight out of `_gk`: `<gen>/_p=<frag>/<file>`,
    // where gen and file are writer-generated names and the FRAGMENT is
    // the on-disk dir name URI-encoded by `_metadata.file_path` —
    // percent-decoding it (r17) recovers the exact manifest frag for ANY
    // partition value and ANY spec era (the previous value-rebuild
    // derived the frag from the CURRENT spec's columns, which would
    // mis-key hits in pre-evolution slices).
    val counts = spark.read.parquet(s"$path/$rel")
      .groupBy(col("_gk")).count()
      .collect().map { r =>
        val segs = r.getString(0).split("/", 3)
        require(segs.length == 3, s"malformed sidecar key '${r.getString(0)}'")
        s"data/${segs(0)}/${SnapshotStore.pctDecode(segs(1))}/${segs(2)}" ->
          r.getLong(1)
      }.toMap
    if (counts.isEmpty) {
      org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(s"$path/$rel"), true)
      (None, counts)
    } else (Some(rel), counts)
  }

  /** The MoR rebuild: partitions whose entry actually CHANGED — an
    * AllMatch field dropped as metadata, or an ambiguous field that took
    * positions — mapped to their new field lists: NoMatch fields
    * verbatim, hit fields with the new DV ref appended (count exact per
    * field), clean-scanned ambiguous fields verbatim. A partition whose
    * every field leaves (all AllMatch, delete) maps to Nil — the caller
    * removes its entry without re-adding. Partitions where nothing
    * happened (every ambiguous field scanned clean, nothing dropped) are
    * absent: their entries stay byte-identical, so the identity diff
    * never has to cancel a rewrite.
    */
  /** Distinct slice DIRS among the per-FILE count keys — the receipt's
    * `dvDirs` keeps meaning "slices touched", not "files touched".
    */
  private[storage] def dvDirCount(counts: Map[String, Long]): Int =
    counts.keysIterator.map(k => k.substring(0, k.lastIndexOf('/')))
      .toSet.size

  /** A manifest field's share of [[writeDv]]'s per-FILE counts: by
    * identity for file-grain fields, by prefix for dir-grain fields (a
    * dir field owns every file under it).
    */
  private[storage] def dvCountFor(counts: Map[String, Long],
      field: String): Long = {
    val d = dirOf(field)
    if (d.endsWith(".parquet")) counts.getOrElse(d, 0L)
    else {
      val pre = d + "/"
      counts.iterator.collect { case (k, n) if k.startsWith(pre) => n }.sum
    }
  }

  private def annotate(plan: DmlPlan, dvRel: Option[String],
      counts: Map[String, Long]): Map[String, Seq[String]] = {
    // counts arrive per FILE; a manifest field collects its share by
    // identity (file-grain field IS one file) or by prefix (a dir-grain
    // field owns every file under it). Summing under the dir keeps the
    // per-FIELD deleted count exact — the metadata COUNT subtraction
    // depends on it.
    def countFor(f: String): Long = dvCountFor(counts, f)
    plan.removed.flatMap { p =>
      val kept = plan.keptByPart.getOrElse(p, Nil)
      val amb = plan.ambByPart.getOrElse(p, Nil)
      val hitHere = amb.exists(f => countFor(f) > 0L)
      // an AllMatch metadata drop shows as "the surviving fields don't
      // add back up to the original entry"
      val droppedHere =
        plan.origCount.getOrElse(p, 0) > kept.size + amb.size
      if (!hitHere && !droppedHere) None
      else Some(p -> (kept ++ amb.map { f =>
        countFor(f) match {
          case n if n > 0L =>
            withDv(baseOf(f), dvOf(f) :+ DvRef(dvRel.get, n))
          case _ => f
        }
      }))
    }.toMap
  }

  private def validateAssignments(assignments: Seq[(String, Column)],
      logicalSchema: org.apache.spark.sql.types.StructType,
      partSpec: String, verb: String): Unit = {
    require(assignments.nonEmpty, s"$verb needs at least one assignment")
    val partComps = splitPartCols(partSpec)
    assignments.foreach { case (c, _) =>
      require(logicalSchema.fieldNames.contains(c),
        s"$verb column '$c' is not in the store's schema " +
          s"(${logicalSchema.fieldNames.mkString(", ")})")
      require(!partComps.contains(c),
        s"$verb cannot assign the partition column '$c' — moving " +
          "rows across partitions is a merge (delete + re-insert names " +
          "the moves row by row)")
    }
    require(assignments.map(_._1).distinct.size == assignments.size,
      s"$verb assigns a column twice: " +
        assignments.map(_._1).mkString(", "))
  }

  /** One `select` applying all assignments against the PRE-update row
    * (`SET a = b, b = a` swaps). The hit flag is MATERIALIZED from the
    * pre-update row before any assignment lands: re-filtering the
    * post-assignment frame with the user's predicate would re-resolve
    * it against the assigned values, and a self-referencing update
    * (SET status='x' WHERE status='y') would drop its own rows out of
    * the constraint-enforcement set. CHECK constraints gate the rows
    * the assignments actually modify (the copied-through remainder is
    * existing, already-conforming data).
    */
  private def applyAssignments(base: DataFrame,
      assignments: Seq[(String, Column)], pred: Column,
      logicalSchema: org.apache.spark.sql.types.StructType,
      spark: SparkSession, path: String, verb: String): DataFrame = {
    val hit = coalesce(pred, lit(false))
    val assigned = assignments.toMap
    val hitCol = Iterator.from(0).map(i => s"_graft_hit$i")
      .find(n => !base.columns.contains(n)).get
    val updated = base.withColumn(hitCol, hit).select(
      (base.columns.map { c =>
        assigned.get(c) match {
          case Some(e) =>
            when(col(hitCol), e.cast(logicalSchema(c).dataType))
              .otherwise(col(c)).as(c)
          case None => col(c)
        }
      } :+ col(hitCol)).toSeq: _*)
    SnapshotConstraints.enforce(spark, path,
      updated.filter(col(hitCol)).drop(hitCol), verb)
    updated.drop(hitCol)
  }

  /** DELETE over a WAP branch TIP, staged as the branch's next version —
    * the audit-fix loop's workhorse ("the profile flagged these rows;
    * purge them from the candidate and re-audit"). Same planner, same
    * pruning, same three-way treatment as [[deleteWhere]]; main is never
    * touched, and a dropped branch releases the rewrite gens to the
    * orphan sweep like any staged gen. The staged-CAS loser retries
    * against the new tip (branch-append discipline).
    */
  def deleteBranchWhere(spark: SparkSession, path: String, name: String,
                        pred: Column): DmlReceipt = {
    requireAtomicRename(path)
    var attempt = 0
    while (true) {
      val st = SnapshotBranch.readStaged(spark, path, name)
      val logicalSchema = org.apache.spark.sql.types.StructType(
        st.schema.fields.map(f =>
          f.copy(name = st.renames.getOrElse(f.name, f.name))))
      val expr = analyzed(spark, logicalSchema, pred)
      val statsCols = statsColsOf(spark, path)
      val plan = planDml(spark, path, st.entries, expr,
        st.renames.map(_.swap), statsCols, st.schema, metadataDrop = true)
      if (!plan.touched) return DmlReceipt(st.k, 0, 0, 0)
      val newEntries: Map[String, String] =
        if (plan.rewrite.isEmpty) Map.empty
        else {
          val base = applyRenames(
            readFieldsPhys(spark, path, plan.rewrite, Some(st.schema)),
            st.renames)
          val survivors = base.filter(not(coalesce(pred, lit(false))))
          val physPartCol = partColOf(spark, path).getOrElse(
            throw new IllegalStateException(
              s"store at $path records no partition column"))
          writeGen(toPhysical(survivors, st.renames), path, physPartCol,
            statsCols = statsCols)
        }
      try {
        SnapshotBranch.stageNext(spark, path, name, st,
          {
            val (removedF, addedF) = foldNewEntries(plan.removed,
              plan.rebuild(Map.empty), newEntries,
              cross => st.entries.filter { case (k, _) => cross(k) })
            st.entries -- removedF ++ addedF
          })
        return DmlReceipt(st.k + 1, plan.dropped, plan.rewrite.size,
          plan.kept, keptFiles = plan.keptFiles,
          droppedFiles = plan.droppedFiles)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** UPDATE over a WAP branch TIP (see [[deleteBranchWhere]]) — the
    * in-place candidate fix ("redact the flagged field and re-audit").
    * Pre-update-row assignment semantics and the CHECK-constraint gate
    * over modified rows match [[updateWhere]] exactly.
    */
  def updateBranchWhere(spark: SparkSession, path: String, name: String,
                        assignments: Seq[(String, Column)],
                        pred: Column): DmlReceipt = {
    requireAtomicRename(path)
    var attempt = 0
    while (true) {
      val st = SnapshotBranch.readStaged(spark, path, name)
      val physPartCol = partColOf(spark, path).getOrElse(
        throw new IllegalStateException(
          s"store at $path records no partition column"))
      val logicalSchema = org.apache.spark.sql.types.StructType(
        st.schema.fields.map(f =>
          f.copy(name = st.renames.getOrElse(f.name, f.name))))
      validateAssignments(assignments, logicalSchema,
        logicalPartCol(physPartCol, st.renames), "updateBranchWhere")
      val expr = analyzed(spark, logicalSchema, pred)
      val statsCols = statsColsOf(spark, path)
      val plan = planDml(spark, path, st.entries, expr,
        st.renames.map(_.swap), statsCols, st.schema, metadataDrop = false)
      if (!plan.touched) return DmlReceipt(st.k, 0, 0, 0)
      val base = applyRenames(
        readFieldsPhys(spark, path, plan.rewrite, Some(st.schema)),
        st.renames)
      val updated = applyAssignments(base, assignments, pred,
        logicalSchema, spark, path, "branch update")
      val newEntries = writeGen(toPhysical(updated, st.renames), path,
        physPartCol, statsCols = statsCols)
      try {
        SnapshotBranch.stageNext(spark, path, name, st,
          {
            val (removedF, addedF) = foldNewEntries(plan.removed,
              plan.rebuild(Map.empty), newEntries,
              cross => st.entries.filter { case (k, _) => cross(k) })
            st.entries -- removedF ++ addedF
          })
        return DmlReceipt(st.k + 1, 0, plan.rewrite.size, plan.kept,
          keptFiles = plan.keptFiles)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** MERGE-ON-READ DELETE over a WAP branch TIP — [[deleteWhereMor]]'s
    * semantics staged as the branch's next version: the audit-fix purge
    * priced at the matched rows ("drop the 400 flagged docs from the
    * 10 TB candidate") where even the branch CoW delete rewrites the
    * flagged slices. Fork-snapshot slices prove NoMatch from their blobs
    * and are never opened; main's head never moves until publish, and
    * the published fields carry their DV refs into main verbatim (every
    * reader goes through the central DV-aware reader). A retry-lost
    * attempt's sidecar is an unreferenced orphan for the age-floored
    * sweep, like a lost attempt's gens.
    */
  def deleteBranchWhereMor(spark: SparkSession, path: String, name: String,
                           pred: Column): DmlReceipt = {
    requireAtomicRename(path)
    var attempt = 0
    while (true) {
      val st = SnapshotBranch.readStaged(spark, path, name)
      val logicalSchema = org.apache.spark.sql.types.StructType(
        st.schema.fields.map(f =>
          f.copy(name = st.renames.getOrElse(f.name, f.name))))
      val expr = analyzed(spark, logicalSchema, pred)
      val statsCols = statsColsOf(spark, path)
      val plan = planDml(spark, path, st.entries, expr,
        st.renames.map(_.swap), statsCols, st.schema,
        metadataDrop = true, fileGrain = false)
      if (!plan.touched) return DmlReceipt(st.k, 0, 0, 0)
      val (dvRel, counts) =
        if (plan.rewrite.isEmpty) (None, Map.empty[String, Long])
        else {
          val physPartCol = partColOf(spark, path).getOrElse(
            throw new IllegalStateException(
              s"store at $path records no partition column"))
          val tagged = applyRenames(
            readFieldsTagged(spark, path, plan.rewrite, Some(st.schema)),
            st.renames)
          writeDv(spark, path, tagged.filter(coalesce(pred, lit(false))))
        }
      if (plan.dropped == 0 && counts.isEmpty)
        return DmlReceipt(st.k, 0, 0, plan.kept)
      val annotated = annotate(plan, dvRel, counts)
      try {
        SnapshotBranch.stageNext(spark, path, name, st,
          st.entries -- annotated.keySet ++ annotated.filter(_._2.nonEmpty))
        return DmlReceipt(st.k + 1, plan.dropped, 0, plan.kept,
          dvDirs = dvDirCount(counts), dvRows = counts.values.sum)
      } catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > 5) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** MERGE-ON-READ UPDATE over a WAP branch TIP — [[updateWhereMor]]'s
    * semantics staged as the branch's next version: hit rows are
    * deletion-vector'd out of the staged slices and their updated images
    * (pre-update-row RHS, CHECK-gated) append as one fresh staged gen
    * per touched partition. The in-place candidate redaction at matched-
    * rows cost.
    */
  def updateBranchWhereMor(spark: SparkSession, path: String, name: String,
                           assignments: Seq[(String, Column)],
                           pred: Column): DmlReceipt = {
    requireAtomicRename(path)
    var attempt = 0
    while (true) {
      val st = SnapshotBranch.readStaged(spark, path, name)
      val physPartCol = partColOf(spark, path).getOrElse(
        throw new IllegalStateException(
          s"store at $path records no partition column"))
      val logicalSchema = org.apache.spark.sql.types.StructType(
        st.schema.fields.map(f =>
          f.copy(name = st.renames.getOrElse(f.name, f.name))))
      validateAssignments(assignments, logicalSchema,
        logicalPartCol(physPartCol, st.renames),
        "updateBranchWhereMor")
      val expr = analyzed(spark, logicalSchema, pred)
      val statsCols = statsColsOf(spark, path)
      val plan = planDml(spark, path, st.entries, expr,
        st.renames.map(_.swap), statsCols, st.schema,
        metadataDrop = false, fileGrain = false)
      if (!plan.touched) return DmlReceipt(st.k, 0, 0, 0)
      val tagged = applyRenames(
        readFieldsTagged(spark, path, plan.rewrite, Some(st.schema)),
        st.renames)
      val hits = tagged.filter(coalesce(pred, lit(false)))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val assigned = assignments.toMap
        val updated = hits.select(logicalSchema.fieldNames.toSeq.map { c =>
          assigned.get(c) match {
            case Some(e) => e.cast(logicalSchema(c).dataType).as(c)
            case None => col(c)
          }
        }: _*)
        SnapshotConstraints.enforce(spark, path, updated, "branch update")
        val (dvRel, counts) = writeDv(spark, path, hits)
        if (counts.isEmpty)
          return DmlReceipt(st.k, 0, 0, plan.kept)
        val newEntries = writeGen(toPhysical(updated, st.renames), path,
          physPartCol, statsCols = statsCols)
        val annotated = annotate(plan, dvRel, counts)
        val (removedF, addedF) = foldNewEntries(annotated.keySet,
          annotated.filter(_._2.nonEmpty), newEntries,
          cross => st.entries.filter { case (k, _) => cross(k) })
        try {
          SnapshotBranch.stageNext(spark, path, name, st,
            st.entries -- removedF ++ addedF)
          return DmlReceipt(st.k + 1, 0, newEntries.size, plan.kept,
            dvDirs = dvDirCount(counts), dvRows = counts.values.sum)
        } catch {
          case e: java.util.ConcurrentModificationException =>
            attempt += 1
            if (attempt > 5) throw e
        }
      } finally hits.unpersist()
    }
    throw new IllegalStateException("unreachable")
  }
}
