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
  *  - Only genuinely ambiguous slices pay copy-on-write: they are read,
  *    filtered/updated, and rewritten as ONE fresh gen per partition
  *    (stats re-derived), so repeated DML doubles as compaction of the
  *    touched slices.
  *
  * History is never rewritten: old versions keep referencing the old
  * gens (time travel sees pre-DML data until [[SnapshotStore.expire]]
  * ages them out — the GDPR caveat is the same as Delta's: a delete is
  * logical until retention physically drops the old files). The commit
  * goes through the same single-winner manifest CAS as every write, and
  * [[SnapshotStore.changes]] reconstructs the row-level delta of a DML
  * commit exactly like a merge's (replaced partition entries diff into
  * delete / update_pre+postimage rows).
  */
private[graft] object SnapshotDml {
  import SnapshotStore._
  import SnapshotFormat.{dirOf, statsOf, parseStats}

  /** One DML commit's receipt. `version` is the committed head (the
    * prior head when the predicate provably touched nothing — a no-op
    * commits no version). `droppedDirs` = (partition, gen) slices
    * deleted as pure metadata (AllMatch); `rewrittenDirs` = ambiguous
    * slices that paid copy-on-write; `keptDirs` = NoMatch slices inside
    * touched partitions whose fields copied forward verbatim (slices of
    * untouched partitions are not counted — they were never resolved).
    */
  case class DmlReceipt(version: Int, droppedDirs: Int,
                        rewrittenDirs: Int, keptDirs: Int)

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
      case None => forWrite(path, head)(readManifest(spark, path, head))
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
    val residual = Seq.newBuilder[String]
    var touchedAny = false
    entries.foreach { case (p, fields) =>
      val vs = fields.map { f =>
        val v = statsOf(f).map(b =>
          evalPrune(expr, parseStats(b), logicalToPhysical))
          .getOrElse(MightMatch)
        f -> (if (v != NoMatch && bloomNoMatch(f)) NoMatch else v)
      }
      if (vs.exists(_._2 != NoMatch)) {
        touchedAny = true
        removed += p
        keptByPart += p -> vs.collect { case (f, NoMatch) => f }
        residual ++= vs.collect { case (f, MightMatch) => f }
        dropped += vs.count(_._2 == AllMatch)
        kept += vs.count(_._2 == NoMatch)
      }
    }
    if (!touchedAny) return DmlReceipt(head, 0, 0, 0)
    val residualDirs = residual.result().map(dirOf).distinct.sorted
    // copy-on-write for the ambiguous slices: survivors are the rows the
    // predicate does NOT hold for (NULL survives — three-valued DELETE)
    val newEntries: Map[String, String] =
      if (residualDirs.isEmpty) Map.empty
      else {
        val base = applyRenames(readWithSchema(spark, path, head,
          residualDirs.map(d => s"$path/$d")), renames)
        val survivors = base.filter(not(coalesce(pred, lit(false))))
        val physPartCol = partColOf(spark, path).getOrElse(
          throw new IllegalStateException(
            s"store at $path records no partition column"))
        writeGen(toPhysical(survivors, renames), path, physPartCol,
          statsCols = statsColsOf(spark, path))
      }
    val keptMap = keptByPart.result()
    val added = removed.result().flatMap { p =>
      val fields = keptMap.getOrElse(p, Nil) ++ newEntries.get(p).toSeq
      if (fields.isEmpty) None else Some(p -> fields)
    }.toMap
    beforeCommit() // test seam: a concurrent committer lands here
    commitDelta(spark, path, head + 1, head,
      removed = removed.result(), added = added,
      newEntries.values.map(_.split("/").take(2).mkString("/"))
        .toSeq.distinct,
      Some(physSchema), renames, op = "delete")
    DmlReceipt(head + 1, dropped, residualDirs.size, kept)
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
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val logicalToPhysical = renames.map(_.swap)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    val physPartCol = partColOf(spark, path).getOrElse(
      throw new IllegalStateException(
        s"store at $path records no partition column"))
    val logicalPartCol = renames.getOrElse(physPartCol, physPartCol)
    assignments.foreach { case (c, _) =>
      require(logicalSchema.fieldNames.contains(c),
        s"updateWhere column '$c' is not in the store's schema " +
          s"(${logicalSchema.fieldNames.mkString(", ")})")
      require(c != logicalPartCol,
        s"updateWhere cannot assign the partition column '$c' — moving " +
          "rows across partitions is a merge (delete + re-insert names " +
          "the moves row by row)")
    }
    require(assignments.map(_._1).distinct.size == assignments.size,
      "updateWhere assigns a column twice: " +
        assignments.map(_._1).mkString(", "))
    val expr = analyzed(spark, logicalSchema, pred)
    val entries = touchedEntries(spark, path, head, renames, logicalSchema,
      expr)
    // same needle demotion as deleteWhere: a bloom-rejected gen holds no
    // row the assignments could touch
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
    var kept = 0
    val removed = Set.newBuilder[String]
    val keptByPart = Map.newBuilder[String, Seq[String]]
    val rewrite = Seq.newBuilder[String]
    var touchedAny = false
    entries.foreach { case (p, fields) =>
      val vs = fields.map { f =>
        val v = statsOf(f).map(b =>
          evalPrune(expr, parseStats(b), logicalToPhysical))
          .getOrElse(MightMatch)
        f -> (if (v != NoMatch && bloomNoMatch(f)) NoMatch else v)
      }
      if (vs.exists(_._2 != NoMatch)) {
        touchedAny = true
        removed += p
        keptByPart += p -> vs.collect { case (f, NoMatch) => f }
        rewrite ++= vs.collect { case (f, v) if v != NoMatch => f }
        kept += vs.count(_._2 == NoMatch)
      }
    }
    if (!touchedAny) return DmlReceipt(head, 0, 0, 0)
    val rewriteDirs = rewrite.result().map(dirOf).distinct.sorted
    val base = applyRenames(readWithSchema(spark, path, head,
      rewriteDirs.map(d => s"$path/$d")), renames)
    val hit = coalesce(pred, lit(false))
    val assigned = assignments.toMap
    // the hit flag is MATERIALIZED from the PRE-update row before any
    // assignment lands: re-filtering the post-assignment frame with the
    // user's predicate would re-resolve it against the assigned values,
    // and a self-referencing update (SET status='x' WHERE status='y')
    // would drop its own rows out of the constraint-enforcement set
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
    // CHECK constraints gate the rows the assignments actually modify
    // (the copied-through remainder is existing, already-conforming data)
    SnapshotConstraints.enforce(spark, path,
      updated.filter(col(hitCol)).drop(hitCol), "update")
    val newEntries = writeGen(toPhysical(updated.drop(hitCol), renames), path,
      physPartCol, statsCols = statsColsOf(spark, path))
    val keptMap = keptByPart.result()
    val added = removed.result().flatMap { p =>
      val fields = keptMap.getOrElse(p, Nil) ++ newEntries.get(p).toSeq
      if (fields.isEmpty) None else Some(p -> fields)
    }.toMap
    beforeCommit() // test seam: a concurrent committer lands here
    commitDelta(spark, path, head + 1, head,
      removed = removed.result(), added = added,
      newEntries.values.map(_.split("/").take(2).mkString("/"))
        .toSeq.distinct,
      Some(physSchema), renames, op = "update")
    DmlReceipt(head + 1, 0, rewriteDirs.size, kept)
  }
}
