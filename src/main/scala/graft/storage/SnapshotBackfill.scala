package graft.storage

import org.apache.spark.sql.SparkSession

/** Declare-LATER data skipping — `backfillStats`: adds stats and/or
  * needle (bloom) columns to an EXISTING store and backfills every
  * retained head gen, with ZERO data rewritten. Without this verb,
  * "I forgot to declare skipping columns at write time" (or "the query
  * pattern changed — now everybody filters on `source_url`") meant
  * rewriting the corpus; with it, the fix is one pass over the data
  * that lands entirely in METADATA:
  *
  *  - min/max + null-count blobs are recomputed per (partition, gen)
  *    through the same [[SnapshotStore.genStats]] every commit uses, and
  *    the head's manifest FIELDS are re-texted with them — one new
  *    version, no gen dir touched (the Iceberg "rewrite manifests with
  *    new stats" maintenance idea, re-derived);
  *  - bloom sidecars are built per gen through the same
  *    [[SnapshotBloom.buildFor]] writeGen uses (sidecars live inside the
  *    gen dirs; no commit needed for them beyond the declaration);
  *  - the `_statscols` / `_bloomcols` declarations are REPLACED (union
  *    of old + new), so every later write maintains the new columns
  *    automatically.
  *
  * CDC interplay: a backfill commit changes only blob text, never dir
  * lists — and [[SnapshotStore.changes]] diffs partitions by their DIR
  * lists, so the feed across a backfill version is empty WITHOUT reading
  * anything (the streaming source's diff was always dir-based). Time
  * travel is untouched: older versions keep their original fields.
  *
  * Cost model, stated plainly: ONE corpus-sized aggregate over all
  * retained head gens in a single Spark job (r16 —
  * [[SnapshotStore.genStatsBatch]]; jobs no longer scale with gen
  * count), one full-manifest commit (every partition's entry text
  * changes — the one-time O(partitions) cost the per-commit delta path
  * exists to avoid), and one bloom build per gen per declared needle
  * column (sidecars are per-gen files, so those stay per-gen by
  * construction; each build is one gen-sized job).
  */
private[graft] object SnapshotBackfill {
  import SnapshotStore._
  import SnapshotFormat.{StatsSep, dirOf, dvOf, withDv}

  /** Adds `statsCols`/`bloomCols` (LOGICAL names) to the store's
    * declarations and backfills the head. Returns the committed version
    * (the prior head when there was nothing to do — an empty store, or
    * both lists already declared with every gen already covered).
    */
  def backfillStats(spark: SparkSession, path: String,
                    statsCols: Seq[String] = Nil,
                    bloomCols: Seq[String] = Nil): Int = {
    requireAtomicRename(path)
    require(statsCols.nonEmpty || bloomCols.nonEmpty,
      "backfillStats needs at least one column to declare")
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val physSchema = versionSchema(spark, path, head)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      physSchema.fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    def toPhys(cols: Seq[String], what: String): Seq[String] = cols.map {
      c =>
        require(logicalSchema.fieldNames.contains(c),
          s"backfillStats $what column '$c' is not in the store's " +
            s"schema (${logicalSchema.fieldNames.mkString(", ")})")
        physicalCol(c, renames)
    }
    val physStats = toPhys(statsCols, "stats")
    val physBlooms = toPhys(bloomCols, "bloom")
    validateStatsCols(physStats, physSchema)
    SnapshotBloom.validateBloomCols(physBlooms, physSchema)
    val newStats = (statsColsOf(spark, path) ++ physStats).distinct
    val newBlooms =
      (SnapshotBloom.bloomColsOf(spark, path) ++ physBlooms).distinct
    // declarations FIRST: a write racing the backfill then already
    // maintains the new columns for its own gens
    replaceColsFile(spark, path, "_statscols", newStats)
    replaceColsFile(spark, path, "_bloomcols", newBlooms)
    // STAGED branch gens get needle sidecars too — they are per-gen
    // files, so no staged manifest is rewritten and no branch owner is
    // raced; the WAP audit then prunes on the new columns immediately.
    // (Staged STATS blobs stay as written — conservative — until the
    // branch's own appends/merges or its publish-era compactions re-blob
    // them; publishing re-points gens, and a post-publish backfill
    // covers them like any main-line gen.)
    SnapshotBranch.allStagedDirs(spark, path)
      .map(f => dirOf(f).split("/").lift(1).getOrElse(""))
      .filter(_.nonEmpty).toSet
      .foreach((g: String) =>
        SnapshotBloom.buildFor(spark, path, g, newBlooms))
    val entries = forWrite(path, head)(readManifest(spark, path, head))
    if (entries.isEmpty) return head
    val gens = entries.values.flatten
      .map(f => dirOf(f).split("/").lift(1).getOrElse("")).toSet - ""
    // ONE corpus-sized aggregate for ALL gens (r16 — was one driver-looped
    // job per gen, hours at a 10k-gen store), through the commit path's
    // own stats codec — per-partition blobs keyed by (gen, value)
    // FILE-level fields (a DML file split's kept files) are excluded:
    // their blobs are footer-fresh from the split that made them, and
    // re-aggregating their parent DIR would resurrect unreferenced
    // files' rows into the blob. They re-blob (gaining any newly
    // declared column) at the next compaction, which collapses them.
    val blobs: Map[String, Map[String, String]] =
      genStatsBatch(spark, path,
        entries.values.flatten.map(dirOf)
          .filterNot(_.endsWith(".parquet")).toSeq.distinct.sorted,
        newStats, physSchema)
    gens.foreach(g => SnapshotBloom.buildFor(spark, path, g, newBlooms))
    val rebuilt = entries.map { case (p, fields) =>
      p -> fields.map { f =>
        val dir = dirOf(f)
        val gen = dir.split("/").lift(1).getOrElse("")
        blobs.get(gen).flatMap(_.get(p)) match {
          // the re-derived blob describes the dir's PHYSICAL rows — the
          // same population any deletion-vector suffix overlays, so the
          // suffix carries forward verbatim (live = physical - DV'd)
          case Some(blob) => withDv(s"$dir$StatsSep$blob", dvOf(f))
          case None => f // vanished/odd slice: keep the original field
        }
      }
    }
    commit(spark, path, head + 1, rebuilt, Nil, Some(physSchema),
      renames, op = "backfill_stats")
    head + 1
  }

  /** Atomic-enough REPLACE of a writer-hint declarations file: the file
    * is re-read fresh by every write and its absence only degrades that
    * one write to fewer stats, so delete-then-single-winner-publish is
    * sound (the brief missing window is the documented hint semantics;
    * concurrent replacers retry into last-wins).
    */
  private[storage] def replaceColsFile(spark: SparkSession, path: String,
                              name: String, cols: Seq[String]): Unit = {
    if (cols.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val Esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val dst = new org.apache.hadoop.fs.Path(path, name)
    var attempt = 0
    while (attempt < 5) {
      fs.delete(dst, false)
      fs.delete(new org.apache.hadoop.fs.Path(path, s".$name.crc"), false)
      val tmp = new org.apache.hadoop.fs.Path(path,
        s".$name.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(cols.map(Esc.escapePathName).mkString("\n")
        .getBytes("UTF-8"))
      finally out.close()
      try { publishFile(spark, path, tmp, dst); return }
      catch {
        // a concurrent replacer won the publish: retry into last-wins
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          attempt += 1
        case _: java.io.IOException if fs.exists(dst) =>
          attempt += 1
      }
    }
    throw new IllegalStateException(
      s"could not replace $name at $path after 5 attempts")
  }
}
