package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Keyed, partitioned upsert store: MERGE a CDC-style batch (inserts +
  * updates + deletes) into a Hive-partitioned parquet table REWRITING ONLY
  * THE TOUCHED PARTITIONS — the mutable-dimension counterpart of
  * [[LogTableWriter]]'s append-only fact store (reference analog: ClickHouse
  * ReplacingMergeTree's key-collapsing semantics, `/root/reference/README.md:32`
  * "merge parts in background keeping the latest row per key" family —
  * re-expressed as one declarative Spark job instead of a background engine
  * thread).
  *
  * Why this shape at 100 TB:
  *   - a CDC batch touches FEW partitions by construction; the merge reads
  *     the base pruned to `partCol IN (batch's partitions)` — Catalyst turns
  *     the isin into directory-level partition pruning, so a 10k-partition
  *     store merges a 3-partition batch by reading 3 directories;
  *   - the rewrite side uses Spark's DYNAMIC partition overwrite (the
  *     per-write `partitionOverwriteMode=dynamic` option): only partitions
  *     present in the merged output are replaced, each swapped by the
  *     committer's rename — untouched partition directories are never
  *     listed, read, or written (MergeSpec pins their files byte-stable);
  *   - the batch's key set broadcast-anti-joins the pruned base (update and
  *     delete keys are batch-sized), so the only data-sized work is the
  *     touched partitions' scan + rewrite.
  *
  * Contracts (the standard partition-path discipline of every
  * partition-pruned upsert store, Hudi/Iceberg-style):
  *   - a key's partition value is IMMUTABLE — rows move between partitions
  *     only via explicit delete + insert;
  *   - within one batch, `precedenceCol` (when given) picks the winning row
  *     per key; without it the batch must be unique per key;
  *   - MERGE-with-staging note: the merged view is `localCheckpoint`ed
  *     before the overwrite (Spark refuses a path-write that scans the same
  *     path), so executor storage must hold the TOUCHED partitions — batch-
  *     bounded by the pruning above, and the knob a catalog-table deployment
  *     replaces with the committer's staging dir.
  */
object MergeStore {

  /** Initial (or full-replace) write of the store, Hive-partitioned by
    * `partCol`; one shuffle on the partition key so each partition lands in
    * few files (the [[LogTableWriter.write]] small-files discipline).
    */
  def write(df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy(partCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** MERGE `batch` into the store at `path`:
    *   - rows with `deleteCol` true remove their key;
    *   - remaining batch rows upsert (replace the key if present, insert
    *     otherwise);
    *   - base rows whose key is absent from the batch survive untouched —
    *     and rows in UNTOUCHED PARTITIONS survive without being read.
    *
    * `batch` must carry the base schema (plus `deleteCol`/`precedenceCol`
    * if used) including `partCol` on every row — delete markers too: the
    * partition value is what scopes the rewrite.
    */
  def merge(spark: SparkSession, path: String, batch: DataFrame,
            partCol: String, keyCols: Seq[String],
            deleteCol: Option[String] = None,
            precedenceCol: Option[String] = None,
            broadcastRowLimit: Long = Joins.BroadcastRowLimit): Unit = {
    val view = mergedView(spark, path, batch, partCol, keyCols, deleteCol,
      precedenceCol, broadcastRowLimit)
    if (view.isEmpty) return // empty batch: nothing to rewrite
    val (merged, parts) = view.get
    // stage (see scaladoc), then dynamically overwrite ONLY the partitions
    // present in the merged output
    val staged = merged.localCheckpoint()
    staged
      .repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy(partCol)
      .parquet(path)
    // Dynamic overwrite replaces only partitions PRESENT in the output — an
    // affected partition whose rows were ALL deleted has no output rows, so
    // its stale directory would survive the write. Drop those explicitly
    // (cheap distinct over the checkpointed staging data).
    val present = staged.select(col(partCol)).distinct().collect()
      .map(_.get(0)).toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    parts.filterNot(present).foreach { v =>
      val name = Option(v).map(x =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(x.toString))
        .getOrElse("__HIVE_DEFAULT_PARTITION__")
      fs.delete(new org.apache.hadoop.fs.Path(path, s"$partCol=$name"), true)
    }
  }

  /** The merged relation [[merge]] writes (pre-staging) plus the affected
    * partition values — exposed so the partition-pruning contract is
    * plan-pinnable (MergeSpec asserts the base scan carries the batch's
    * partition values as PartitionFilters).
    * None ⇔ empty batch (merge is then a filesystem no-op).
    */
  private[graft] def mergedView(spark: SparkSession, path: String,
      batch: DataFrame, partCol: String, keyCols: Seq[String],
      deleteCol: Option[String], precedenceCol: Option[String],
      broadcastRowLimit: Long = Joins.BroadcastRowLimit)
      : Option[(DataFrame, IndexedSeq[Any])] = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val (resolved, upserts) = resolveBatch(batch, keyCols, deleteCol,
      precedenceCol)
    val keys = resolved.select(keyCols.map(col): _*).distinct()
    // CDC contract: the batch touches few partitions → collecting their
    // values is bounded driver state, and the isin literal is what Catalyst
    // prunes the base scan's directory listing with
    val parts = resolved.select(col(partCol)).distinct().collect()
      .map(_.get(0)).toIndexedSeq
    if (parts.isEmpty) return None
    // NULL is a legal partition value (__HIVE_DEFAULT_PARTITION__) but
    // isin(null) matches NOTHING — a NULL-partition batch would silently
    // drop that partition's unmatched base rows from the merged view
    // (then the overwrite would persist the loss). Add the isNull branch
    // explicitly; both arms stay partition-prunable.
    val nonNull = parts.filter(_ != null)
    val prune =
      if (nonNull.isEmpty) col(partCol).isNull
      else if (nonNull.size == parts.size) col(partCol).isin(nonNull: _*)
      else col(partCol).isin(nonNull: _*) || col(partCol).isNull
    val base = spark.read.parquet(path).filter(prune)
    val survivors = base.join(Joins.maybeBroadcast(keys, broadcastRowLimit),
      keyCols, "left_anti")
    Some((upserts.unionByName(survivors), parts))
  }

  /** Shared batch-resolution semantics (latest-wins per key via the
    * precedence column, delete-marker split) for [[merge]] and
    * [[SnapshotStore.merge]] — one copy, so the two stores' MERGE
    * contracts cannot drift. Returns (resolved, upserts): `resolved`
    * still carries delete markers (its keys define removals), `upserts`
    * is the re-insert set.
    */
  private[storage] def resolveBatch(batch: DataFrame, keyCols: Seq[String],
      deleteCol: Option[String], precedenceCol: Option[String])
      : (DataFrame, DataFrame) = {
    // latest-wins within the batch (CDC streams can carry several versions
    // of one key); without a precedence column the batch is trusted unique
    val resolved = precedenceCol match {
      case Some(v) =>
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(v).desc)
        batch.withColumn("_mrn", row_number().over(w))
          .filter(col("_mrn") === 1).drop("_mrn", v)
      case None => batch
    }
    val upserts = deleteCol match {
      case Some(d) => resolved.filter(!coalesce(col(d), lit(false))).drop(d)
      case None    => resolved
    }
    (resolved, upserts)
  }
}
