package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MergeTree-analog physical layout (SURVEY R11):
  * `/root/reference/nginx.click:1` declares
  * `PARTITION BY toYYYYMMDD(logdate) ORDER BY (logdate, logdatetime)
  *  SETTINGS index_granularity=8192` — re-expressed for Spark as:
  *
  *  - Hive-style `partitionBy("logdate")` daily directories → Catalyst
  *    partition pruning for every time-filtered dashboard query
  *    (`README.md:283`), the same pruning `toYYYYMMDD` buys ClickHouse;
  *  - `sortWithinPartitions(logdate, logdatetime)` before the write →
  *    clustered parquet row groups whose min/max stats emulate the 8192-row
  *    sparse primary index (row-group/page skipping via parquet filter
  *    pushdown);
  *  - zstd-compressed parquet ≈ MergeTree columnar compression
  *    (`README.md:32`: "it compresses stored data").
  *
  * 100 TB notes: `repartition($"logdate")` shuffles once on the partition key
  * so each day lands in few large files (no small-file explosion from N
  * upstream tasks × M days); within-day ordering costs a per-partition sort,
  * no extra exchange. For heavily skewed days, AQE splits oversized shuffle
  * partitions; `maxRecordsPerFile` caps single-file size.
  */
object LogTableWriter {

  def write(df: DataFrame, path: String,
            maxRecordsPerFile: Long = 8L * 1024 * 1024): Unit = {
    df.repartition(col("logdate"))
      .sortWithinPartitions(col("logdate"), col("logdatetime"))
      .write
      .mode("overwrite")
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("logdate")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compacts a streaming-written store: micro-batch appends leave one file
    * per batch per day (the small-file problem — at 100 TB, file-listing and
    * footer overhead dominate scans long before data does). Rewrites each
    * partition into few large sorted files — the Spark analog of MergeTree's
    * background merges — via a staging directory and a two-rename swap.
    *
    * Concurrency contract (NOT atomic — a rename pair can't be on generic
    * filesystems): (1) readers can observe a brief window where `path` is
    * absent between the two renames — schedule compaction off-peak or have
    * readers retry; a table format / manifest indirection is the true fix.
    * (2) files appended to the store AFTER the compaction read are detected
    * by a before/after listing diff and MOVED into the compacted store, not
    * deleted — so running compaction concurrently with ingest loses nothing
    * (those late files simply stay un-compacted until the next pass).
    */
  def compact(spark: SparkSession, path: String,
              maxRecordsPerFile: Long = 8L * 1024 * 1024,
              beforeSwap: () => Unit = () => ()): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    val staging = path + "_compacting"
    val snapshot = dataFiles(fs, dst).keySet
    write(spark.read.parquet(path), staging, maxRecordsPerFile)
    beforeSwap() // test seam: simulate a concurrent append landing here
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    // rescue anything that landed after the snapshot: it was not part of
    // the compaction input, so it must survive in the new store
    dataFiles(fs, old).foreach { case (rel, src) =>
      if (!snapshot.contains(rel)) {
        val target = new org.apache.hadoop.fs.Path(dst, rel)
        fs.mkdirs(target.getParent)
        fs.rename(src, target)
      }
    }
    fs.delete(old, true)
  }

  /** Recursive data-file listing as store-relative path → absolute path
    * (metadata files like _SUCCESS/.crc excluded).
    */
  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem,
                        root: org.apache.hadoop.fs.Path): Map[String, org.apache.hadoop.fs.Path] = {
    val base = root.toUri.getPath.stripSuffix("/") + "/"
    val out = scala.collection.mutable.Map.empty[String, org.apache.hadoop.fs.Path]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath)
        else if (!name.startsWith("_") && !name.startsWith("."))
          out(st.getPath.toUri.getPath.stripPrefix(base)) = st.getPath
      }
    if (fs.exists(root)) walk(root)
    out.toMap
  }
}
