package graft.storage

import org.apache.spark.sql.SparkSession

/** Small-file compaction for a parquet directory — the daily-ops answer to
  * the lake's "millions of tiny files" problem: listing, footer probing,
  * and task scheduling all scale with file COUNT, not bytes, so a corpus
  * that accreted through many small appends reads slower every day. The
  * reference's ClickHouse table solves this with background part merges
  * (the MergeTree contract, /root/reference/nginx.click:1); here it is one
  * explicit size-targeted rewrite.
  *
  * Sizing: `nOut = ceil(totalBytes / targetFileBytes)`, derived from the
  * input listing. The default path COALESCES — merging partitions without
  * a shuffle, because at 100 TB a compaction that shuffles the corpus
  * costs more than the problem it fixes; `rebalance = true` switches to a
  * full repartition for the rarer skew-recovery compaction (accepting the
  * shuffle to equalize output sizes).
  */
object Compaction {

  /** Compacts the parquet files under `inDir` into `outDir`; returns the
    * output file-count target. Content is preserved row-for-row (the
    * declared gate hash-matches the compacted read-back against the
    * original table).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L << 20,
              rebalance: Boolean = false): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    // recursive DATA-file byte count, so a Hive-partitioned input still
    // sizes correctly (a flat listStatus would sum 0 over subdirectories
    // and coalesce everything into one file); _SUCCESS/markers excluded.
    // NOTE: compacting a partitioned dir through here flattens the
    // layout — partitioned stores compact per-partition: merges rewrite
    // touched partitions whole, and the snapshot store has a dedicated
    // manifest-committed [[SnapshotStore.compactPartitions]].
    var totalBytes = 0L
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(inDir), true)
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) totalBytes += st.getLen
    }
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val sized = if (rebalance) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").option("compression", "zstd")
      .parquet(outDir)
    nOut
  }
}
