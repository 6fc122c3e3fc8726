package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free fact-fact joins (SURVEY §4: "the
  * 100 TB design story is layout + AQE + bucketing").
  *
  * `bucketBy(n, key)` pre-shuffles data ONCE at write time into n stable hash
  * buckets; any later equi-join or aggregation on the bucket key reads both
  * sides co-partitioned, so Catalyst plans a SortMergeJoin with NO Exchange —
  * at 100 TB that removes the dominant cost (re-shuffling the fact table for
  * every join) from recurring queries and replaces it with a one-time write
  * cost. Bucket counts should be sized so one bucket ≈ one task's worth of
  * data at target scale (e.g. 100 TB / 2048 buckets ≈ 50 GB per bucket,
  * split further by parquet row groups).
  */
object BucketedTables {

  /** Writes `df` as a bucketed catalog table (bucket metadata lives in the
    * session catalog; files are plain parquet).
    */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .option("compression", "zstd")
      .bucketBy(numBuckets, bucketKey)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
