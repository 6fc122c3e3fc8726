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
    * session catalog; files are plain parquet). With `path` the table is
    * external — files land there instead of the session warehouse dir.
    */
  def writeBucketed(df: DataFrame, table: String, bucketKey: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite")
      .format("parquet")
      .option("compression", "zstd")
      .bucketBy(numBuckets, bucketKey)
    val w = path.fold(w0)(p => w0.option("path", p))
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  private val factBuilt =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** Leaf-file identity (name|size|mtime) of one table's parquet under a
    * dataset dir — memo keys carry it so an in-place rewrite of the source
    * can never be served a stale derived layout (the same reason
    * `StreamGate.replayCache` fingerprints its input). Shared with
    * [[VectorIndexStore]].
    */
  private[graft] def sourceFingerprint(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
        .map(c => s"${c.getName}|${c.length}|${c.lastModified}").mkString(";")
    else s"${f.length}|${f.lastModified}"
  }

  /** The write-once half of the layout story, wired to the gate
    * (`q_join_bucketed`): lineitem and orders bucketed on the order key,
    * built at most once per JVM per dataset (bucket METADATA lives in the
    * in-memory catalog, so each JVM re-registers; the files land under a
    * dataset-keyed tmp dir). The memo key carries the SESSION identity
    * (each session has its own catalog), the bucket count, and the source
    * files' fingerprint (an in-place rewrite must rebuild). Returns
    * (lineitemTable, ordersTable) catalog names.
    */
  def ensureFactBuckets(spark: SparkSession, dir: String,
                        numBuckets: Int = 8): (String, String) = {
    val memoKey = s"${System.identityHashCode(spark)}|$dir|$numBuckets|" +
      s"${sourceFingerprint(dir, "lineitem")}|${sourceFingerprint(dir, "orders")}"
    factBuilt.getOrElseUpdate(memoKey, {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(memoKey.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$key"
      val (li, ord) = (s"graft_b_lineitem_$key", s"graft_b_orders_$key")
      writeBucketed(graft.Tables.table(spark, dir, "lineitem"),
        li, "l_orderkey", numBuckets, path = Some(s"$base/lineitem"))
      writeBucketed(graft.Tables.table(spark, dir, "orders"),
        ord, "o_orderkey", numBuckets, path = Some(s"$base/orders"))
      (li, ord)
    })
  }
}
