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

  /** Size-derived bucket count: one bucket per ~64 MB of the larger fact's
    * source files, clamped to [8, 4096] and rounded up to a power of two
    * (bucket-count compatibility under future splits/merges). The r9 100×
    * probe is why this is derived rather than fixed: a constant 8 buckets
    * capped the recurring join at 8-way parallelism on a 32-core box and
    * erased the layout's whole advantage (11.3 s bucketed vs 11.5 s plain);
    * sizing by data restores it. At 100 TB the same rule yields the
    * 2048-bucket / ~50 GB-per-bucket shape the scaladoc above describes.
    */
  private[graft] def autoBuckets(dir: String): Int = {
    def bytes(table: String): Long = {
      val f = new java.io.File(s"$dir/$table.parquet")
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(_.length).sum
      else f.length
    }
    val target = math.max(bytes("lineitem"), bytes("orders")) / (64L << 20)
    val clamped = math.min(4096L, math.max(8L, target)).toInt
    // next power of two ≥ clamped (clamped ∈ [8, 4096], so no overflow)
    Integer.highestOneBit(clamped - 1) << 1
  }

  /** The write-once half of the layout story, wired to the gate
    * (`q_join_bucketed`): lineitem and orders bucketed on the order key.
    * The FILE layout is shared across JVMs under a layout-keyed tmp dir
    * (dataset + bucket count + source fingerprint — an in-place rewrite of
    * the source must rebuild) and published via [[AtomicDir.publishOnce]],
    * so a concurrent Verify/Bench JVM reuses the published files instead
    * of overwriting them under a reader mid-scan. Bucket METADATA lives in
    * the in-memory catalog, so each SESSION registers its own tables over
    * the published location (`CREATE TABLE … CLUSTERED BY … LOCATION` —
    * bucket ids ride in the parquet file names, which is how Spark maps
    * files to buckets at read time). Returns (lineitemTable, ordersTable)
    * catalog names.
    *
    * `numBuckets = 0` (the default) derives the count from the source size
    * via [[autoBuckets]]; pass an explicit count to pin a layout.
    */
  /** EXPLICIT session contract for the Sort-free bucketed join — call it
    * once per session that queries this layout (the `q_join_bucketed`
    * gate does; a co-resident workload that wants the conservative
    * planner default simply doesn't):
    *
    * Spark reports a bucketed scan's SORT ordering only behind
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` (off by default
    * since 3.0 because it is wrong when a bucket holds multiple files —
    * pre-2.4 assumed sorted regardless). [[ensureFactBuckets]]'s layout
    * guarantees exactly ONE file per bucket by construction (repartition
    * by the bucket key into nB partitions before the bucketed write), so
    * the ordering is genuinely true and the flag lets the recurring join
    * skip the per-query Sort of both fact sides, not just the Exchange.
    * The flag CANNOT manufacture wrong results for other tables: with it
    * on, FileSourceScanExec claims a sort order only when every bucket
    * holds at most one file (its singleFilePartitions check), so a
    * multi-file bucketed table elsewhere in the session keeps getting
    * its Sort. The only externally-visible effect is plan shape.
    *
    * This is a named, documented session mutation — deliberately NOT
    * hidden inside [[ensureFactBuckets]] (a library silently flipping a
    * session legacy flag surprises co-resident workloads); returns the
    * prior value so a caller that wants scoping can restore it.
    */
  def enableSortedBucketScan(spark: SparkSession): Option[String] = {
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    prior
  }

  def ensureFactBuckets(spark: SparkSession, dir: String,
                        numBuckets: Int = 0): (String, String) = {
    val nB = if (numBuckets > 0) numBuckets else autoBuckets(dir)
    val layoutKey = s"v3|$dir|$nB|" +
      s"${sourceFingerprint(dir, "lineitem")}|${sourceFingerprint(dir, "orders")}"
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(layoutKey.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$h"
    val (li, ord) = (s"graft_b_lineitem_$h", s"graft_b_orders_$h")
    val tables = Seq(("lineitem", "l_orderkey", li), ("orders", "o_orderkey", ord))
    factBuilt.getOrElseUpdate(s"${graft.SessionIds.of(spark)}|$layoutKey", {
      AtomicDir.publishOnce(base) { tmp =>
        // saveAsTable is the only public API that writes bucket-id file
        // names, so the files are written through throwaway catalog
        // entries pointing at the pre-publish tmp path, dropped right
        // after — the durable artifact is the file layout alone
        val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        tables.foreach { case (t, bk, _) =>
          val tmpName = s"graft_wb_${t}_$tag"
          // ONE file per bucket, sorted by the bucket key: repartition by
          // the key into exactly nB partitions (repartition's
          // HashPartitioning is the same murmur3-pmod as the bucket spec,
          // so each task holds exactly one bucket's rows) and record the
          // sort in the bucket metadata. With one sorted file per bucket
          // the scan reports its ordering, so a recurring key-join skips
          // the SORT as well as the Exchange — without this, both sides
          // still sort 60M rows per join and the saved shuffle is noise
          // at probe scale (the r10-r12 0.985x advantage artifact).
          writeBucketed(
            graft.Tables.table(spark, dir, t)
              .repartition(nB, org.apache.spark.sql.functions.col(bk)),
            tmpName, bk, nB, sortCols = Seq(bk), path = Some(s"$tmp/$t"))
          spark.sql(s"DROP TABLE IF EXISTS $tmpName")
        }
      }
      tables.foreach { case (t, bk, name) =>
        val cols = graft.Tables.table(spark, dir, t).schema.toDDL
        // SORTED BY mirrors the write-side sortBy — the catalog carries
        // the ordering, the scan reports it, the join's Sort disappears
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS $name ($cols) USING parquet
             |CLUSTERED BY ($bk) SORTED BY ($bk) INTO $nB BUCKETS
             |LOCATION '$base/$t'""".stripMargin)
      }
      (li, ord)
    })
  }
}
