package graft.storage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (NOT a declared query; deleted before round
  * end or kept uncommitted): times the store-commit path phase by phase
  * so optimization targets the real cost, not a guess.
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val orders = t("load orders")(graft.Tables.table(spark, sfDir, "orders"))
    t("warm count")(orders.count())

    // ---- repeat the q_snapshot_count fixture shape, phase-timed
    (1 to 2).foreach { round =>
      println(s"--- round $round (second round = warm JIT)")
      val dir = java.nio.file.Files.createTempDirectory("graft_probe")
        .toString + "/orders_probe"
      val k = col("o_orderkey")
      val mx = t("agg max")(orders.agg(max(k)).head().getLong(0))
      val (q1, q3) = (mx / 4, 3 * mx / 4)
      t("write (v1)")(SnapshotStore.write(orders.filter(k <= q1),
        dir, "o_orderpriority", statsCols = Seq("o_orderkey")))
      t("append (v2)")(SnapshotStore.append(
        orders.filter(k > q1 && k <= mx / 2), dir, "o_orderpriority"))
      t("append (v3)")(SnapshotStore.append(
        orders.filter(k > mx / 2 && k <= q3), dir, "o_orderpriority"))
      t("append (v4)")(SnapshotStore.append(orders.filter(k > q3),
        dir, "o_orderpriority"))
      t("countWhere full")(SnapshotStore.countWhereDetailed(
        spark, dir, lit(true)))
      t("countWhere mid")(SnapshotStore.countWhereDetailed(
        spark, dir, k > q1 && k <= q3))

      // ---- micro-phases of one more append
      println("--- micro-phases of one append (v5)")
      val df5 = orders.filter(k <= q1 / 2)
      val gen = "gen-probemicro0001"
      val genPath = s"$dir/data/$gen"
      t("  writeTo: repartition+sort+write") {
        df5.withColumn("_p",
            SnapshotStore.partKeyExpr(Seq("o_orderpriority")))
          .repartition(col("_p"))
          .sortWithinPartitions(col("_p"))
          .write.mode("overwrite")
          .option("compression", "zstd").partitionBy("_p")
          .parquet(genPath)
      }
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      t("  listStatus") {
        fs.listStatus(new org.apache.hadoop.fs.Path(genPath))
          .map(_.getPath.getName).count(_.startsWith("_p="))
      }
      t("  bloom buildFor (none declared)") {
        SnapshotBloom.buildFor(spark, dir, gen,
          SnapshotBloom.bloomColsOf(spark, dir))
      }
      t("  genStats") {
        SnapshotStore.genStats(spark, dir, gen, Seq("o_orderkey"))
      }
      t("  genStats again (page-hot)") {
        SnapshotStore.genStats(spark, dir, gen, Seq("o_orderkey"))
      }
      // inside genStats: the two reads
      t("  read.parquet(.schema) probe") {
        spark.read.parquet(genPath).schema
      }
      t("  statsColsOf + headVersion") {
        SnapshotStore.statsColsOf(spark, dir)
        SnapshotStore.headVersion(spark, dir)
      }
      // what would a bloom-declared commit add?
      t("  bloom filter agg (1 col)") {
        val df = spark.read.parquet(genPath)
        val rows = df.count()
        df.select(col("o_orderkey").cast("string").as("c"))
          .stat.bloomFilter("c", math.max(64L, math.min(rows, 8000000L)), 0.01)
      }
    }
    spark.stop()
  }
}
