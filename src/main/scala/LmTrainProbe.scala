package graft

/** Variance profiler for the one-time `q_lm_perplexity_bc` train pass (r9
  * VERDICT next-round #5: the 100× train wall swung 2.5–16 s across probe
  * runs with host state, unexplained). Runs the extracted
  * [[graft.queries.TextOps.trainLmModel]] repeatedly over the same 100×
  * corpus (500k docs) and attributes each run's wall to its sub-steps —
  * bigram_agg (the corpus scan + pair-count shuffle), top_b (the
  * driver-merged TakeOrdered of 262144 pairs), top_v (context re-agg +
  * TakeOrdered), vocab (count_distinct scan) — alongside the JVM's GC time
  * delta, so a swing separates into: host slowness (all steps inflate
  * together), driver GC (gc_delta tracks the swing), or a skewed/spilling
  * stage (one step owns it).
  */
object LmTrainProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rounds = if (args.nonEmpty) args(0).toInt else 4
    val docs = Tables.table(spark, "/root/testdata/sf0.1", "documents")
    val d100 = (0 until 100).map { k =>
      docs.select((col("doc_id") + k * 1000000L).as("doc_id"),
        concat(lit(s"v$k "), col("text")).as("text"))
    }.reduce(_ union _)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lmtrain").toString
    d100.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    (1 to rounds).foreach { r =>
      val t = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      val (cb, cw, v) = graft.queries.TextOps.trainLmModel(
        corpus, topV = 65536, topB = 262144, timings = t)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE lm_train_round$r wall=$wall%.2f s " +
        t.map { case (k, s) => f"$k=$s%.2f" }.mkString(" ") +
        f" gc_delta=${gcMillis - gc0} ms" +
        s" (model ${cb.size} pairs / ${cw.size} contexts / vocab $v)")
    }
    spark.stop()
  }
}
