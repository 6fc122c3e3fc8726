/** Fleet-wall diagnostic (VERDICT r7 #1): runs the 7-gate streaming fleet
  * repeatedly under alternating state widths and dumps, per gate, the wall
  * charged by the bench, the delay from fleet start to the gate's first
  * micro-batch, and every micro-batch's durationMs breakdown — so "where do
  * the 26 s go" is answered by measurement instead of guesswork.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain FleetProbe [w1,w2,...]"
  * (widths default to 4,8,4,8 — alternating so host drift can't masquerade
  * as a width effect). Session config mirrors graft.Bench exactly.
  */
object FleetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    System.setProperty("graft.streamgate.fleet", "true")
    val spark = org.apache.spark.sql.SparkSession.builder()
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
    import org.apache.spark.sql.functions._
    // the same streaming warmup Bench runs, so rep 1 here sees what the
    // official run's fleet sees
    try {
      val warmIn = java.nio.file.Files.createTempDirectory("graft_warm_stream")
      spark.range(2).select(
          expr("timestamp_micros(1704067200000000 + id * 1800000000)").as("ts"),
          col("id").as("v"))
        .repartition(2).write.mode("overwrite").parquet(warmIn.toString)
      (1 to 2).foreach { _ =>
        val ck = java.nio.file.Files.createTempDirectory("graft_warm_ck")
        spark.readStream.schema("ts timestamp, v bigint")
          .option("maxFilesPerTrigger", 1).parquet(warmIn.toString)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour")).count()
          .writeStream.outputMode("update")
          .option("checkpointLocation", ck.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("noop").start().awaitTermination()
      }
    } catch { case _: Throwable => () }
    val widths = args.headOption.getOrElse("4,8,4,8").split(",").toSeq
    widths.zipWithIndex.foreach { case (w, rep) =>
      System.setProperty("graft.streamgate.fleetWidth", w)
      graft.queries.StreamGate.resetFleetCache()
      val t0 = System.nanoTime()
      val dfs = graft.queries.StreamGate.queries
        .map { case (n, fn) => n -> fn(spark, sfDir) }
      dfs.foreach(_._2.write.mode("overwrite").format("noop").save())
      val wall = (System.nanoTime() - t0) / 1e9
      val fleetT0 = graft.queries.StreamGate.fleetStartMillis.get()
      println(f"== rep $rep width $w: fleet wall $wall%.2f s")
      graft.queries.StreamGate.fleetGateSeconds.toSeq.sortBy(-_._2)
        .foreach { case (g, secs) =>
          val tl = graft.queries.StreamGate.batchTimeline.getOrElse(g, Nil)
          val firstDelta = tl.headOption
            .map(b => (b._2 - fleetT0) / 1e3).getOrElse(-1.0)
          println(f"  $g%-18s ${secs}%6.2f s  first-batch +$firstDelta%5.2f s")
          tl.foreach { case (bid, ts, rows, dur) =>
            val d = dur.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString(" ")
            println(f"    b$bid +${(ts - fleetT0) / 1e3}%5.2f s rows=$rows $d")
          }
        }
    }
    spark.stop()
  }
}
