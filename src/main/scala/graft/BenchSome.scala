package graft

import org.apache.spark.sql.SparkSession

/** Scratch: times a comma-separated subset of declared queries with the
  * Bench session + repeat discipline — for fast optimization iterations
  * (the full Bench run is ~25 min). Not a driver surface.
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption.getOrElse("q_snapshot_count").split(",").toSeq
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_BENCH_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { n =>
      try graft.Tables.table(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    def runOnce(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[benchsome] $name failed: ${e.getMessage}")
      }
      val s = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      s
    }
    val profile = sys.env.get("GRAFT_BENCH_PROFILE").contains("true")
    val jobs = new java.util.concurrent.ConcurrentHashMap[
      Int, (String, Long, Long)]() // id -> (desc, t0, t1)
    if (profile) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(js.stageInfos.lastOption.map(si =>
              si.name + " [" + js.stageInfos.map(_.numTasks).sum + " tasks/" +
                js.stageInfos.size + " stages]"))
            .getOrElse("?")
          jobs.put(js.jobId, (d, js.time, -1L))
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val prev = jobs.get(je.jobId)
          if (prev != null)
            jobs.put(je.jobId, (prev._1, prev._2, je.time))
        }
      })
    names.foreach { name =>
      if (profile) {
        jobs.clear()
        val t = runOnce(name)
        println(f"[benchsome] $name%-28s $t%7.3f s — per-job:")
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1).foreach { case (id, (d, t0, t1)) =>
          val ms = if (t1 > 0) t1 - t0 else -1
          println(f"[benchsome]   job $id%3d ${ms}%6d ms  ${d.take(110)}")
        }
      } else {
        val first = runOnce(name)
        val official =
          if (first < 2.0)
            (first +: (1 to 2).map(_ => runOnce(name))).sorted.apply(1)
          else math.min(first, runOnce(name))
        println(
          f"[benchsome] $name%-28s $official%7.3f s (first $first%7.3f)")
      }
    }
    spark.stop()
  }
}
