package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query subset — dev-loop filter;
    // the driver always passes two args and gets the full set]
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None
    // Verify evaluates the FULL query set, so the streaming gates run as one
    // concurrent fleet (seven real streams started together) instead of
    // paying seven serial stream-start floors — see StreamGate.runFleet.
    System.setProperty("graft.streamgate.fleet", "true")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Classic (non-ANSI) eval: invalid casts/parses yield NULL, matching the
      // reference's permissive ClickHouse insert-cast semantics (SURVEY R8)
      // and the TRY_CAST forms used in the DuckDB oracle SQL.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Write µs-precision timestamps (not INT96) so the driver's DuckDB/arrow
      // readers see the same values Spark computed.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // r18 (optimization guide §2.2/§3.1/§9): let AQE actually coalesce
      // tiny post-shuffle partitions (parallelismFirst keeps the local
      // default parallelism otherwise — the docs recommend false), and
      // let the planner pick a shuffled hash join when its size gates
      // hold (sort-merge stays the fallback). Result-preserving.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators persist() intermediates for within-query reuse; drop them
      // between queries so a long session's cache stays bounded
      spark.sharedState.cacheManager.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
