package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Extended, LogPipeline, MediaOps, NearDup, Relational, Retrieval, SimilarityOps, StreamGate, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared query pairs a Spark implementation with (when expressible)
  * a DuckDB oracle over the same parquet tables; names and column aliases
  * match across engines (the driver hash-compares values per sorted column).
  */
object SparkEntry {
  /** Single source of truth for the module roster — CoverageGen reads it
    * so the generated inventory can't drift from the declared contract. */
  val namedModules: Seq[(String, graft.queries.QueryModule)] = Seq(
    "Relational" -> Relational, "Extended" -> Extended,
    "LogPipeline" -> LogPipeline, "TextOps" -> TextOps,
    "NearDup" -> NearDup, "SimilarityOps" -> SimilarityOps,
    "Retrieval" -> Retrieval, "MediaOps" -> MediaOps,
    "StreamGate" -> StreamGate)
  private val modules: Seq[graft.queries.QueryModule] = namedModules.map(_._2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H Q1-shaped hash aggregate (R13) — chosen because it runs under
    * any session config (the events table needs the nanosAsLong conf that
    * Verify/Bench sessions set for themselves).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (approx sketches,
    * engine-specific hash permutations) → driver records a rows-only check.
    */
  val oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
