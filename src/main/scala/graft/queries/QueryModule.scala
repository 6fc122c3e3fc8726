package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A family of declared queries: each entry pairs a Spark implementation with
  * (optionally) a DuckDB oracle SQL over the same parquet tables.
  * Determinism contract (SURVEY §2.B): total ORDER BY on a unique key set,
  * ROUND(x,4) on double aggregates, identical column aliases in both engines.
  */
trait QueryModule {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Seq[(String, QFn)]
  def oracle: Seq[(String, String)]

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.table(spark, dir, name)
}
