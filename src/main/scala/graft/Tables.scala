package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic testdata tables (TESTDATA.md) plus
  * the schema constants for the nginx access-log table — the Spark analog of
  * the reference's ClickHouse DDL (`/root/reference/nginx.click:1`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Loads a testdata table, normalizing `events.ts` across the timestamp
    * flavors the driver's generator has shipped:
    *  - nanosecond-as-long parquet (sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true`; the ns value is
    *    truncated here to a µs timestamp, the exact truncation DuckDB
    *    applies casting TIMESTAMP_NS → TIMESTAMP — FIXTURES.md);
    *  - tz-naive µs parquet, which Spark ≥3.4 infers as TIMESTAMP_NTZ by
    *    default: NTZ inference is disabled per-read (data-source option)
    *    so the column lands as plain TIMESTAMP — sessions run in UTC, so
    *    the wall-clock values match what DuckDB reads, and ts predicates
    *    still push down to the scan natively. The cast fallback below
    *    covers a FOREIGN session (the driver's own) where the conf was
    *    captured by an earlier read of the same files.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every timestamp column in the generated tables is tz-naive µs
    // (o_orderdate / l_shipdate / events.ts) — read them all as TIMESTAMP.
    // Scoped to THIS read via the data-source option: a session-conf set
    // here would leak into the caller's session and silently change NTZ
    // inference for all its later parquet reads (r9 ADVICE).
    val df = spark.read.option("inferTimestampNTZ", "false")
      .parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast(org.apache.spark.sql.types.TimestampType))
    else df
  }

  /** SURVEY §3.2 bootstrap: registers every testdata table as a temp view so
    * the full `spark.sql(...)` surface works verbatim (the ClickHouse DDL
    * analog — a driver-only catalog operation, no data movement), and
    * registers the graft native functions for SQL use.
    */
  def bootstrap(spark: SparkSession, dir: String): Unit = {
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    graft.operators.Dedup.register(spark)
    graft.expressions.AccessLogParseExpr.register(spark)
    graft.expressions.VectorOps.register(spark)
    graft.expressions.LshPlanes.register(spark)
    graft.plans.AsOf.register(spark)
  }

  /** `events` with a time-range predicate pushed to the parquet scan.
    * The ns→µs conversion wraps `ts` in a function, which defeats parquet
    * row-group skipping; the conversion is monotone, so an equivalent raw-ns
    * range filter is applied UNDER the conversion — `.explain` then shows
    * `PushedFilters: [GreaterThanOrEqual(ts,...), LessThanOrEqual(ts,...)]`.
    * At 100 TB this is the difference between scanning a day and a year.
    */
  def eventsTimeFiltered(spark: SparkSession, dir: String,
                         fromUtc: String, toUtc: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val fromUs = java.time.LocalDateTime.parse(fromUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val toUs = java.time.LocalDateTime.parse(toUtc.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val df = spark.read.option("inferTimestampNTZ", "false")
      .parquet(s"$dir/events.parquet")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.filter(col("ts") >= fromUs * 1000L && col("ts") <= toUs * 1000L + 999L)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      // foreign-session fallback (see `table`): range-filter in NTZ space —
      // pushdown-friendly — then cast the surviving rows to TIMESTAMP
      df.filter(col("ts").between(
          lit(fromUtc).cast("timestamp_ntz"), lit(toUtc).cast("timestamp_ntz")))
        .withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    else
      df.filter(col("ts").between(
        lit(fromUtc).cast("timestamp"), lit(toUtc).cast("timestamp")))
  }

  import org.apache.spark.sql.types._

  /** Typed output schema of the ingest pipeline — mirrors the 16-column
    * ClickHouse table `/root/reference/nginx.click:1` (`README.md:248-271`),
    * with `response UInt16 → IntegerType` and `bytes UInt64 → LongType`
    * (SURVEY §1.2), plus the additive `tz` retention and `_corrupt` flag
    * (SURVEY §2.A R4/R7).
    */
  val accessLogSchema: StructType = StructType(Seq(
    StructField("logdate", DateType),
    StructField("logdatetime", TimestampType),
    StructField("hostname", StringType),
    StructField("syslogtag", StringType),
    StructField("message", StringType),
    StructField("clientip", StringType),
    StructField("ident", StringType),
    StructField("auth", StringType),
    StructField("verb", StringType),
    StructField("request", StringType),
    StructField("httpv", StringType),
    StructField("response", IntegerType),
    StructField("bytes", LongType),
    StructField("referrer", StringType),
    StructField("agent", StringType),
    StructField("blob", StringType),
    StructField("tz", StringType),
    StructField("_corrupt", BooleanType)))
}
