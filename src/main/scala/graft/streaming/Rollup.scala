package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous pre-aggregation store — the ClickHouse materialized-view
  * analog for the R12 dashboards. At 100 TB a Grafana panel must not scan
  * raw events per refresh; instead the stream maintains the tumbling-count
  * rollup incrementally and panels read O(hours) rollup rows.
  *
  * Append output mode + watermark: a window row is emitted exactly once,
  * when the watermark closes it — so the parquet rollup store is append-only
  * and replay-safe (the file sink's transaction log gives exactly-once
  * files). Freshness lags by the watermark (the declared late-data bound),
  * which is the correct dashboard trade at scale: closed buckets are final,
  * the in-flight bucket is served by a cheap raw-tail query if needed.
  */
object Rollup {

  /** Starts the continuous hourly-count rollup of `events` into `outDir`. */
  def start(events: DataFrame, outDir: String, checkpointDir: String,
            window_ : String = "1 hour", watermark: String = "2 hours",
            trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    StreamOps.tumblingCounts(events, "ts", window_, watermark)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet").option("path", outDir)
      .trigger(trigger)
      .start()

  /** The dashboard-side read: closed window buckets, ordered. */
  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).orderBy(col("t"))
}
