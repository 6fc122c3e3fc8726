package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Driver-visible streaming queries: each entry executes a REAL Structured
  * Streaming job (file source → watermarked stateful aggregate → sink) over
  * the round's test tables and returns the final result as a batch
  * DataFrame, so the streaming family goes through the same oracle-hash
  * gate as every batch operator instead of living only in ScalaTest parity
  * checks.
  *
  * `s_tumbling_counts` is the R12 dashboard query
  * (`/root/reference/README.md:279-286`) as a stream: the events table is
  * re-chunked into four files consumed one per micro-batch
  * (`maxFilesPerTrigger=1`), so the aggregation genuinely crosses batch
  * boundaries and exercises state-store merge — then the complete-mode
  * result must hash-match the SAME DuckDB oracle as the batch
  * `q_timeseries_count`.
  */
object StreamGate extends QueryModule {

  def queries: Seq[(String, QFn)] = Seq(
    "s_tumbling_counts" -> ((s, d) => {
      // only ts matters for the count: a 1-column replay source keeps the
      // re-chunk write narrow (no global sort, no extra columns)
      val ev = t(s, d, "events").select("ts")
      val in = Files.createTempDirectory("graft_sgate_in").toString
      val ck = Files.createTempDirectory("graft_sgate_ck").toString
      // four hash chunks → four micro-batches; every window's rows are
      // spread across ALL chunks, so each window's aggregate genuinely
      // merges state from every batch
      ev.withColumn("part", pmod(xxhash64(col("ts")), lit(4)))
        .repartition(4, col("part"))
        .write.partitionBy("part").mode("overwrite").parquet(in)
      val src = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/part=*")
      // complete-mode memory sink: the final table IS the full aggregate
      // (720 windows — driver-bounded by construction); the durable-sink
      // path (foreachBatch parquet/JDBC) is covered by StreamingSpec's
      // golden-artifact and JdbcSink tests
      val name = "sg_" + java.util.UUID.randomUUID.toString.replace("-", "")
      // Size the STATE layout to the key cardinality: the aggregate holds
      // ~720 hour-windows, so 32 state partitions would pay 32 store
      // commits per micro-batch for near-empty stores. The stream pins its
      // state partitioning from this conf at first start (it lives in the
      // checkpoint thereafter); restore the session value right after.
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      val q = try {
        s.conf.set("spark.sql.shuffle.partitions", "8")
        StreamOps.tumblingCounts(src).writeStream
          .outputMode("complete")
          .option("checkpointLocation", ck)
          .format("memory").queryName(name)
          .trigger(Trigger.AvailableNow()).start()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      q.awaitTermination()
      s.table(name)
        .select(col("t").cast("timestamp_ntz").as("t"), col("cnt"))
        .orderBy(col("t"))
    }))

  // window('1 hour').start ≡ date_trunc('hour', ts): the stream shares the
  // batch dashboard query's oracle verbatim (full hash check, not rows-only).
  def oracle: Seq[(String, String)] = Seq(
    "s_tumbling_counts" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t, count(*) AS cnt
        |FROM events GROUP BY t ORDER BY t""".stripMargin)
}
