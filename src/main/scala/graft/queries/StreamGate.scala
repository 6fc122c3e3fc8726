package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Driver-visible streaming queries: each entry executes a REAL Structured
  * Streaming job (file source → watermarked stateful aggregate → foreachBatch
  * sink) over the round's test tables and returns the final artifact as a
  * batch DataFrame, so the streaming family goes through the same
  * oracle-hash gate as every batch operator instead of living only in
  * ScalaTest parity checks.
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
      val ev = t(s, d, "events").select("ts", "event_type", "user_id")
      val in = Files.createTempDirectory("graft_sgate_in").toString
      val out = Files.createTempDirectory("graft_sgate_out").toString
      val ck = Files.createTempDirectory("graft_sgate_ck").toString
      // four time-ordered chunks → four micro-batches; windows span chunk
      // boundaries so partial aggregates really merge across batches
      ev.withColumn("part", ntile(4).over(
          org.apache.spark.sql.expressions.Window.orderBy("ts")))
        .repartition(col("part"))
        .write.partitionBy("part").mode("overwrite").parquet(in)
      val src = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$in/part=*")
      val q = StreamOps.tumblingCounts(src).writeStream
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("overwrite").parquet(out)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out)
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
