package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Ingest, StreamOps}

/** Streaming parity (SURVEY §5.2): each StreamOps operator's streamed result
  * equals its batch result on the same data; watermarks drop late data.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf = Tables.table(spark, sf(), "events")
    .select(col("ts"), col("user_id"), col("event_type"), col("value"))

  /** Replays a batch DF through a file-based stream in N chunks and runs
    * `op` over it with a memory sink; returns the final result as a DF.
    */
  private def streamed(name: String, chunks: Int = 4)(
      op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory(s"graft_stream_$name").toString
    // time-contiguous chunks, one file each: replay preserves event-time order
    // so the watermark never drops on-time data (session windows filter
    // pre-watermark rows even in complete mode).
    val batch = eventsDf.withColumn("part",
      ntile(chunks).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to chunks).foreach { i =>
      batch.filter(col("part") === i).drop("part").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/chunk=$i")
    }
    // re-read as a stream: one file group per trigger
    val src = spark.readStream.schema(eventsDf.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/chunk=*")
    val q = op(src).writeStream.outputMode("complete")
      .format("memory").queryName(s"out_$name")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(s"out_$name")
  }

  test("tumbling counts: stream result == batch result") {
    val got = streamed("tumbling")(df => StreamOps.tumblingCounts(df))
      .orderBy("t").collect()
    val want = StreamOps.tumblingCounts(eventsDf).orderBy("t").collect()
    assert(got.sameElements(want))
  }

  test("sliding sum: stream result == batch result") {
    val got = streamed("sliding")(df => StreamOps.slidingSum(df, "value"))
      .orderBy("t").collect()
    val want = StreamOps.slidingSum(eventsDf, "value").orderBy("t").collect()
    assert(got.sameElements(want))
  }

  test("session windows: stream result == batch result") {
    val got = streamed("session")(df => StreamOps.sessionCounts(df, "user_id"))
      .orderBy("session_start", "user_id").collect()
    val want = StreamOps.sessionCounts(eventsDf, "user_id")
      .orderBy("session_start", "user_id").collect()
    assert(got.sameElements(want))
  }

  test("watermark drops late data in append mode (FIXTURES.md §B.4)") {
    // Two separate AvailableNow runs over one checkpoint: run 1 sees only the
    // on-time file and advances the watermark to 11:00 (persisted); run 2 sees
    // the late arrival, which must be dropped before the 10:00 window emits.
    // (Batch boundaries within a single run are not deterministic enough —
    // the file source may coalesce files into one batch.)
    val dir = Files.createTempDirectory("graft_late").toString
    val out = Files.createTempDirectory("graft_late_out").toString
    val ck = Files.createTempDirectory("graft_late_ck").toString
    def write(i: Int, rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/f=$i")
    def t(s: String) = Timestamp.valueOf(s)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(s"$dir/f=*")
      val agg = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("wstart"), col("cnt"))
      val q = agg.writeStream.outputMode("append")
        .option("checkpointLocation", ck).format("parquet")
        .option("path", out).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: events up to 12:00 → watermark (1h) persists at 11:00
    write(0, Seq((t("2024-01-01 10:10:00"), 1L), (t("2024-01-01 12:00:00"), 1L)))
    runOnce()
    // run 2: an arrival below the restored watermark (10:00:01 < 11:00) →
    // dropped; the closing 10:00 window must contain ONLY the on-time event
    write(1, Seq((t("2024-01-01 10:00:01"), 2L)))
    runOnce()
    val emitted = spark.read.parquet(out)
      .select(col("wstart").cast("string"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(emitted.get("2024-01-01 10:00:00").contains(1L),
      s"late row leaked into closed window: $emitted")
  }

  test("stream-stream interval join: stream result == batch result") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    // time-contiguous single-file chunks (same discipline as streamed())
    val ev = eventsDf
    val batchL = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("uid"), col("ts").as("lts"))
    val batchR = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("uid"), col("ts").as("rts"))
    val chunked = ev.withColumn("part",
      ntile(3).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 3).foreach { i =>
      chunked.filter(col("part") === i).drop("part").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/chunk=$i")
    }
    val src = spark.readStream.schema(eventsDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/chunk=*")
    val sl = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("uid"), col("ts").as("lts"))
    val sr = src.filter(col("event_type") === "error")
      .select(col("user_id").as("uid"), col("ts").as("rts"))
    val q = StreamOps.intervalJoin(sl, sr, "uid")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ssj_out").orderBy("uid", "lts", "rts").collect()
    val want = batchL.join(batchR,
        batchL("uid") === batchR("uid") &&
          col("rts") >= col("lts") &&
          col("rts") <= col("lts") + expr("INTERVAL 30 minutes"))
      .drop(batchR("uid"))
      .orderBy("uid", "lts", "rts").collect()
    assert(got.nonEmpty, "interval join produced no pairs — fixture too sparse")
    assert(got.sameElements(want))
  }

  test("stream dedup drops duplicate keys within the watermark horizon") {
    val dir = Files.createTempDirectory("graft_dedup").toString
    def t(s: String) = Timestamp.valueOf(s)
    Seq((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:00:00"), 1L),
      (t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:05:00"), 2L))
      .toDF("ts", "user_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/f=0")
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType))))
      .parquet(s"$dir/f=*")
    val q = StreamOps.dedup(src, Seq("user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("dedup_out").count() == 2)
  }

  test("custom-state sessionization emits on event-time timeout only") {
    val dir = Files.createTempDirectory("graft_sess").toString
    val out = Files.createTempDirectory("graft_sess_out").toString
    val ck = Files.createTempDirectory("graft_sess_ck").toString
    def t(s: String) = Timestamp.valueOf(s)
    def write(i: Int, rows: Seq[(Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/f=$i")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(s"$dir/f=*")
        .as[(Timestamp, Long)]
      val q = StreamOps.sessionizeCustomState(src, gapMinutes = 30)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck).format("parquet")
        .option("path", out).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: user 1 has two events; user 2 one recent event. No session closes
    // yet (watermark 10 min behind 11:50 max).
    write(0, Seq((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:05:00"), 1L),
      (t("2024-01-01 11:50:00"), 2L)))
    runOnce()
    // run 2: a later event advances the watermark past user 1's and user 2's
    // 30-minute gap timeouts → both sessions emit; user 3 stays open.
    write(1, Seq((t("2024-01-01 13:30:00"), 3L)))
    runOnce()
    val sessions = spark.read.parquet(out).as[StreamOps.SessionSummary]
      .collect().map(s => s.user_id -> s).toMap
    assert(sessions(1L).n_events == 2L, s"got $sessions")
    assert(sessions(1L).last_event_ms == t("2024-01-01 10:05:00").getTime)
    assert(sessions(2L).n_events == 1L)
    assert(!sessions.contains(3L), "open session must not emit")
  }

  test("end-to-end ingest: stream of log files → partitioned parquet store") {
    val in = Files.createTempDirectory("graft_in").toString
    val out = Files.createTempDirectory("graft_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    Files.writeString(java.nio.file.Paths.get(in, "a.log"),
      """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""" + "\n" +
        """10.0.0.2 - - [07/Apr/2020:09:00:00 -0400] "GET /b HTTP/1.1" 404 50 "-" "c" "-"""")
    val q = Ingest.start(spark, in, out, ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.filter(col("response") === 404).count() == 1)
    val parts = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("logdate=")).sorted
    assert(parts.toSeq == Seq("logdate=2020-04-06", "logdate=2020-04-07"))
  }
}
