package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{Ingest, JdbcSink, StreamOps, Syslog, SyslogSpool}

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
    // run 1: user 1 has two events plus a third past the 30-min gap — the
    // IN-BATCH split must close the first session immediately (no waiting
    // for a timeout); user 2 has one recent event that stays open.
    write(0, Seq((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:05:00"), 1L),
      (t("2024-01-01 11:50:00"), 1L), (t("2024-01-01 11:50:00"), 2L)))
    runOnce()
    val afterRun1 = spark.read.parquet(out).as[StreamOps.SessionOut]
      .collect().map(s => s.user_id -> s).toMap
    assert(afterRun1.keySet == Set(1L), s"in-batch split must emit: $afterRun1")
    assert(afterRun1(1L).n_events == 2L &&
      afterRun1(1L).first_us == t("2024-01-01 10:00:00").getTime * 1000L &&
      afterRun1(1L).last_us == t("2024-01-01 10:05:00").getTime * 1000L)
    // run 2: a later event advances the watermark past user 1's and user 2's
    // gap timeouts → both trailing sessions emit; user 3 stays open.
    write(1, Seq((t("2024-01-01 13:30:00"), 3L)))
    runOnce()
    val sessions = spark.read.parquet(out).as[StreamOps.SessionOut]
      .collect().groupBy(_.user_id)
    assert(sessions(1L).map(_.n_events).sorted.toSeq == Seq(1L, 2L),
      s"got $sessions")
    assert(sessions(2L).head.n_events == 1L)
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
    val back = Ingest.readStore(spark, out)
    assert(back.count() == 2)
    assert(back.filter(col("response") === 404).count() == 1)
    // idempotence layout: each micro-batch owns a batch=<id> dir with the
    // date partitions nested inside
    val batches = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted
    assert(batches.nonEmpty, "expected per-batch idempotence directories")
    val parts = new java.io.File(s"$out/${batches.head}").listFiles()
      .map(_.getName).filter(_.startsWith("logdate=")).sorted
    assert(parts.toSeq == Seq("logdate=2020-04-06", "logdate=2020-04-07"))
  }

  test("golden artifact: streamed tumblingCounts == batch q_timeseries_count") {
    val dir = Files.createTempDirectory("graft_golden_in").toString
    val golden = Files.createTempDirectory("graft_golden_out").toString
    val ck = Files.createTempDirectory("graft_golden_ck").toString
    val batch = eventsDf.withColumn("part",
      ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy("ts")))
    (1 to 4).foreach { i =>
      batch.filter(col("part") === i).drop("part").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/chunk=$i")
    }
    val src = spark.readStream.schema(eventsDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/chunk=*")
    // complete-mode foreachBatch overwrite: the final batch leaves the full
    // aggregate as a parquet artifact (and every replay is idempotent)
    val q = StreamOps.tumblingCounts(src).writeStream.outputMode("complete")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("overwrite").parquet(golden)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(golden)
      .select(col("t").cast("string"), col("cnt")).orderBy("t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = SparkEntry.queries("q_timeseries_count")(spark, sf())
      .select(col("t").cast("string"), col("cnt")).orderBy("t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.sameElements(want),
      s"stream artifact diverged: got ${got.take(3).toSeq} want ${want.take(3).toSeq}")
  }

  test("rollup store: closed windows land append-only and match batch counts") {
    val dir = Files.createTempDirectory("graft_rollup_in").toString
    val out = Files.createTempDirectory("graft_rollup_out").toString
    val ck = Files.createTempDirectory("graft_rollup_ck").toString
    def t(s: String) = Timestamp.valueOf(s)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(s"$dir/f=*")
      val q = graft.streaming.Rollup.start(src, out, ck,
        trigger = Trigger.AvailableNow())
      q.awaitTermination()
    }
    // run 1: two 10:xx events + one 12:05 event → watermark lands at 10:05,
    // nothing closed yet; run 2: a 15:00 event pushes the watermark past
    // 12:00 and 13:00, closing the 10:00 and 12:00 buckets
    Seq((t("2024-01-01 10:10:00"), 1L), (t("2024-01-01 10:40:00"), 2L),
      (t("2024-01-01 12:05:00"), 3L))
      .toDF("ts", "user_id").coalesce(1).write.mode("overwrite").parquet(s"$dir/f=0")
    runOnce()
    Seq((t("2024-01-01 15:00:00"), 4L))
      .toDF("ts", "user_id").coalesce(1).write.mode("overwrite").parquet(s"$dir/f=1")
    runOnce()
    val rolled = graft.streaming.Rollup.read(spark, out)
      .select(col("t").cast("string"), col("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rolled.get("2024-01-01 10:00:00").contains(2L), s"got $rolled")
    assert(rolled.get("2024-01-01 12:00:00").contains(1L), s"got $rolled")
    assert(!rolled.contains("2024-01-01 15:00:00"), "open bucket must not emit")
  }

  test("syslog envelope parse: RFC3164 and RFC5424 fields") {
    val rows = Seq(
      """<190>Apr  6 09:54:48 web01 nginx: GET-payload""",
      """<165>1 2020-04-06T09:54:48Z web02 nginx 1234 ID47 - payload-5424""",
      """garbage frame""")
      .toDF("line")
    val got = Syslog.parseEnvelope(rows.toDF()).collect()
    val r3 = got(0)
    assert(r3.getInt(0) == 23 && r3.getInt(1) == 6) // 190 = 23*8 + 6
    assert(r3.getTimestamp(2).toString == "2020-04-06 09:54:48.0")
    assert(r3.getString(3) == "web01" && r3.getString(4) == "nginx")
    assert(r3.getString(5) == "GET-payload" && !r3.getBoolean(6))
    val r5 = got(1)
    assert(r5.getInt(0) == 20 && r5.getInt(1) == 5) // 165 = 20*8 + 5
    assert(r5.getString(3) == "web02" && r5.getString(4) == "nginx")
    assert(r5.getString(5) == "payload-5424" && !r5.getBoolean(6))
    assert(got(2).getBoolean(6), "garbage frame must be sl_corrupt")
  }

  test("syslog transform parity: envelope-wrapped lines == direct ingest") {
    val raw = graft.operators.AccessLog.fixtureLines.map(_._2)
    val wrapped = raw.map(l => s"<190>Apr  6 09:54:48 web01 nginx: $l")
      .toDF("line")
    val got = Syslog.transform(wrapped)
      .drop("hostname").orderBy("message").collect()
    val want = graft.operators.AccessLog.project(raw.toDF("line"))
      .drop("hostname").orderBy("message").collect()
    assert(got.sameElements(want))
    // and the envelope hostname is per-message, not a constant
    val hosts = Syslog.transform(wrapped).select("hostname").distinct().collect()
    assert(hosts.map(_.getString(0)).toSeq == Seq("web01"))
  }

  test("kafka seam: fail-fast without connector; record projection feeds pipeline") {
    // This sandbox has no broker and no spark-sql-kafka jar (zero egress):
    // the availability probe must say so, and the source must fail at
    // CONSTRUCTION with deployment guidance — not at stream start with a
    // ClassNotFoundException from inside source resolution.
    assert(!Syslog.Kafka.connectorAvailable,
      "connector unexpectedly present — promote this test to a broker round-trip")
    val e = intercept[IllegalArgumentException](
      Syslog.from(spark, Syslog.Kafka("localhost:9092", "syslog")))
    assert(e.getMessage.contains("spark-sql-kafka"), e.getMessage)
    // The projection the source wires is real and covered: kafka-SHAPED
    // records (binary key/value + topic/partition/offset/timestamp) must
    // flow through the same transform as every other transport.
    val raw = graft.operators.AccessLog.fixtureLines.map(_._2)
    val records = raw.zipWithIndex.map { case (l, i) =>
      (Array.empty[Byte],
        s"<190>Apr  6 09:54:48 web01 nginx: $l".getBytes("UTF-8"),
        "syslog", 0, i.toLong, new java.sql.Timestamp(0L), 0)
    }.toDF("key", "value", "topic", "partition", "offset", "timestamp",
      "timestampType")
    val got = Syslog.transform(Syslog.Kafka.project(records))
      .drop("hostname").orderBy("message").collect()
    val want = graft.operators.AccessLog.project(raw.toDF("line"))
      .drop("hostname").orderBy("message").collect()
    assert(got.sameElements(want))
  }

  test("syslog TCP socket source ingests live frames end-to-end") {
    val server = new java.net.ServerSocket(0)
    @volatile var stop = false
    val writer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        val line = """<190>Apr  6 09:54:48 web01 nginx: """ +
          """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-""""
        while (!stop) { out.println(line); Thread.sleep(100) }
        sock.close()
      } catch { case _: Throwable => () }
    })
    writer.setDaemon(true); writer.start()
    val q = Syslog.transform(
        Syslog.fromSocket(spark, "localhost", server.getLocalPort))
      .writeStream.outputMode("append").format("memory").queryName("syslog_live")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("syslog_live").count() == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(500)
      val rows = spark.table("syslog_live")
      assert(rows.count() > 0, "no rows arrived over the socket within 60s")
      val r = rows.select("hostname", "response", "clientip").head
      assert(r.getString(0) == "web01")
      assert(r.getInt(1) == 200)
      assert(r.getString(2) == "127.0.0.1")
    } finally { stop = true; q.stop(); server.close() }
  }

  test("syslog UDP source round-trips RFC3164 frames end-to-end") {
    // Find a free UDP port (bind 0, read, close — racy only if something
    // grabs it in the microseconds before the stream rebinds).
    val probe = new java.net.DatagramSocket(0)
    val port = probe.getLocalPort
    probe.close()
    @volatile var stop = false
    val sender = new Thread(() => {
      try {
        val sock = new java.net.DatagramSocket()
        val addr = java.net.InetAddress.getByName("127.0.0.1")
        val line = """<190>Apr  6 09:54:48 web02 nginx: """ +
          """10.0.0.9 - - [06/Apr/2020:09:54:48 -0400] "GET /udp HTTP/1.1" 404 152 "-" "curl/7.29.0" "-""""
        val bytes = line.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        while (!stop) {
          sock.send(new java.net.DatagramPacket(bytes, bytes.length, addr, port))
          Thread.sleep(100)
        }
        sock.close()
      } catch { case _: Throwable => () }
    })
    sender.setDaemon(true); sender.start()
    val q = Syslog.transform(
        Syslog.from(spark, Syslog.Udp(port)))
      .writeStream.outputMode("append").format("memory").queryName("syslog_udp")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("syslog_udp").count() == 0 &&
        System.currentTimeMillis() < deadline) Thread.sleep(500)
      val rows = spark.table("syslog_udp")
      assert(rows.count() > 0, "no rows arrived over UDP within 60s")
      val r = rows.select("hostname", "response", "clientip", "request").head
      assert(r.getString(0) == "web02")
      assert(r.getInt(1) == 404)
      assert(r.getString(2) == "10.0.0.9")
      assert(r.getString(3).contains("/udp"))
    } finally { stop = true; q.stop() }
  }

  test("JDBC sink (Derby stand-in): micro-batch lands, replay is idempotent") {
    val in = Files.createTempDirectory("graft_jdbc_in").toString
    val ckpt = Files.createTempDirectory("graft_jdbc_ck").toString
    val db = Files.createTempDirectory("graft_jdbc_db").toString + "/clickdb"
    val url = s"jdbc:derby:$db;create=true"
    Files.writeString(java.nio.file.Paths.get(in, "a.log"),
      """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""" + "\n" +
        """10.0.0.2 - - [07/Apr/2020:09:00:00 -0400] "GET /b HTTP/1.1" 404 50 "-" "c" "-"""")
    val q = JdbcSink.start(
      Ingest.transform(Ingest.source(spark, in)),
      url, "accesslog", ckpt, Trigger.AvailableNow())
    q.awaitTermination()
    def count(): Long =
      spark.read.jdbc(url, "accesslog", new java.util.Properties).count()
    assert(count() == 2, "micro-batch rows missing from the JDBC table")
    // simulate a checkpoint replay of batch 0: same data, same batch id —
    // the delete+reinsert contract must leave the table unchanged
    JdbcSink.writeBatch(
      Ingest.transform(Ingest.batchSource(spark, in)), 0L, url, "accesslog")
    assert(count() == 2, s"replay duplicated rows: ${count()}")
    val hosts = spark.read.jdbc(url, "accesslog", new java.util.Properties)
      .select("response").orderBy("response").collect().map(_.getInt(0))
    assert(hosts.toSeq == Seq(200, 404))
  }

  // ---- durable spool transport (SyslogSpool) -------------------------------

  private def rfc3164(host: String, path: String, status: Int = 200): String =
    s"""<190>Apr  6 09:54:48 $host nginx: """ +
      s"""10.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET $path HTTP/1.1" $status 612 "-" "curl/7.29.0" "-""""

  private def udpSend(port: Int, frames: Seq[String]): Unit = {
    val sock = new java.net.DatagramSocket()
    val addr = java.net.InetAddress.getByName("127.0.0.1")
    frames.foreach { f =>
      val b = f.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      sock.send(new java.net.DatagramPacket(b, b.length, addr, port))
    }
    sock.close()
  }

  /** Polls until `dir` holds `n` visible (rolled) spool files. */
  private def awaitSpoolFiles(dir: String, n: Int, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    def count = Option(new java.io.File(dir).listFiles()).map(
      _.count(f => f.getName.startsWith("spool-") && f.getName.endsWith(".log")))
      .getOrElse(0)
    while (count < n && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(count >= n, s"spool dir never reached $n rolled files (got $count)")
  }

  test("durable spool: rolled frames survive a query restart exactly-once") {
    val dir = Files.createTempDirectory("graft_spool").toString
    val ckpt = Files.createTempDirectory("graft_spool_ck").toString
    // rollBytes=1 → every frame rolls (syncs + renames) immediately
    val spool = new SyslogSpool.Spool(dir, rollBytes = 1)
    val rx = new SyslogSpool.UdpReceiver(0, spool)
    try {
      udpSend(rx.boundPort, Seq(
        rfc3164("web03", "/a"), rfc3164("web03", "/b"), rfc3164("web03", "/c")))
      awaitSpoolFiles(dir, 3)
      val outDir = Files.createTempDirectory("graft_spool_out").toString
      // memory sink can't recover a checkpoint; the exactly-once parquet
      // file sink is the restart-capable path (and the production shape)
      def run() = {
        val q = Syslog.transform(Syslog.from(spark, Syslog.Spooled(dir)))
          .writeStream.option("checkpointLocation", ckpt)
          .outputMode("append").format("parquet").option("path", outDir)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(); q
      }
      val q1 = run()
      assert(spark.read.parquet(outDir).count() == 3)
      // structural: the consumer is the checkpointed FILE source — no
      // driver-side frame buffer anywhere in the read path
      assert(q1.recentProgress.flatMap(_.sources.map(_.description))
        .exists(_.contains("FileStreamSource")),
        "spool read path is not the file source")
      // simulated restart: the query is gone; frames are on disk, the
      // offsets are in the checkpoint. New frames arrive while down.
      udpSend(rx.boundPort, Seq(rfc3164("web04", "/d", 404), rfc3164("web04", "/e", 404)))
      awaitSpoolFiles(dir, 5)
      run()
      // exactly-once across the restart: 3+2, nothing lost, nothing replayed
      val all = spark.read.parquet(outDir)
      assert(all.count() == 5, s"restart replayed or lost frames: ${all.count()}")
      assert(all.filter(col("hostname") === "web04").count() == 2)
    } finally { rx.close(); spool.close() }
  }

  test("durable spool: N receivers (UDP+TCP), one stream, multi-file parallel read") {
    val dir = Files.createTempDirectory("graft_spool_multi").toString
    val ckpt = Files.createTempDirectory("graft_spool_multi_ck").toString
    val spoolA = new SyslogSpool.Spool(dir, rollBytes = 1)
    val spoolB = new SyslogSpool.Spool(dir, rollBytes = 1)
    val udp = new SyslogSpool.UdpReceiver(0, spoolA)
    val tcp = new SyslogSpool.TcpReceiver(0, spoolB)
    try {
      udpSend(udp.boundPort, (1 to 4).map(i => rfc3164("webA", s"/u$i")))
      val sock = new java.net.Socket("127.0.0.1", tcp.boundPort)
      val w = new java.io.PrintWriter(sock.getOutputStream, true)
      (1 to 4).foreach(i => w.println(rfc3164("webB", s"/t$i")))
      w.flush(); sock.close()
      awaitSpoolFiles(dir, 8)
      // two independent receivers landed files in one directory
      val batch = spark.read.text(dir)
      assert(batch.inputFiles.length >= 8)
      assert(batch.inputFiles.map(_.replaceAll(".*spool-", "").take(8)).distinct.length == 2,
        "expected spool files from two distinct receivers")
      val q = Syslog.transform(Syslog.from(spark, Syslog.Spooled(dir)))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("append").format("memory").queryName("spool_multi")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val rows = spark.table("spool_multi")
      assert(rows.count() == 8)
      assert(rows.select("hostname").distinct().collect().map(_.getString(0)).toSet
        == Set("webA", "webB"))
    } finally { udp.close(); tcp.close(); spoolA.close(); spoolB.close() }
  }

  test("durable spool: receiver close rolls the partial file (no frame stranded)") {
    val dir = Files.createTempDirectory("graft_spool_close").toString
    // big rollBytes + long rollMillis: nothing rolls until close()
    val spool = new SyslogSpool.Spool(dir, rollBytes = 1L << 20, rollMillis = 60000)
    val rx = new SyslogSpool.UdpReceiver(0, spool)
    try {
      udpSend(rx.boundPort, Seq(rfc3164("web05", "/z")))
      // wait for the receiver thread to append (file exists as hidden tmp)
      val deadline = System.currentTimeMillis() + 10000
      def tmps = Option(new java.io.File(dir).listFiles()).map(
        _.count(_.getName.startsWith(".spool-"))).getOrElse(0)
      while (tmps == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(tmps == 1, "frame never reached the spool tmp file")
      // hidden tmp is invisible to Spark's listing
      assert(spark.read.text(dir).count() == 0)
    } finally { rx.close(); spool.close() }
    awaitSpoolFiles(dir, 1, 5000)
    assert(spark.read.text(dir).count() == 1)
  }

  test("replay-cache build race: two concurrent gates, one committed layout") {
    // A fresh copy of the events table gives a fresh cache key, so BOTH
    // threads enter the build path together; the atomic-rename commit must
    // leave exactly one layout, zero .build-* leftovers, and both gate
    // results hash-identical to each other.
    val d = Files.createTempDirectory("graft_race_ev").toString
    Tables.table(spark, sf("sf0.001"), "events")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Seq.fill(2)(Future {
      SparkEntry.queries("s_tumbling_counts")(spark, d).collect().toSeq
    })
    val results = Await.result(Future.sequence(runs), 300.seconds)
    assert(results(0).nonEmpty && results(0) == results(1))
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val caches = tmp.listFiles().filter(_.getName.startsWith("graft_replay_sgate4w-"))
      .filter(f => new java.io.File(s"$d/events.parquet").lastModified() > 0 &&
        f.lastModified() >= System.currentTimeMillis() - 600000)
    // leftovers from the race would be .build-* siblings of a fresh cache
    val leftovers = tmp.listFiles()
      .filter(_.getName.matches("graft_replay_sgate4w-.*\\.build-.*"))
      .filter(_.lastModified() >= System.currentTimeMillis() - 600000)
    assert(leftovers.isEmpty,
      s"uncommitted build dirs leaked: ${leftovers.map(_.getName).toSeq}")
    assert(caches.nonEmpty)
  }
}
