package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.streaming.{ClickHouseDialect, ClickHouseSink}

/** Loopback integration test for the PRODUCTION ClickHouse HTTP transport
  * (`ClickHouseSink.httpExecutor`): a JDK `com.sun.net.httpserver` stub on
  * 127.0.0.1 stands in for ClickHouse's `:8123` endpoint
  * (`/root/reference/nginx.conf:61-63`) and emulates the two server-side
  * behaviors the sink's idempotence contract leans on — lightweight DELETE
  * by `_batch_id` and `insert_deduplication_token` block dropping. Real
  * executor tasks POST real INSERT statements through real sockets; the
  * stub's table state is then asserted row-for-row. What stays untestable
  * in this sandbox is only ClickHouse's own implementation of those
  * documented behaviors.
  */
class ClickHouseHttpSpec extends SparkSpec with BeforeAndAfterAll {
  import ClickHouseHttpSpec._

  override def afterAll(): Unit = stopServer()

  private def mkBatch(n: Int, parts: Int) = {
    import org.apache.spark.sql.functions.{col, concat, lit}
    spark.range(n)
      .select(col("id"), concat(lit("msg-"), col("id")).as("msg"),
        expr("timestamp_micros(1704067200000000 + id * 1000000)").as("ts"))
      .repartition(parts)
  }

  test("executor POSTs land over loopback HTTP: replay DELETE first, " +
    "all rows exactly once, tokens unique, partitions post concurrently") {
    reset()
    val latch = new CountDownLatch(2)
    concurrencyLatch.set(latch)
    ClickHouseSink.writeBatch(mkBatch(100, 4), 5L, "nginx_t1",
      ClickHouseSink.httpExecutor("127.0.0.1", serverPort, maxRetries = 0),
      maxRowsPerInsert = 10)
    val reqs = requests.synchronized(requests.toList)
    assert(reqs.head.startsWith("DELETE FROM nginx_t1 WHERE _batch_id = 5"))
    assert(reqs.tail.forall(_.startsWith("INSERT INTO nginx_t1 (")))
    assert(tableRows("nginx_t1").size === 100)
    // every row's last column is the batch id
    assert(tableRows("nginx_t1").forall(_.endsWith(", 5")))
    val toks = reqs.tail.flatMap(tokenOf)
    assert(toks.size === reqs.tail.size && toks.distinct.size === toks.size)
    // two INSERT posts were in flight simultaneously (4 partition tasks on
    // local[4]; the handler holds each INSERT until a second one arrives)
    assert(latch.getCount === 0, "no two partition POSTs overlapped")
    // batch REPLAY (driver restart): new DELETE wipes the prior attempt,
    // re-insert lands under a fresh epoch — still exactly-once
    val toksBefore = toks.toSet
    val nReqsBefore = reqs.size
    ClickHouseSink.writeBatch(mkBatch(100, 4), 5L, "nginx_t1",
      ClickHouseSink.httpExecutor("127.0.0.1", serverPort, maxRetries = 0),
      maxRowsPerInsert = 10)
    assert(tableRows("nginx_t1").size === 100)
    val replayToks = requests.synchronized(requests.toList)
      .drop(nReqsBefore).flatMap(tokenOf).toSet
    assert(replayToks.nonEmpty && replayToks.intersect(toksBefore).isEmpty,
      "replay must use a fresh token epoch")
  }

  test("intra-batch task re-post is dropped by the token window " +
    "(every INSERT posted twice; table still exactly-once)") {
    reset()
    ClickHouseSink.writeBatch(mkBatch(60, 3), 9L, "nginx_t2",
      doublePostFactory(serverPort), maxRowsPerInsert = 7)
    val inserts = requests.synchronized(requests.toList).filter(_.startsWith("INSERT"))
    // each statement went over the wire twice...
    assert(inserts.size === inserts.distinct.size * 2)
    // ...and the server's dedup window dropped every second copy
    assert(tableRows("nginx_t2").size === 60)
  }

  test("transient 503 is retried with the byte-identical statement and succeeds") {
    reset()
    failuresRemaining.set(2)
    ClickHouseSink.writeBatch(mkBatch(40, 2), 3L, "nginx_t3",
      ClickHouseSink.httpExecutor("127.0.0.1", serverPort,
        maxRetries = 3, retryBackoffMs = 1),
      maxRowsPerInsert = 20)
    assert(tableRows("nginx_t3").size === 40)
    val inserts = requests.synchronized(requests.toList).filter(_.startsWith("INSERT"))
    // at least one statement appears >1x (the 503'd attempts re-posted
    // byte-identically, same token)
    assert(inserts.groupBy(identity).exists(_._2.size > 1))
  }

  test("4xx is permanent: no retry, the write fails loudly") {
    reset()
    reject400Remaining.set(1)
    val e = intercept[Exception] {
      ClickHouseSink.writeBatch(mkBatch(10, 1), 4L, "nginx_t4",
        ClickHouseSink.httpExecutor("127.0.0.1", serverPort,
          maxRetries = 3, retryBackoffMs = 1))
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("HTTP 400")))
    // the failed INSERT was posted exactly once — 4xx must not burn retries
    val inserts = requests.synchronized(requests.toList).filter(_.startsWith("INSERT"))
    assert(inserts.size === 1)
  }

  test("streaming e2e: foreachBatch sink posts each micro-batch over HTTP") {
    reset()
    val in = java.nio.file.Files.createTempDirectory("graft_chhttp_in").toString
    mkBatch(30, 1).write.mode("overwrite").parquet(in)
    val ck = java.nio.file.Files.createTempDirectory("graft_chhttp_ck").toString
    val src = spark.readStream.schema("id bigint, msg string, ts timestamp")
      .option("maxFilesPerTrigger", 1).parquet(in)
    val q = ClickHouseSink.start(src, "nginx_stream", ck,
      ClickHouseSink.httpExecutor("127.0.0.1", serverPort, maxRetries = 0),
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    assert(tableRows("nginx_stream").size === 30)
  }
}

/** The loopback stub + its state live in the companion so Spark closures
  * never capture the (non-serializable) suite instance. All state is
  * driver/server-side in this JVM; executors only see host/port.
  */
object ClickHouseHttpSpec {
  val requests = scala.collection.mutable.ListBuffer.empty[String]
  private val tables =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.ListBuffer[String]]
  private val seenTokens = scala.collection.mutable.Set.empty[String]
  val failuresRemaining = new AtomicInteger(0)
  val reject400Remaining = new AtomicInteger(0)
  val concurrencyLatch =
    new java.util.concurrent.atomic.AtomicReference[CountDownLatch](null)

  def reset(): Unit = synchronized {
    requests.clear(); tables.clear(); seenTokens.clear()
    failuresRemaining.set(0); reject400Remaining.set(0)
    concurrencyLatch.set(null)
  }

  def tableRows(t: String): List[String] =
    synchronized(tables.get(t).map(_.toList).getOrElse(Nil))

  def tokenOf(sql: String): Option[String] =
    "insert_deduplication_token='([^']+)'".r.findFirstMatchIn(sql).map(_.group(1))

  /** A task-retry transport: every INSERT goes over the wire twice with the
    * identical statement (and token) — what a speculative duplicate does.
    */
  def doublePostFactory(port: Int): () => ClickHouseSink.Executor = () => {
    val inner = ClickHouseSink.httpExecutor("127.0.0.1", port, maxRetries = 0)()
    sql => { inner(sql); if (sql.startsWith("INSERT")) inner(sql) }
  }

  /** Minimal ClickHouse-behavior emulation: batch-id DELETE, token-window
    * INSERT dedup, VALUES row parsing (test data contains no parens/commas
    * inside string literals), configurable 503/400 fault injection.
    */
  private def serve(body: String): (Int, String) = {
    if (body.startsWith("INSERT") && reject400Remaining.getAndDecrement() > 0)
      return (400, "Syntax error (injected)")
    reject400Remaining.updateAndGet(n => math.max(n, 0))
    if (body.startsWith("INSERT") && failuresRemaining.getAndDecrement() > 0)
      return (503, "Too many simultaneous queries (injected)")
    failuresRemaining.updateAndGet(n => math.max(n, 0))
    if (body.startsWith("DELETE FROM ")) {
      val m = "DELETE FROM (\\S+) WHERE _batch_id = (\\d+)".r.findFirstMatchIn(body)
        .getOrElse(sys.error(s"bad DELETE: $body"))
      val (t, bid) = (m.group(1), m.group(2))
      synchronized(tables.get(t).foreach(rows =>
        rows.filterInPlace(!_.endsWith(s", $bid"))))
      (200, "Ok.")
    } else if (body.startsWith("INSERT INTO ")) {
      val t = "INSERT INTO (\\S+) \\(".r.findFirstMatchIn(body).get.group(1)
      val tok = tokenOf(body)
      val dup = synchronized(tok.exists(k => !seenTokens.add(k)))
      if (!dup) {
        val vals = body.substring(body.indexOf(" VALUES ") + 8)
        val rows = vals.stripPrefix("(").stripSuffix(")").split("\\), \\(")
        synchronized(tables.getOrElseUpdate(t,
          scala.collection.mutable.ListBuffer.empty) ++= rows)
      }
      (200, "Ok.")
    } else (400, s"unrecognized statement: ${body.take(100)}")
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.setExecutor(Executors.newCachedThreadPool())
    s.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        requests.synchronized(requests += body)
        if (body.startsWith("INSERT"))
          Option(concurrencyLatch.get()).foreach { l =>
            l.countDown(); l.await(3, TimeUnit.SECONDS)
          }
        val (code, resp) = serve(body)
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    s.start()
    s
  }

  def serverPort: Int = server.getAddress.getPort

  def stopServer(): Unit = server.stop(0)
}
