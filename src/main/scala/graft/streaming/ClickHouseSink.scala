package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** ClickHouse-dialect SQL generation for the R9/R11 production sink.
  *
  * The reference lands rows in ClickHouse over HTTP: `omclickhouse`
  * renders one INSERT per message from the `ng` template
  * (`/root/reference/nginx.conf:2-46`) against the MergeTree table declared
  * at `/root/reference/nginx.click:1`. No live ClickHouse exists in this
  * sandbox; the DIALECT is golden-tested against those two reference
  * artifacts, and the HTTP transport + idempotence protocol are
  * integration-tested end-to-end against a loopback stub
  * (ClickHouseHttpSpec) that emulates the server behaviors the contract
  * leans on (batch-id DELETE, token-window dedup, 5xx). [[ClickHouseDialect.accessLogDdl]]
  * reproduces `nginx.click:1` token-for-token from the shared
  * `Tables.accessLogSchema` constants, and the INSERT generator emits the
  * template's exact column list with multi-row VALUES batching (what
  * omclickhouse's bulk mode does). A live deployment plugs these
  * statements into any HTTP/JDBC executor; [[ClickHouseSink]] is the
  * `foreachBatch` wiring with the same per-batch replay idempotence as
  * [[JdbcSink]].
  */
object ClickHouseDialect {

  /** SURVEY §1.2 Spark→ClickHouse map. Spark has no unsigned integral
    * types, so columns that must round-trip to `UInt*` (the reference's
    * `response UInt16`, `bytes UInt64`) carry per-column overrides.
    */
  def chType(dt: DataType): String = dt match {
    case StringType | BinaryType            => "String"
    case DateType                           => "Date"
    case TimestampType | TimestampNTZType   => "DateTime"
    case ByteType                           => "Int8"
    case ShortType                          => "Int16"
    case IntegerType                        => "Int32"
    case LongType                           => "Int64"
    case FloatType                          => "Float32"
    case DoubleType                         => "Float64"
    case BooleanType                        => "UInt8"
    case other =>
      throw new IllegalArgumentException(s"no ClickHouse mapping for $other")
  }

  /** MergeTree DDL for a Spark schema. `overrides` pins exact ClickHouse
    * types per column; `exclude` drops Spark-side-only columns.
    */
  def createTableDdl(table: String, schema: StructType,
                     partitionBy: String, orderBy: Seq[String],
                     granularity: Int = 8192,
                     overrides: Map[String, String] = Map.empty,
                     exclude: Set[String] = Set.empty): String = {
    val cols = schema.fields.filterNot(f => exclude(f.name))
      .map(f => s"${f.name} ${overrides.getOrElse(f.name, chType(f.dataType))}")
    s"CREATE TABLE $table ( ${cols.mkString(", ")} ) Engine = MergeTree() " +
      s"PARTITION BY $partitionBy ORDER BY (${orderBy.mkString(", ")}) " +
      s"SETTINGS index_granularity=$granularity"
  }

  /** The access-log store DDL — `/root/reference/nginx.click:1` derived
    * from `Tables.accessLogSchema`. `tz`/`_corrupt` are the documented
    * additive Spark-side columns (SURVEY §1.2) and stay out of the
    * reference table; the UInt overrides are §1.2's unsigned mapping.
    */
  def accessLogDdl(table: String = "nginx"): String =
    createTableDdl(table, graft.Tables.accessLogSchema,
      partitionBy = "toYYYYMMDD(logdate)",
      orderBy = Seq("logdate", "logdatetime"),
      overrides = Map("response" -> "UInt16", "bytes" -> "UInt64"),
      exclude = Set("tz", "_corrupt"))

  /** The table [[ClickHouseSink]] actually writes: [[accessLogDdl]]'s
    * columns PLUS the `_batch_id Int64` replay column the sink's
    * idempotence protocol DELETEs and INSERTs on. The reference table
    * (`nginx.click:1`, no batch column) is the at-least-once omclickhouse
    * target; this one is the effectively-once target. Use this DDL when
    * the sink is the writer.
    */
  def accessLogSinkDdl(table: String = "nginx"): String =
    createTableDdl(table,
      graft.Tables.accessLogSchema.add(JdbcSink.BatchIdCol, LongType),
      partitionBy = "toYYYYMMDD(logdate)",
      orderBy = Seq("logdate", "logdatetime"),
      overrides = Map("response" -> "UInt16", "bytes" -> "UInt64"),
      exclude = Set("tz", "_corrupt"))

  private val DateTimeFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss").withZone(ZoneOffset.UTC)

  /** One SQL literal. Strings escape `\` and `'` (ClickHouse escaping);
    * DateTime renders at second granularity in UTC, matching the
    * reference's `DateTime` column and session timezone.
    */
  def literal(v: Any): String = v match {
    case null                  => "NULL"
    case s: String             =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case d: java.sql.Date      => s"'$d'"
    case t: java.sql.Timestamp => "'" + DateTimeFmt.format(t.toInstant) + "'"
    case t: java.time.LocalDateTime => "'" + DateTimeFmt.format(t.toInstant(ZoneOffset.UTC)) + "'"
    case b: Boolean            => if (b) "1" else "0"
    case b: Array[Byte]        => literal(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    // java.time variants: with spark.sql.datetime.java8API.enabled=true,
    // Row.get returns Instant/LocalDate instead of java.sql.Timestamp/Date
    case t: java.time.Instant   => "'" + DateTimeFmt.format(t) + "'"
    case d: java.time.LocalDate => s"'$d'"
    case n: java.lang.Number   => n.toString
    case other => throw new IllegalArgumentException(
      s"no ClickHouse literal for ${other.getClass.getName}")
  }

  /** Multi-row `INSERT INTO t (cols) VALUES (…), (…)` — omclickhouse's
    * bulk shape (one statement per template render, batched by the action
    * queue; `nginx.conf:3` fixes the column list golden-tested in
    * ClickHouseDialectSpec).
    */
  def insertStatement(table: String, columns: Seq[String], rows: Seq[Row],
                      dedupToken: Option[String] = None): String = {
    require(rows.nonEmpty, "empty INSERT batch")
    val vals = rows.map(r =>
      columns.indices.map(i => literal(r.get(i))).mkString("(", ", ", ")"))
    // insert_deduplication_token: ClickHouse drops a re-posted block whose
    // token is still in the table's deduplication window — the server-side
    // half of the sink's task-retry idempotence (needs
    // non_replicated_deduplication_window > 0 on plain MergeTree; on by
    // default for Replicated tables). The token must not contain quotes.
    val settings = dedupToken.map { tok =>
      require(!tok.exists(c => c == '\'' || c == '\\'), s"bad dedup token: $tok")
      s" SETTINGS insert_deduplicate=1, insert_deduplication_token='$tok'"
    }.getOrElse("")
    s"INSERT INTO $table (${columns.mkString(", ")})$settings VALUES ${vals.mkString(", ")}"
  }

  /** The replay guard: ClickHouse lightweight DELETE of a replayed batch
    * id — the dialect twin of [[JdbcSink.writeBatch]]'s DELETE.
    */
  def deleteBatchSql(table: String, batchId: Long): String =
    s"DELETE FROM $table WHERE ${JdbcSink.BatchIdCol} = $batchId"
}

/** `foreachBatch` ClickHouse sink: per-batch replay DELETE then
  * partition-parallel batched INSERTs. `executorFactory` supplies the
  * statement transport — one instance per task, created executor-side, so
  * every partition posts its own INSERTs concurrently straight from the
  * executors (the driver only issues the replay DELETE). In production
  * that is an HTTP POST to `:8123` (omclickhouse's transport,
  * `nginx.conf:61-63`); tests record statements instead.
  *
  * Idempotence has TWO layers, because failure happens at two granularities:
  *   - CROSS-BATCH (driver restart replays a committed micro-batch): the
  *     replay DELETE removes the prior attempt's rows by `_batch_id` before
  *     re-inserting.
  *   - INTRA-BATCH (a task retried or speculatively duplicated re-posts its
  *     partition's INSERTs inside a batch that then commits — the DELETE
  *     never sees those duplicates): every INSERT carries a deterministic
  *     `insert_deduplication_token` of (attempt-epoch, batchId, partitionId,
  *     chunk#), so the server drops the re-post. The epoch is fresh per
  *     `writeBatch` call — task/stage retries share it (same closure) and
  *     dedup; a batch REPLAY gets a new epoch so its inserts are NOT deduped
  *     against rows the replay DELETE just removed (lightweight DELETE does
  *     not clear the dedup log). Chunk composition is made attempt-stable by
  *     sorting within partitions first (shuffle fetch order is otherwise
  *     nondeterministic, and token-dedup keyed on unstable chunks could drop
  *     or double rows). Token dedup requires
  *     `non_replicated_deduplication_window > 0` on plain MergeTree tables;
  *     with `dedupTokens=false` the contract degrades to AT-LEAST-ONCE under
  *     task retry/speculation and speculation should be disabled.
  */
object ClickHouseSink {

  type Executor = String => Unit

  def writeBatch(batch: DataFrame, batchId: Long, table: String,
                 executorFactory: () => Executor,
                 maxRowsPerInsert: Int = 10000,
                 dedupTokens: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    // same invariant as JdbcSink: the table name is necessarily
    // interpolated into the DELETE/INSERT text, so it must be an identifier
    JdbcSink.requireIdent(table)
    val withId = batch.withColumn(JdbcSink.BatchIdCol, lit(batchId))
    // attempt-stable row order per partition → attempt-stable chunks →
    // retries re-post byte-identical token'd blocks (external sort, spills)
    val stable =
      if (dedupTokens) withId.sortWithinPartitions(withId.columns.map(col).toIndexedSeq: _*)
      else withId
    val cols = stable.schema.fieldNames.toSeq
    val epoch = java.util.UUID.randomUUID().toString
    executorFactory()(ClickHouseDialect.deleteBatchSql(table, batchId))
    stable.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val exec = executorFactory()
        rows.grouped(maxRowsPerInsert).zipWithIndex.foreach { case (g, i) =>
          val tok = if (dedupTokens) Some(s"graft-$epoch-$batchId-$pid-$i") else None
          exec(ClickHouseDialect.insertStatement(table, cols, g.toSeq, tok))
        }
      }
    }
  }

  /** Streams `df` into ClickHouse with per-batch idempotence. */
  def start(df: DataFrame, table: String, checkpointDir: String,
            executorFactory: () => Executor,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) =>
        writeBatch(b, id, table, executorFactory))
      .start()

  /** The production transport: POST each statement to ClickHouse's HTTP
    * endpoint (`nginx.conf:61-63`: server/port/usehttps). Transient
    * failures — 5xx/429 (ClickHouse answers 503 under memory/queue
    * pressure) and connect/timeout errors — are retried with exponential
    * backoff; the retried POST is byte-identical, so its
    * `insert_deduplication_token` makes the retry safe even if the first
    * attempt actually committed server-side. 4xx (malformed statement)
    * is permanent and thrown immediately. No live ClickHouse exists in
    * this sandbox; ClickHouseHttpSpec drives this exact code path against
    * a loopback HTTP stub from real executor tasks.
    */
  def httpExecutor(server: String, port: Int = 8123,
                   https: Boolean = false, maxRetries: Int = 3,
                   retryBackoffMs: Long = 500): () => Executor = () => {
    // one client (connection pool) per task, shared by its statements
    val scheme = if (https) "https" else "http"
    val client = java.net.http.HttpClient.newHttpClient()
    val uri = java.net.URI.create(s"$scheme://$server:$port/")
    sql => {
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(uri)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(sql))
        .build()
      // a while loop, not a local def: a lifted local method would make
      // this lambda capture the (non-serializable) enclosing module.
      // Left = permanent (4xx: a malformed statement never improves);
      // Right(Some) = transient. ANY IOException from the transport itself
      // is transient — connection resets from a restarting server / an
      // idle-killing LB are the classic case the dedup token exists for.
      var attempt = 0
      var done = false
      while (!done) {
        val outcome: Either[String, Option[String]] =
          try {
            val resp = client.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofString())
            val sc = resp.statusCode()
            if (sc / 100 == 2) Right(None)
            else {
              val msg = s"ClickHouse HTTP $sc: ${resp.body().take(500)}"
              if (sc / 100 == 5 || sc == 429) Right(Some(msg)) else Left(msg)
            }
          } catch {
            case e: java.io.IOException => Right(Some(s"io: ${e.getMessage}"))
          }
        outcome match {
          case Left(msg) => throw new java.io.IOException(msg)
          case Right(None) => done = true
          case Right(Some(msg)) if attempt >= maxRetries =>
            throw new java.io.IOException(s"$msg (after ${attempt + 1} attempts)")
          case Right(Some(_)) =>
            Thread.sleep(retryBackoffMs << attempt)
            attempt += 1
        }
      }
    }
  }
}
