package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.streaming.{ClickHouseDialect, ClickHouseSink, Ingest, JdbcSink}

/** Golden tests pinning the ClickHouse dialect to the reference artifacts:
  * the MergeTree DDL against `/root/reference/nginx.click:1` and the INSERT
  * column list against the `ng` template (`/root/reference/nginx.conf:3`).
  * No server exists in the sandbox — the SQL text IS the contract.
  */
class ClickHouseDialectSpec extends SparkSpec {

  private def norm(s: String) = s.replaceAll("\\s+", "")

  test("golden: accessLogDdl reproduces nginx.click token-for-token") {
    val ref = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/nginx.click")).trim
    val gen = ClickHouseDialect.accessLogDdl()
    assert(norm(gen) == norm(ref),
      s"DDL drifted from nginx.click:\n ref: $ref\n gen: $gen")
  }

  test("golden: INSERT column list matches the ng template's") {
    val conf = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/nginx.conf"))
    val m = """INSERT INTO nginx\.nginx \(([^)]*)\)""".r
      .findFirstMatchIn(conf).getOrElse(fail("template INSERT not found"))
    val refCols = m.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val storeCols = Tables.accessLogSchema.fieldNames.toSeq
      .filterNot(Set("tz", "_corrupt"))
    assert(storeCols == refCols,
      s"column list drifted: store=$storeCols template=$refCols")
    val sql = ClickHouseDialect.insertStatement("nginx.nginx", storeCols,
      Seq(org.apache.spark.sql.Row.fromSeq(storeCols.map(_ => "x"))))
    assert(sql.startsWith(s"INSERT INTO nginx.nginx (${refCols.mkString(", ")}) VALUES "))
  }

  test("sink DDL: accessLogSinkDdl is accessLogDdl plus the _batch_id column") {
    val ref = ClickHouseDialect.accessLogDdl()
    val sink = ClickHouseDialect.accessLogSinkDdl()
    // same table, one extra trailing column in the parenthesized list
    assert(norm(sink) == norm(ref.replace(" ) Engine",
      s", ${JdbcSink.BatchIdCol} Int64 ) Engine")),
      s"sink DDL is not ref DDL + batch column:\n ref: $ref\n sink: $sink")
    // and it is actually compatible with what the sink writes: the INSERT
    // column list (store columns + _batch_id) ⊆ the sink DDL's columns
    val ddlCols = """\( (.*) \) Engine""".r.findFirstMatchIn(sink).get
      .group(1).split(", ").map(_.split(" ")(0)).toSet
    val insertCols = Tables.accessLogSchema.fieldNames.toSeq
      .filterNot(Set("tz", "_corrupt")) :+ JdbcSink.BatchIdCol
    assert(insertCols.toSet == ddlCols,
      s"sink DDL columns $ddlCols != insert columns $insertCols")
  }

  test("writeBatch rejects non-identifier table names (SQL smuggling guard)") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ClickHouseSink.writeBatch(df, 0L, "nginx; DROP TABLE nginx",
        ClickHouseDialectSpec.factory)
    }
  }

  test("literals: escaping, DateTime second granularity, NULL, UInt8 bool") {
    import ClickHouseDialect.literal
    assert(literal("""a'b\c""") == """'a\'b\\c'""")
    assert(literal(java.sql.Timestamp.valueOf("2020-04-06 09:54:48.123"))
      == "'2020-04-06 09:54:48'")
    assert(literal(java.sql.Date.valueOf("2020-04-06")) == "'2020-04-06'")
    assert(literal(null) == "NULL")
    assert(literal(true) == "1" && literal(false) == "0")
    assert(literal(612L) == "612")
    // java8API session rows hand back java.time values
    assert(literal(java.time.Instant.parse("2020-04-06T13:54:48.900Z"))
      == "'2020-04-06 13:54:48'")
    assert(literal(java.time.LocalDate.parse("2020-04-06")) == "'2020-04-06'")
    // an unmapped type must be a clear error, not unquoted toString output
    intercept[IllegalArgumentException] { literal(Seq(1, 2)) }
  }

  test("writeBatch: replay DELETE precedes batched INSERTs; replay is a rewrite") {
    val in = java.nio.file.Files.createTempDirectory("graft_ch_in").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "a.log"),
      """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""" + "\n" +
        """10.0.0.2 - - [07/Apr/2020:09:00:00 -0400] "GET /b HTTP/1.1" 404 50 "-" "it's \"quoted\"" "-"""")
    val batch = Ingest.transform(Ingest.batchSource(spark, in))
      .drop("tz", "_corrupt")
    ClickHouseDialectSpec.recorded.clear()
    def run() = ClickHouseSink.writeBatch(batch, 7L, "nginx.nginx",
      ClickHouseDialectSpec.factory, maxRowsPerInsert = 1)
    run()
    val stmts = ClickHouseDialectSpec.recorded.synchronized {
      ClickHouseDialectSpec.recorded.toList
    }
    assert(stmts.head == s"DELETE FROM nginx.nginx WHERE ${JdbcSink.BatchIdCol} = 7")
    val inserts = stmts.tail
    assert(inserts.size == 2, s"expected 2 single-row INSERTs, got $inserts")
    assert(inserts.forall(_.startsWith("INSERT INTO nginx.nginx (")))
    // every row carries the batch id; values render in ClickHouse dialect
    assert(inserts.forall(_.endsWith(", 7)")))
    assert(inserts.exists(s => s.contains("'2020-04-06 09:54:48'")
      && s.contains(", 200, 612,")))
    // the grammar stops the agent field at the first unescaped quote (same
    // as the reference rule), so agent = `it's \`; the dialect escapes the
    // embedded ' and trailing \ on top
    assert(inserts.exists(_.contains("""'it\'s \\'""")))
    // every INSERT carries a dedup token (task-retry idempotence): scheme
    // graft-<epoch>-<batchId>-<partition>-<chunk>, with the SETTINGS clause
    // ahead of VALUES as ClickHouse requires
    val TokRe = """SETTINGS insert_deduplicate=1, insert_deduplication_token='graft-([0-9a-f-]+)-7-(\d+)-(\d+)' VALUES""".r.unanchored
    assert(inserts.forall(TokRe.findFirstIn(_).isDefined), s"token missing: $inserts")
    def epochOf(s: String) = TokRe.findFirstMatchIn(s).get.group(1)
    def stripTok(s: String) = TokRe.replaceAllIn(s, "VALUES")
    assert(inserts.map(epochOf).distinct.size == 1,
      "one writeBatch call = one attempt epoch (retries of its tasks dedup)")
    // a checkpoint replay of the same batch re-runs DELETE-then-INSERT:
    // the statement stream stays idempotent at the table level. The replay
    // gets a FRESH epoch — its inserts must NOT token-dedup against the
    // rows its own DELETE just removed (the dedup log outlives the delete)
    run()
    val replay = ClickHouseDialectSpec.recorded.synchronized {
      ClickHouseDialectSpec.recorded.toList
    }.drop(stmts.size)
    assert(replay.head.startsWith("DELETE FROM nginx.nginx"))
    assert(replay.tail.map(stripTok).toSet == inserts.map(stripTok).toSet)
    assert(epochOf(replay.tail.head) != epochOf(inserts.head),
      "replay must carry a fresh dedup epoch")
    // tokens are attempt-deterministic: same rows, same chunking → the
    // token is a pure function of (epoch, batch, partition, chunk), so a
    // speculative duplicate of a task re-posts byte-identical statements
    assert(replay.tail.map(stripTok).toSet.size == replay.tail.size)
  }

  test("multi-row VALUES batching groups rows per statement") {
    import spark.implicits._
    val df = (1 to 5).map(i => (i, s"v$i")).toDF("a", "b")
    ClickHouseDialectSpec.recorded.clear()
    ClickHouseSink.writeBatch(df.coalesce(1), 0L, "t",
      ClickHouseDialectSpec.factory, maxRowsPerInsert = 2)
    val inserts = ClickHouseDialectSpec.recorded.synchronized {
      ClickHouseDialectSpec.recorded.toList
    }.filter(_.startsWith("INSERT"))
    // 5 rows, 2 per statement, one partition → 3 statements
    assert(inserts.size == 3)
    assert(inserts.map("\\(\\d+, 'v".r.findAllIn(_).size).sum == 5)
  }
}

/** Executor-side statement recorder: local-mode executors share this JVM,
  * so a static buffer observes what each partition posted.
  */
object ClickHouseDialectSpec {
  val recorded = new ArrayBuffer[String]
  val factory: () => ClickHouseSink.Executor =
    () => sql => recorded.synchronized { recorded += sql }
}
