package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.AccessLog

/** The reference's own dataflow — R3 parse, R5 lookup, R7 date derivation,
  * R8 casts — as declared, oracle-checked queries over fixture lines inlined
  * identically in both engines (FIXTURES.md §B).
  */
object LogPipeline extends QueryModule {

  private val P = AccessLog.pattern

  def queries: Seq[(String, QFn)] = Seq(
    // R3+R4: the flagship 16-field grammar parse incl. corrupt-line behavior.
    // Runs the single-pass NATIVE parser (the production ingest operator);
    // the oracle evaluates the equivalent regex in DuckDB, so the gate
    // certifies the native implementation directly (equivalence with the
    // regex formulation is additionally property-tested in AccessLogSpec).
    "q_parse_accesslog" -> ((s, _) => {
      graft.expressions.AccessLogParseExpr.register(s)
      val fx = AccessLog.fixtures(s)
      fx.withColumn("_p", graft.expressions.AccessLogParseExpr.parseCol(col("line")))
        .select(col("id") +: (AccessLog.fields.map(f => col(s"_p.$f").as(f)) :+
          col("_p._corrupt").as("_corrupt")): _*)
        .orderBy(col("id"))
    }),

    // R5: month-name→number lookup with nomatch → 'unk'.
    "q_lookup_month" -> ((s, _) => {
      val fx = AccessLog.fixtures(s)
      fx.select(col("id"),
          regexp_extract(col("line"), P, 5).as("month"))
        .withColumn("nxm", AccessLog.monthLookup(col("month")))
        .orderBy(col("id"))
    }),

    // R5 generalized: the same lookup through the FILE-BACKED dim path
    // (AccessLog.lookupJoin — broadcast left join, nomatch → default), the
    // operator a user reaches for when the dim is too big/dynamic for a
    // literal map. Dim rows inlined identically in both engines.
    "q_lookup_file" -> ((s, _) => {
      import s.implicits._
      val fx = AccessLog.fixtures(s)
      val dim = AccessLog.monthMap.toSeq.sorted.toDF("month", "nxm")
      val parsed = fx.select(col("id"),
        regexp_extract(col("line"), P, 5).as("month"))
      AccessLog.lookupJoin(parsed, dim, "month", "nxm", "unk", "nx")
        .select(col("id"), col("month"), col("nx"))
        .orderBy(col("id"))
    }),

    // R7: logdate/logdatetime reassembly from split parts (+ R5 inside).
    "q_derive_dates" -> ((s, _) => {
      val fx = AccessLog.fixtures(s)
      val p = fx.select(col("id"),
        regexp_extract(col("line"), P, 4).as("day"),
        regexp_extract(col("line"), P, 5).as("month"),
        regexp_extract(col("line"), P, 6).as("year"),
        regexp_extract(col("line"), P, 7).as("rtime"))
      val nxm = AccessLog.monthLookup(col("month"))
      p.select(col("id"),
          AccessLog.logdate(col("year"), nxm, col("day")).as("logdate"),
          AccessLog.logdatetime(col("year"), nxm, col("day"), col("rtime"))
            .cast("timestamp_ntz").as("logdatetime"))
        .orderBy(col("id"))
    }),

    // URL analytics over parsed requests: path (query string stripped),
    // per-verb counts, bytes served — the top-URLs dashboard panel (R12/R13).
    "q_url_stats" -> ((s, _) => {
      val fx = AccessLog.fixtures(s)
      val p = fx.select(
        regexp_extract(col("line"), P, 9).as("verb"),
        regexp_extract(col("line"), P, 10).as("request"),
        regexp_extract(col("line"), P, 13).as("bytes"))
        .filter(length(col("verb")) > 0)
      p.select(col("verb"),
          element_at(split(col("request"), "\\?"), 1).as("path"),
          expr("try_cast(bytes AS BIGINT)").as("b"))
        .groupBy(col("verb"), col("path"))
        .agg(count(lit(1)).as("hits"), sum(col("b")).as("bytes_served"))
        .orderBy(col("verb"), col("path"))
    }),

    // R8: string→UInt16/UInt64 casts incl. garbage→NULL and range check.
    "q_cast_insert" -> ((s, _) => {
      val fx = AccessLog.fixtures(s)
      fx.select(col("id"),
          AccessLog.responseCast(regexp_extract(col("line"), P, 12)).as("response"),
          AccessLog.bytesCast(regexp_extract(col("line"), P, 13)).as("bytes"))
        .orderBy(col("id"))
    }),

    // The composed pipeline, R1→R12 in one gate (see [[PipelineE2e]]):
    // events rendered to syslog-framed nginx lines, pushed over a real TCP
    // socket through the durable spool, ingested by the checkpointed
    // streaming parse, landed in the R11 store, then served as the R12
    // dashboard aggregate. Oracle = the same aggregate straight off the
    // events parquet; a hash match certifies the whole chain round-trips
    // every field.
    "q_pipeline_e2e" -> ((s, d) => {
      val store = PipelineE2e.ensure(s, d)
      graft.storage.LogTableWriter.readRange(s, store,
          java.sql.Timestamp.valueOf("2024-01-08 00:00:00"),
          java.sql.Timestamp.valueOf("2024-01-18 00:00:00"))
        .groupBy(date_trunc("hour", col("logdatetime"))
          .cast("timestamp_ntz").as("t"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("bytes")).as("bytes_served"),
          sum(when(col("response") === 500, 1).otherwise(0)).as("errors"))
        .orderBy(col("t"))
    }))

  def oracle: Seq[(String, String)] = {
    val fx = AccessLog.fixturesSql
    // DuckDB's indexed regexp_extract caps at group 9; the named-list form
    // returns all 16 groups as a struct in one pass.
    val groupList = AccessLog.fields.map(f => s"'$f'").mkString("[", ", ", "]")
    val structExtract = s"regexp_extract(line, '$P', $groupList)"
    val fieldCols = AccessLog.fields.map(f => s"r.$f AS $f").mkString(",\n  ")
    Seq(
      "q_parse_accesslog" ->
        s"""WITH p AS (SELECT id, $structExtract AS r,
           |    NOT regexp_matches(line, '$P') AS _corrupt FROM $fx)
           |SELECT id,
           |  $fieldCols,
           |  _corrupt
           |FROM p ORDER BY id""".stripMargin,

      "q_lookup_month" ->
        s"""WITH p AS (SELECT id, regexp_extract(line, '$P', 5) AS month FROM $fx)
           |SELECT id, month, ${AccessLog.monthLookupSql("month")} AS nxm
           |FROM p ORDER BY id""".stripMargin,

      "q_lookup_file" -> {
        val dimValues = AccessLog.monthMap.toSeq.sorted
          .map { case (k, v) => s"('$k', '$v')" }.mkString(", ")
        s"""WITH p AS (SELECT id, regexp_extract(line, '$P', 5) AS month FROM $fx),
           |  dim(month, nxm) AS (VALUES $dimValues)
           |SELECT id, p.month AS month, coalesce(dim.nxm, 'unk') AS nx
           |FROM p LEFT JOIN dim USING (month) ORDER BY id""".stripMargin
      },

      "q_derive_dates" ->
        s"""WITH p AS (SELECT id,
           |    regexp_extract(line, '$P', 4) AS day,
           |    regexp_extract(line, '$P', 5) AS month,
           |    regexp_extract(line, '$P', 6) AS year,
           |    regexp_extract(line, '$P', 7) AS rtime
           |  FROM $fx),
           |  m AS (SELECT *, ${AccessLog.monthLookupSql("month")} AS nxm FROM p)
           |SELECT id,
           |  TRY_CAST(year || '-' || nxm || '-' || day AS DATE) AS logdate,
           |  TRY_CAST(year || '-' || nxm || '-' || day || ' ' || rtime AS TIMESTAMP)
           |    AS logdatetime
           |FROM m ORDER BY id""".stripMargin,

      "q_url_stats" ->
        s"""WITH p AS (SELECT r['verb'] AS verb, r['request'] AS request,
           |    r['bytes'] AS bytes
           |  FROM (SELECT $structExtract AS r FROM $fx)
           |  WHERE length(r['verb']) > 0)
           |SELECT verb, string_split(request, '?')[1] AS path,
           |  count(*) AS hits,
           |  CAST(sum(TRY_CAST(bytes AS BIGINT)) AS BIGINT) AS bytes_served
           |FROM p GROUP BY verb, path ORDER BY verb, path""".stripMargin,

      "q_cast_insert" ->
        s"""WITH p AS (SELECT id, r.response AS response, r.bytes AS bytes
           |  FROM (SELECT id, $structExtract AS r FROM $fx))
           |SELECT id,
           |  CASE WHEN TRY_CAST(response AS INTEGER) BETWEEN 0 AND 65535
           |       THEN TRY_CAST(response AS INTEGER) END AS response,
           |  TRY_CAST(bytes AS BIGINT) AS bytes
           |FROM p ORDER BY id""".stripMargin,

      // The pipeline renders each event's access-log timestamp at SECOND
      // precision, so the oracle truncates ts the same way before both the
      // range filter and the hour bucket; bytes = event_id % 100000 and
      // status 500 ⇔ event_type = 'error' mirror the render exactly.
      "q_pipeline_e2e" ->
        """WITH e AS (SELECT date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts,
          |    event_id, event_type FROM events)
          |SELECT date_trunc('hour', ts) AS t,
          |  count(*) AS cnt,
          |  CAST(sum(event_id % 100000) AS BIGINT) AS bytes_served,
          |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS errors
          |FROM e
          |WHERE ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
          |  AND TIMESTAMP '2024-01-18 00:00:00'
          |GROUP BY t ORDER BY t""".stripMargin)
  }
}
