package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The log-domain operator family, re-expressed Spark-first.
  *
  * Semantics derive from the reference's declarative configs:
  *  - grammar parse of the nginx `combined`-style line into 16 string fields
  *    (`/root/reference/nginx.rule:3`, invoked at `/root/reference/nginx.conf:54`);
  *  - month-name→number lookup with `nomatch → "unk"`
  *    (`/root/reference/nginx.table:1-15`, applied at `/root/reference/nginx.conf:55`);
  *  - date/datetime reassembly (`/root/reference/nginx.conf:4-16`);
  *  - string→UInt16/UInt64 insert casts (`/root/reference/nginx.click:1`,
  *    `/root/reference/README.md:213`).
  *
  * Everything is a narrow, shuffle-free column transform: at 100 TB this runs
  * embarrassingly parallel over input splits, entirely inside whole-stage
  * codegen, with no exchange until a downstream aggregation.
  */
object AccessLog {

  /** Single-pass equivalent of the liblognorm grammar `/root/reference/nginx.rule:3`.
    * Group order = field order of the rule. RE2/Java-compatible (no backtracking
    * constructs), so the DuckDB oracle evaluates the identical pattern.
    */
  val pattern: String =
    """^(\S+) (\S+) (\S+) \[([^/]+)/([^/]+)/(\d+):(\S+) ([^\]]+)\] "(\S+) (\S+) HTTP/([\d.]+)" (\d+) (\d+) "([^"]*)" "([^"]*)"(.*)$"""

  /** Field names in regex-group order (1-based group i ↔ fields(i-1)). */
  val fields: Seq[String] = Seq(
    "clientip", "ident", "auth", "day", "month", "year", "rtime", "tz",
    "verb", "request", "httpversion", "response", "bytes", "referrer",
    "agent", "blob")

  /** `/root/reference/nginx.table:2-13` verbatim; miss ⇒ "unk" (`nginx.table:1`). */
  val monthMap: Map[String, String] = Map(
    "Jan" -> "01", "Feb" -> "02", "Mar" -> "03", "Apr" -> "04",
    "May" -> "05", "Jun" -> "06", "Jul" -> "07", "Aug" -> "08",
    "Sep" -> "09", "Oct" -> "10", "Nov" -> "11", "Dec" -> "12")

  /** Parser fixtures (FIXTURES.md §B): the reference's own golden line
    * (`/root/reference/README.md:68`) plus edge cases. Inlined as VALUES in
    * both engines so parse queries are oracle-checkable without external files.
    */
  val fixtureLines: Seq[(Int, String)] = Seq(
    1 -> """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""",
    2 -> """10.0.0.7 - alice [31/Dec/2023:23:59:59 +0000] "POST /login?next=%2Fhome HTTP/2.0" 302 0 "https://example.com/a?b=c" "Mozilla/5.0 (X11; Linux x86_64)" "203.0.113.9"""",
    3 -> """2001:db8::1 - - [01/Jan/2024:00:00:00 -0800] "GET /a b HTTP/1.1" 400 12 "-" "-" "-"""",
    4 -> """192.168.1.1 - - [15/Aug/2026:12:00:00 +0000] "GET /x HTTP/1.1" 200 4096 "ref \"quoted\"" "UA" "-"""",
    5 -> """not a log line at all""",
    6 -> """127.0.0.1 - - [06/Foo/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"""",
    7 -> """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 999999 99999999999 "-" "c" "-"""",
    8 -> """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""")

  /** Fixture lines as a DataFrame(id int, line string). */
  def fixtures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    fixtureLines.toDF("id", "line")
  }

  /** Identical fixture relation as a DuckDB VALUES clause. */
  def fixturesSql: String =
    fixtureLines
      .map { case (i, l) => s"($i, '${l.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ") t(id, line)")

  /** R3+R4: parse `lineCol` into the 16 string fields + `_corrupt`.
    * A non-matching line yields empty strings — the reference's silent
    * degradation (SURVEY R4) — plus our explicit `_corrupt` marker.
    */
  def parsed(lineCol: Column): Seq[Column] =
    fields.zipWithIndex.map { case (f, i) =>
      regexp_extract(lineCol, pattern, i + 1).as(f)
    } :+ (!lineCol.rlike(pattern)).as("_corrupt")

  /** R5: month-name→number broadcast-map lookup with `nomatch → "unk"`.
    * A `typedLit` map is constant-folded by Catalyst — the scale analog of the
    * reference's load-once lookup table (`reloadOnHUP="off"`, nginx.conf:1).
    */
  def monthLookup(monthCol: Column): Column =
    coalesce(element_at(typedLit(monthMap), monthCol), lit("unk"))

  /** R5 generalized: a FILE-BACKED lookup table (the reference reloads
    * `nginx.table` from disk on HUP) joined as a broadcast left join with
    * `nomatch → default`. For dimension tables too big or too dynamic to
    * constant-fold into the plan the way [[monthLookup]]'s literal map is;
    * `broadcast()` keeps the probe side shuffle-free at any fact-table size.
    */
  def lookupJoin(df: DataFrame, lookup: DataFrame, keyCol: String,
                 valueCol: String, default: String, outCol: String): DataFrame =
    df.join(broadcast(lookup.select(col(keyCol), col(valueCol))),
        Seq(keyCol), "left")
      .withColumn(outCol, coalesce(col(valueCol), lit(default)))
      .drop(valueCol)

  /** The same lookup as oracle SQL (deterministically ordered CASE). */
  def monthLookupSql(expr: String): String =
    monthMap.toSeq.sorted
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(s"CASE $expr ", " ", " ELSE 'unk' END")

  /** R7: reassemble `logdate`/`logdatetime` from split parts
    * (`/root/reference/nginx.conf:4-16`). Invalid parts (corrupt line, "unk"
    * month) yield NULL via `try_to_*` — matching TRY_CAST in the oracle.
    */
  def logdate(year: Column, nxm: Column, day: Column): Column =
    try_to_date(concat_ws("-", year, nxm, day))

  def logdatetime(year: Column, nxm: Column, day: Column, rtime: Column): Column =
    try_to_timestamp(concat(concat_ws("-", year, nxm, day), lit(" "), rtime))

  /** R8: string→numeric insert casts. `response` is range-checked to the
    * UInt16 domain of the target column (`nginx.click:1`); out-of-range or
    * non-numeric ⇒ NULL (vs ClickHouse throw — documented divergence).
    */
  def responseCast(c: Column): Column = {
    val v = c.try_cast(org.apache.spark.sql.types.IntegerType)
    when(v.between(0, 65535), v)
  }

  def bytesCast(c: Column): Column =
    c.try_cast(org.apache.spark.sql.types.LongType)

  /** Full ingest projection — R2..R8 composed, emitting `Tables.accessLogSchema`
    * (the template at `/root/reference/nginx.conf:2-46` as a structured select;
    * no string-SQL rendering, which retires the reference's quoting wart).
    *
    * Parsing uses the single-pass native expression
    * [[graft.expressions.AccessLogParseExpr]] (one scan per line) rather than
    * the 17-regex-evaluations `parsed` formulation; the two are
    * equivalence-tested in AccessLogSpec.
    */
  def project(lines: DataFrame, hostname: String = "localhost",
              syslogtag: String = "nginx"): DataFrame =
    projectCols(lines, lit(hostname), lit(syslogtag))

  /** As [[project]], but the envelope hostname/syslogtag come from COLUMNS of
    * `lines` (the live syslog-receiver path, where each line carries its own
    * envelope — `/root/reference/nginx.conf:18-22`'s per-message properties).
    */
  def projectCols(lines: DataFrame, hostnameCol: Column,
                  syslogtagCol: Column): DataFrame = {
    graft.expressions.AccessLogParseExpr.register(lines.sparkSession)
    val p = lines
      .withColumn("_p", graft.expressions.AccessLogParseExpr.parseCol(col("line")))
      .select(Seq(col("line"), hostnameCol.as("_hn"), syslogtagCol.as("_tag")) ++
        (fields.map(f => col(s"_p.$f").as(f)) :+
          col("_p._corrupt").as("_corrupt")): _*)
    val nxm = monthLookup(col("month"))
    p.select(
      logdate(col("year"), nxm, col("day")).as("logdate"),
      logdatetime(col("year"), nxm, col("day"), col("rtime")).as("logdatetime"),
      col("_hn").as("hostname"),
      col("_tag").as("syslogtag"),
      col("line").as("message"),
      col("clientip"), col("ident"), col("auth"), col("verb"), col("request"),
      col("httpversion").as("httpv"),
      responseCast(col("response")).as("response"),
      bytesCast(col("bytes")).as("bytes"),
      col("referrer"), col("agent"), col("blob"), col("tz"), col("_corrupt"))
  }
}
