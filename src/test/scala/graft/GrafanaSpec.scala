package graft

import org.apache.spark.sql.functions._

import graft.plans.Grafana

/** Golden tests for the Grafana macro layer: the README's verbatim panel
  * query (`/root/reference/README.md:279-286`) must expand to runnable
  * engine SQL that computes the same buckets as the native dashboard
  * queries over the same window.
  */
class GrafanaSpec extends SparkSpec {

  // the reference panel query, verbatim
  private val panel =
    """SELECT
      |    $timeSeries as t,
      |    count(*) as Count
      |FROM $table
      |WHERE $timeFilter
      |GROUP BY t
      |ORDER BY t""".stripMargin

  test("README panel query expands to the golden engine SQL") {
    val got = Grafana.expand(panel, table = "events", timeColumn = "ts",
      interval = "1h", from = "2024-01-05 00:00:00", to = "2024-01-20 00:00:00")
    val want =
      """SELECT
        |    timestamp_seconds(floor(unix_timestamp(ts) / 3600) * 3600) as t,
        |    count(*) as Count
        |FROM events
        |WHERE ts >= timestamp'2024-01-05 00:00:00' AND ts <= timestamp'2024-01-20 00:00:00'
        |GROUP BY t
        |ORDER BY t""".stripMargin
    assert(got === want)
  }

  test("expanded panel query returns the same buckets as the native " +
    "dashboard query over the same window") {
    Tables.table(spark, sf(), "events").createOrReplaceTempView("events")
    try {
      val got = spark.sql(Grafana.expand(panel, "events", "ts", "1h",
          "2024-01-05 00:00:00", "2024-01-20 00:00:00"))
        .select(col("t").cast("timestamp_ntz").as("t"), col("Count").as("cnt"))
        .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
      // the engine's native form of the same panel: hour-truncated count
      // restricted to the $timeFilter window (q_timeseries_count's shape)
      val want = Tables.table(spark, sf(), "events")
        .filter(col("ts").between(
          lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-20 00:00:00").cast("timestamp")))
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("t"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("t"))
        .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
      assert(got.nonEmpty && got === want)
    } finally spark.catalog.dropTempView("events")
  }

  test("sub-second panel intervals bucket on unix_millis and compute true " +
    "ms buckets (vertamedia ms-granularity $timeSeries)") {
    val got = Grafana.expand(panel, "events", "ts", "500ms",
      "2024-01-05 00:00:00", "2024-01-05 01:00:00")
    assert(got.contains(
      "timestamp_millis(CAST(floor(unix_millis(ts) / 500) * 500 AS BIGINT))"),
      s"wrong ms bucket form:\n$got")
    Tables.table(spark, sf(), "events").createOrReplaceTempView("events")
    try {
      val rows = spark.sql(Grafana.expand(panel, "events", "ts", "500ms",
          "2024-01-05 00:00:00", "2024-01-06 00:00:00"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      assert(rows.nonEmpty)
      // every bucket lands on a 500 ms boundary, and the buckets partition
      // the window's events (counts re-sum to the filtered total)
      assert(rows.forall(_._1 % 500 == 0))
      val total = Tables.table(spark, sf(), "events")
        .filter(col("ts").between(
          lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-06 00:00:00").cast("timestamp")))
        .count()
      assert(rows.map(_._2).sum == total)
      // whole-second intervals keep the second-based golden form
      assert(Grafana.expand(panel, "events", "ts", "2000ms",
          "2024-01-05 00:00:00", "2024-01-06 00:00:00")
        .contains("timestamp_seconds(floor(unix_timestamp(ts) / 2) * 2)"))
    } finally spark.catalog.dropTempView("events")
  }

  test("$from/$to/$interval expand to epoch seconds; intervals parse all units") {
    val got = Grafana.expand("SELECT $from, $to, $interval", "t1", "ts",
      "30s", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(got === "SELECT 1704067200, 1704153600, 30")
    assert(Grafana.expand("$interval", "t1", "ts", "15m",
      "2024-01-01 00:00:00", "2024-01-01 00:00:00") === "900")
    assert(Grafana.expand("$interval", "t1", "ts", "1d",
      "2024-01-01 00:00:00", "2024-01-01 00:00:00") === "86400")
  }

  test("prefix-sharing and unknown macros fail loudly instead of mangling") {
    // $timeFilterByColumn is a REAL plugin macro sharing $timeFilter's
    // prefix — it must surface as unsupported, not as garbled SQL
    val e1 = intercept[IllegalArgumentException] {
      Grafana.expand("SELECT 1 FROM $table WHERE $timeFilterByColumn(created_at)",
        "events", "ts", "1h", "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    }
    assert(e1.getMessage.contains("$timeFilterByColumn"))
    val e2 = intercept[IllegalArgumentException] {
      Grafana.expand("SELECT $rate(x) FROM $table", "events", "ts", "1h",
        "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    }
    assert(e2.getMessage.contains("$rate"))
  }

  test("macro expansion rejects non-identifier table/column and bad bounds") {
    intercept[IllegalArgumentException] {
      Grafana.expand(panel, "events; DROP TABLE x", "ts", "1h",
        "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    }
    intercept[Exception] {
      Grafana.expand(panel, "events", "ts", "1h",
        "not-a-time", "2024-01-02 00:00:00")
    }
    intercept[IllegalArgumentException] {
      Grafana.expand(panel, "events", "ts", "1 fortnight",
        "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    }
  }
}
