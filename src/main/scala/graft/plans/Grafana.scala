package graft.plans

/** Grafana→engine macro expansion for the dashboard SQL surface.
  *
  * The reference wires Grafana to ClickHouse through the
  * vertamedia-clickhouse-datasource plugin and documents ONE panel query
  * (`/root/reference/README.md:279-286`):
  *
  * {{{
  * SELECT
  *     $timeSeries as t,
  *     count(*) as Count
  * FROM $table
  * WHERE $timeFilter
  * GROUP BY t
  * ORDER BY t
  * }}}
  *
  * The engine answers the EXPANDED forms (`q_timeseries_count/filtered/
  * zerofill`), but a user pasting the macro form verbatim got a parse
  * error — this closes that last verbatim-surface gap. The plugin's macros
  * rewrite to Spark SQL as:
  *
  *   - `$timeSeries`  → the `$interval`-floored time bucket,
  *     `timestamp_seconds(floor(unix_timestamp(col)/N)*N)` — the Spark
  *     equivalent of the plugin's `intDiv(toUInt32(col), N) * N`
  *   - `$timeFilter`  → `col >= timestamp'from' AND col <= timestamp'to'`
  *   - `$table`       → the engine table/view name
  *   - `$from`/`$to`  → epoch-second literals
  *   - `$interval`    → the interval in seconds
  *
  * GrafanaSpec golden-tests the README query's expansion text and proves
  * the expanded SQL computes the same buckets as the engine's native
  * dashboard query over the same window.
  */
object Grafana {

  /** Expands the Grafana macros in `sql` for the engine's SQL surface.
    *
    * @param interval panel interval — `"250ms"`, `"30s"`, `"15m"`, `"1h"`,
    *                 `"1d"`, or a bare second count. Sub-second intervals
    *                 bucket on `unix_millis` (the plugin's ms-granularity
    *                 `$timeSeries` for sub-second panels); whole-second
    *                 intervals keep the second-based form.
    * @param from,to  closed window bounds, `yyyy-MM-dd HH:mm:ss` (UTC,
    *                 matching the engine's session timezone)
    */
  def expand(sql: String, table: String, timeColumn: String,
             interval: String, from: String, to: String): String = {
    // both names are interpolated into SQL text — identifiers only
    graft.streaming.JdbcSink.requireIdent(table)
    graft.streaming.JdbcSink.requireIdent(timeColumn)
    val nMs = intervalMillis(interval)
    val n = nMs / 1000
    val bucket =
      if (nMs % 1000 == 0)
        s"timestamp_seconds(floor(unix_timestamp($timeColumn) / $n) * $n)"
      else
        s"timestamp_millis(CAST(floor(unix_millis($timeColumn) / $nMs)" +
          s" * $nMs AS BIGINT))"
    val filter = s"$timeColumn >= timestamp'${ts(from)}'" +
      s" AND $timeColumn <= timestamp'${ts(to)}'"
    // token-boundary replacement: a plain String.replace would silently
    // mangle any macro sharing a prefix with a supported one (the plugin
    // really has e.g. $timeFilterByColumn) into garbled SQL
    def sub(src: String, macroName: String, replacement: String): String =
      (s"\\$$$macroName(?![A-Za-z0-9_])").r
        .replaceAllIn(src, java.util.regex.Matcher.quoteReplacement(replacement))
    val out = Seq[(String, String)](
      "timeSeries"  -> bucket,
      "timeFilter"  -> filter,
      "table"       -> table,
      "from"        -> epochSec(from).toString,
      "to"          -> epochSec(to).toString,
      "interval"    -> math.max(n, 1L).toString,
      "interval_ms" -> nMs.toString)
      .foldLeft(sql) { case (acc, (m, r)) => sub(acc, m, r) }
    // any macro left over is one this layer does NOT support — fail loudly
    // instead of handing Spark unparseable SQL
    "\\$[A-Za-z_][A-Za-z0-9_]*".r.findFirstIn(out).foreach { m =>
      throw new IllegalArgumentException(s"unsupported Grafana macro: $m")
    }
    out
  }

  private val Fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Validates-and-normalizes a bound (it is interpolated into SQL). */
  private def ts(s: String): String =
    java.time.LocalDateTime.parse(s, Fmt).format(Fmt)

  private def epochSec(s: String): Long =
    java.time.LocalDateTime.parse(s, Fmt).toEpochSecond(java.time.ZoneOffset.UTC)

  private def intervalMillis(interval: String): Long = {
    val m = "^(\\d+)(ms|[smhd]?)$".r.findFirstMatchIn(interval.trim).getOrElse(
      throw new IllegalArgumentException(s"bad interval: $interval"))
    val unit = m.group(2) match {
      case "ms"     => 1L
      case "" | "s" => 1000L
      case "m"      => 60000L
      case "h"      => 3600000L
      case "d"      => 86400000L
    }
    val v = m.group(1).toLong * unit
    require(v > 0, s"bad interval: $interval")
    v
  }
}
