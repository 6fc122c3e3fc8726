package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.AccessLog

/** Live syslog receiver + envelope parse — the "Structured Streaming from
  * syslog" north-star path.
  *
  * The reference deployment tails files (`/root/reference/nginx.conf:48-51`,
  * imfile), but its envelope properties (`fromhost`, `syslogtag`,
  * `nginx.conf:18-22`) come from rsyslog's syslog layer; a live deployment
  * receives RFC3164/RFC5424 frames over TCP/UDP (imtcp/imudp). This module
  * is that layer: TCP and UDP line receivers behind the [[Syslog.SyslogSource]]
  * transport seam, plus an envelope parser that feeds the same R2..R8
  * `AccessLog` pipeline, with the hostname/tag taken from each message's own
  * envelope instead of a constant.
  *
  * Scale note: the in-driver TCP/UDP receivers are dev/integration-grade
  * (driver-side buffering, no replay past restart — the same contract as
  * Spark's built-in `socket` source). The production transports are
  * [[Syslog.Kafka]] (durable bus) and [[Syslog.Spooled]] ([[SyslogSpool]]
  * receivers on the ingest nodes → synced rolling files → the
  * checkpointed file source) — both keep frames out of the driver heap
  * and replay past restarts.
  */
object Syslog {

  /** RFC3164 (BSD syslog): `<PRI>Mmm dd hh:mm:ss HOST TAG[pid]: MSG`.
    * Day-of-month is space-padded per the RFC ("Apr  6").
    */
  val Rfc3164: String =
    """^<(\d{1,3})>([A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}) (\S+) ([^:\[\s]+)(?:\[\d+\])?: (.*)$"""

  /** RFC5424: `<PRI>1 ISO8601 HOST APP PROCID MSGID SD MSG` (SD = `-` or
    * one `[...]` element; nested structured-data lists are out of scope).
    */
  val Rfc5424: String =
    """^<(\d{1,3})>1 (\S+) (\S+) (\S+) \S+ \S+ (?:-|\[[^\]]*\]) ?(.*)$"""

  /** Parses syslog envelopes from a `line` column. Emits:
    * facility/severity (from PRI), sl_ts (envelope time; RFC3164 has no year
    * — `assumeYear` supplies it, the same convention rsyslog applies),
    * sl_host, sl_tag, message (the payload for the grammar parse), and
    * sl_corrupt for frames matching neither RFC.
    */
  def parseEnvelope(lines: DataFrame, assumeYear: Int = 2020): DataFrame = {
    val l = col("line")
    val is5424 = l.rlike(Rfc5424)
    def pick(g5424: Int, g3164: Int) =
      when(is5424, regexp_extract(l, Rfc5424, g5424))
        .otherwise(regexp_extract(l, Rfc3164, g3164))
    val pri = pick(1, 1).try_cast("int")
    val ts3164 = try_to_timestamp(
      concat(lit(s"$assumeYear "),
        regexp_replace(regexp_extract(l, Rfc3164, 2), "  ", " ")),
      lit("yyyy MMM d HH:mm:ss"))
    val ts5424 = regexp_extract(l, Rfc5424, 2).try_cast("timestamp")
    lines.select(
      floor(pri / 8).cast("int").as("facility"),
      (pri % 8).cast("int").as("severity"),
      when(is5424, ts5424).otherwise(ts3164).as("sl_ts"),
      pick(3, 3).as("sl_host"),
      pick(4, 4).as("sl_tag"),
      pick(5, 5).as("message"),
      (!is5424 && !l.rlike(Rfc3164)).as("sl_corrupt"))
  }

  /** Transport seam: every receiver yields the same unbounded `line STRING`
    * table, so the envelope/grammar pipeline is transport-agnostic and
    * swapping TCP → UDP → Kafka is a one-line change of the source value.
    *
    *  - [[Tcp]]: Spark's built-in single-connection socket client (imtcp
    *    analog; dev/integration durability).
    *  - [[Udp]]: RFC 5426 datagram receiver ([[UdpSyslogProvider]]; imudp
    *    analog, same dev-grade durability).
    *  - [[Kafka]]: the production front — requires the spark-sql-kafka
    *    connector on the classpath at runtime; offsets/replay come from the
    *    bus, which is what makes the pipeline restart-safe at 100 TB/day.
    *  - [[Files]]: the reference deployment's imfile analog (tail a spool
    *    directory); checkpointable and replayable without a bus.
    */
  sealed trait SyslogSource { def lines(spark: SparkSession): DataFrame }

  final case class Tcp(host: String, port: Int) extends SyslogSource {
    def lines(spark: SparkSession): DataFrame =
      spark.readStream.format("socket")
        .option("host", host).option("port", port)
        .load()
        .withColumnRenamed("value", "line")
  }

  final case class Udp(port: Int, bind: String = "127.0.0.1") extends SyslogSource {
    def lines(spark: SparkSession): DataFrame =
      spark.readStream.format(classOf[UdpSyslogProvider].getName)
        .option("port", port).option("bind", bind)
        .load()
  }

  final case class Kafka(bootstrap: String, topic: String) extends SyslogSource {
    def lines(spark: SparkSession): DataFrame = {
      // fail at construction with an actionable message, not at stream start
      // with a ClassNotFoundException from deep inside source resolution
      require(Kafka.connectorAvailable,
        "the 'kafka' data source is not on the classpath — deploy " +
          "org.apache.spark:spark-sql-kafka-0-10_2.13 (same version as " +
          "Spark) to use Syslog.Kafka; Spooled covers durable ingest " +
          "without a bus")
      Kafka.project(
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrap)
          .option("subscribe", topic)
          .load())
    }
  }

  object Kafka {
    /** True when the `kafka` source provider is registered on the classpath
      * — the same `ServiceLoader[DataSourceRegister]` lookup Spark's own
      * source resolution performs.
      */
    lazy val connectorAvailable: Boolean = {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader
        .load(classOf[org.apache.spark.sql.sources.DataSourceRegister],
          Thread.currentThread.getContextClassLoader)
        .asScala.exists(_.shortName() == "kafka")
    }

    /** Kafka record batch (key/value binary + topic/partition/offset) →
      * the transport-agnostic `line STRING` table. Factored out of the
      * streaming source so the projection the pipeline depends on is
      * testable against kafka-SHAPED batches in environments without the
      * connector (this sandbox has no broker and no egress to fetch one —
      * the wiring is covered, the broker round-trip is a documented
      * standing limitation, SURVEY §12).
      */
    def project(records: DataFrame): DataFrame =
      records.selectExpr("CAST(value AS STRING) AS line")
  }

  final case class Files(dir: String) extends SyslogSource {
    def lines(spark: SparkSession): DataFrame =
      spark.readStream.text(dir).withColumnRenamed("value", "line")
  }

  /** The durable receiver path: any number of [[SyslogSpool]] UDP/TCP
    * receivers — plain JVMs on the ingest nodes, NOT in the Spark driver —
    * write frames to synced, atomically-renamed rolling files under `dir`,
    * and the query tails them with the checkpointed file source. Frames
    * survive both receiver and query restarts once rolled (the two-barrier
    * contract documented on [[SyslogSpool]]); read parallelism is the
    * number of spool files per micro-batch.
    */
  final case class Spooled(dir: String) extends SyslogSource {
    def lines(spark: SparkSession): DataFrame = Files(dir).lines(spark)
  }

  /** The unbounded syslog line table for any transport. */
  def from(spark: SparkSession, source: SyslogSource): DataFrame =
    source.lines(spark)

  /** R1-live: TCP line source (kept as the named entry point; equivalent to
    * `from(spark, Tcp(host, port))`).
    */
  def fromSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    from(spark, Tcp(host, port))

  /** Envelope parse → grammar parse → project, with per-message envelope
    * hostname/tag. Corrupt FRAMES (bad envelope) are dropped here; corrupt
    * PAYLOADS (bad access-log line inside a good envelope) flow through with
    * `_corrupt` = true for the dead-letter split, same as file ingest.
    */
  def transform(lines: DataFrame, assumeYear: Int = 2020): DataFrame = {
    val env = parseEnvelope(lines, assumeYear).filter(!col("sl_corrupt"))
    AccessLog.projectCols(
      env.select(col("message").as("line"), col("sl_host"), col("sl_tag")),
      col("sl_host"), col("sl_tag"))
  }
}
