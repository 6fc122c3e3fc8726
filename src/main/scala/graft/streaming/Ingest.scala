package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.AccessLog
import graft.storage.LogTableWriter

/** The reference's ingest pipeline (SURVEY §3.1) on Structured Streaming:
  *
  * ```
  * access.log dir ──readStream.text──► parse(R3) ─ lookup(R5) ─ project(R7/R8)
  *   ──foreachBatch──► partitioned+sorted parquet (R11)
  * ```
  *
  * vs the reference (`/root/reference/nginx.conf:48-64`): imfile → the
  * file-source with `maxFilesPerTrigger`; the rsyslog main queue → micro-batch
  * planning; the omclickhouse async action queue (at-least-once) → checkpointed
  * `foreachBatch` (exactly-once file sink — an upgrade, documented).
  *
  * The whole parse→project stage is narrow (no shuffle before the sink's
  * `repartition(logdate)`), so streaming throughput scales linearly with
  * executors at any data volume.
  */
object Ingest {

  /** R1: the file-tail source. One row per line, envelope columns from config
    * (`/root/reference/nginx.conf:51`: tag="nginx"; hostname from the syslog
    * envelope, `nginx.conf:18-22`).
    */
  def source(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)
      .withColumnRenamed("value", "line")

  /** Batch replay of the same pipeline (for backfills and parity tests). */
  def batchSource(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir).withColumnRenamed("value", "line")

  /** R2..R8 composed — identical code path for stream and batch. */
  def transform(lines: DataFrame, hostname: String = "localhost"): DataFrame =
    AccessLog.project(lines, hostname)

  /** R9: the sink. Each micro-batch lands as partitioned parquet under its
    * own `batch=<id>` directory, written with OVERWRITE — so a checkpointed
    * replay of batch N (foreachBatch is only at-least-once) rewrites exactly
    * `batch=N` and nothing else. Idempotent writes + the checkpoint give
    * end-to-end effectively-once delivery; the dead-letter text write uses
    * the same per-batch layout for the same reason.
    *
    * Readers use [[readStore]] (drops the physical `batch` column);
    * `LogTableWriter.compact` collapses the per-batch small files into the
    * sorted daily layout once a day's ingest is complete.
    *
    * R4 upgrade (SURVEY: "explicit `_corrupt` boolean + dead-letter filter"):
    * corrupt lines are split to `deadLetterDir` with the raw `message`
    * preserved instead of silently degrading into empty-string rows the way
    * the reference's template does.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
            deadLetterDir: Option[String] = None,
            maxFilesPerTrigger: Int = 16): StreamingQuery =
    startTransformed(transform(source(spark, inDir, maxFilesPerTrigger)),
      outDir, checkpointDir, trigger, deadLetterDir)

  /** The same checkpointed ingest over the durable SYSLOG transport
    * (R1+R2 composed): spool frames → envelope parse (corrupt FRAMES
    * dropped) → grammar parse/project with per-message hostname/tag →
    * the idempotent per-batch sink. This is the full reference topology
    * (`/root/reference/nginx.conf:18-22,48-64`) end to end.
    */
  def startSyslog(spark: SparkSession, spoolDir: String, outDir: String,
                  checkpointDir: String,
                  trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
                  deadLetterDir: Option[String] = None,
                  assumeYear: Int = 2020): StreamingQuery =
    startTransformed(
      Syslog.transform(Syslog.from(spark, Syslog.Spooled(spoolDir)), assumeYear),
      outDir, checkpointDir, trigger, deadLetterDir)

  private def startTransformed(projected: DataFrame, outDir: String,
                               checkpointDir: String, trigger: Trigger,
                               deadLetterDir: Option[String]): StreamingQuery =
    projected
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions.col
        val good = deadLetterDir match {
          case Some(dl) =>
            batch.filter(col("_corrupt"))
              .select("message")
              .write.mode("overwrite").text(s"$dl/batch=$batchId")
            batch.filter(!col("_corrupt"))
          case None => batch
        }
        good.write
          .mode("overwrite")
          .option("compression", "zstd")
          .partitionBy("logdate")
          .parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Reads an ingest store back as the logical log table (the physical
    * per-batch idempotence directories surface as a `batch` partition
    * column, which is dropped here).
    */
  def readStore(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch")

  /** Reads the dead-letter store (raw corrupt lines, batch column dropped). */
  def readDeadLetters(spark: SparkSession, dlDir: String): DataFrame =
    spark.read.text(dlDir).drop("batch")
}
