package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star: image/audio/video at 100 TB).
  *
  * Media travels as an opaque `binary` column plus typed metadata — the same
  * philosophy as the reference's `blob` escape-hatch column
  * (`/root/reference/README.md:90,242`): raw bytes are never shredded, typed
  * views are derived. All Spark-side mechanics — schema, per-partition
  * batching, deterministic output shape — are real and tested; the actual
  * codec call is stubbed (this container ships no image/audio libs) behind
  * `decodeStub`, clearly marked, so swapping in a real decoder changes one
  * function.
  *
  * Scale shape: decode/featurize run in `mapPartitions` so per-partition
  * setup (codec init, model load) is amortized across rows — the Scala analog
  * of a Pandas-UDF `mapInPandas` batch loop — and the operator stays a narrow
  * transform: no shuffle, linear scaling with executors.
  */
object Media {

  /** One media row: id, raw bytes, declared format + dimensions metadata. */
  case class MediaRow(media_id: Long, bytes: Array[Byte], format: String,
                      width: Int, height: Int)

  /** Decoded/featurized output: per-row feature vector + sampled frames. */
  case class MediaFeatures(media_id: Long, n_bytes: Int, format: String,
                           features: Array[Double], frames: Array[Array[Byte]])

  /** STUB — stands in for the real codec (no image/audio libs in this
    * container). Deterministic: a 16-bin byte histogram normalized to [0,1].
    * Replace with e.g. a JNI/Java ImageIO decode; the signature is the
    * contract.
    */
  def decodeStub(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    hist.map(_ / n)
  }

  /** STUB frame sampler: every `stride`-th 8-byte slice stands in for a video
    * frame grab; real implementation would seek keyframes.
    */
  def frameSampleStub(bytes: Array[Byte], stride: Int): Array[Array[Byte]] =
    bytes.grouped(8).zipWithIndex.collect {
      case (g, i) if i % stride == 0 => g
    }.toArray

  /** The featurize operator: mapPartitions so codec setup happens once per
    * partition, not per row.
    */
  def featurize(media: Dataset[MediaRow], frameStride: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize codec/model HERE, once per partition
      rows.map { r =>
        MediaFeatures(r.media_id, r.bytes.length, r.format,
          decodeStub(r.bytes), frameSampleStub(r.bytes, frameStride))
      }
    }
  }

  /** Resize stub as a pure column op: truncate bytes to a target size bound
    * (placeholder for a real scale-down) while keeping metadata consistent.
    */
  def resize(df: DataFrame, maxBytes: Int): DataFrame =
    df.withColumn("bytes",
        expr(s"CASE WHEN length(bytes) > $maxBytes THEN substring(bytes, 1, $maxBytes) ELSE bytes END"))
      .withColumn("truncated", length(col("bytes")) === maxBytes)

  /** Synthesize a MediaRow dataset from the documents table (text bytes as
    * the opaque payload) — lets every test and demo run on driver testdata.
    */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.table(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("bytes"),
        lit("text/plain").as("format"),
        lit(0).as("width"), lit(0).as("height"))
      .as[MediaRow]
  }
}
