package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** Multimodal plumbing: schema, batch shape, and determinism of the stubbed
  * decode/featurize/resize operators (north star surface).
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Media.fromDocuments(spark, sf())

  test("binary payload survives the typed boundary with correct byte length") {
    val doc = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = media.collect()
    assert(rows.length == doc.size)
    rows.foreach(r => assert(r.bytes.length == doc(r.media_id)))
  }

  test("featurize emits normalized 16-bin histograms deterministically") {
    val out = Media.featurize(media).collect()
    out.foreach { f =>
      assert(f.features.length == 16)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, "histogram not normalized")
      assert(f.frames.nonEmpty)
    }
    // determinism: same input → identical features
    val again = Media.featurize(media).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    out.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("featurize plan is a narrow map (no shuffle)") {
    val plan = Media.featurize(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("resize truncates oversized payloads and flags them") {
    val out = Media.resize(media.toDF(), 64)
    assert(out.filter(col("truncated") && length(col("bytes")) =!= 64).count() == 0)
    assert(out.filter(length(col("bytes")) > 64).count() == 0)
  }
}
