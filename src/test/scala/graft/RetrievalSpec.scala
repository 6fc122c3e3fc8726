package graft

import org.apache.spark.sql.functions._

/** Properties of the retrieval/prep family that the value-equality oracle
  * gate can't express: ranking quality of the quantized ANN vs the exact
  * scorer, BM25 term sensitivity, shard-packing invariants, and stratum
  * coverage of the deterministic sampler.
  */
class RetrievalSpec extends SparkSpec {

  test("int8-quantized top-10 overlaps exact cosine top-10 (recall >= 0.8)") {
    val exact = SparkEntry.queries("q_sim_topk")(spark, sf())
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = SparkEntry.queries("q_sim_quant")(spark, sf())
      .select(col("q_id"), col("c_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"8-bit quantization lost too much ranking signal: recall $recall")
  }

  test("bm25 ranks docs by query-term density, scores strictly positive") {
    val top = SparkEntry.queries("q_bm25")(spark, sf()).collect()
    assert(top.length == 20)
    assert(top.forall(_.getDouble(1) > 0.0), "bm25 scores must be positive")
    // the top doc must actually contain at least two distinct query terms
    val topDoc = top.head.getLong(0)
    val text = Tables.table(spark, sf(), "documents")
      .filter(col("doc_id") === topDoc).select("text").collect()(0).getString(0)
    val hits = Seq("spark", "vector", "stream").count(text.split(" ").contains)
    assert(hits >= 2, s"top bm25 doc $topDoc contains only $hits query terms")
  }

  test("prep pipeline: shards are contiguous, ordered, and budget-bounded") {
    val out = SparkEntry.queries("q_prep_pipeline")(spark, sf()).collect()
    assert(out.nonEmpty)
    // shard ids never decrease in doc order and start at 0
    val shards = out.map(_.getLong(2))
    assert(shards.head == 0L && shards.sameElements(shards.sorted))
    // every doc fits its shard: weight of a shard (minus its last doc that
    // may straddle the boundary) stays under the 4096 budget
    val byShard = out.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(1)))
    byShard.foreach { case (sid, ws) =>
      assert(ws.dropRight(1).sum < 4096L,
        s"shard $sid overfilled before its last doc: ${ws.sum}")
    }
  }

  test("stratified sample returns exactly 5 docs per language, deterministic") {
    val a = SparkEntry.queries("q_sample_stratified")(spark, sf()).collect()
    val b = SparkEntry.queries("q_sample_stratified")(spark, sf()).collect()
    assert(a.sameElements(b), "sample must be retry-stable")
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ == 5), s"per-stratum counts: ${perLang.toMap}")
    assert(perLang.keys.toSet == Set("en", "zh", "fr", "es", "de"))
  }
}
