package graft

import org.apache.spark.sql.functions._

import graft.expressions.VectorOps
import graft.operators.VectorPq

/** Product-quantization properties the rows-only driver gate can't see:
  * code shape/determinism, ADC exactness against a driver-side
  * reconstruction, and the shortlist+re-rank recall floor vs brute force.
  */
class PqSpec extends SparkSpec {

  private val M = 8
  private val K = 16

  private def emb = queries.SimilarityOps.embWithNorm(spark, sf())
    .select(col("vec_id"), col("v"))

  private lazy val books =
    VectorPq.trainCodebooks(emb, "vec_id", "v", M, K, iters = 3,
      trainSampleMod = 2)

  test("codebooks: M*K centroids of dim/M doubles each") {
    val dim = emb.select(size(col("v"))).head.getInt(0)
    assert(books.length == M * K)
    assert(books.forall(_.length == dim / M))
  }

  test("encode: M codes per vector, each within [0, K); deterministic") {
    VectorOps.register(spark)
    val bcId = VectorOps.broadcastCentroids(spark, books)
    def codes() = emb
      .select(col("vec_id"), VectorOps.pqEncodeBc(col("v"), bcId, M).as("c"))
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    val c1 = codes()
    assert(c1.forall { case (_, cs) => cs.length == M && cs.forall(c => c >= 0 && c < K) })
    assert(c1.sameElements(codes()), "encode is not deterministic")
  }

  test("ADC cosine == exact cosine of the driver-side reconstruction") {
    VectorOps.register(spark)
    val bcId = VectorOps.broadcastCentroids(spark, books)
    val rows = emb.limit(20)
      .select(col("v"), VectorOps.pqEncodeBc(col("v"), bcId, M).as("c"),
        VectorOps.pqCosBc(col("v"), VectorOps.pqEncodeBc(col("v"), bcId, M),
          bcId, M).as("adc"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val codes = r.getSeq[Int](1)
      val recon = codes.zipWithIndex.flatMap { case (c, mi) => books(mi * K + c) }.toArray
      val dot = v.zip(recon).map { case (a, b) => a * b }.sum
      val want = dot / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(recon.map(x => x * x).sum))
      assert(math.abs(r.getDouble(2) - want) < 1e-9,
        s"ADC ${r.getDouble(2)} != recon cosine $want")
    }
  }

  test("shortlist+re-rank recall@10 >= 0.8 vs brute-force cosine") {
    val got = VectorPq.searchTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "v", books, M, topK = 10, shortlistK = 150)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val all = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val hits = (0L until 5L).map { q =>
      val want = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> cos(all(q), v) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      want.intersect(got.getOrElse(q, Set.empty)).size
    }.sum
    val recall = hits / 50.0
    assert(recall >= 0.8, s"PQ shortlist recall@10 = $recall < 0.8")
  }

  test("IVF-PQ composed search holds recall@10 >= 0.7 of the flat-PQ result") {
    // The coarse quantizer prunes candidates BEFORE ADC — recall can only
    // drop vs flat PQ; with nProbe=8 of 16 cells it must stay close.
    val cents = graft.operators.VectorIvf.kmeans(emb, "vec_id", "v", 16, 3)
    val got = VectorPq.searchTopKIvf(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "v", cents, books, M, nProbe = 8, topK = 10,
        shortlistK = 150)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val all = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val hits = (0L until 5L).map { q =>
      val want = all.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> cos(all(q), v) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
      want.intersect(got.getOrElse(q, Set.empty)).size
    }.sum
    val recall = hits / 50.0
    assert(recall >= 0.7, s"IVF-PQ recall@10 = $recall < 0.7")
    // every query still returns a full ranked list
    assert(got.values.forall(_.size == 10))
  }

  test("q_sim_pq returns a full ranked top-5 per query") {
    val r = SparkEntry.queries("q_sim_pq")(spark, sf()).collect()
    assert(r.length == 25)
    assert(r.groupBy(_.getLong(0)).forall(_._2.map(_.getInt(1)).sorted.sameElements(1 to 5)))
  }

  test("q_sim_ivfpq (composed IVF-PQ) returns a full ranked top-5 per query") {
    val r = SparkEntry.queries("q_sim_ivfpq")(spark, sf()).collect()
    assert(r.length == 25)
    assert(r.groupBy(_.getLong(0)).forall(_._2.map(_.getInt(1)).sorted.sameElements(1 to 5)))
  }

  test("persisted-index search is row-for-row identical to the in-memory " +
    "IVF-PQ path (same training params)") {
    // identical deterministic training → the persisted path must be a pure
    // layout change, never a semantic one
    val mem = SparkEntry.queries("q_sim_ivfpq")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val store = SparkEntry.queries("q_sim_ivfpq_store")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(store.toSeq == mem.toSeq,
      "persisted-index search diverged from the in-memory IVF-PQ path")
  }
}
