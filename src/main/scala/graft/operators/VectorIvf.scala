package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.expressions.VectorOps

/** IVF (inverted-file) ANN: coarse quantization by k-means centroids, search
  * probes only the query's `nProbe` nearest cells — the centroid-based
  * complement to the hyperplane-LSH family in `queries/SimilarityOps`.
  *
  * Scale shape: training is Lloyd's algorithm over a DETERMINISTIC HASH
  * SAMPLE of the corpus (`trainSampleMod` — the same hash-range primitive as
  * q_sample_hash, so the training set is reproducible and retry-safe; k·√N
  * samples estimate centroids as well as the full corpus for quantization
  * purposes), persisted across iterations and unpersisted on exit. Centroids
  * travel to executors as a BROADCAST variable (the expression carries only
  * the handle — no k·dim plan literal, so k in the thousands neither bloats
  * the plan nor re-ships per task). Each iteration is one narrow assign pass
  * + one k-group aggregate; nothing driver-side ever exceeds k·dim. Search
  * is an equi-join on cell id (candidates = vectors in probed cells), then
  * exact re-rank of candidates only. Assignment runs in the native
  * [[VectorOps.NearestCentroidBc]] expression: k·dim multiplies per row in
  * one JIT loop.
  *
  * Determinism note: init is the first k sampled vectors by id and iteration
  * count is fixed, but centroid MEANS are distributed double sums
  * (partial-order dependent in the last ulp), so cell boundaries — and
  * therefore recall, not correctness — can wobble across cluster layouts.
  * The exact re-rank keeps returned scores exact; tests assert recall
  * floors, not byte equality (hence rows-only in the driver gate, like the
  * MinHash family).
  */
object VectorIvf {

  /** `iters` Lloyd rounds from a deterministic init (first k training
    * vectors by id). `trainSampleMod` > 1 trains on the hash-sample
    * `xxhash64(id) mod m == 0` (≈ 1/m of the corpus) instead of every row —
    * the 100 TB path: quantizer quality needs a sample, not the corpus.
    * Returns k×dim centroids (empty cells keep their previous centroid; if
    * the sample has fewer than k rows, k degrades to the sample size).
    */
  def kmeans(e: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int, trainSampleMod: Int = 1): Array[Seq[Double]] = {
    VectorOps.register(e.sparkSession)
    val train0 =
      if (trainSampleMod <= 1) e.select(col(idCol), col(vecCol))
      else e.select(col(idCol), col(vecCol))
        .filter(pmod(xxhash64(col(idCol)), lit(trainSampleMod)) === 0)
    val train = train0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = train.select(size(col(vecCol))).head().getInt(0)
      var cents: Array[Seq[Double]] = train.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect().map(_.getSeq[Double](0))
      (1 to iters).foreach { _ =>
        val bcId = VectorOps.broadcastCentroids(e.sparkSession,
          cents.map(_.toArray))
        val assigned = train.withColumn("_cell",
          VectorOps.nearestCentroidBc(col(vecCol), bcId))
        val stats = assigned.groupBy(col("_cell"))
          .agg(array((0 until dim).map(i =>
            sum(element_at(col(vecCol), i + 1))): _*).as("_s"),
            count(lit(1)).as("_n"))
          .collect()
        val next = cents.clone()
        stats.foreach { r =>
          val cell = r.getInt(0)
          val s = r.getSeq[Double](1); val n = r.getLong(2).toDouble
          next(cell) = s.map(_ / n)
        }
        cents = next
      }
      cents
    } finally { train.unpersist(false); () }
  }

  /** Top-`topK` neighbors for each row of `queries` among `e`, probing the
    * query's `nProbe` nearest cells. Both inputs need (idCol, vecCol).
    */
  def searchTopK(e: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, cents: Array[Seq[Double]], nProbe: Int,
                 topK: Int,
                 broadcastRowLimit: Long = Joins.BroadcastRowLimit): DataFrame = {
    VectorOps.register(e.sparkSession)
    val bcId = VectorOps.broadcastCentroids(e.sparkSession,
      cents.map(_.toArray))
    def norm(v: Column) = sqrt(graft.expressions.TextHashes.vecDot(v, v))
    val cand = e.select(col(idCol).as("c_id"), col(vecCol).as("cv"),
      VectorOps.nearestCentroidBc(col(vecCol), bcId).as("cell"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(VectorOps.nearestCentroidsBc(col(vecCol), bcId, nProbe))
          .as("cell"))
    val scored = cand.join(Joins.maybeBroadcast(probes, broadcastRowLimit), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        (graft.expressions.TextHashes.vecDot(col("qv"), col("cv")) /
          (norm(col("qv")) * norm(col("cv")))).as("score"))
      .groupBy(col("q_id"), col("c_id")).agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("c_id"),
        round(col("score"), 4).as("score"))
  }
}
