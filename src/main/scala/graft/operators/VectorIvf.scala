package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorOps

/** IVF (inverted-file) ANN: coarse quantization by k-means centroids, search
  * probes only the query's `nProbe` nearest cells — the centroid-based
  * complement to the hyperplane-LSH family in `queries/SimilarityOps`.
  *
  * Scale shape: training is Lloyd's algorithm with BROADCAST centroids (k·dim
  * doubles — kilobytes) — each iteration is one narrow assign pass + one
  * k-group aggregate; nothing driver-side ever exceeds k·dim. Search is an
  * equi-join on cell id (candidates = vectors in probed cells), then exact
  * re-rank of candidates only. Assignment runs in the native
  * [[VectorOps.NearestCentroid]] expression: k·dim multiplies per row in one
  * JIT loop.
  *
  * Determinism note: init is the first k vectors by id and iteration count is
  * fixed, but centroid MEANS are distributed double sums (partial-order
  * dependent in the last ulp), so cell boundaries — and therefore recall, not
  * correctness — can wobble across cluster layouts. The exact re-rank keeps
  * returned scores exact; tests assert recall floors, not byte equality
  * (hence rows-only in the driver gate, like the MinHash family).
  */
object VectorIvf {

  /** `iters` Lloyd rounds from a deterministic init (first k vectors by id).
    * Returns k×dim centroids (empty cells keep their previous centroid).
    */
  def kmeans(e: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int): Array[Seq[Double]] = {
    VectorOps.register(e.sparkSession)
    val dim = e.select(size(col(vecCol))).head().getInt(0)
    var cents: Array[Seq[Double]] = e.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Double](0))
    (1 to iters).foreach { _ =>
      val assigned = e.withColumn("_cell",
        VectorOps.nearestCentroid(col(vecCol), typedlit(cents.toSeq)))
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
  }

  /** Top-`topK` neighbors for each row of `queries` among `e`, probing the
    * query's `nProbe` nearest cells. Both inputs need (idCol, vecCol).
    */
  def searchTopK(e: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, cents: Array[Seq[Double]], nProbe: Int,
                 topK: Int): DataFrame = {
    VectorOps.register(e.sparkSession)
    val centsLit = typedlit(cents.toSeq)
    def norm(v: Column) = sqrt(graft.expressions.TextHashes.vecDot(v, v))
    val cand = e.select(col(idCol).as("c_id"), col(vecCol).as("cv"),
      VectorOps.nearestCentroid(col(vecCol), centsLit).as("cell"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(VectorOps.nearestCentroids(col(vecCol), centsLit,
          lit(nProbe))).as("cell"))
    val scored = cand.join(broadcast(probes), Seq("cell"))
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
