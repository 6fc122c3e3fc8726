package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.expressions.{TextHashes, VectorOps}

/** Product quantization (PQ) ANN — the memory-compression path of the
  * similarity family (Jégou, Douze, Schmid: "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011): the vector space splits
  * into M subspaces, each with its own K-centroid codebook, and a corpus
  * vector is stored as M small codes (M=8, K=16 → 8 ints ≈ 4 bits each —
  * a 64× smaller representation than 64 doubles). Search is asymmetric
  * (ADC): the query stays exact, candidates contribute only their codes,
  * scored against reconstructed centroids.
  *
  * Scale shape mirrors [[VectorIvf]]: training runs on a deterministic
  * hash-sample with codebooks delivered by BROADCAST (no plan literal),
  * and — unlike the naive per-subspace loop — ONE pass per Lloyd round
  * trains all M codebooks simultaneously: the native
  * [[VectorOps.PqEncodeBc]] assigns all M codes per row in one JIT loop,
  * then a single `posexplode(codes)` + `(m, code)` hash aggregate updates
  * every codebook. Search never materializes a corpus vector after
  * encoding: the candidate side of the join carries (id, codes) only; the
  * exact re-rank joins vectors back for the tiny shortlist alone.
  *
  * Like the other trained quantizers, centroid means are distributed FP
  * sums → recall floors are asserted in tests and the declared query is
  * rows-only in the driver gate (same contract as `q_sim_ivf_kmeans`).
  */
object VectorPq {

  /** Trains M codebooks of K centroids (`iters` Lloyd rounds, one data
    * pass per round) on the hash-sample `xxhash64(id) mod trainSampleMod
    * == 0`. Returns the FLAT (M·K)×dsub table (row m·K+k = centroid k of
    * subspace m) that [[VectorOps.pqEncodeBc]]/[[VectorOps.pqCosBc]]
    * consume. Init: the first K sampled vectors by id, sliced. Empty
    * cells keep their previous centroid.
    */
  def trainCodebooks(e: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int,
                     trainSampleMod: Int = 1): Array[Array[Double]] = {
    val spark = e.sparkSession
    VectorOps.register(spark)
    val train0 =
      if (trainSampleMod <= 1) e.select(col(idCol), col(vecCol))
      else e.select(col(idCol), col(vecCol))
        .filter(pmod(xxhash64(col(idCol)), lit(trainSampleMod)) === 0)
    val train = train0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val dimProbe = train.select(size(col(vecCol))).head(1)
      require(dimProbe.nonEmpty,
        s"trainSampleMod=$trainSampleMod selected 0 training rows — lower it")
      val dim = dimProbe(0).getInt(0)
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val dsub = dim / m
      // init: slice the first k sample vectors into all M subspaces
      val seed = train.orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect().map(_.getSeq[Double](0).toArray)
      var books = Array.tabulate(m * k) { i =>
        val (mi, c) = (i / k, i % k)
        seed(math.min(c, seed.length - 1)).slice(mi * dsub, (mi + 1) * dsub)
      }
      (1 to iters).foreach { _ =>
        val bcId = VectorOps.broadcastCentroids(spark, books)
        val stats = train
          .select(col(vecCol),
            VectorOps.pqEncodeBc(col(vecCol), bcId, m).as("_codes"))
          .select(col(vecCol), posexplode(col("_codes")).as(Seq("_m", "_c")))
          .select(col("_m"), col("_c"),
            slice(col(vecCol), col("_m") * lit(dsub) + lit(1), lit(dsub)).as("_sub"))
          .groupBy(col("_m"), col("_c"))
          .agg(array((0 until dsub).map(i =>
            sum(element_at(col("_sub"), i + 1))): _*).as("_s"),
            count(lit(1)).as("_n"))
          .collect()
        val next = books.clone()
        stats.foreach { r =>
          val (mi, c) = (r.getInt(0), r.getInt(1))
          val s = r.getSeq[Double](2); val n = r.getLong(3).toDouble
          next(mi * k + c) = s.map(_ / n).toArray
        }
        books = next
      }
      books
    } finally { train.unpersist(false); () }
  }

  /** IVF-PQ composed search (the FAISS-style big-ANN shape): a coarse
    * k-means quantizer prunes the corpus to the query's `nProbe` cells
    * (equi-join on cell id — the IVF part), PQ codes score the surviving
    * candidates without touching their vectors (the ADC part), and only
    * the final shortlist is re-ranked exactly. At 100 TB the corpus-side
    * state is (id, cell, M codes) ≈ 20 bytes/vector; vectors are read
    * only for the per-query shortlist.
    */
  def searchTopKIvf(e: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, cents: Array[Seq[Double]],
                    books: Array[Array[Double]], m: Int, nProbe: Int,
                    topK: Int, shortlistK: Int = 50,
                    broadcastRowLimit: Long = Joins.BroadcastRowLimit): DataFrame = {
    val spark = e.sparkSession
    VectorOps.register(spark)
    val bcCells = VectorOps.broadcastCentroids(spark, cents.map(_.toArray))
    val bcBooks = VectorOps.broadcastCentroids(spark, books)
    val cand = e.select(col(idCol).as("c_id"),
      VectorOps.nearestCentroidBc(col(vecCol), bcCells).as("cell"),
      VectorOps.pqEncodeBc(col(vecCol), bcBooks, m).as("_codes"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"),
      explode(VectorOps.nearestCentroidsBc(col(vecCol), bcCells, nProbe))
        .as("cell"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("_adc").desc, col("c_id"))
    val shortlist = cand
      .join(Joins.maybeBroadcast(probes, broadcastRowLimit), Seq("cell"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("c_id"),
        VectorOps.pqCosBc(col("qv"), col("_codes"), bcBooks, m).as("_adc"))
      // a vector probing p cells can meet the same candidate ≤p times;
      // dedup before the rank so the shortlist holds distinct candidates
      .groupBy(col("q_id"), col("c_id"))
      .agg(first(col("qv")).as("qv"), max(col("_adc")).as("_adc"))
      .withColumn("_r", row_number().over(wAdc))
      .filter(col("_r") <= shortlistK)
      .select(col("q_id"), col("qv"), col("c_id"))
    rerank(e, idCol, vecCol, shortlist, topK)
  }

  /** Top-`topK` neighbors per query row: ADC-cosine shortlist of
    * `shortlistK` candidates over the CODES (the corpus's vectors never
    * travel through the big join), then exact cosine re-rank of the
    * shortlist only. `books` is [[trainCodebooks]]' flat table.
    */
  def searchTopK(e: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, books: Array[Array[Double]], m: Int,
                 topK: Int, shortlistK: Int = 50,
                 broadcastRowLimit: Long = Joins.BroadcastRowLimit): DataFrame = {
    val spark = e.sparkSession
    VectorOps.register(spark)
    val bcId = VectorOps.broadcastCentroids(spark, books)
    val cand = e.select(col(idCol).as("c_id"),
      VectorOps.pqEncodeBc(col(vecCol), bcId, m).as("_codes"))
    val qs = queries.select(col(idCol).as("q_id"), col(vecCol).as("qv"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("_adc").desc, col("c_id"))
    val shortlist = cand
      .join(Joins.maybeBroadcast(qs, broadcastRowLimit),
        col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("c_id"),
        VectorOps.pqCosBc(col("qv"), col("_codes"), bcId, m).as("_adc"))
      .withColumn("_r", row_number().over(wAdc))
      .filter(col("_r") <= shortlistK)
      .select(col("q_id"), col("qv"), col("c_id"))
    rerank(e, idCol, vecCol, shortlist, topK)
  }

  /** Exact cosine re-rank of a (q_id, qv, c_id) shortlist — vectors join
    * back for the shortlist rows only. Shared with the persisted-index
    * search path (`storage.VectorIndexStore`).
    */
  private[graft] def rerank(e: DataFrame, idCol: String, vecCol: String,
                            shortlist: DataFrame, topK: Int): DataFrame = {
    def nrm(c: Column) = sqrt(TextHashes.vecDot(c, c))
    val scored = shortlist
      .join(e.select(col(idCol).as("c_id"), col(vecCol).as("cv")), Seq("c_id"))
      .select(col("q_id"), col("c_id"),
        (TextHashes.vecDot(col("qv"), col("cv")) /
          (nrm(col("qv")) * nrm(col("cv")))).as("score"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("rank"), col("c_id"),
        round(col("score"), 4).as("score"))
  }
}
