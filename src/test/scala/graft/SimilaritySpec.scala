package graft

import org.apache.spark.sql.functions._

/** Similarity-search correctness: declared queries vs a driver-side
  * brute-force recomputation (SURVEY §7.3 #4).
  */
class SimilaritySpec extends SparkSpec {

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private lazy val vecs = Tables.table(spark, sf(), "embeddings")
    .select(col("vec_id"), col("embedding"))
    .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap

  test("q_sim_topk matches brute-force top-10 per query vector") {
    val got = queries.SimilarityOps.queries.toMap
      .apply("q_sim_topk")(spark, sf())
      .collect().groupBy(_.getLong(0))
    (0L until 5L).foreach { q =>
      val expect = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => id -> cosine(vecs(q), v) }
        .sortBy { case (id, s) => (-s, id) }.take(10)
      val rows = got(q).sortBy(_.getInt(1))
      assert(rows.length == 10)
      expect.zip(rows).zipWithIndex.foreach { case (((eid, es), r), i) =>
        assert(r.getLong(2) == eid, s"q=$q rank=${i + 1}")
        assert(math.abs(r.getDouble(3) - es) < 5e-5, s"q=$q score")
      }
    }
  }

  test("q_sim_ivf returns a subset consistent with the bucket restriction") {
    def bucketOf(v: Seq[Float]): String =
      (0 until 4).map(i => if (v(i) >= 0) '1' else '0').mkString
    val rows = queries.SimilarityOps.queries.toMap
      .apply("q_sim_ivf")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getLong(0); val c = r.getLong(2)
      assert(bucketOf(vecs(q)) == bucketOf(vecs(c)), "candidate outside bucket")
      assert(math.abs(r.getDouble(3) - cosine(vecs(q), vecs(c))) < 5e-5)
    }
  }

  test("approx_count_distinct within 5% of exact (q_approx_distinct contract)") {
    val li = Tables.table(spark, sf(), "lineitem")
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05)
  }
}
