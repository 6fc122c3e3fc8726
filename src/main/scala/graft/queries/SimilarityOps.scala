package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Similarity search over the `embeddings` table (north star extension).
  *
  * FP-determinism contract with the DuckDB oracle: every dot product is a
  * sequential left fold over index order in DOUBLE (Spark `aggregate` ≡ DuckDB
  * `list_reduce`, both left folds; float→double widening is exact), so scores
  * are bit-identical across engines and safe to rank and round.
  *
  * Scale design: brute-force top-k is the correctness baseline (O(Q·N) with a
  * broadcast query set — fine when |Q| is small); the bucketed variant is the
  * 100 TB path: a deterministic hyperplane-sign code (IVF-style coarse
  * quantization) turns all-pairs search into an equi-join on bucket id, so
  * candidate generation is a shuffle-hash join, not a cross join.
  */
object SimilarityOps extends QueryModule {

  /** Sequential-fold dot product of two double arrays — native expression
    * (graft.expressions.TextHashes.VecDot): the same index-order left fold as
    * the interpreted `aggregate(zip_with(...))` form and the DuckDB oracle,
    * ~10× faster (tight JIT loop, no per-element boxing).
    */
  private def dot(a: Column, b: Column): Column =
    graft.expressions.TextHashes.vecDot(a, b)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** 4-bit hyperplane sign code over the first 4 dims (axis-aligned LSH). */
  private def bucket(v: Column): Column =
    concat((0 until 4).map(i =>
      when(element_at(v, i + 1) >= 0, lit("1")).otherwise(lit("0"))): _*)

  private def embWithNorm(s: SparkSession, d: String): DataFrame = {
    graft.operators.Dedup.register(s)
    t(s, d, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** DuckDB fragment: same sequential-fold dot product over DOUBLE[] lists. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(list_zip($a, $b), x -> x[1]*x[2])), (p,q) -> p+q)""".stripMargin

  private val sqlEmb =
    s"""SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"""

  private val sqlNorm =
    s"""SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e"""

  private val sqlBucket =
    "(CASE WHEN v[1] >= 0 THEN '1' ELSE '0' END) || " +
      "(CASE WHEN v[2] >= 0 THEN '1' ELSE '0' END) || " +
      "(CASE WHEN v[3] >= 0 THEN '1' ELSE '0' END) || " +
      "(CASE WHEN v[4] >= 0 THEN '1' ELSE '0' END)"

  def queries: Seq[(String, QFn)] = Seq(
    // Brute-force cosine top-10 for a small query set — the exact baseline.
    "q_sim_topk" -> ((s, d) => {
      val e = embWithNorm(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cn"))
      val scored = q.join(broadcast(c), col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("score"), 4).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Bucketed (IVF/LSH-style) ANN: search only the query's sign-code bucket.
    "q_sim_ivf" -> ((s, d) => {
      val e = embWithNorm(s, d).withColumn("bkt", bucket(col("v")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
          col("bkt"))
      val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("bkt"))
      val scored = q.join(c, Seq("bkt")).filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("score"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("score"), 4).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs via the same bucket join (a ≥ threshold
    // all-pairs search that never cross-joins: candidates share a bucket).
    "q_embed_neardup" -> ((s, d) => {
      val e = embWithNorm(s, d).withColumn("bkt", bucket(col("v")))
      val a = e.select(col("vec_id").as("a"), col("v").as("av"),
        col("nrm").as("an"), col("bkt"))
      val b = e.select(col("vec_id").as("b"), col("v").as("bv"),
        col("nrm").as("bn"), col("bkt"))
      a.join(b, Seq("bkt")).filter(col("a") < col("b"))
        .select(col("a"), col("b"),
          (dot(col("av"), col("bv")) / (col("an") * col("bn"))).as("score"))
        .filter(col("score") >= 0.5)
        .select(col("a"), col("b"), round(col("score"), 4).as("score"))
        .orderBy(col("a"), col("b"))
    }))

  def oracle: Seq[(String, String)] = Seq(
    "q_sim_topk" ->
      s"""WITH e AS ($sqlEmb),
         |  n AS ($sqlNorm),
         |  p AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |      ${sqlDot("q.v", "c.v")} / (q.nrm * c.nrm) AS score
         |    FROM n q JOIN n c ON c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5),
         |  r AS (SELECT q_id, c_id, score, row_number() OVER
         |      (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank FROM p)
         |SELECT q_id, CAST(rank AS INT) AS rank, c_id, round(score,4) AS score
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "q_sim_ivf" ->
      s"""WITH e AS ($sqlEmb),
         |  n AS ($sqlNorm),
         |  nb AS (SELECT vec_id, v, nrm, $sqlBucket AS bkt FROM n),
         |  p AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |      ${sqlDot("q.v", "c.v")} / (q.nrm * c.nrm) AS score
         |    FROM nb q JOIN nb c ON q.bkt = c.bkt AND c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5),
         |  r AS (SELECT q_id, c_id, score, row_number() OVER
         |      (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank FROM p)
         |SELECT q_id, CAST(rank AS INT) AS rank, c_id, round(score,4) AS score
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH e AS ($sqlEmb),
         |  n AS ($sqlNorm),
         |  nb AS (SELECT vec_id, v, nrm, $sqlBucket AS bkt FROM n),
         |  p AS (SELECT x.vec_id AS a, y.vec_id AS b,
         |      ${sqlDot("x.v", "y.v")} / (x.nrm * y.nrm) AS score
         |    FROM nb x JOIN nb y ON x.bkt = y.bkt AND x.vec_id < y.vec_id)
         |SELECT a, b, round(score,4) AS score FROM p
         |WHERE score >= 0.5 ORDER BY a, b""".stripMargin)
}
