package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north star extension).
  *
  * FP-determinism contract with the DuckDB oracle: every dot product is a
  * sequential left fold over index order in DOUBLE (Spark `aggregate` ≡ DuckDB
  * `list_reduce`, both left folds; float→double widening is exact), so scores
  * are bit-identical across engines and safe to rank and round. The LSH band
  * codes below inherit the same guarantee: each code bit is the sign of a
  * left-fold dot against a ±1 hyperplane, so Spark and DuckDB compute the
  * exact same bucket assignment.
  *
  * Scale design: brute-force top-k is the correctness baseline — O(Q·N) with
  * the SMALL query set broadcast against the streamed candidate table, so the
  * big side never leaves the executors. The banded-LSH variant is the 100 TB
  * path: `Lsh.Bands` independent `Lsh.BandBits`-bit sign codes from fixed
  * pseudo-random hyperplanes; candidates are pairs sharing ≥1 band code (an
  * equi-join on the code string — bucket count 2^BandBits per band, so join
  * parallelism and per-bucket pair counts are tunable by one constant), then
  * exact cosine re-rank. Banding ORs the bands (classic LSH amplification):
  * per-band collision p^bits, overall recall 1-(1-p^bits)^bands — high for
  * true near-duplicates, and the candidate volume shrinks geometrically with
  * BandBits (SimilaritySpec asserts both properties).
  */
object SimilarityOps extends QueryModule {

  /** Fixed pseudo-random ±1 hyperplanes for sign-LSH over 64-dim embeddings.
    * Deterministic (splitmix64 bit mix of the plane/dim index) — no RNG at
    * plan time, identical constants on every engine and every run.
    */
  object Lsh {
    val Dim = 64

    /** Default geometry: 4 bands × 8 bits = 32 hyperplanes, 256 buckets/band.
      * At N rows/band-bucket ≈ N/256 on spread-out data, the within-bucket
      * pair count is (N/256)²·256 per band — quadratic dampened by 1/256, and
      * raising BandBits shrinks it 4× per extra bit (the scale dial).
      */
    val BandBits = 8
    val Bands = 4

    /** Near-dup geometry: the 0.5-cosine threshold is a LOW similarity bar
      * (θ=60°, per-bit collision only 2/3), so recall needs wider OR-
      * amplification: narrower bands, more of them. The candidate volume is
      * correspondingly higher — the information-theoretic LSH tradeoff; for a
      * true near-duplicate corpus (cos ≥ 0.9) the default (8,4) geometry cuts
      * candidates ~15× (SimilaritySpec's shrink test demonstrates the dial).
      */
    val NearDupBits = 5
    val NearDupBands = 8

    private def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    /** Component i of hyperplane j: ±1.0, deterministic. */
    def sign(j: Int, i: Int): Double =
      if ((mix(j.toLong * Dim + i) & 1L) == 0L) 1.0 else -1.0

    def hyperplane(j: Int): Seq[Double] = (0 until Dim).map(i => sign(j, i))

    /** Band code `g` of vector column `v`: "<g>:" + BandBits sign chars. */
    def bandCode(v: Column, g: Int, bits: Int): Column =
      concat((lit(s"$g:") +: (0 until bits).map { b =>
        val dot = graft.expressions.TextHashes.vecDot(
          v, typedlit(hyperplane(g * bits + b)))
        when(dot >= 0, lit("1")).otherwise(lit("0"))
      }): _*)

    /** All band codes of `v` as an array (explode for the candidate join). */
    def bandCodes(v: Column, bits: Int = BandBits, bands: Int = Bands): Column =
      array((0 until bands).map(g => bandCode(v, g, bits)): _*)

    /** DuckDB mirror of one hyperplane dot: the same left fold against the
      * same ±1 literal list — bit-identical to VecDot.
      */
    private def sqlDotPlane(vExpr: String, j: Int): String = {
      val lits = hyperplane(j).map(d => if (d > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(list_zip($vExpr, $lits), x -> x[1]*x[2])),
         |      (p,q) -> p+q)""".stripMargin
    }

    def sqlBandCode(g: Int, bits: Int): String =
      s"'$g:' || " + (0 until bits).map { b =>
        s"(CASE WHEN ${sqlDotPlane("v", g * bits + b)} >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")

    def sqlBandCodes(bits: Int = BandBits, bands: Int = Bands): String =
      (0 until bands).map(g => sqlBandCode(g, bits)).mkString("[", ", ", "]")
  }

  /** Sequential-fold dot product of two double arrays — native expression
    * (graft.expressions.TextHashes.VecDot): the same index-order left fold as
    * the interpreted `aggregate(zip_with(...))` form and the DuckDB oracle,
    * ~10× faster (tight JIT loop, no per-element boxing).
    */
  private def dot(a: Column, b: Column): Column =
    graft.expressions.TextHashes.vecDot(a, b)

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  private[graft] def embWithNorm(s: SparkSession, d: String): DataFrame = {
    graft.operators.Dedup.register(s)
    t(s, d, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** LSH candidate pairs (a < b) sharing ≥1 band code. Only (code, vec_id)
    * rows flow through the shuffle — vectors are re-attached by the caller,
    * so the band join never carries a 64-double payload.
    */
  private[graft] def lshCandidates(e: DataFrame, bits: Int, bands: Int): DataFrame = {
    val codes = e.select(col("vec_id"),
      explode(Lsh.bandCodes(col("v"), bits, bands)).as("code"))
    codes.select(col("code"), col("vec_id").as("a"))
      .join(codes.select(col("code"), col("vec_id").as("b")), Seq("code"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** DuckDB fragment: same sequential-fold dot product over DOUBLE[] lists. */
  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(list_zip($a, $b), x -> x[1]*x[2])), (p,q) -> p+q)""".stripMargin

  private val sqlEmb =
    s"""SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"""

  private val sqlNorm =
    s"""SELECT vec_id, v, sqrt(${sqlDot("v", "v")}) AS nrm FROM e"""

  private def sqlCodes(bits: Int = Lsh.BandBits, bands: Int = Lsh.Bands): String =
    s"""SELECT vec_id, unnest(${Lsh.sqlBandCodes(bits, bands)}) AS code FROM n"""

  def queries: Seq[(String, QFn)] = Seq(
    // Brute-force cosine top-10 for a small query set — the exact baseline.
    // The SMALL query set is the broadcast/build side; the full candidate
    // table streams through the BroadcastNestedLoopJoin probe side, so
    // nothing unbounded is ever collected to one node (PlanSpec asserts the
    // build side carries the vec_id<5 filter).
    "q_sim_topk" -> ((s, d) => {
      val e = embWithNorm(s, d)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("nrm").as("cn"))
      val scored = c.join(broadcast(q), col("c_id") =!= col("q_id"))
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

    // Banded-LSH ANN: candidates share ≥1 of the query's band codes (id-only
    // equi-join on the code string), exact cosine re-rank, top-5.
    "q_sim_ivf" -> ((s, d) => {
      val e = embWithNorm(s, d)
      val codes = e.select(col("vec_id"),
        explode(Lsh.bandCodes(col("v"))).as("code"))
      val qCodes = codes.filter(col("vec_id") < 5)
        .select(col("code"), col("vec_id").as("q_id"))
      val cand = codes.select(col("code"), col("vec_id").as("c_id"))
        .join(broadcast(qCodes), Seq("code"))
        .filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id")).distinct()
      val scored = cand
        .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"),
          col("nrm").as("qn")), Seq("q_id"))
        .join(e.select(col("vec_id").as("c_id"), col("v").as("cv"),
          col("nrm").as("cn")), Seq("c_id"))
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

    // True IVF ANN (k-means coarse quantizer + nProbe cell probing) — the
    // centroid-based complement to the hyperplane-LSH family. Rows-only in
    // the driver gate: centroid means are distributed FP sums (see
    // operators/VectorIvf doc); recall floors asserted in SimilaritySpec.
    "q_sim_ivf_kmeans" -> ((s, d) => {
      val e = embWithNorm(s, d).select(col("vec_id"), col("v"))
      val cents = graft.operators.VectorIvf.kmeans(e, "vec_id", "v", k = 16, iters = 3)
      val q = e.filter(col("vec_id") < 5)
      graft.operators.VectorIvf
        .searchTopK(e, q, "vec_id", "v", cents, nProbe = 6, topK = 5)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Embedding-cosine near-dup pairs via the same banded candidate join (a
    // ≥ threshold all-pairs search that never cross-joins: candidates share
    // a band code; arrays re-attached only for the exact verify).
    "q_embed_neardup" -> ((s, d) => {
      val e = embWithNorm(s, d)
      lshCandidates(e, Lsh.NearDupBits, Lsh.NearDupBands)
        .join(e.select(col("vec_id").as("a"), col("v").as("av"),
          col("nrm").as("an")), Seq("a"))
        .join(e.select(col("vec_id").as("b"), col("v").as("bv"),
          col("nrm").as("bn")), Seq("b"))
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
         |  codes AS (${sqlCodes()}),
         |  cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
         |    FROM codes q JOIN codes c USING (code)
         |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |  p AS (SELECT cand.q_id, cand.c_id,
         |      ${sqlDot("nq.v", "nc.v")} / (nq.nrm * nc.nrm) AS score
         |    FROM cand JOIN n nq ON nq.vec_id = cand.q_id
         |      JOIN n nc ON nc.vec_id = cand.c_id),
         |  r AS (SELECT q_id, c_id, score, row_number() OVER
         |      (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank FROM p)
         |SELECT q_id, CAST(rank AS INT) AS rank, c_id, round(score,4) AS score
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "q_embed_neardup" ->
      s"""WITH e AS ($sqlEmb),
         |  n AS ($sqlNorm),
         |  codes AS (${sqlCodes(Lsh.NearDupBits, Lsh.NearDupBands)}),
         |  cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |    FROM codes x JOIN codes y USING (code)
         |    WHERE x.vec_id < y.vec_id),
         |  p AS (SELECT cand.a, cand.b,
         |      ${sqlDot("na.v", "nb.v")} / (na.nrm * nb.nrm) AS score
         |    FROM cand JOIN n na ON na.vec_id = cand.a
         |      JOIN n nb ON nb.vec_id = cand.b)
         |SELECT a, b, round(score,4) AS score FROM p
         |WHERE score >= 0.5 ORDER BY a, b""".stripMargin)
}
