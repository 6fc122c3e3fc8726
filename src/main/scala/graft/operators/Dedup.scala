package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash+LSH and SimHash.
  *
  * Both follow the same 100 TB-safe shape:
  *   1. per-row signature computation — narrow, codegen'd higher-order
  *      expressions, no shuffle;
  *   2. band/chunk explosion — rows × small-constant blowup;
  *   3. candidate generation — a self-equi-join on (band, hash), i.e. a hash
  *      shuffle on the band key, never a cross join;
  *   4. exact verification (Jaccard / Hamming) only on candidates.
  *
  * No oracle SQL (hash permutations aren't portable across engines); the
  * ScalaTest suite verifies recall on planted duplicates against a
  * brute-force small-n cross-check (SURVEY §7.3).
  */
object Dedup {

  private val Prime = 2038074743L // large prime < 2^31 for (a·x+b) mod p
  val NumHashes = 32
  val Bands = 8
  val RowsPerBand: Int = NumHashes / Bands

  /** Deterministic permutation parameters (fixed seed — no RNG at plan time). */
  private val perms: Seq[(Long, Long)] =
    (0 until NumHashes).map(i => (2L * i + 1, 7919L * (i + 1) % Prime))

  /** 3-token shingles of a text column, distinct per doc. */
  def shingles(text: Column): Column = {
    val toks = split(text, " ")
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => when(i <= size(toks) - 3,
            concat_ws(" ", slice(toks, i + 1, lit(3))))),
        s => s.isNotNull && length(s) > 0))
  }

  /** MinHash signature (array of NumHashes minima) from a shingle array.
    * Base hash = xxhash64 (codegen'd); permutation j = (a_j·|x| + b_j) mod p.
    */
  def minhashSignature(sh: Column): Column = {
    val hashes = transform(sh, s => pmod(xxhash64(s), lit(Prime)))
    array(perms.map { case (a, b) =>
      array_min(transform(hashes, x => pmod(lit(a) * x + lit(b), lit(Prime))))
    }: _*)
  }

  /** Candidate pairs whose MinHash signatures collide in ≥1 LSH band, verified
    * by exact Jaccard over the shingle sets; returns (a, b, jaccard) with
    * jaccard ≥ `threshold`, ordered.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5): DataFrame = {
    val withSig = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh")))
    val bands = withSig.select(col("doc_id"), col("sh"),
      explode(array((0 until Bands).map { bnd =>
        struct(lit(bnd).as("band"),
          xxhash64(concat_ws(",",
            (0 until RowsPerBand).map(r =>
              element_at(col("sig"), bnd * RowsPerBand + r + 1)): _*)).as("bh"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bh"))
    val l = bands.select(col("band"), col("bh"), col("doc_id").as("a"),
      col("sh").as("sha"))
    val r = bands.select(col("band"), col("bh"), col("doc_id").as("b"),
      col("sh").as("shb"))
    l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sha"), col("shb")).distinct()
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", size(col("sha")) + size(col("shb")) - col("inter"))
      .select(col("a"), col("b"),
        round(col("inter") / col("uni").cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("a"), col("b"))
  }

  /** 64-bit SimHash via a single SQL higher-order expression: per-bit signed
    * vote of token xxhash64 bits, folded into a long — one pass over tokens,
    * no explode, no shuffle. `textExpr` is a SQL expression for the text col.
    */
  def simhashExpr(textExpr: String): Column = expr(
    s"""aggregate(
       |  transform(split($textExpr, ' '), t -> xxhash64(t)),
       |  array_repeat(0L, 64),
       |  (acc, h) -> zip_with(acc, transform(sequence(0, 63),
       |      i -> CASE WHEN (h >> i) & 1 = 1 THEN 1L ELSE -1L END),
       |    (a, v) -> a + v),
       |  votes -> aggregate(
       |    zip_with(votes, sequence(0, 63),
       |      (v, i) -> CASE WHEN v > 0 THEN shiftleft(1L, CAST(i AS INT)) ELSE 0L END),
       |    0L, (acc2, bit) -> acc2 | bit))""".stripMargin)

  /** Candidate pairs by shared 16-bit SimHash chunk (any pair within Hamming
    * distance 3 of a 64-bit hash must agree on ≥1 of 4 chunks), verified by
    * exact `bit_count(a^b) ≤ maxHamming`.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("doc_id"),
      simhashExpr(textCol).as("sim"))
    val chunks = sigs.select(col("doc_id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          (shiftrightunsigned(col("sim"), 16 * c) % 65536).as("ch"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("sim"), col("cc.chunk"), col("cc.ch"))
    val l = chunks.select(col("chunk"), col("ch"), col("doc_id").as("a"),
      col("sim").as("sa"))
    val r = chunks.select(col("chunk"), col("ch"), col("doc_id").as("b"),
      col("sim").as("sb"))
    l.join(r, Seq("chunk", "ch")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sa"), col("sb")).distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
      .orderBy(col("a"), col("b"))
  }
}
