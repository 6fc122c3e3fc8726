package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval + training-data assembly queries on top of the text/similarity
  * primitives: BM25 ranked retrieval, int8-quantized ANN (the
  * memory-bandwidth scale path), the composed filter→dedup→pack prep
  * pipeline, and per-stratum deterministic sampling. All four carry full
  * DuckDB oracles — every floating-point reduction is either exact integer
  * arithmetic in doubles or a sorted left fold, the repo's FP-parity
  * discipline.
  */
object Retrieval extends QueryModule {

  /** Okapi BM25 constants (the classic defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** The standing query for the ranked-retrieval demo. */
  private val Terms = Seq("spark", "vector", "stream")
  private val TermsSql = Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** Same 8-entry stopword list as TextOps' language-id heuristic. */
  private val Stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  private val StopSql = Stop.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Sequential left-fold dot product — VecDot / DuckDB list_reduce parity. */
  private def dot(a: Column, b: Column): Column =
    graft.expressions.TextHashes.vecDot(a, b)

  private def sqlDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(list_zip($a, $b), x -> x[1]*x[2])), (p,q) -> p+q)""".stripMargin

  def queries: Seq[(String, QFn)] = Seq(
    // BM25 ranked retrieval for a fixed term set. Scale shape: the corpus
    // explodes to (doc, term) rows but the term filter prunes to |Q| terms
    // immediately after the generator (nothing else shuffles); df and the
    // per-doc score are hash aggs over that tiny slice; dl/avgdl come from
    // one corpus stat pass. FP discipline: idf/tf/dl are exact integers in
    // doubles, avgdl is one division of exact ints, and the per-doc sum
    // over query terms is a SORTED left fold (collect_list → array_sort →
    // aggregate) so Spark's agg order can't reorder double addition vs the
    // oracle.
    "q_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok").isin(Terms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val contrib = tf.join(df_, "tok").join(dl, "doc_id").crossJoin(stats)
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
        .withColumn("c",
          col("idf") * (col("tf") * (K1 + 1.0)) /
            (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      contrib.groupBy(col("doc_id"))
        .agg(collect_list(struct(col("tok"), col("c"))).as("cs"))
        .select(col("doc_id"),
          round(expr("aggregate(array_sort(cs), 0.0D, (acc, x) -> acc + x.c)"),
            4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    }),

    // Int8-quantized cosine top-k — the 100 TB ANN memory path: symmetric
    // per-vector quantization q_i = floor(v_i·127/max|v| + 0.5) shrinks the
    // candidate corpus 8× (byte vs double) while integer dot products stay
    // EXACT in double arithmetic (|q·q| ≤ 64·127² ≪ 2⁵³ — fold order is
    // irrelevant, unlike float dots), so both engines agree bit-for-bit.
    // Same size-switched query-side plan as q_sim_topk. floor(x+0.5)
    // instead of round(): identical half-up semantics on every engine.
    "q_sim_quant" -> ((s, d) => {
      graft.operators.Dedup.register(s)
      graft.expressions.VectorOps.register(s)
      // native QuantizeI8: float→double cast, max|v|, and the per-element
      // floor fuse into ONE codegen'd pass (the interpreted HOF transform
      // this replaces re-evaluated its lambda per element per consumer)
      val e = t(s, d, "embeddings")
        .select(col("vec_id"),
          graft.expressions.VectorOps.quantizeI8(col("embedding")).as("q"))
        .withColumn("qn", sqrt(dot(col("q"), col("q"))))
        .filter(col("qn") > 0)
      val qs = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("q").as("qv"), col("qn").as("qnn"))
      val scored = e.select(col("vec_id").as("c_id"), col("q").as("cv"),
          col("qn").as("cn"))
        .join(graft.operators.Joins.maybeBroadcast(qs), col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          (dot(col("qv"), col("cv")) / (col("qnn") * col("cn"))).as("score"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("c_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("score"), 4).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // The composed training-data prep pipeline — the end-to-end user story:
    // quality gate (length + stopword-ratio language heuristic) → exact
    // dedup (keep the smallest doc_id per content hash) → token-budget
    // shard packing via the two-phase distributed prefix sum. Every stage
    // is a narrow transform or hash agg; the only window is Pack's
    // bucket-total window over a relation 2-4 orders smaller than the data.
    "q_prep_pipeline" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val stats = t(s, d, "documents").select(col("doc_id"), col("text"),
        size(toks).as("n_tok"),
        size(expr(s"filter(split(text, ' '), tk -> tk IN $StopSql)")).as("n_sw"))
      val kept = stats.filter(col("n_tok") >= 30 &&
        col("n_sw").cast("double") / col("n_tok") > 0.05)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = kept.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("n_tok"))
      graft.operators.Pack.packShards(deduped, "doc_id", "n_tok", 4096L)
        .orderBy(col("doc_id"))
    }),

    // The pipeline's EXIT DOOR (r8 VERDICT missing #4): quality gate →
    // exact dedup → token-budget shard pack → per-shard JSONL export —
    // written ONCE per dataset (fingerprint-keyed, atomically published),
    // then the gate READS THE EXPORT BACK through the real spark.read.json
    // path and aggregates per shard. The oracle computes the same
    // aggregate from the documents parquet by replaying the gate/dedup/
    // pack logic in SQL, so a hash match certifies both the shard
    // assignment AND byte fidelity of every exported text
    // (`sum(length(text))`, the q_source_jsonl discipline).
    "q_export_shards" -> ((s, d) => {
      val dir = exportShardsDir(s, d)
      s.read.schema("doc_id BIGINT, text STRING, n_tok BIGINT").json(dir)
        .groupBy(col("shard").cast("bigint").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("sum_tok"),
          sum(length(col("text"))).as("sum_len"),
          min(col("doc_id")).as("first_id"))
        .orderBy(col("shard"))
    }),

    // Deterministic EPOCH SHUFFLE: a seeded, content-free permutation for
    // training-order randomization. shard = 4 hex digits of the seeded
    // md5 mod 8 (the worker assignment), pos = rank within shard by the
    // full hash — what a data loader actually consumes is a per-worker
    // order, so there is NO global window (which would collapse to one
    // partition); the rank parallelizes by shard. No rand(): retries and
    // repartitioning reproduce the identical epoch.
    "q_epoch_shuffle" -> ((s, d) => {
      val h = md5(concat_ws("|", lit("epoch7"), col("doc_id").cast("string")))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      t(s, d, "documents")
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard",
          conv(substring(col("h"), 1, 4), 16, 10).cast("long") % 8)
        .withColumn("pos", row_number().over(w))
        .select(col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("shard"), col("pos"))
    }),

    // Small-file COMPACTION (graft.storage.Compaction): the 64-way
    // fragmented corpus fixture is rewritten into size-targeted files via
    // shuffle-free coalesce; the gate reads the compacted output back and
    // hash-matches the ORIGINAL table — compaction is pure layout, zero
    // content drift (md5(text) certifies byte-level text fidelity).
    "q_compact_files" -> ((s, d) => {
      val frag = fragmentedDocsDir(s, d)
      val out = java.nio.file.Files.createTempDirectory("graft_compact")
        .toString + "/docs"
      graft.storage.Compaction.compact(s, frag, out,
        targetFileBytes = 64L << 10)
      s.read.parquet(out)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy(col("doc_id"))
    }),

    // Stratified deterministic sampling: top-5 docs per language by content-
    // free md5 rank — the retry-safe per-stratum sample (no rand(), stable
    // under re-execution and partitioning). One window per stratum.
    "q_sample_stratified" -> ((s, d) => {
      val h = md5(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("lang")).orderBy(h, col("doc_id"))
      t(s, d, "documents")
        .select(col("lang"), col("doc_id"), row_number().over(w).as("rk"))
        .filter(col("rk") <= 5)
        .orderBy(col("lang"), col("rk"))
    }))

  /** Builds the packed-corpus JSONL export once per dataset: the
    * q_prep_pipeline stages with `text` carried through, then one JSONL
    * file set per shard (`shard=N/…`, Hive-partition layout — the shard id
    * rides in the path, each file holds only the document payload). A
    * training run consumes these files directly; the gate consumes them
    * through `spark.read.json` to prove the round trip.
    */
  private def exportShardsDir(s: org.apache.spark.sql.SparkSession,
                              d: String): String =
    StreamGate.replayCache(d, "exp", table = "documents") { dir =>
      val toks = split(col("text"), " ")
      val stats = t(s, d, "documents").select(col("doc_id"), col("text"),
        size(toks).cast("bigint").as("n_tok"),
        size(expr(s"filter(split(text, ' '), tk -> tk IN $StopSql)")).as("n_sw"))
      val kept = stats.filter(col("n_tok") >= 30 &&
        col("n_sw").cast("double") / col("n_tok") > 0.05)
      val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      val deduped = kept.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"), col("n_tok"))
      val packed = graft.operators.Pack.packShards(
          deduped.select(col("doc_id"), col("n_tok")), "doc_id", "n_tok", 4096L)
        .select(col("doc_id"), col("shard"))
      deduped.join(packed, Seq("doc_id"))
        .repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("doc_id"))
        .write.partitionBy("shard").json(dir)
    }

  /** 64-way fragmented copy of the documents table (content-fingerprint
    * cached): the "many tiny files" fixture the compaction gate rewrites.
    */
  private def fragmentedDocsDir(s: org.apache.spark.sql.SparkSession,
                                d: String): String =
    StreamGate.replayCache(d, "frag64", table = "documents") { dir =>
      t(s, d, "documents").repartition(64)
        .write.mode("overwrite").parquet(dir)
    }

  def oracle: Seq[(String, String)] = Seq(
    "q_epoch_shuffle" ->
      """WITH x AS (SELECT doc_id,
        |    md5('epoch7|' || doc_id) AS h FROM documents),
        |  y AS (SELECT doc_id, h,
        |    CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 8 AS shard FROM x)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |    AS INTEGER) AS pos,
        |  doc_id
        |FROM y ORDER BY shard, pos""".stripMargin,

    // compaction is pure layout: the read-back equals the original table
    "q_compact_files" ->
      """SELECT doc_id, lang, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_bm25" ->
      s"""WITH dl AS (SELECT doc_id, len(string_split(text,' ')) AS dl
         |    FROM documents),
         |  st AS (SELECT count(*) AS n_docs,
         |      CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |  tf AS (SELECT doc_id, tok, count(*) AS tf FROM (
         |      SELECT doc_id, unnest(string_split(text,' ')) AS tok
         |      FROM documents)
         |    WHERE tok IN $TermsSql GROUP BY doc_id, tok),
         |  df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |  c AS (SELECT tf.doc_id, tf.tok,
         |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
         |        (tf * ${K1 + 1.0}) /
         |        (tf + $K1 * (${1.0 - B} + $B * dl / avgdl)) AS c
         |    FROM tf JOIN df USING (tok) JOIN dl ON dl.doc_id = tf.doc_id
         |    CROSS JOIN st)
         |SELECT doc_id, round(list_reduce(list_prepend(0.0::DOUBLE,
         |    list(c ORDER BY tok)), (a, b) -> a + b), 4) AS bm25
         |FROM c GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    "q_sim_quant" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |  m AS (SELECT vec_id, v,
         |      list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
         |  qz AS (SELECT vec_id, list_transform(v,
         |      x -> CASE WHEN mx = 0.0 THEN 0.0
         |           ELSE floor(x * 127.0 / mx + 0.5) END) AS q FROM m),
         |  n AS (SELECT vec_id, q, sqrt(${sqlDot("q", "q")}) AS qn FROM qz
         |    WHERE sqrt(${sqlDot("q", "q")}) > 0),
         |  p AS (SELECT a.vec_id AS q_id, c.vec_id AS c_id,
         |      ${sqlDot("a.q", "c.q")} / (a.qn * c.qn) AS score
         |    FROM n a JOIN n c ON c.vec_id <> a.vec_id
         |    WHERE a.vec_id < 5),
         |  r AS (SELECT q_id, c_id, score, row_number() OVER
         |      (PARTITION BY q_id ORDER BY score DESC, c_id) AS rank FROM p)
         |SELECT q_id, CAST(rank AS INT) AS rank, c_id, round(score,4) AS score
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "q_prep_pipeline" ->
      s"""WITH s AS (SELECT doc_id, text,
         |    len(string_split(text,' ')) AS n_tok,
         |    len(list_filter(string_split(text,' '), tk -> tk IN $StopSql))
         |      AS n_sw
         |  FROM documents),
         |  k AS (SELECT * FROM s
         |    WHERE n_tok >= 30 AND CAST(n_sw AS DOUBLE) / n_tok > 0.05),
         |  u AS (SELECT doc_id, n_tok FROM (
         |      SELECT doc_id, n_tok, row_number() OVER
         |        (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM k)
         |    WHERE rn = 1)
         |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(coalesce(sum(CAST(n_tok AS BIGINT)) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096
         |    AS BIGINT) AS shard
         |FROM u ORDER BY doc_id""".stripMargin,

    // replays gate → dedup → pack in SQL, then aggregates per shard; the
    // Spark side aggregates the EXPORTED JSONL instead, so the hash match
    // certifies the export round trip (length(text) = byte fidelity).
    "q_export_shards" ->
      s"""WITH s AS (SELECT doc_id, text,
         |    len(string_split(text,' ')) AS n_tok,
         |    len(list_filter(string_split(text,' '), tk -> tk IN $StopSql))
         |      AS n_sw
         |  FROM documents),
         |  k AS (SELECT * FROM s
         |    WHERE n_tok >= 30 AND CAST(n_sw AS DOUBLE) / n_tok > 0.05),
         |  u AS (SELECT doc_id, text, n_tok FROM (
         |      SELECT doc_id, text, n_tok, row_number() OVER
         |        (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM k)
         |    WHERE rn = 1),
         |  p AS (SELECT doc_id, text, n_tok,
         |    CAST(coalesce(sum(CAST(n_tok AS BIGINT)) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096
         |      AS BIGINT) AS shard
         |    FROM u)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |  CAST(sum(length(text)) AS BIGINT) AS sum_len, min(doc_id) AS first_id
         |FROM p GROUP BY shard ORDER BY shard""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)
}
