package graft.queries

import graft.operators.Dedup

/** Declared near-dup queries (MinHash+LSH, SimHash, and the persisted-index
  * incremental probe) — all hash-gated against brute-force DuckDB oracles
  * since round 10.
  *
  * - `q_dedup_near`: the operator's OUTPUT contract is exact — every emitted
  *   pair carries true 3-shingle Jaccard (verification is exact; LSH only
  *   prunes candidates), so the oracle is the full inverted-index exact
  *   Jaccard join with no candidate cap. The gate therefore also pins LSH
  *   recall at 100% on the fixture corpus: its 25 true pairs all have
  *   J ≥ 0.9, where the 8-band × 4-row family's miss probability is
  *   (1 − 0.9⁴)⁸ ≈ 2·10⁻⁴ per pair — and the fixed permutation seeds make
  *   the outcome deterministic, not a per-run coin flip.
  * - `q_dedup_simhash`: the md5-derived hash family
  *   ([[graft.expressions.TextHashes.SimHashMd5]]) is computed bit-for-bit
  *   by DuckDB (`('0x' || substr(md5(t), 1, 8))::BIGINT`), and the 16-bit
  *   chunk banding is EXACT by pigeonhole for hamming ≤ 3 — so the all-pairs
  *   oracle matches by construction, with no recall caveat at all.
  *
  * The remaining non-oracle surface (trained quantizers etc.) lives in
  * SimilarityOps; see SURVEY §2.B.
  */
object NearDup extends QueryModule {

  def queries: Seq[(String, QFn)] = Seq(
    "q_dedup_near" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), "doc_id", "text", 0.5)),
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", 3)),
    // Incremental near-dup against the PERSISTED band index: history
    // (doc_id % 3 ≠ 0) is indexed once; the batch (doc_id % 3 = 0) probes
    // it without re-shingling the corpus. Output pairs carry exact
    // Jaccard (LSH only prunes) — same oracle-gateable contract as
    // q_dedup_near, restricted to batch × history.
    "q_dedup_near_store" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = t(s, d, "documents")
      val history = docs.filter(col("doc_id") % 3 =!= 0)
      val batch = docs.filter(col("doc_id") % 3 === 0)
      val dir = graft.storage.NearDupIndexStore.ensureIndex(
        history, "doc_id", "text", key = d, variant = "mod3")
      graft.storage.NearDupIndexStore.pairsAgainst(
        history, batch, "doc_id", "text", dir, 0.5)
    }),
    // The full incremental LOOP over the persisted index — probe, admit,
    // APPEND, probe the next batch against history + admitted — declared
    // end-to-end: round 1 probes batch₁ (doc_id%3=2) against indexed
    // history (%3=1); batch₁ is then appended (NearDupIndexStore.append,
    // inside the build-once publish so reruns are idempotent) and round 2
    // probes batch₂ (%3=0) against history ∪ batch₁. Pairs carry exact
    // Jaccard, so the oracle is the same brute-force join with the two
    // rounds' membership predicates.
    "q_dedup_near_append" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit}
      val docs = t(s, d, "documents")
      val history = docs.filter(col("doc_id") % 3 === 1)
      val batch1 = docs.filter(col("doc_id") % 3 === 2)
      val batch2 = docs.filter(col("doc_id") % 3 === 0)
      val dir = graft.storage.NearDupIndexStore.ensureIndex(
        history, "doc_id", "text", key = d, variant = "mod3append",
        alsoAppend = Some(batch1))
      val p1 = graft.storage.NearDupIndexStore.pairsAgainst(
        history, batch1, "doc_id", "text", dir, 0.5)
      val p2 = graft.storage.NearDupIndexStore.pairsAgainst(
        history.unionByName(batch1), batch2, "doc_id", "text", dir, 0.5)
      p1.withColumn("round", lit(1))
        .unionByName(p2.withColumn("round", lit(2)))
        .orderBy(col("round"), col("b"), col("h"))
    }))

  def oracle: Seq[(String, String)] = Seq(
    // Brute-force exact 3-shingle Jaccard over ALL pairs (inverted-index
    // join — a pair with J ≥ 0.5 must share at least one shingle).
    "q_dedup_near" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |  sh AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, greatest(len(ts)-1, 1)),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
        |    FROM tok) WHERE sh IS NOT NULL AND length(sh) > 0),
        |  counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |  inter AS (SELECT p.doc_id AS a, q.doc_id AS b, count(*) AS inter
        |    FROM sh p JOIN sh q ON p.sh = q.sh AND p.doc_id < q.doc_id
        |    GROUP BY p.doc_id, q.doc_id),
        |  pairs AS (SELECT i.a, i.b,
        |      round(inter / (ca.n_sh + cb.n_sh - inter), 4) AS jaccard
        |    FROM inter i JOIN counts ca ON ca.doc_id = i.a
        |      JOIN counts cb ON cb.doc_id = i.b)
        |SELECT a, b, jaccard FROM pairs WHERE jaccard >= 0.5
        |ORDER BY a, b""".stripMargin,
    // Same brute-force exact Jaccard, restricted to batch (doc_id%3=0) ×
    // history (doc_id%3≠0) pairs — the persisted-index probe's contract.
    "q_dedup_near_store" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |  sh AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, greatest(len(ts)-1, 1)),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
        |    FROM tok) WHERE sh IS NOT NULL AND length(sh) > 0),
        |  counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |  inter AS (SELECT p.doc_id AS b, q.doc_id AS h, count(*) AS inter
        |    FROM sh p JOIN sh q ON p.sh = q.sh
        |      AND p.doc_id % 3 = 0 AND q.doc_id % 3 <> 0
        |    GROUP BY p.doc_id, q.doc_id),
        |  pairs AS (SELECT i.b, i.h,
        |      round(inter / (cb.n_sh + ch.n_sh - inter), 4) AS jaccard
        |    FROM inter i JOIN counts cb ON cb.doc_id = i.b
        |      JOIN counts ch ON ch.doc_id = i.h)
        |SELECT b, h, jaccard FROM pairs WHERE jaccard >= 0.5
        |ORDER BY b, h""".stripMargin,
    // The two-round incremental loop, replayed as membership predicates:
    // round 1 = batch₁ (%3=2) × history (%3=1); round 2 = batch₂ (%3=0)
    // × (history ∪ batch₁) (%3≠0).
    "q_dedup_near_append" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
        |  sh AS (SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, greatest(len(ts)-1, 1)),
        |        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
        |    FROM tok) WHERE sh IS NOT NULL AND length(sh) > 0),
        |  counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |  inter AS (
        |    SELECT 1 AS round, p.doc_id AS b, q.doc_id AS h, count(*) AS inter
        |    FROM sh p JOIN sh q ON p.sh = q.sh
        |      AND p.doc_id % 3 = 2 AND q.doc_id % 3 = 1
        |    GROUP BY p.doc_id, q.doc_id
        |    UNION ALL
        |    SELECT 2 AS round, p.doc_id AS b, q.doc_id AS h, count(*) AS inter
        |    FROM sh p JOIN sh q ON p.sh = q.sh
        |      AND p.doc_id % 3 = 0 AND q.doc_id % 3 <> 0
        |    GROUP BY p.doc_id, q.doc_id),
        |  pairs AS (SELECT i.round, i.b, i.h,
        |      round(inter / (cb.n_sh + ch.n_sh - inter), 4) AS jaccard
        |    FROM inter i JOIN counts cb ON cb.doc_id = i.b
        |      JOIN counts ch ON ch.doc_id = i.h)
        |SELECT round, b, h, jaccard FROM pairs WHERE jaccard >= 0.5
        |ORDER BY round, b, h""".stripMargin,
    // Bit-exact md5 SimHash rebuild: two 32-bit signature halves (lo = votes
    // of md5 hex chars 1-8, hi = chars 9-16), all-pairs Hamming ≤ 3.
    "q_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t
        |    FROM documents),
        |  th AS (SELECT doc_id,
        |      ('0x'||substr(md5(t),1,8))::BIGINT AS h1,
        |      ('0x'||substr(md5(t),9,8))::BIGINT AS h2 FROM tok),
        |  bits AS (SELECT unnest(range(0,32)) AS b),
        |  votes AS (SELECT doc_id, b,
        |      sum(((h1 >> b) & 1) * 2 - 1) AS v1,
        |      sum(((h2 >> b) & 1) * 2 - 1) AS v2
        |    FROM th CROSS JOIN bits GROUP BY doc_id, b),
        |  sig AS (SELECT doc_id,
        |      CAST(sum(CASE WHEN v1 > 0 THEN (1::BIGINT << b) ELSE 0 END)
        |        AS BIGINT) AS lo,
        |      CAST(sum(CASE WHEN v2 > 0 THEN (1::BIGINT << b) ELSE 0 END)
        |        AS BIGINT) AS hi
        |    FROM votes GROUP BY doc_id),
        |  pairs AS (SELECT x.doc_id AS a, y.doc_id AS b,
        |      CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
        |        AS INT) AS hamming
        |    FROM sig x JOIN sig y ON x.doc_id < y.doc_id)
        |SELECT a, b, hamming FROM pairs WHERE hamming <= 3
        |ORDER BY a, b""".stripMargin)
}
