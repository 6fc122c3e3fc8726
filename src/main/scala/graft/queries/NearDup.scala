package graft.queries

import graft.operators.Dedup

/** Declared near-dup queries (MinHash+LSH, SimHash). No DuckDB oracle — hash
  * permutations aren't portable across engines (SURVEY §2.B `q_dedup_near`) —
  * so the driver records a rows-only check; correctness is covered by the
  * ScalaTest brute-force cross-checks in DedupSpec.
  */
object NearDup extends QueryModule {

  def queries: Seq[(String, QFn)] = Seq(
    "q_dedup_near" -> ((s, d) =>
      Dedup.minhashPairs(t(s, d, "documents"), "doc_id", "text", 0.5)),
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", 3)))

  def oracle: Seq[(String, String)] = Seq.empty
}
