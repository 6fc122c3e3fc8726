package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-based join-side strategy for the similarity/retrieval operators.
  *
  * The dashboard shape ("score these 5 queries against the corpus") wants
  * the query side broadcast; the batch shape (corpus-vs-corpus retrieval,
  * a 10M-row query table) must NOT be — an unconditional `broadcast()`
  * hint overrides the planner's size checks and OOMs the build side. The
  * switch probes the side's cardinality with a bounded scan and only hints
  * below the threshold; above it the planner falls back to its normal
  * shuffle-join strategies (equi-joins — the LSH/IVF candidate joins —
  * become shuffled hash joins, which is exactly the corpus-vs-corpus scale
  * path).
  */
object Joins {

  /** Default hint ceiling: ~100k rows of 64-dim vectors ≈ 25 MB serialized
    * — comfortably inside executor broadcast budgets at any cluster size.
    */
  val BroadcastRowLimit: Long = 100000L

  /** Broadcast-hints `side` only when it holds at most `limit` rows. The
    * probe is `limit(n+1).count()` — the global limit caps the scan, so a
    * 10M-row side costs a bounded peek, not a full count. The probe IS one
    * extra Spark action that recomputes `side` — pass a cheap (scan-level)
    * or cached side, not an expensive pipeline.
    */
  def maybeBroadcast(side: DataFrame, limit: Long = BroadcastRowLimit): DataFrame = {
    // limit+1 must fit an Int: a larger ceiling would overflow the probe
    // (and a >2G-row broadcast is never sane anyway)
    require(limit > 0 && limit < Int.MaxValue, s"broadcast row limit out of range: $limit")
    if (side.limit((limit + 1).toInt).count() <= limit) broadcast(side) else side
  }
}
