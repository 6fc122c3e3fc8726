package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed prefix sum (operators/Pack): equivalence with the
  * naive single-partition global window, and bucket-locality of the heavy
  * window.
  */
class PackSpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sf("sf0.01"), "documents")
    .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tok"))

  test("two-phase packing equals the naive global running-sum window") {
    val naive = docs
      .withColumn("shard", expr("""
        coalesce(sum(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) div 4096"""))
      .select("doc_id", "n_tok", "shard")
      .orderBy("doc_id").collect()
    val twoPhase = graft.operators.Pack.packShards(docs, "doc_id", "n_tok", 4096L)
      .orderBy("doc_id").collect()
    assert(twoPhase.sameElements(naive))
    // and it actually packs: multiple shards, non-decreasing over doc order
    val shards = twoPhase.map(_.getLong(2))
    assert(shards.distinct.length > 1)
    assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
  }

  test("the full-relation window is bucket-partitioned (no global sort of data)") {
    val plan = graft.operators.Pack.packShards(docs, "doc_id", "n_tok", 4096L)
      .queryExecution.executedPlan.toString
    // the heavy window must carry the _bkt partition spec; the only
    // unpartitioned window runs over the tiny bucket-totals relation
    val windows = plan.split("\n").filter(_.contains("Window ["))
    assert(windows.exists(_.contains("[_bkt")),
      s"expected a _bkt-partitioned window:\n${windows.mkString("\n")}")
  }
}
