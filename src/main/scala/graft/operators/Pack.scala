package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic shard packing for training-data assembly: each row, taken
  * in stable id order, goes to shard `floor(running_weight_before / budget)`
  * — the distributed analog of sequentially filling token-budgeted shards.
  *
  * Scale shape: a naive formulation is one global running-sum window, which
  * Spark executes on a SINGLE partition (no partition spec → all rows move
  * to one task — the classic prefix-sum scale trap). This implementation is
  * the standard two-phase prefix sum instead:
  *   1. rows bucket by `id div bucketWidth`; per-bucket totals aggregate
  *      distributed (tiny result: |rows| / bucketWidth);
  *   2. the global running offset is computed by a window over the BUCKET
  *      TOTALS only (singleton partition of a relation 2-4 orders of
  *      magnitude smaller — driver-scale, not data-scale);
  *   3. offsets broadcast-join back and each bucket computes its local
  *      running sum in parallel (window partitioned by bucket).
  * Equivalence with the naive global window is asserted in PackSpec.
  */
object Pack {

  def packShards(docs: DataFrame, idCol: String, weightCol: String,
                 budget: Long, bucketWidth: Long = 100L): DataFrame = {
    val withB = docs
      .select(col(idCol), col(weightCol).cast("bigint").as("_w"))
      .withColumn("_bkt", expr(s"$idCol div $bucketWidth"))
    val bucketTotals = withB.groupBy(col("_bkt"))
      .agg(sum(col("_w")).as("_bsum"))
    val wBuckets = Window.orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("_off", coalesce(sum(col("_bsum")).over(wBuckets), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val wInBucket = Window.partitionBy(col("_bkt"))
      .orderBy(col(idCol)).rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offsets), Seq("_bkt"))
      .withColumn("_cum_before",
        col("_off") + coalesce(sum(col("_w")).over(wInBucket), lit(0L)))
      .select(col(idCol), col("_w").as(weightCol),
        expr(s"_cum_before div $budget").as("shard"))
  }
}
