package graft

import org.apache.spark.sql.functions._
import graft.storage.BucketedTables

/** Bucketed joins: pre-shuffled layout makes the fact-fact join exchange-free
  * (both sides co-partitioned on the bucket key).
  */
class BucketedSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without Exchange") {
    BucketedTables.writeBucketed(
      Tables.table(spark, sf(), "orders"), "orders_b", "o_custkey", 8)
    BucketedTables.writeBucketed(
      Tables.table(spark, sf(), "customer"), "customer_b", "c_custkey", 8)
    val joined = BucketedTables.read(spark, "orders_b")
      .join(BucketedTables.read(spark, "customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    // disable broadcast so the co-located-join claim is actually exercised
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBeforeAgg = plan.split("HashAggregate").head
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!exchangesBeforeAgg.contains("Exchange hashpartitioning(o_custkey") &&
        !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"join still shuffles its inputs:\n$plan")
      // and the result is right
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = Tables.table(spark, sf(), "orders")
        .join(Tables.table(spark, sf(), "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
