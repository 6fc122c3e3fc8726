package graft

import org.apache.spark.sql.functions._
import graft.expressions.TopKSketch

/** SpaceSaving sketch: recovers true heavy hitters on skewed data with
  * bounded memory, across partitioned partial-aggregation merges.
  */
class TopKSketchSpec extends SparkSpec {
  import spark.implicits._

  test("sketch recovers the true top-10 users from skewed events") {
    TopKSketch.register(spark, k = 10, capacity = 500)
    val ev = Tables.table(spark, sf("sf0.01"), "events")
      .select(col("user_id").cast("string").as("u")).repartition(8)
    val sketch = ev.agg(TopKSketch.topk(col("u")).as("top")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).map(r => r.getString(0)).toSet
    val exact = Tables.table(spark, sf("sf0.01"), "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("user_id"))
      .limit(10).collect().map(_.getLong(0).toString).toSet
    // capacity 500 >> distinct users → sketch is exact here
    assert(sketch == exact, s"sketch=$sketch exact=$exact")
  }

  test("bounded memory: capacity constrains counter count under many keys") {
    TopKSketch.register(spark, k = 5, capacity = 20)
    // one dominant key + 10k unique keys; the heavy hitter must survive
    val df = (1 to 10000).map(i => s"rare_$i").toDF("u")
      .union(Seq.fill(5000)("HOT").toDF("u")).repartition(8)
    val top = df.agg(TopKSketch.topk(col("u")).as("top")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._1 == "HOT", s"heavy hitter lost: $top")
    assert(top.head._2 >= 5000L, "SpaceSaving count must upper-bound the true count")
  }

  test("adversarial high-cardinality input stays fast (O(log) eviction)") {
    TopKSketch.register(spark, k = 10, capacity = 50000)
    // 1M near-unique keys: almost every insert evicts. The old O(capacity)
    // minBy scan made this O(rows x capacity) ~ 5e10 ops (minutes); the
    // bucket-index eviction completes in seconds.
    val df = spark.range(1000000)
      .select(concat(lit("k"), (col("id") % 900000)).as("u"))
    val t0 = System.nanoTime()
    val n = df.agg(TopKSketch.topk(col("u")).as("top")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).size
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n == 10)
    assert(secs < 60.0, s"eviction path too slow: $secs s for 1M rows")
  }

  test("merge keeps counts upper bounds when incoming items carry error") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKSketch.TopKAgg(Literal("x"), 5, 2)
    def buf(items: (String, Long, Long)*): TopKSketch.Buffer = {
      val b = agg.createAggregationBuffer()
      items.foreach { case (i, c, e) =>
        b.counts(i) = c; if (e > 0) b.error(i) = e; b.indexAdd(i, c)
      }
      b
    }
    // existing-item branch: HOT's upper bound is 100 in one partial and 50
    // in the other → the merged count must be the SUM of upper bounds (150);
    // dropping the incoming error term would store 110 and can under-rank
    // true heavy hitters
    val m = agg.merge(buf(("HOT", 50L, 0L)), buf(("HOT", 100L, 40L)))
    assert(m.counts("HOT") == 150L, s"upper bound lost: ${m.counts}")
    assert(m.error("HOT") == 40L)
    // eviction branch at capacity: the incoming item's stored count must be
    // minCnt + its full upper bound (cnt), error = minCnt + its error
    val m2 = agg.merge(buf(("a", 10L, 0L), ("b", 20L, 0L)), buf(("c", 30L, 5L)))
    assert(m2.counts("c") == 40L, s"eviction dropped error term: ${m2.counts}")
    assert(m2.error("c") == 15L)
  }

  test("merged sketches keep count/error bounds (count-err <= true <= count)") {
    TopKSketch.register(spark, k = 5, capacity = 40)
    // force evictions in EVERY partition partial sketch, then a lossy merge
    val hotTrue = 3000L
    val df = (1 to 8000).map(i => s"rare_$i").toDF("u")
      .union(Seq.fill(hotTrue.toInt)("HOT").toDF("u")).repartition(16)
    val rows = df.agg(TopKSketch.topk(col("u")).as("top")).collect()(0)
      .getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
    val hot = rows.find(_._1 == "HOT")
    assert(hot.isDefined, s"heavy hitter lost after merge: $rows")
    assert(hot.get._2 >= hotTrue, s"count ${hot.get._2} must upper-bound $hotTrue")
  }
}
