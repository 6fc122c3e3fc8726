package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted join: result-identical to the plain join, and the salted key really
  * spreads a hot key across salt buckets.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join on skewed data") {
    // 90% of fact rows hit one hot key
    val big = (1L to 10000L)
      .map(i => (if (i % 10 == 0) i % 50 else 7L, i)).toDF("k", "id")
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "id", "name")
    val salted = Skew.saltedJoin(big, small, "k", col("id"), 8)
      .select("k", "id", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key occupies all salt buckets") {
    val big = (1L to 1000L).map(i => (7L, i)).toDF("k", "id")
    val buckets = big.withColumn("_salt",
        pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(buckets == 8L)
  }

  test("salted agg == plain agg, incl. distinct, on a planted hot group") {
    // one group holds 90% of rows and most of the distinct values
    val df = (1L to 10000L)
      .map(i => (if (i % 10 == 0) s"g${i % 5}" else "hot", i / 3, i))
      .toDF("g", "v", "id")
    val plain = df.groupBy("g")
      .agg(countDistinct(col("v")).as("nd"), sum(col("id")).as("s"),
        count(lit(1)).as("n"), max(col("v")).as("mx"))
    val salted = Skew.saltedAgg(df, Seq("g"), salt = col("v"), saltBuckets = 8,
      partial = Seq(countDistinct(col("v")).as("_pd"), sum(col("id")).as("_ps"),
        count(lit(1)).as("_pn"), max(col("v")).as("_pm")),
      merge = Seq(sum(col("_pd")).as("nd"), sum(col("_ps")).as("s"),
        sum(col("_pn")).as("n"), max(col("_pm")).as("mx")))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot group's distinct state spreads disjointly over salt buckets") {
    val df = (1L to 8000L).map(i => ("hot", i % 1000, i)).toDF("g", "v", "id")
    val phase1 = df.withColumn("_salt",
        pmod(xxhash64(col("v")), lit(8)).cast("int"))
      .groupBy(col("g"), col("_salt"))
      .agg(countDistinct(col("v")).as("_pd"))
    val rows = phase1.collect()
    // all 8 buckets occupied, and the per-bucket distinct sets are disjoint:
    // their counts sum exactly to the group's true distinct count
    assert(rows.length == 8, s"expected 8 salt buckets, got ${rows.length}")
    assert(rows.map(_.getLong(2)).sum == 1000L)
    // no bucket holds the whole state (the point of the spread)
    assert(rows.map(_.getLong(2)).max < 1000L)
  }
}
