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
}
