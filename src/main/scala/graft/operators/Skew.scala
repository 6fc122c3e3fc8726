package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew (SURVEY "salting for skew").
  *
  * AQE's skew-join split handles most skew by subdividing oversized shuffle
  * partitions, but it cannot split a SINGLE hot key whose hash bucket is one
  * task by definition. Salting can: the skewed (big) side gets a
  * deterministic salt in [0, S) derived from a high-cardinality disambiguator
  * column, the small side is replicated S×, and the join key becomes
  * (key, salt) — spreading one hot key over S tasks. Deterministic (no
  * `rand()`): same inputs ⇒ same plan ⇒ same results, which keeps the
  * operator oracle-comparable and retry-safe under task re-execution.
  */
object Skew {

  /** Inner equi-join `big ⋈ small` on `key`, with `big` salted into `salt`
    * subkeys by hashing `disambig` (any column that varies within a hot key,
    * e.g. the fact table's primary key).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 disambig: Column, saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(disambig), lit(saltBuckets)).cast("int"))
    val salts = small.sparkSession.range(saltBuckets)
      .select(col("id").cast("int").as("_salt"))
    val saltedSmall = small.crossJoin(broadcast(salts))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
