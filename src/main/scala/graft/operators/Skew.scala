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

  /** Two-phase salted aggregation for hot-GROUP skew: partial aggregates on
    * `(keys, salt)` spread one hot group over `saltBuckets` reduce tasks,
    * then a cheap final aggregate on `keys` merges the ≤`saltBuckets`
    * partial rows per group.
    *
    * When does this beat plain `groupBy` (whose hash aggregate already
    * combines map-side)? When per-group STATE is large, not per-group row
    * count: `count(DISTINCT x)`, `collect_set`, big sketches — there the
    * map-side combine still ships each group's full state set to ONE
    * reducer. Salting by `hash(x)` makes the distinct sets of the salt
    * buckets DISJOINT, so phase 1 holds 1/S of the hot group's state per
    * task and phase 2 merges by plain sum.
    *
    * Correctness contract (the reason `salt` is a caller-supplied column):
    * every distinct-style partial must have its distinct column feed the
    * salt — disjointness across buckets is what makes `sum(partial)` the
    * exact merge. Decomposable partials (sum/count/min/max) are
    * salt-agnostic. Deterministic hash salt, no `rand()` — retry-safe and
    * oracle-comparable.
    *
    * `partial` aggregates raw columns per `(keys, salt)`; `merge`
    * re-aggregates the partial columns per `keys`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Column,
                saltBuckets: Int, partial: Seq[Column],
                merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && merge.nonEmpty, "need partial and merge aggs")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(salt), lit(saltBuckets)).cast("int"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
