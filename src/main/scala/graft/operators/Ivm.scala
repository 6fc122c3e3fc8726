package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for SUM/COUNT group-by aggregates over a
  * change feed ([[graft.storage.SnapshotStore.changes]] shape: a
  * `_change_type` column ∈ {insert, delete, update_preimage,
  * update_postimage} plus the full row).
  *
  * The classic IVM identity: SUM and COUNT are self-maintainable — each
  * change row contributes `+expr` (insert / update_postimage) or `-expr`
  * (delete / update_preimage), so a materialized aggregate is refreshed by
  * folding the DELTA into the prior result without touching the base table.
  * At 100 TB that is the difference between re-aggregating the corpus per
  * merge and an O(batch) refresh: the only scans are the changed
  * partitions (already pruned by the manifest diff) and the prior
  * aggregate itself (group-cardinality-sized). MIN/MAX are deliberately
  * NOT offered — a delete of the current extremum forces a base rescan
  * (the standard non-self-maintainability result), so offering them here
  * would hide a corpus scan behind an "incremental" name.
  *
  * Reference anchor: the dashboard rollups of
  * /root/reference/README.md:279-286 — their nightly full re-aggregation
  * becomes a per-merge delta fold.
  */
object Ivm {

  /** Refreshes `prior` (a materialized `GROUP BY groupCols` aggregate with
    * a `countName` COUNT(*) column and one column per `sums` entry) by
    * folding in `changes`. Each `sums` entry maps an output column name in
    * `prior` to the per-row contribution expression evaluated over a
    * change row. Groups whose maintained count reaches 0 are dropped
    * (matching what a recomputation over the new base would produce);
    * groups first seen in the delta appear with prior = 0. The group join
    * is null-SAFE: a NULL group key folds into the prior NULL group
    * exactly as GROUP BY would collapse it on a recompute.
    */
  def applyDelta(prior: DataFrame, changes: DataFrame,
                 groupCols: Seq[String], sums: Seq[(String, Column)],
                 countName: String): DataFrame = {
    require(groupCols.nonEmpty, "applyDelta needs at least one group column")
    require(sums.nonEmpty, "applyDelta needs at least one maintained sum")
    val valNames = sums.map(_._1) :+ countName
    valNames.foreach(n => require(prior.columns.contains(n),
      s"prior aggregate lacks maintained column $n"))
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(lit("unknown _change_type: "),
        col("_change_type"))))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(sum(sign * sums.head._2).as(s"_d_${sums.head._1}"),
        (sums.tail.map { case (n, e) => sum(sign * e).as(s"_d_$n") } :+
          sum(sign).as(s"_d_$countName")): _*)
      // null-SAFE group join below: a NULL group key must fold into the
      // prior NULL group, not split into a second row (plain equi-join
      // semantics would never match NULL = NULL)
      .select(groupCols.map(c => col(c).as(s"_g_$c")) ++
        valNames.map(n => col(s"_d_$n")): _*)
    val joinCond = groupCols.map(c => col(c) <=> col(s"_g_$c"))
      .reduce(_ && _)
    prior.join(delta, joinCond, "full_outer")
      .select(groupCols.map(c =>
        coalesce(col(c), col(s"_g_$c")).as(c)) ++ valNames.map { n =>
        (coalesce(col(n), lit(0L)) + coalesce(col(s"_d_$n"), lit(0L))).as(n)
      }: _*)
      .filter(col(countName) > 0)
  }

  /** [[applyDelta]] generalized to a materialized ROLLUP: `prior` is a
    * `rollup(groupCols).agg(grouping_id() as gidName, sums…, count)`
    * materialization, and the delta is folded into EVERY grouping set in
    * one pass — the change feed is rolled up itself (one Expand, one
    * shuffle), then joined to the prior on (grouping_id, null-safe group
    * cols). The grouping id is what disambiguates a rolled-up NULL from a
    * real NULL group value, so both fold correctly. AVG needs no extra
    * maintained state — it is derived from the maintained SUM/COUNT at
    * read time (the standard self-maintainability decomposition), which is
    * why this module still maintains only SUM and COUNT.
    */
  def applyDeltaRollup(prior: DataFrame, changes: DataFrame,
                       groupCols: Seq[String], sums: Seq[(String, Column)],
                       countName: String, gidName: String): DataFrame = {
    require(groupCols.nonEmpty, "applyDeltaRollup needs group columns")
    require(sums.nonEmpty, "applyDeltaRollup needs a maintained sum")
    val valNames = sums.map(_._1) :+ countName
    (valNames :+ gidName).foreach(n => require(prior.columns.contains(n),
      s"prior rollup lacks maintained column $n"))
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .when(col("_change_type").isin("delete", "update_preimage"), lit(-1L))
      .otherwise(raise_error(concat(lit("unknown _change_type: "),
        col("_change_type"))))
    val delta = changes.rollup(groupCols.map(col): _*)
      .agg(grouping_id().cast("int").as(s"_g_$gidName"),
        (sums.map { case (n, e) => sum(sign * e).as(s"_d_$n") } :+
          sum(sign).as(s"_d_$countName")): _*)
      .select((col(s"_g_$gidName") +:
        groupCols.map(c => col(c).as(s"_g_$c"))) ++
        valNames.map(n => col(s"_d_$n")): _*)
    val joinCond = ((col(gidName) === col(s"_g_$gidName")) +:
      groupCols.map(c => col(c) <=> col(s"_g_$c"))).reduce(_ && _)
    prior.join(delta, joinCond, "full_outer")
      .select((coalesce(col(gidName), col(s"_g_$gidName")).as(gidName) +:
        groupCols.map(c => coalesce(col(c), col(s"_g_$c")).as(c))) ++
        valNames.map { n =>
          (coalesce(col(n), lit(0L)) +
            coalesce(col(s"_d_$n"), lit(0L))).as(n)
        }: _*)
      .filter(col(countName) > 0)
  }
}
