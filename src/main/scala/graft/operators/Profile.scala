package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Table profiling (the ANALYZE / data-quality-dashboard shape): per
  * column, rows / nulls / exact distincts / native-typed min+max — ONE
  * scan for the whole profile.
  *
  * Plan shape: a single aggregate carrying every column's four measures;
  * the N `count(DISTINCT col)`s plan as ONE Expand pass (N× row multiply,
  * one shuffle) rather than N jobs, and the `stack` unpivot that turns the
  * 1×(4N+1) row into N tidy rows is a driver-free Generate. min/max are
  * cast to string AFTER aggregating on the native type, so numeric columns
  * profile numerically. At 100 TB swap `count_distinct` for
  * `approx_count_distinct` — same plan minus the Expand.
  */
object Profile {

  /** Profile `columns` (default: every atomic-typed column — nested/array/
    * map columns have no portable min/max ordering and are skipped).
    * Output: (col_name, n_rows, n_null, n_distinct, min_s, max_s),
    * ordered by col_name.
    *
    * `approx = true` is the 100 TB dial: `approx_count_distinct` (HLL++,
    * default 5% rsd) replaces the exact distincts, which removes BOTH the
    * Expand row-multiply AND the full-value shuffle — exact
    * `count(DISTINCT text)` must shuffle every distinct text once, so on a
    * wide corpus the exact profile moves the corpus; the sketch moves a
    * fixed few-KB buffer per column per partition.
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    val cols =
      if (columns.nonEmpty) columns
      else df.schema.fields.filterNot(f => f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => true
        case _ => false
      }).map(_.name).toSeq
    require(cols.nonEmpty, "no profilable (atomic-typed) columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_nn"),
        (if (approx) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"${c}_nd"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    val stackExpr = cols
      .map(c => s"'$c', `${c}_nn`, `${c}_nd`, `${c}_min`, `${c}_max`")
      .mkString(s"stack(${cols.length}, ", ", ", ")")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), expr(stackExpr)
        .as(Seq("col_name", "n_nonnull", "n_distinct", "min_s", "max_s")))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_null"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }
}
