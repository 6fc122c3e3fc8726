package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for table profiling — the fifth rung of the TVF ladder
  * ([[AsOfSql]], [[SkewSql]], [[AnnSql]], [[NearDupSql]]): `ANALYZE`-style
  * per-column stats from pure SQL, resolving to the very plan
  * [[graft.operators.Profile.profile]] builds (one scan, single-Expand
  * multi-distinct, stack unpivot).
  *
  * {{{
  *   SELECT * FROM graft_profile('docs_view')
  *   -- columns: col_name, n_rows, n_null, n_distinct, min_s, max_s
  * }}}
  *
  * One code path for SQL and DataFrame users; nested/array/map columns are
  * skipped (no portable min/max ordering), and the column set is fixed at
  * analysis time from the resolved table's schema.
  */
object ProfileSql {

  val name = "graft_profile"

  val info: ExpressionInfo = new ExpressionInfo(
    ProfileSql.getClass.getCanonicalName, name,
    "graft_profile(table) - per-column profile (rows, nulls, exact " +
      "distincts, min/max as strings) of every atomic-typed column; " +
      "string-literal argument", "", "")

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 1,
      s"$name takes 1 string-literal argument (table); got " + args.size)
    val e = args.head
    require(e.foldable && e.dataType == StringType,
      s"$name argument must be a string literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$name argument must not be NULL")
    graft.operators.Profile
      .profile(SparkSession.active.table(v.toString))
      .queryExecution.analyzed
  }

  /** The `injectTableFunction` descriptor for [[graft.GraftExtensions]]. */
  def descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, builder)
}
