package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.sql.types.StringType

/** SQL surface for the skew-salted equi-join (R13 + SURVEY "salting for
  * skew"): a table-valued function, so a pure-SQL user gets the skew-safe
  * plan — one hot key spread over `saltBuckets` tasks — instead of the
  * single-stuck-task shuffle join they would otherwise write.
  *
  * {{{
  *   SELECT * FROM graft_salted_join(
  *     'lineitem_big', 'part_small',  -- big/small table or temp view
  *     'partkey',                     -- equi-join key column
  *     'l_orderkey,l_linenumber',     -- comma-separated disambiguator
  *                                    --   columns on the BIG side (salt hash)
  *     '8')                           -- salt bucket count
  * }}}
  *
  * Unlike [[AsOfSql]] (a custom logical node the analyzer resolves), the
  * salted join is a COMPOSITION of standard operators — so the builder
  * resolves the two table names through the active session and returns the
  * very plan [[graft.operators.Skew.saltedJoin]] builds. One code path for
  * SQL and DataFrame users: parity is structural, not tested-for.
  */
object SkewSql {

  val name = "graft_salted_join"

  val info: ExpressionInfo = new ExpressionInfo(
    SkewSql.getClass.getCanonicalName, name,
    "graft_salted_join(big, small, key, disambigCols, saltBuckets) - " +
      "inner equi-join with the big side salted over saltBuckets subkeys " +
      "by hashing disambigCols; string-literal arguments", "", "")

  /** TVF builder: literal string args → the salted-join plan. */
  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 5,
      s"$name takes 5 string-literal arguments " +
        "(big, small, key, disambigCols, saltBuckets); got " + args.size)
    def str(i: Int): String = {
      val e = args(i)
      require(e.foldable && e.dataType == StringType,
        s"$name argument ${i + 1} must be a string literal, got ${e.sql}")
      val v = e.eval()
      require(v != null, s"$name argument ${i + 1} must not be NULL")
      v.toString
    }
    val disambig = str(3).split(",").iterator.map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(disambig.nonEmpty, s"$name needs at least one disambiguator column")
    val buckets =
      try str(4).trim.toInt
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$name saltBuckets must be an integer literal, got '${str(4)}'")
      }
    require(buckets >= 1, s"$name saltBuckets must be >= 1, got $buckets")
    val spark = SparkSession.active
    val salt =
      if (disambig.size == 1) col(disambig.head)
      else struct(disambig.map(col): _*)
    graft.operators.Skew.saltedJoin(
        spark.table(str(0)), spark.table(str(1)), str(2), salt, buckets)
      .queryExecution.analyzed
  }

  /** The `injectTableFunction` descriptor for [[graft.GraftExtensions]]. */
  def descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, builder)
}
