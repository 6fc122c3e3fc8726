package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryMinus}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for the native as-of join (R13, the reference's "regular SQL
  * syntax" requirement — `/root/reference/README.md:7,32`): a table-valued
  * function, so a pure-SQL user reaches the O(n+m) [[AsOfJoinExec]] instead
  * of hand-writing the per-key-quadratic join+window composition.
  *
  * {{{
  *   SELECT * FROM graft_asof_join(
  *     'errors', 'purchases',        -- left/right table or temp view
  *     'e_user', 'p_user',           -- comma-separated equi-key lists
  *     'e_ts',   'p_ts'              -- time columns
  *     [, 'p_id'                     -- tie-break columns ('' = none)
  *     [, '30 minutes'               -- tolerance interval ('' = unbounded)
  *     [, 'forward' ]]])             -- direction (default 'backward')
  * }}}
  *
  * The builder emits the [[AsOfJoin]] logical node over `UnresolvedRelation`
  * children with `UnresolvedAttribute` keys — the analyzer's generic
  * reference/function resolution fills them in, then the injected strategy
  * plans the node exactly as the DataFrame path does. `forward` needs no
  * helper columns: the node takes time *expressions*, so it is the same
  * backward merge over `-unix_micros(time)` passed directly as the time
  * expression (one codegen'd projection inside the exec's sort, nothing
  * added to the output schema).
  */
object AsOfSql {

  val name = "graft_asof_join"

  val info: ExpressionInfo = new ExpressionInfo(
    AsOfSql.getClass.getCanonicalName, name,
    "graft_asof_join(left, right, leftKeys, rightKeys, leftTime, rightTime" +
      "[, tie[, tolerance[, direction]]]) - native sort-merge as-of join " +
      "over two tables/views; string-literal arguments", "", "")

  /** TVF builder: literal string args → the unresolved [[AsOfJoin]] plan. */
  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size >= 6 && args.size <= 9,
      s"$name takes 6-9 string-literal arguments " +
        "(left, right, leftKeys, rightKeys, leftTime, rightTime" +
        "[, tie[, tolerance[, direction]]]); got " + args.size)
    def str(i: Int): String = {
      val e = args(i)
      require(e.foldable && e.dataType == StringType,
        s"$name argument ${i + 1} must be a string literal, got ${e.sql}")
      val v = e.eval()
      require(v != null, s"$name argument ${i + 1} must not be NULL")
      v.toString
    }
    def csv(s: String): Seq[String] =
      s.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    def rel(s: String): LogicalPlan =
      UnresolvedRelation(CatalystSqlParser.parseMultipartIdentifier(s))
    def attr(s: String): UnresolvedAttribute = UnresolvedAttribute(s)

    val (left, right) = (rel(str(0)), rel(str(1)))
    val (lKeys, rKeys) = (csv(str(2)).map(attr), csv(str(3)).map(attr))
    require(lKeys.nonEmpty && lKeys.size == rKeys.size,
      s"$name key lists must be non-empty and align pairwise")
    val tie = if (args.size > 6) csv(str(6)).map(attr) else Nil
    val tolUs = if (args.size > 7 && str(7).nonEmpty)
      Some(AsOf.parseToleranceUs(str(7))) else None
    val direction = if (args.size > 8) str(8) else "backward"

    def time(i: Int): Expression = direction match {
      case "backward" => attr(str(i))
      // same merge over negated epoch-µs (see AsOf.join) — built as an
      // expression, so no helper column enters the output schema
      case "forward" => UnaryMinus(
        UnresolvedFunction("unix_micros", Seq(attr(str(i))), isDistinct = false),
        failOnError = false)
      case other => throw new IllegalArgumentException(
        s"$name direction must be backward or forward, got $other")
    }
    AsOfJoin(left, right, lKeys, rKeys, time(4), time(5), tie, tolUs)
  }

  /** The `injectTableFunction` descriptor for [[graft.GraftExtensions]]. */
  def descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, builder)
}
