package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL time travel — the sixth TVF rung: read any retained version of a
  * [[graft.storage.SnapshotStore]] from pure SQL.
  *
  * {{{
  *   SELECT * FROM graft_snapshot('/data/orders_snap', 'head')
  *   SELECT * FROM graft_snapshot('/data/orders_snap', '3')
  * }}}
  *
  * One code path with `SnapshotStore.read` (the [[NearDupSql]] argument):
  * the manifest resolution, shared-partition layout, and `_p` shadow-column
  * handling are the store's, not a SQL-side copy.
  */
object SnapshotSql {

  val name = "graft_snapshot"

  val info: ExpressionInfo = new ExpressionInfo(
    SnapshotSql.getClass.getCanonicalName, name,
    "graft_snapshot(path, version) - reads a SnapshotStore at `path`; " +
      "version is a positive integer literal or 'head'; string-literal " +
      "arguments", "", "")

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 2,
      s"$name takes 2 string-literal arguments (path, version); got " +
        args.size)
    def str(i: Int): String = {
      val e = args(i)
      require(e.foldable && e.dataType == StringType,
        s"$name argument ${i + 1} must be a string literal, got ${e.sql}")
      val v = e.eval()
      require(v != null, s"$name argument ${i + 1} must not be NULL")
      v.toString
    }
    val path = str(0)
    val version = str(1).trim.toLowerCase match {
      case "head" => None
      case s =>
        val v = try s.toInt catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$name version must be a positive integer or 'head', got '$s'")
        }
        require(v >= 1,
          s"$name version must be a positive integer or 'head', got $v")
        Some(v)
    }
    graft.storage.SnapshotStore.read(SparkSession.active, path, version)
      .queryExecution.analyzed
  }

  /** The `injectTableFunction` descriptor for [[graft.GraftExtensions]]. */
  def descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, builder)
}
