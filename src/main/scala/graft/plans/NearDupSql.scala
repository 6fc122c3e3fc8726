package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

/** SQL surface for near-duplicate pair detection (R13 "regular SQL
  * syntax" extended to the dedup family, the third rung of the TVF
  * ladder after [[SkewSql]] and [[AnnSql]]): a table-valued function
  * resolving to the very banded-LSH plans
  * [[graft.operators.Dedup.minhashPairs]] /
  * [[graft.operators.Dedup.simhashPairs]] build — per-row signatures,
  * band/chunk explosion, an equi-join on the band key (never a cross
  * join), exact verification only on candidates.
  *
  * {{{
  *   SELECT * FROM graft_neardup(
  *     'docs_view',  -- table/view with (idCol, textCol) rows
  *     'doc_id',     -- id column
  *     'text',       -- text column
  *     'minhash',    -- method: minhash | simhash
  *     '0.5')        -- minhash: min jaccard; simhash: max hamming
  *   -- minhash columns: a, b, jaccard;  simhash columns: a, b, hamming
  * }}}
  *
  * One code path for SQL and DataFrame users (the [[SkewSql]] argument):
  * parity is structural, and the recall/property guarantees tested in
  * DedupSpec for the operator apply verbatim to the TVF.
  *
  * Note on laziness: the operator builds end in `localCheckpoint()`, so
  * ANALYSIS of a `graft_neardup` query — including a plain `EXPLAIN` —
  * executes the full LSH job eagerly and returns a plan over the
  * materialized pair set (the [[AnnSql]] build-at-first-call pattern;
  * the checkpoint is what lets the corpus-sized shingle cache be
  * released before the result is handed to the optimizer).
  */
object NearDupSql {

  val name = "graft_neardup"

  val info: ExpressionInfo = new ExpressionInfo(
    NearDupSql.getClass.getCanonicalName, name,
    "graft_neardup(table, idCol, textCol, method, param) - near-duplicate " +
      "pairs via banded LSH; method 'minhash' (param = min jaccard, " +
      "returns a, b, jaccard) or 'simhash' (param = max hamming, returns " +
      "a, b, hamming); string-literal arguments", "", "")

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.size == 5,
      s"$name takes 5 string-literal arguments " +
        "(table, idCol, textCol, method, param); got " + args.size)
    def str(i: Int): String = {
      val e = args(i)
      require(e.foldable && e.dataType == StringType,
        s"$name argument ${i + 1} must be a string literal, got ${e.sql}")
      val v = e.eval()
      require(v != null, s"$name argument ${i + 1} must not be NULL")
      v.toString
    }
    // validate method/param BEFORE resolving the table, so a user with a
    // typo'd method gets the method error, not TABLE_OR_VIEW_NOT_FOUND
    val (idCol, textCol) = (str(1), str(2))
    val method = str(3).trim.toLowerCase
    require(method == "minhash" || method == "simhash",
      s"$name method must be minhash or simhash, got '$method'")
    val out = if (method == "minhash") {
      val threshold =
        try str(4).trim.toDouble
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$name minhash param must be a numeric jaccard threshold " +
              s"literal, got '${str(4)}'")
        }
      require(threshold >= 0.0 && threshold <= 1.0,
        s"$name jaccard threshold must be in [0, 1], got $threshold")
      graft.operators.Dedup.minhashPairs(
        SparkSession.active.table(str(0)), idCol, textCol, threshold)
    } else {
      val maxHamming =
        try str(4).trim.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$name simhash param must be an integer max-hamming literal, " +
              s"got '${str(4)}'")
        }
      require(maxHamming >= 0 && maxHamming <= 64,
        s"$name max hamming must be in [0, 64], got $maxHamming")
      graft.operators.Dedup.simhashPairs(
        SparkSession.active.table(str(0)), idCol, textCol, maxHamming)
    }
    out.queryExecution.analyzed
  }

  /** The `injectTableFunction` descriptor for [[graft.GraftExtensions]]. */
  def descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) =
    (FunctionIdentifier(name), info, builder)
}
