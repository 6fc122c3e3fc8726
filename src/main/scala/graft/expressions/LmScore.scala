package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scorer for the broadcast-pruned bigram-LM perplexity filter
  * (`q_lm_perplexity_bc`): the per-document sum of add-k-smoothed bigram
  * log-probabilities, folded in POSITION order.
  *
  * Why native: the Column formulation (`transform(sequence(...), i ->
  * log(... element_at(mapLit, ...) ...))`) evaluates the lambda INTERPRETED
  * per element, and `element_at` on a literal map is a linear scan — ~930
  * string compares per lookup × 2 lookups × every bigram position made the
  * score pass ~6 s at sf0.1 where one JIT-compiled pass with hash lookups
  * is ~0.3 s. Same pattern as [[graft.operators.Bpe.BpeEncode]].
  *
  * FP discipline: `StrictMath.log` (what Catalyst's `Log` uses), one
  * `(cb + k) / (cw + k·v)` division and one ascending-position `sum += lp`
  * per bigram — bit-identical to the lambda fold and to the DuckDB oracle's
  * `list(lp ORDER BY pos)` fold. A missing pair/context scores as unseen
  * (count 0), the broadcast model's smoothing contract.
  */
object LmScore {

  private val Sep = UTF8String.fromString("\u0001")

  /** The model rides in `Broadcast` HANDLES, not plan-embedded maps: the
    * expression (and with it every task binary and plan string) stays a
    * few hundred bytes regardless of topV/topB — executors fetch the maps
    * once via the broadcast manager (the `VectorOps.PqEncodeBc` pattern).
    * LmScoreSpec pins the serialized expression under 64 KB with a
    * 200k-entry model.
    */
  case class LmScoreSum(child: Expression, cbBc: Broadcast[Map[String, Long]],
                        cwBc: Broadcast[Map[String, Long]], k: Double, v: Long)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType

    @transient private lazy val cbJ = {
      val cb = cbBc.value
      val m = new java.util.HashMap[UTF8String, java.lang.Long](cb.size * 2)
      cb.foreach { case (s, c) => m.put(UTF8String.fromString(s), c) }
      m
    }
    @transient private lazy val cwJ = {
      val cw = cwBc.value
      val m = new java.util.HashMap[UTF8String, java.lang.Long](cw.size * 2)
      cw.foreach { case (s, c) => m.put(UTF8String.fromString(s), c) }
      m
    }

    def evalDouble(toks: ArrayData): Double = {
      val n = toks.numElements()
      var sum = 0.0
      var i = 0
      while (i < n - 1) {
        val w1 = toks.getUTF8String(i)
        val w2 = toks.getUTF8String(i + 1)
        val cbc = cbJ.get(UTF8String.concat(w1, Sep, w2))
        val cwc = cwJ.get(w1)
        val cbv = if (cbc == null) 0L else cbc.longValue
        val cwv = if (cwc == null) 0L else cwc.longValue
        sum += StrictMath.log((cbv + k) / (cwv + k * v))
        i += 1
      }
      sum
    }

    override def nullSafeEval(input: Any): Any =
      evalDouble(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("lmScore", this, classOf[LmScoreSum].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalDouble($c);")
    }
    override protected def withNewChildInternal(c: Expression): LmScoreSum =
      copy(child = c)
  }

  private val bcCache = scala.collection.concurrent.TrieMap
    .empty[String, (Broadcast[Map[String, Long]], Broadcast[Map[String, Long]])]

  /** Registers `graft_lm_score` bound to a trained+pruned model (the
    * FunctionRegistry route — Column-from-Expression is sealed in Spark 4).
    * The maps are broadcast HERE, once per registration; the expression
    * carries only the handles. With `cacheKey` the broadcasts are memoized
    * (keyed per session + caller key) so repeated registrations of the
    * SAME model — the declared query re-executing — reuse one broadcast
    * pair instead of accumulating replaced blocks until GC.
    */
  def register(spark: SparkSession, cb: Map[String, Long],
               cw: Map[String, Long], k: Double, v: Long,
               cacheKey: Option[String] = None): Unit = {
    val (cbBc, cwBc) = cacheKey match {
      case Some(key) => bcCache.getOrElseUpdate(
        s"${graft.SessionIds.of(spark)}|$key",
        (spark.sparkContext.broadcast(cb), spark.sparkContext.broadcast(cw)))
      case None =>
        (spark.sparkContext.broadcast(cb), spark.sparkContext.broadcast(cw))
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lm_score", es => LmScoreSum(es.head, cbBc, cwBc, k, v), "built-in")
  }
}
