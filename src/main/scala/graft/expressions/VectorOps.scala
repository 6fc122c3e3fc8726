package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.call_function

/** Native vector-quantization expressions for the IVF ANN family: nearest
  * centroid(s) by squared L2 distance, in one tight JIT loop per row. The
  * centroid table arrives as a FOLDABLE array<array<double>> literal (right
  * operand), decoded once per expression instance — so k·dim multiplies per
  * row run with zero per-element Catalyst overhead, vs k interpreted
  * `aggregate()` lambdas.
  */
object VectorOps {

  private def decodeCentroids(v: Any): Array[Array[Double]] = {
    val arr = v.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
  }

  /** Index (0-based) of the nearest centroid by squared L2. */
  case class NearestCentroid(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val cents: Array[Array[Double]] =
      decodeCentroids(right.eval(null))

    def evalIdx(vec: ArrayData): Int = {
      val v = vec.toDoubleArray()
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val ct = cents(c)
        var d = 0.0; var i = 0
        val n = math.min(v.length, ct.length)
        while (i < n) { val t = v(i) - ct(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nearcent", this, classOf[NearestCentroid].getName)
      nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.evalIdx($a);")
    }
    override def nullSafeEval(l: Any, r: Any): Any =
      java.lang.Integer.valueOf(evalIdx(l.asInstanceOf[ArrayData]))
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Indices of the `n` nearest centroids (ascending distance; ties by
    * index), as array<int> — the multi-probe cell list for IVF search.
    */
  case class NearestCentroids(first: Expression, second: Expression,
                              third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cents: Array[Array[Double]] =
      decodeCentroids(second.eval(null))
    @transient private lazy val nProbe: Int =
      third.eval(null).asInstanceOf[Number].intValue()

    def evalIdxs(vec: ArrayData): ArrayData = {
      val v = vec.toDoubleArray()
      val d = new Array[Double](cents.length)
      var c = 0
      while (c < cents.length) {
        val ct = cents(c)
        var acc = 0.0; var i = 0
        val n = math.min(v.length, ct.length)
        while (i < n) { val t = v(i) - ct(i); acc += t * t; i += 1 }
        d(c) = acc; c += 1
      }
      val order = Array.range(0, cents.length)
        .sortBy(i => (d(i), i)).take(math.min(nProbe, cents.length))
      new GenericArrayData(order.map(java.lang.Integer.valueOf).toArray[Any])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nearcents", this, classOf[NearestCentroids].getName)
      nullSafeCodeGen(ctx, ev, (a, _, _) => s"${ev.value} = $self.evalIdxs($a);")
    }
    override def nullSafeEval(v: Any, c: Any, n: Any): Any =
      evalIdxs(v.asInstanceOf[ArrayData])
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                   t: Expression) =
      copy(first = f, second = s, third = t)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_nearest_centroid",
      es => NearestCentroid(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroids",
      es => NearestCentroids(es(0), es(1), es(2)), "built-in")
  }

  def nearestCentroid(v: Column, cents: Column): Column =
    call_function("graft_nearest_centroid", v, cents)
  def nearestCentroids(v: Column, cents: Column, nProbe: Column): Column =
    call_function("graft_nearest_centroids", v, cents, nProbe)
}
