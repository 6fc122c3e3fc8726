package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{call_function, lit}

/** Native vector-quantization expressions for the IVF ANN family: nearest
  * centroid(s) by squared L2 distance, in one tight JIT loop per row.
  *
  * Centroid delivery has two forms:
  *  - a FOLDABLE array<array<double>> literal (right operand) — fine for
  *    toy k, but the literal is embedded in every plan copy, so at
  *    realistic k (√N ≈ thousands) it bloats plan analysis/serialization;
  *  - a Spark BROADCAST variable (the `*Bc` variants) — the expression
  *    carries only the broadcast handle; executors fetch the centroid
  *    blocks once per JVM via torrent broadcast. This is the 100 TB path
  *    and what [[graft.operators.VectorIvf]] uses.
  */
object VectorOps {

  private def decodeCentroids(v: Any): Array[Array[Double]] = {
    val arr = v.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
  }

  /** Shared argmin loop: index of nearest centroid by squared L2. */
  private def nearestIdx(v: Array[Double], cents: Array[Array[Double]]): Int = {
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

  /** Shared top-n loop: indices of the n nearest centroids (ties by idx). */
  private def nearestIdxs(v: Array[Double], cents: Array[Array[Double]],
                          nProbe: Int): ArrayData = {
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

  /** Driver-side handle registry so the temp-function builder (which only
    * sees literal arguments) can attach a broadcast to the expression at
    * analysis time. Bounded: old entries are dropped once 64 newer
    * broadcasts exist (live plans keep their own reference; the map entry
    * is only needed while the plan is being analyzed).
    */
  private val bcReg =
    new java.util.LinkedHashMap[Long, Broadcast[Array[Array[Double]]]]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Broadcast[Array[Array[Double]]]]) =
        size() > 64
    }

  /** Broadcast a centroid table; returns the id to pass to the Bc columns. */
  def broadcastCentroids(spark: SparkSession,
                         cents: Array[Array[Double]]): Long = {
    val bc = spark.sparkContext.broadcast(cents)
    bcReg.synchronized { bcReg.put(bc.id, bc) }
    bc.id
  }

  /** Index (0-based) of the nearest centroid by squared L2. */
  case class NearestCentroid(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val cents: Array[Array[Double]] =
      decodeCentroids(right.eval(null))

    def evalIdx(vec: ArrayData): Int = nearestIdx(vec.toDoubleArray(), cents)

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

    def evalIdxs(vec: ArrayData): ArrayData =
      nearestIdxs(vec.toDoubleArray(), cents, nProbe)

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

  /** Nearest centroid via a broadcast handle (no plan literal). */
  case class NearestCentroidBc(child: Expression,
                               bc: Broadcast[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val cents: Array[Array[Double]] = bc.value
    def evalIdx(vec: ArrayData): Int = nearestIdx(vec.toDoubleArray(), cents)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nearcentbc", this, classOf[NearestCentroidBc].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.evalIdx($a);")
    }
    override def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(evalIdx(v.asInstanceOf[ArrayData]))
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** n nearest centroids via a broadcast handle (no plan literal). */
  case class NearestCentroidsBc(left: Expression, right: Expression,
                                bc: Broadcast[Array[Array[Double]]])
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cents: Array[Array[Double]] = bc.value
    @transient private lazy val nProbe: Int =
      right.eval(null).asInstanceOf[Number].intValue()
    def evalIdxs(vec: ArrayData): ArrayData =
      nearestIdxs(vec.toDoubleArray(), cents, nProbe)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("nearcentsbc", this, classOf[NearestCentroidsBc].getName)
      nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.evalIdxs($a);")
    }
    override def nullSafeEval(v: Any, n: Any): Any =
      evalIdxs(v.asInstanceOf[ArrayData])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Symmetric int8 quantization of a FLOAT/DOUBLE vector in one pass:
    * q_i = floor(v_i · 127 / max|v| + 0.5) (0-vector → zeros), emitted as
    * int-valued DOUBLEs so downstream dot products stay exact and reuse the
    * VecDot fold. Replaces the interpreted per-element HOF transform
    * (LambdaFunction, no codegen) that dominated q_sim_quant's profile;
    * floor(x+0.5), not round(): identical half-up semantics on every engine.
    */
  case class QuantizeI8(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    def evalArray(v: ArrayData): ArrayData =
      nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("qi8", this, classOf[QuantizeI8].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalArray($c);")
    }
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val n = v.numElements()
      val isFloat = child.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }
      def at(i: Int): Double =
        if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var mx = 0.0
      var i = 0
      while (i < n) { val a = math.abs(at(i)); if (a > mx) mx = a; i += 1 }
      val out = new Array[Any](n)
      i = 0
      if (mx == 0.0) while (i < n) { out(i) = 0.0; i += 1 }
      else while (i < n) {
        out(i) = math.floor(at(i) * 127.0 / mx + 0.5); i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): QuantizeI8 =
      copy(child = c)
  }

  /** Product-quantization encode via a broadcast FLAT codebook table (row
    * `m·K + k` = centroid k of subspace m, K inferred from table size):
    * `code_m = argmin_k ‖v[m·dsub ..] − cent(m,k)‖²`. All M argmins run in
    * one JIT loop per row — the corpus's 8-int code replaces its
    * dim-double vector everywhere downstream (the PQ memory path; Jégou
    * et al., TPAMI 2011).
    */
  case class PqEncodeBc(left: Expression, right: Expression,
                        bc: Broadcast[Array[Array[Double]]])
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    @transient private lazy val cents: Array[Array[Double]] = bc.value
    @transient private lazy val m: Int =
      right.eval(null).asInstanceOf[Number].intValue()

    def evalCodes(vec: ArrayData): ArrayData = {
      val v = vec.toDoubleArray()
      val k = cents.length / m
      val dsub = v.length / m
      val out = new Array[Any](m)
      var mi = 0
      while (mi < m) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ct = cents(mi * k + c)
          var d = 0.0; var i = 0
          while (i < dsub) { val t = v(mi * dsub + i) - ct(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(mi) = java.lang.Integer.valueOf(best)
        mi += 1
      }
      new GenericArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqencbc", this, classOf[PqEncodeBc].getName)
      nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $self.evalCodes($a);")
    }
    override def nullSafeEval(v: Any, mm: Any): Any =
      evalCodes(v.asInstanceOf[ArrayData])
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Asymmetric PQ cosine: `dot(q, recon(codes)) / (‖q‖·‖recon(codes)‖)`
    * where `recon` concatenates the coded centroids. One pass accumulates
    * the dot AND the reconstruction norm — the corpus side contributes
    * only its M-int codes, never a vector (the ADC search shape: query
    * exact, candidates compressed).
    */
  case class PqCosBc(first: Expression, second: Expression, third: Expression,
                     bc: Broadcast[Array[Array[Double]]])
      extends TernaryExpression {
    override def dataType: DataType = DoubleType
    @transient private lazy val cents: Array[Array[Double]] = bc.value
    @transient private lazy val m: Int =
      third.eval(null).asInstanceOf[Number].intValue()

    def evalCos(q: ArrayData, codes: ArrayData): Double = {
      val qv = q.toDoubleArray()
      val k = cents.length / m
      val dsub = qv.length / m
      var dot = 0.0; var rn = 0.0; var qn = 0.0
      var i = 0
      while (i < qv.length) { qn += qv(i) * qv(i); i += 1 }
      var mi = 0
      while (mi < m) {
        val ct = cents(mi * k + codes.getInt(mi))
        var j = 0
        while (j < dsub) {
          val x = ct(j); dot += qv(mi * dsub + j) * x; rn += x * x; j += 1
        }
        mi += 1
      }
      val den = math.sqrt(qn) * math.sqrt(rn)
      if (den == 0.0) 0.0 else dot / den
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("pqcosbc", this, classOf[PqCosBc].getName)
      nullSafeCodeGen(ctx, ev, (a, b, _) => s"${ev.value} = $self.evalCos($a, $b);")
    }
    override def nullSafeEval(q: Any, codes: Any, mm: Any): Any =
      java.lang.Double.valueOf(
        evalCos(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData]))
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                   t: Expression) =
      copy(first = f, second = s, third = t)
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_quantize_i8",
      es => QuantizeI8(es(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_encode_bc",
      es => PqEncodeBc(es(0), es(2), bcReg.synchronized {
        bcReg.get(es(1).eval(null).asInstanceOf[Number].longValue())
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_pq_cos_bc",
      es => PqCosBc(es(0), es(1), es(3), bcReg.synchronized {
        bcReg.get(es(2).eval(null).asInstanceOf[Number].longValue())
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroid",
      es => NearestCentroid(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroids",
      es => NearestCentroids(es(0), es(1), es(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroid_bc",
      es => NearestCentroidBc(es(0), bcReg.synchronized {
        bcReg.get(es(1).eval(null).asInstanceOf[Number].longValue())
      }), "built-in")
    reg.createOrReplaceTempFunction("graft_nearest_centroids_bc",
      es => NearestCentroidsBc(es(0), es(2), bcReg.synchronized {
        bcReg.get(es(1).eval(null).asInstanceOf[Number].longValue())
      }), "built-in")
  }

  def quantizeI8(v: Column): Column = call_function("graft_quantize_i8", v)
  def pqEncodeBc(v: Column, bcId: Long, m: Int): Column =
    call_function("graft_pq_encode_bc", v, lit(bcId), lit(m))
  def pqCosBc(q: Column, codes: Column, bcId: Long, m: Int): Column =
    call_function("graft_pq_cos_bc", q, codes, lit(bcId), lit(m))
  def nearestCentroid(v: Column, cents: Column): Column =
    call_function("graft_nearest_centroid", v, cents)
  def nearestCentroids(v: Column, cents: Column, nProbe: Column): Column =
    call_function("graft_nearest_centroids", v, cents, nProbe)
  def nearestCentroidBc(v: Column, bcId: Long): Column =
    call_function("graft_nearest_centroid_bc", v, lit(bcId))
  def nearestCentroidsBc(v: Column, bcId: Long, nProbe: Int): Column =
    call_function("graft_nearest_centroids_bc", v, lit(bcId), lit(nProbe))
}
