package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sign-LSH primitives over embedding vectors.
  *
  * The Column-composed formulation (one `VecDot` against a `typedlit`
  * hyperplane per code bit / signature bit) is numerically identical but
  * plants hundreds of 64-double literals in the plan — Catalyst analysis and
  * codegen time dominated the actual work (~3 s/query at sf0.1). These
  * expressions generate the same splitmix-derived ±1 hyperplanes INSIDE the
  * operator (one plan node, planes built lazily per executor) and run the
  * same left-fold dot products as one tight JIT loop per row.
  *
  * FP-parity contract (shared with the DuckDB oracle): each plane dot is a
  * sequential index-order left fold in DOUBLE starting at 0.0 — exactly
  * `VecDot` and DuckDB's `list_reduce(list_prepend(0.0, ...))`.
  */
object LshPlanes {

  val Dim = 64

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Component i of hyperplane j: ±1.0, deterministic on every engine. */
  def sign(j: Int, i: Int): Double =
    if ((mix(j.toLong * Dim + i) & 1L) == 0L) 1.0 else -1.0

  def hyperplane(j: Int): Array[Double] =
    Array.tabulate(Dim)(i => sign(j, i))

  private def planeMatrix(n: Int): Array[Array[Double]] =
    Array.tabulate(n)(hyperplane)

  /** Left-fold dot of vector row `v` against plane `p` — VecDot semantics. */
  private def foldDot(v: ArrayData, p: Array[Double]): Double = {
    val n = math.min(v.numElements(), p.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
    acc
  }

  /** All band codes of a DOUBLE-array vector: band g = "g:" + `bits` sign
    * chars against planes j = g*bits+b.
    */
  case class LshBandCodes(child: Expression, bits: Int, bands: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val planes = planeMatrix(bits * bands)
    def evalArray(v: ArrayData): ArrayData =
      nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("lshcodes", this, classOf[LshBandCodes].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalArray($c);")
    }
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val out = new Array[AnyRef](bands)
      var g = 0
      while (g < bands) {
        val sb = new java.lang.StringBuilder(bits + 3)
        sb.append(g).append(':')
        var b = 0
        while (b < bits) {
          sb.append(if (foldDot(v, planes(g * bits + b)) >= 0) '1' else '0')
          b += 1
        }
        out(g) = UTF8String.fromString(sb.toString)
        g += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): LshBandCodes =
      copy(child = c)
  }

  /** Bit-signature words: word w packs the signs of planes [32w, 32w+32)
    * as bits 0..31 of a long (exact integer arithmetic on every engine).
    */
  case class LshSigWords(child: Expression, words: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    @transient private lazy val planes = planeMatrix(words * 32)
    def evalArray(v: ArrayData): ArrayData =
      nullSafeEval(v).asInstanceOf[ArrayData]
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("lshsig", this, classOf[LshSigWords].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalArray($c);")
    }
    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val out = new Array[Long](words)
      var w = 0
      while (w < words) {
        var word = 0L
        var i = 0
        while (i < 32) {
          if (foldDot(v, planes(w * 32 + i)) >= 0) word |= (1L << i)
          i += 1
        }
        out(w) = word
        w += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): LshSigWords =
      copy(child = c)
  }

  /** Idempotent registration (Column ctor is sealed in Spark 4). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_lsh_codes",
      es => LshBandCodes(es(0),
        es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int]),
      "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_sig",
      es => LshSigWords(es(0), es(1).eval().asInstanceOf[Int]), "built-in")
  }

  // Column-level wrappers (valid after register())
  def bandCodes(v: Column, bits: Int, bands: Int): Column =
    call_function("graft_lsh_codes", v,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(bands))
  def sigWords(v: Column, words: Int): Column =
    call_function("graft_lsh_sig", v, org.apache.spark.sql.functions.lit(words))
}
