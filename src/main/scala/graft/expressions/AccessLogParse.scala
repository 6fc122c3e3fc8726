package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass nginx access-log parser (SURVEY §4: "the only place a custom
  * Catalyst node plausibly pays for itself").
  *
  * Semantics are EXACTLY the liblognorm grammar `/root/reference/nginx.rule:3`
  * / the equivalent anchored regex in [[graft.operators.AccessLog.pattern]]:
  * one left-to-right scan with the same tokenizer classes (`word` = to next
  * space, `char-to:C` = until literal C, `number` = digit run, `float` =
  * digits and dots, `rest`), same corrupt-line behavior (all fields empty,
  * `_corrupt` true). The regexp_extract formulation evaluates the full regex
  * 17× per line (16 extracts + the corrupt-flag rlike); this is one scan with
  * zero regex machinery — the ingest hot path at 100 TB.
  *
  * Output: struct of the 16 string fields + `_corrupt` boolean.
  */
object AccessLogParseExpr {

  val outputType: StructType = StructType(
    graft.operators.AccessLog.fields.map(f =>
      StructField(f, StringType, nullable = false)) :+
      StructField("_corrupt", BooleanType, nullable = false))

  private val emptyFields: Array[Any] =
    Array.fill[Any](16)(UTF8String.EMPTY_UTF8) :+ java.lang.Boolean.TRUE

  /** Parses one line; returns 16 fields + corrupt flag, regex-equivalent. */
  def parse(line: String): Array[Any] = {
    val out = new Array[Any](17)
    val n = line.length
    var i = 0

    def corrupt(): Array[Any] = emptyFields.clone()

    // Java regex \s is exactly [ \t\n\x0B\f\r]; (\S+) stops at ALL of them,
    // not just space — a tab inside a token makes the whole line corrupt
    // (the following expect(' ') fails), matching the regex + oracle.
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    // %field:word% — one-or-more non-whitespace chars ((\S+))
    def word(): String = {
      val s = i
      while (i < n && !isWs(line.charAt(i))) i += 1
      if (i == s) null else line.substring(s, i)
    }
    def expect(c: Char): Boolean =
      if (i < n && line.charAt(i) == c) { i += 1; true } else false

    // char-to:C — zero-or-more chars up to literal C ([^C]*), C consumed
    def charTo(c: Char): String = {
      val s = i
      while (i < n && line.charAt(i) != c) i += 1
      if (i >= n) null else { val r = line.substring(s, i); i += 1; r }
    }
    // like charTo but requires a non-empty match ([^C]+)
    def charTo1(c: Char): String = {
      val r = charTo(c)
      if (r == null || r.isEmpty) null else r
    }
    def digits(): String = {
      val s = i
      while (i < n && { val c = line.charAt(i); c >= '0' && c <= '9' }) i += 1
      if (i == s) null else line.substring(s, i)
    }
    // ([\d.]+) — digit-or-dot run
    def floatChars(): String = {
      val s = i
      while (i < n && { val c = line.charAt(i)
        (c >= '0' && c <= '9') || c == '.' }) i += 1
      if (i == s) null else line.substring(s, i)
    }

    val clientip = word(); if (clientip == null || !expect(' ')) return corrupt()
    val ident = word(); if (ident == null || !expect(' ')) return corrupt()
    val auth = word(); if (auth == null || !expect(' ')) return corrupt()
    if (!expect('[')) return corrupt()
    val day = charTo1('/'); if (day == null) return corrupt()
    val month = charTo1('/'); if (month == null) return corrupt()
    val year = digits(); if (year == null || !expect(':')) return corrupt()
    val rtime = word(); if (rtime == null || !expect(' ')) return corrupt()
    val tz = charTo1(']'); if (tz == null) return corrupt()
    if (!expect(' ') || !expect('"')) return corrupt()
    val verb = word(); if (verb == null || !expect(' ')) return corrupt()
    val request = word(); if (request == null || !expect(' ')) return corrupt()
    if (!(i + 5 <= n && line.startsWith("HTTP/", i))) return corrupt()
    i += 5
    val httpv = floatChars(); if (httpv == null || !expect('"') || !expect(' '))
      return corrupt()
    val response = digits(); if (response == null || !expect(' ')) return corrupt()
    val bytes = digits(); if (bytes == null || !expect(' ')) return corrupt()
    if (!expect('"')) return corrupt()
    val referrer = charTo('"'); if (referrer == null) return corrupt()
    if (!expect(' ') || !expect('"')) return corrupt()
    val agent = charTo('"'); if (agent == null) return corrupt()
    val blob = line.substring(i) // (.*)$ — remainder, may be empty

    // word()/charTo stop at delimiters, but the regex's (\S+) for rtime/verb/
    // request also must not contain the chars already consumed — equivalent by
    // construction. Assemble:
    var k = 0
    def put(v: String): Unit = { out(k) = UTF8String.fromString(v); k += 1 }
    put(clientip); put(ident); put(auth); put(day); put(month); put(year)
    put(rtime); put(tz); put(verb); put(request); put(httpv); put(response)
    put(bytes); put(referrer); put(agent); put(blob)
    out(16) = java.lang.Boolean.FALSE
    out
  }

  case class AccessLogParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = outputType
    def evalRow(line: UTF8String): InternalRow =
      InternalRow.fromSeq(parse(line.toString).toIndexedSeq)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("logparse", this, classOf[AccessLogParse].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalRow($c);")
    }
    override def nullSafeEval(input: Any): Any =
      InternalRow.fromSeq(parse(input.toString).toIndexedSeq)
    override protected def withNewChildInternal(c: Expression): AccessLogParse =
      copy(c)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_parse_accesslog", es => AccessLogParse(es.head), "built-in")

  def parseCol(line: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_parse_accesslog", line)
}
