package graft

import org.apache.spark.sql.functions._
import graft.operators.AccessLog

/** Parser golden tests against the reference's own examples
  * (`/root/reference/README.md:68,115,160`) and FIXTURES.md §B edge cases.
  */
class AccessLogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parsed = AccessLog.fixtures(spark)
    .select(col("id") +: AccessLog.parsed(col("line")): _*)
    .collect().map(r => r.getInt(0) -> r).toMap

  test("golden line parses to the reference's golden JSON (README.md:115)") {
    val r = parsed(1)
    val expect = Map(
      "clientip" -> "127.0.0.1", "ident" -> "-", "auth" -> "-",
      "day" -> "06", "month" -> "Apr", "year" -> "2020",
      "rtime" -> "09:54:48", "tz" -> "-0400", "verb" -> "GET",
      "request" -> "/", "httpversion" -> "1.1", "response" -> "200",
      "bytes" -> "612", "referrer" -> "-", "agent" -> "curl/7.29.0",
      "blob" -> " \"-\"")
    expect.foreach { case (f, v) =>
      assert(r.getAs[String](f) == v, s"field $f")
    }
    assert(!r.getAs[Boolean]("_corrupt"))
  }

  test("f02: non-dash auth, query string, HTTP/2.0, UA with spaces") {
    val r = parsed(2)
    assert(r.getAs[String]("auth") == "alice")
    assert(r.getAs[String]("request") == "/login?next=%2Fhome")
    assert(r.getAs[String]("httpversion") == "2.0")
    assert(r.getAs[String]("agent") == "Mozilla/5.0 (X11; Linux x86_64)")
    assert(r.getAs[String]("blob") == " \"203.0.113.9\"")
    assert(!r.getAs[Boolean]("_corrupt"))
  }

  test("f03: space inside request → corrupt path (R4), fields empty, no throw") {
    val r = parsed(3)
    assert(r.getAs[Boolean]("_corrupt"))
    assert(r.getAs[String]("clientip") == "")
  }

  test("f05: garbage line → corrupt, all fields empty") {
    val r = parsed(5)
    assert(r.getAs[Boolean]("_corrupt"))
    AccessLog.fields.foreach(f => assert(r.getAs[String](f) == "", s"field $f"))
  }

  test("month lookup: all 12 months + nomatch → unk (nginx.table:1-15)") {
    val df = (AccessLog.monthMap.keys.toSeq :+ "Foo").toDF("m")
      .select(col("m"), AccessLog.monthLookup(col("m")).as("n"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    AccessLog.monthMap.foreach { case (k, v) => assert(got(k) == v) }
    assert(got("Foo") == "unk")
  }

  test("full projection reproduces the golden INSERT row (README.md:160)") {
    val out = AccessLog.project(
      Seq("""127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-"""")
        .toDF("line")).collect()(0)
    assert(out.getAs[java.sql.Date]("logdate").toString == "2020-04-06")
    assert(out.getAs[java.sql.Timestamp]("logdatetime").toString
      .startsWith("2020-04-06 09:54:48"))
    assert(out.getAs[Int]("response") == 200)
    assert(out.getAs[Long]("bytes") == 612L)
    assert(out.getAs[String]("tz") == "-0400") // retained (additive; SURVEY R7)
    assert(!out.getAs[Boolean]("_corrupt"))
  }

  test("f06: unknown month → unk → null logdate downstream") {
    val out = AccessLog.project(
      Seq("""127.0.0.1 - - [06/Foo/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"""")
        .toDF("line")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("logdate")))
    assert(out.isNullAt(out.fieldIndex("logdatetime")))
    assert(!out.getAs[Boolean]("_corrupt")) // parse succeeded; only the date is bad
  }

  test("f07: out-of-UInt16 response → null, large bytes fits long (R8)") {
    val out = AccessLog.project(
      Seq("""127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 999999 99999999999 "-" "c" "-"""")
        .toDF("line")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("response")))
    assert(out.getAs[Long]("bytes") == 99999999999L)
  }

  test("native single-pass parser is field-identical to the regex formulation") {
    import graft.expressions.AccessLogParseExpr
    // fixtures + adversarial shapes aimed at tokenizer boundaries
    val adversarial = Seq(
      """1.2.3.4 - - [1/X/99:t z] "A B HTTP/9" 1 2 "r" "a"""",
      """a b c [d/e/1:f g] "h i HTTP/1.0" 2 3 "" ""x""",
      """ - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"""",
      """ip - - [//2020:t z] "G / HTTP/1." 0 0 "" """",
      """ip - - [d/m/2020:09:54:48 -0400] "GET /x HTTP/11" 200 612 "-" "c"""",
      """ip - - [d/m/:09:54:48 -0400] "GET /x HTTP/1.1" 200 612 "-" "c" "-"""",
      """ip - - [d/m/2020:09:54:48 -0400] "GET /x HTTP/1.1" 200x 612 "-" "c" "-"""",
      """ip - - [d/m/2020:09:54:48 -0400] "GET /x HTTP/1.1" 200 612 "unterminated""")
    val df = (AccessLog.fixtureLines.map(_._2) ++ adversarial).toDF("line")
    AccessLogParseExpr.register(spark)
    val native = df.select(col("line"),
      AccessLogParseExpr.parseCol(col("line")).as("p")).collect()
      .map(r => r.getString(0) -> r.getStruct(1))
    val regex = df.select(col("line") +: AccessLog.parsed(col("line")): _*)
      .collect().map(r => r.getString(0) -> r).toMap
    native.foreach { case (line, p) =>
      val want = regex(line)
      (AccessLog.fields :+ "_corrupt").zipWithIndex.foreach { case (f, i) =>
        assert(p.get(i) == want.getAs[Any](f),
          s"field $f differs for line <$line>: native=${p.get(i)} regex=${want.getAs[Any](f)}")
      }
    }
  }

  test("f08: repeated lines are NOT deduped on ingest (at-least-once parity)") {
    val line = """127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "curl/7.29.0" "-""""
    assert(AccessLog.project(Seq(line, line, line).toDF("line")).count() == 3)
  }
}
