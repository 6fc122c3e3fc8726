package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.AccessLog
import graft.expressions.AccessLogParseExpr

/** Property-based parser tests (SURVEY §5.2): generated valid lines roundtrip
  * every field; arbitrary garbage never throws; the native single-pass parser
  * agrees with the regex formulation on both.
  */
class AccessLogPropertySpec extends SparkSpec {
  import spark.implicits._

  private val ipG = Gen.oneOf(
    Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString(".")),
    Gen.const("2001:db8::1"))
  private val tokenG = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val monthG = Gen.oneOf(AccessLog.monthMap.keys.toSeq :+ "Foo")
  private def pad2(i: Int) = f"$i%02d"
  private val caseG: Gen[(String, Map[String, String])] = for {
    ip <- ipG
    auth <- Gen.oneOf(Gen.const("-"), tokenG)
    day <- Gen.choose(1, 28).map(pad2)
    month <- monthG
    year <- Gen.choose(1990, 2030).map(_.toString)
    h <- Gen.choose(0, 23).map(pad2); m <- Gen.choose(0, 59).map(pad2)
    sec <- Gen.choose(0, 59).map(pad2)
    tzs <- Gen.oneOf("+", "-"); tzh <- Gen.oneOf("0000", "0400", "0800")
    verb <- Gen.oneOf("GET", "POST", "PUT", "DELETE")
    path <- tokenG.map("/" + _)
    httpv <- Gen.oneOf("1.0", "1.1", "2.0")
    resp <- Gen.choose(100, 599).map(_.toString)
    bytes <- Gen.choose(0L, 99999999L).map(_.toString)
    referrer <- Gen.oneOf(Gen.const("-"), tokenG.map("https://" + _))
    agent <- Gen.oneOf("curl/7.29.0", "Mozilla/5.0 (X11; Linux x86_64)", "-")
    xff <- Gen.oneOf(Gen.const("-"), ipG)
  } yield {
    val rtime = s"$h:$m:$sec"
    val tz = tzs + tzh
    val line = s"""$ip - $auth [$day/$month/$year:$rtime $tz] "$verb $path HTTP/$httpv" $resp $bytes "$referrer" "$agent" "$xff""""
    line -> Map("clientip" -> ip, "auth" -> auth, "day" -> day,
      "month" -> month, "year" -> year, "rtime" -> rtime, "tz" -> tz,
      "verb" -> verb, "request" -> path, "httpversion" -> httpv,
      "response" -> resp, "bytes" -> bytes, "referrer" -> referrer,
      "agent" -> agent, "blob" -> s""" "$xff"""")
  }

  test("generated valid lines: every field roundtrips through the parser") {
    val cases = Gen.listOfN(200, caseG).sample.get
    val parsed = AccessLog.fixtures(spark).sparkSession.createDataset(
        cases.map(_._1))
      .toDF("line")
      .select(col("line") +: AccessLog.parsed(col("line")): _*)
      .collect().map(r => r.getString(0) -> r).toMap
    cases.foreach { case (line, want) =>
      val got = parsed(line)
      assert(!got.getAs[Boolean]("_corrupt"), s"corrupt: $line")
      want.foreach { case (f, v) =>
        assert(got.getAs[String](f) == v, s"field $f of <$line>")
      }
    }
  }

  test("native parser == regex parser on generated valid AND garbage lines") {
    val garbageG = Gen.oneOf(
      Gen.asciiPrintableStr,
      caseG.map(_._1).map(_.drop(5)),
      caseG.map(_._1).map(_.replace("\"", "")),
      caseG.map(_._1).map(l => l.take(l.length / 2)),
      // whitespace-class injections: \S+ must reject tab/VT/FF inside
      // tokens, so these lines are corrupt in BOTH parsers
      caseG.map(_._1).map(_.replaceFirst(" ", "\t")),
      caseG.map(_._1).map(l => l.replace("GET", "G\tET")),
      caseG.map(_._1).map(l => l.replace(" ", "")),
      caseG.map(_._1).map(l => l.replaceFirst("-", "\f-")))
    val lines = (Gen.listOfN(150, caseG).sample.get.map(_._1) ++
      Gen.listOfN(150, garbageG).sample.get).distinct
      .filterNot(l => l.contains("\n") || l.contains("\r"))
    AccessLogParseExpr.register(spark)
    val df = lines.toDF("line")
    val native = df.select(col("line"),
        AccessLogParseExpr.parseCol(col("line")).as("p"))
      .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
    val regex = df.select(col("line") +: AccessLog.parsed(col("line")): _*)
      .collect().map(r => r.getString(0) -> r).toMap
    lines.foreach { line =>
      val p = native(line); val want = regex(line)
      (AccessLog.fields :+ "_corrupt").zipWithIndex.foreach { case (f, i) =>
        assert(p.get(i) == want.getAs[Any](f),
          s"field $f differs for <$line>: native=${p.get(i)} regex=${want.getAs[Any](f)}")
      }
    }
  }

  test("projection of garbage never throws and always flags") {
    val garbage = Gen.listOfN(100, Gen.asciiPrintableStr).sample.get
      .filterNot(l => l.contains("\n") || l.contains("\r"))
    val out = AccessLog.project(garbage.toDF("line"))
    assert(out.count() == garbage.length) // no throw
  }
}
