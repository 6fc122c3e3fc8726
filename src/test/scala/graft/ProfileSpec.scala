package graft

import graft.operators.Profile

/** Profile operator: hand-computed exact profile on a fixture with nulls
  * and duplicates; the approx dial must agree on every non-sketch measure
  * and land within HLL tolerance on the distincts.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None),
    (None, Some("b")), (Some(4L), Some("c")))
    .toDF("k", "s")

  test("exact profile: rows, nulls, distincts, native-typed min/max") {
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5))).toMap
    assert(got("k") == (5L, 1L, 3L, "1", "4"))
    assert(got("s") == (5L, 1L, 3L, "a", "c"))
  }

  test("numeric min/max aggregate numerically, not lexically") {
    val wide = Seq(2L, 10L, 9L).toDF("n") // lexical min would be "10"
    val got = Profile.profile(wide).collect()(0)
    assert(got.getString(4) == "2" && got.getString(5) == "10")
  }

  test("approx dial: identical non-sketch measures, distincts within rsd") {
    val exact = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    val approx = Profile.profile(df, approx = true).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a(1) == e(1) && a(2) == e(2) && a(4) == e(4) && a(5) == e(5),
        s"$c non-sketch measures diverge: $a vs $e")
      val (en, an) = (e(3).asInstanceOf[Long], a(3).asInstanceOf[Long])
      assert(math.abs(an - en) <= math.max(1L, (en * 0.1).toLong),
        s"$c approx distinct $an too far from exact $en")
    }
  }

  test("nested columns are skipped; empty column set rejected") {
    val nested = Seq((1L, Seq(1, 2))).toDF("k", "arr")
    val cols = Profile.profile(nested).collect().map(_.getString(0))
    assert(cols.toSeq == Seq("k"))
    val e = intercept[IllegalArgumentException] {
      Profile.profile(Seq(Tuple1(Seq(1))).toDF("arr"))
    }
    assert(e.getMessage.contains("profilable"))
  }
}
