package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE trainer/encoder correctness, against an independent naive reference
  * implemented here on plain Scala collections (no shared code with the
  * operator): classic-corpus merges, driver/distributed trainer parity,
  * greedy-encode parity, and the round-trip invariant.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive reference ----------------------------------------------------

  private def refPairCounts(seqs: Seq[(List[String], Long)]) =
    seqs.flatMap { case (s, c) =>
      s.zip(s.drop(1)).map(p => (p, c))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }

  private def refMergeOnce(s: List[String], a: String, b: String): List[String] =
    s match {
      case x :: y :: rest if x == a && y == b =>
        (a + b) :: refMergeOnce(rest, a, b)
      case x :: rest => x :: refMergeOnce(rest, a, b)
      case Nil => Nil
    }

  private def refTrain(corpus: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var seqs = corpus.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").filter(_.nonEmpty).toList, ws.size.toLong)
      }.toSeq
    var out = Vector.empty[(String, String)]
    var done = false
    while (!done && out.size < numMerges) {
      val counts = refPairCounts(seqs)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < 2) done = true
        else {
          out :+= ((a, b))
          seqs = seqs.map { case (s, n) => (refMergeOnce(s, a, b), n) }
        }
      }
    }
    out
  }

  private def refEncode(w: String, merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = w.split("").filter(_.nonEmpty).toList
    var go = true
    while (go && syms.size >= 2) {
      val present = syms.zip(syms.drop(1)).flatMap(rank.get)
      if (present.isEmpty) go = false
      else {
        val (a, b) = merges(present.min)
        syms = refMergeOnce(syms, a, b)
      }
    }
    syms
  }

  // ---- fixtures -----------------------------------------------------------

  /** Sennrich et al.'s running example vocabulary. */
  private val classic = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  private def docsDf(words: Seq[String]) =
    Seq(words.mkString(" ")).toDF("text")

  // ---- tests --------------------------------------------------------------

  test("classic corpus: trainer reproduces the reference merges") {
    val got = Bpe.train(docsDf(classic), "text", 8)
    val want = refTrain(Seq(classic.mkString(" ")), 8)
    assert(got == want)
    // the famous first merges: ('e','s') on 9 *est words, then ('es','t')
    assert(got.take(2) == Seq(("e", "s"), ("es", "t")))
  }

  test("driver and distributed trainers are bit-identical") {
    val df = Tables.table(spark, sf(), "documents").limit(120)
    val driver = Bpe.train(df, "text", 16)
    val dist = Bpe.train(df, "text", 16, forceDistributed = true)
    assert(driver.nonEmpty && driver == dist)
  }

  test("native encoder matches the naive reference on corpus words") {
    val df = Tables.table(spark, sf(), "documents").limit(150)
    val merges = Bpe.train(df, "text", 24)
    Bpe.register(spark, merges)
    val got = df.select(Bpe.encode(split(col("text"), " ")).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    val want = df.select(col("text")).collect().map(_.getString(0)
      .split(" ").filter(_.nonEmpty).toList.flatMap(refEncode(_, merges)))
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("round-trip: concatenated subwords reproduce each word") {
    val df = Tables.table(spark, sf(), "documents").limit(100)
    val merges = Bpe.train(df, "text", 32)
    Bpe.register(spark, merges)
    val rows = df
      .select(col("text"), Bpe.encode(split(col("text"), " ")).as("toks"))
      .collect()
    rows.foreach { r =>
      val plain = r.getString(0).split(" ").filter(_.nonEmpty).mkString
      assert(r.getSeq[String](1).mkString == plain)
    }
  }

  test("merges genuinely compress: BPE tokens between words and chars") {
    val df = Tables.table(spark, sf(), "documents").limit(100)
    val merges = Bpe.train(df, "text", 32)
    Bpe.register(spark, merges)
    val row = df.select(
        sum(size(split(col("text"), " "))).as("words"),
        sum(size(Bpe.encode(split(col("text"), " ")))).as("bpe"),
        sum(length(regexp_replace(col("text"), " ", ""))).as("chars"))
      .collect()(0)
    val (words, bpe, chars) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(bpe >= words, "BPE can never produce fewer tokens than words")
    assert(bpe < chars, "48 merges must compress below character count")
  }

  test("empty merges degrade to characters; unseen symbols pass through") {
    Bpe.register(spark, Nil)
    val got = Seq("ab ød").toDF("text")
      .select(Bpe.encode(split(col("text"), " "))).collect()(0).getSeq[String](0)
    assert(got == Seq("a", "b", "ø", "d"))
  }
}
