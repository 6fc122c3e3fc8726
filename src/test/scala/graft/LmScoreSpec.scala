package graft

import org.apache.spark.sql.functions._

/** The native perplexity scorer (expressions/LmScore): parity with a naive
  * Scala reference on in-model bigrams, and the PRUNED-model contract the
  * DuckDB oracle can never exercise (the fixture caps never bite): a bigram
  * or context missing from the broadcast model scores as unseen with add-k
  * smoothing, (0+k)/(0+k·v).
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val K = 0.1
  private val V = 10L

  private def naive(toks: Seq[String], cb: Map[(String, String), Long],
                    cw: Map[String, Long]): Double =
    toks.sliding(2).filter(_.size == 2).foldLeft(0.0) { case (acc, Seq(a, b)) =>
      acc + StrictMath.log(
        (cb.getOrElse((a, b), 0L) + K) / (cw.getOrElse(a, 0L) + K * V))
    }

  private def score(docs: Seq[Seq[String]], cb: Map[(String, String), Long],
                    cw: Map[String, Long]): Seq[Double] = {
    graft.expressions.LmScore.register(spark,
      cb.map { case ((a, b), c) => (a + "\u0001" + b) -> c }, cw, K, V)
    docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("id", "tk")
      .select(col("id"), call_function("graft_lm_score", col("tk")).as("s"))
      .orderBy("id").select("s").as[Double].collect().toSeq
  }

  test("matches the naive fold bit-for-bit on in-model bigrams") {
    val cb = Map(("the", "cat") -> 3L, ("cat", "sat") -> 2L, ("sat", "on") -> 1L)
    val cw = Map("the" -> 5L, "cat" -> 2L, "sat" -> 1L)
    val docs = Seq(
      Seq("the", "cat", "sat", "on"),
      Seq("the", "cat"),
      Seq("cat", "sat", "on"))
    val got = score(docs, cb, cw)
    docs.zip(got).foreach { case (d, s) =>
      assert(s == naive(d, cb, cw), s"doc $d") // == : bit-identical
    }
  }

  test("pruned-away bigrams and contexts score as unseen (0+k)/(0+k*v)") {
    val cb = Map(("a", "b") -> 4L)
    val cw = Map("a" -> 4L)
    // "x y": neither pair nor context in the model
    val unseen = score(Seq(Seq("x", "y")), cb, cw).head
    assert(unseen == StrictMath.log((0 + K) / (0 + K * V)))
    // "a z": context known, pair pruned - smoothing uses the TRUE context total
    val halfSeen = score(Seq(Seq("a", "z")), cb, cw).head
    assert(halfSeen == StrictMath.log((0 + K) / (4 + K * V)))
  }

  test("edge shapes: empty, single-token, and repeated-bigram docs") {
    val cb = Map(("a", "a") -> 2L)
    val cw = Map("a" -> 2L)
    val got = score(Seq(Seq.empty, Seq("a"), Seq("a", "a", "a")), cb, cw)
    assert(got(0) == 0.0 && got(1) == 0.0) // no bigram positions -> empty sum
    assert(got(2) == 2 * StrictMath.log((2 + K) / (2 + K * V)))
  }

  test("the expression carries broadcast handles: serialized size stays " +
    "small under a 200k-entry model") {
    val bigCb = (0 until 200000)
      .map(i => "w" + i + "\u0001w" + (i + 1) -> i.toLong).toMap
    val bigCw = (0 until 200000).map(i => s"w$i" -> i.toLong).toMap
    graft.expressions.LmScore.register(spark, bigCb, bigCw, K, V)
    val expr = spark.sessionState.functionRegistry
      .lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lm_score")).get
      .apply(Seq(org.apache.spark.sql.catalyst.expressions.Literal
        .create(Seq("a", "b"))))
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(expr); oos.close()
      bos.size()
    }
    // a plan-embedded 200k-entry model would serialize to megabytes; the
    // broadcast handle keeps the task-binary contribution tiny
    assert(bytes < 65536, s"expression serialized to $bytes bytes")
  }

  test("the declared query's two model forms agree where the caps are no-ops") {
    val d = sf("sf0.001")
    val base = SparkEntry.queries("q_lm_perplexity")(spark, d).collect()
    val bc = SparkEntry.queries("q_lm_perplexity_bc")(spark, d).collect()
    assert(base.map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      bc.map(r => (r.getLong(0), r.getDouble(2))).toSeq,
      "broadcast-pruned scoring diverged from the shuffle-join model")
  }
}
