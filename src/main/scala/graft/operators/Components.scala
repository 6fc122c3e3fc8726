package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge set via min-label
  * propagation, iterated to the TRUE fixpoint.
  *
  * Mirrors the "which copy do we keep" canonicalization step after near-dup
  * pair detection (reference: the dedup stage a ClickHouse user would run as
  * a recursive CTE over the pair table). Label propagation converges in
  * `diameter(G)` rounds; near-dup components at high thresholds are
  * near-cliques (diameter ~1), but a 100 TB corpus WILL contain chain-shaped
  * components (A~B~C~D with no A~D edge), so the loop is guarded by the
  * actual per-round changed-label count rather than a fixed iteration
  * constant — it runs exactly as many rounds as the data's deepest component
  * needs, and no more.
  *
  * Scale shape: per-round cost is one join on the EDGE set plus one count on
  * the (tiny) label delta. Each round is truncated with an eager
  * `localCheckpoint` — the loop variable feeds both the convergence count
  * and the next round, and without truncation the plan tree doubles per
  * round (2^iters copies of the upstream pipeline). The checkpoint job IS
  * the round's one materialization; the count then reads the cached RDD.
  */
object Components {

  /** Loud backstop: a component of diameter > MaxIters means the input is
    * not a near-dup graph (or is adversarial) — fail rather than loop. At
    * one edge-set join per round this bounds worst-case work explicitly.
    */
  val MaxIters = 64

  /** Size switch for the driver-local solve: ≤1M edges ≈ 16 MB collected —
    * trivially one heap's worth, while even ONE distributed propagation
    * round on such a graph is multiple jobs of pure task-scheduling
    * overhead (measured 1.65 s for a 25-edge graph at sf0.1 vs ~0.2 s
    * local). Near-dup edge sets are orders of magnitude smaller than their
    * corpus, so at 100 TB this path still fires for most daily increments;
    * the distributed loop below remains the unbounded-size path.
    */
  val LocalSolveEdgeLimit = 1000000L

  /** Canonical labels for every node appearing in `pairs` (cols `a`, `b`,
    * one row per undirected edge). Returns (`node`, `lbl`) where `lbl` is
    * the component minimum.
    */
  def connectedComponents(pairs: DataFrame,
                          localSolveEdgeLimit: Long = LocalSolveEdgeLimit): DataFrame = {
    val spark = pairs.sparkSession
    // Eager materialization of the edge set: the bidirectional union and
    // every propagation round re-read it, and inside one action lazy-cache
    // consumers race ahead of population — each would recompute the whole
    // upstream (e.g. ngram) pipeline. One job up front, tiny RDD after.
    val p = pairs.select(col("a"), col("b")).localCheckpoint()
    val nEdges = p.count() // free: reads the checkpointed RDD
    // the driver solve maps keys through Long and casts labels back to the
    // `a` column's type, so BOTH columns must be the SAME integral type;
    // anything else (strings, mixed widths, …) keeps the type-generic
    // fixpoint — mixed widths could overflow on the cast back
    val integralKey = {
      import org.apache.spark.sql.types._
      val (ta, tb) = (p.schema.fields(0).dataType, p.schema.fields(1).dataType)
      ta == tb && (ta match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      })
    }
    if (nEdges <= localSolveEdgeLimit && integralKey) return localSolve(p)
    // Size the loop's shuffles to the EDGE set, not the session default: a
    // near-dup pair table is orders of magnitude smaller than its corpus,
    // and paying full shuffle width per round is pure task-scheduling
    // overhead (measured ~0.5 s/round on a 25-edge graph at width 32).
    // ~1M edges per partition, capped; restored after the loop — the
    // rounds' localCheckpoints are all materialized inside it.
    val parts = math.max(1L, math.min(2048L, nEdges / 1000000L + 1L))
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      val e = p.union(p.select(col("b").as("a"), col("a").as("b")))
        .toDF("src", "dst")
      var labels = e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node"))
        .localCheckpoint()
      var changed = 1L
      var iters = 0
      while (changed > 0) {
        iters += 1
        if (iters > MaxIters)
          throw new IllegalStateException(
            s"connectedComponents: no fixpoint after $MaxIters rounds " +
              "(component diameter exceeds MaxIters — not a near-dup graph?)")
        val nbr = e.join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node")).agg(min(col("lbl")).as("nlbl"))
        val step = labels.join(nbr, Seq("node"), "left")
          .select(col("node"), col("lbl"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("nl"))
          .localCheckpoint()
        changed = step.filter(col("nl") < col("lbl")).count()
        labels = step.select(col("node"), col("nl").as("lbl"))
      }
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  /** Driver-side union-find (path-halving + union by attachment order),
    * relabeled to the component MINIMUM so the output is bit-identical to
    * the distributed fixpoint's. `edges` is already checkpointed and known
    * ≤ [[LocalSolveEdgeLimit]].
    */
  private def localSolve(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val keyType = edges.schema.fields(0).dataType
    val es = edges.collect().map(r =>
      (r.get(0).asInstanceOf[Number].longValue(),
        r.get(1).asInstanceOf[Number].longValue()))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val nodes = parent.keys.toArray
    val minOf = scala.collection.mutable.HashMap.empty[Long, Long]
    nodes.foreach { n =>
      val r = find(n)
      minOf(r) = math.min(minOf.getOrElse(r, n), n)
    }
    val rows = nodes.map(n => org.apache.spark.sql.Row(n, minOf(find(n))))
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq,
        math.max(1, nodes.length / 2000000 + 1)),
      StructType(Seq(StructField("node", LongType), StructField("lbl", LongType))))
    // preserve the caller's key type (e.g. int ids round-trip as ints)
    df.select(col("node").cast(keyType).as("node"),
      col("lbl").cast(keyType).as("lbl"))
  }
}
