package graft
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val docs = Tables.table(spark, sf, "documents")
    // 10x docs: copies are NEAR-dups (version-token prefix), ids offset
    val docs10 = (0 until 10).map { k =>
      docs.select((col("doc_id") + k * 1000000L).as("doc_id"),
        concat(lit(s"v$k "), col("text")).as("text"))
    }.reduce(_ union _)
    println("docs10 = " + docs10.count())
    time("minhash_pairs_1x") {
      operators.Dedup.minhashPairs(docs, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
    }
    time("minhash_pairs_10x") {
      operators.Dedup.minhashPairs(docs10, "doc_id", "text")
        .write.mode("overwrite").format("noop").save()
    }
    time("pack_10x") {
      operators.Pack.packShards(
        docs10.select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tok")),
        "doc_id", "n_tok", 4096L, 1000L)
        .write.mode("overwrite").format("noop").save()
    }
    // 10x embeddings: deterministic perturbed copies
    val emb = queries.SimilarityOps.embWithNorm(spark, sf).select("vec_id", "v")
    val emb10 = (0 until 10).map { k =>
      emb.select((col("vec_id") + k * 1000000L).as("vec_id"),
        transform(col("v"), x => x + lit(k * 0.001)).as("v"))
    }.reduce(_ union _)
    println("emb10 = " + emb10.count())
    time("lsh_candidates_1x") {
      queries.SimilarityOps.lshCandidates(emb, 8, 4)
        .write.mode("overwrite").format("noop").save()
    }
    time("lsh_candidates_10x") {
      queries.SimilarityOps.lshCandidates(emb10, 8, 4)
        .write.mode("overwrite").format("noop").save()
    }
    // round-3 operators: components fixpoint on the 10x-denser near-dup
    // graph, and the composed prep pipeline over the 10x corpus
    time("components_10x") {
      val pairs = operators.Dedup.minhashPairs(docs10, "doc_id", "text")
        .select(col("a"), col("b"))
      operators.Components.connectedComponents(pairs)
        .write.mode("overwrite").format("noop").save()
    }
    val docs10dir = java.nio.file.Files
      .createTempDirectory("graft_scale_docs").toString
    docs10.write.mode("overwrite").parquet(s"$docs10dir/documents.parquet")
    time("prep_pipeline_10x") {
      SparkEntry.queries("q_prep_pipeline")(spark, docs10dir)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
