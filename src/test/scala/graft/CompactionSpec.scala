package graft

import org.apache.spark.sql.functions._
import graft.storage.Compaction

/** Compaction: size-derived output file count, row/content fidelity, and
  * the shuffle-free default (coalesce, not repartition).
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_compact_$tag").toString

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("compacts a fragmented table into the size-derived file count " +
    "with row-for-row fidelity") {
    val in = freshDir("in")
    val df = (1 to 2000).map(i => (i.toLong, s"row-$i")).toDF("id", "v")
    df.repartition(16).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size == 16)
    val total = parquetFiles(in).map(_.length).sum
    val out = freshDir("out")
    val n = Compaction.compact(spark, in, out,
      targetFileBytes = (total + 2) / 3)
    assert(n == 3, s"expected 3 output files from the size target, got $n")
    assert(parquetFiles(out).size == n)
    val got = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(got == df.as[(Long, String)].collect().toSet)
  }

  test("default path merges WITHOUT a shuffle; rebalance opts into one") {
    val in = freshDir("plan")
    spark.range(100).toDF("id").repartition(8)
      .write.mode("overwrite").parquet(in)
    def planOf(rebalance: Boolean): String = {
      val df = spark.read.parquet(in)
      (if (rebalance) df.repartition(2) else df.coalesce(2))
        .queryExecution.executedPlan.toString
    }
    assert(!planOf(rebalance = false).contains("Exchange"),
      "coalesce path must not shuffle")
    assert(planOf(rebalance = true).contains("Exchange"))
  }

  test("single tiny input compacts to one file; zero target rejected") {
    val in = freshDir("one")
    spark.range(10).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(in)
    val out = freshDir("oneout")
    assert(Compaction.compact(spark, in, out) == 1)
    assert(parquetFiles(out).size == 1)
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, in, freshDir("bad"), targetFileBytes = 0)
    }
  }
}
