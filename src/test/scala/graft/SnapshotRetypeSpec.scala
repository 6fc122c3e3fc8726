package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.storage.SnapshotStore

/** Metadata-only safe-widening RETYPE ([[SnapshotStore.retypeColumn]]):
  * the recorded schema widens, old gens keep their narrow physical type
  * (reader upcast), time travel reads each version under its own type.
  * Pins the widening matrix refusals, the writer contract (narrow batches
  * accepted / implicitly-widening batches refused), and composition with
  * rename, rollback, stats skipping, and the changes feed.
  */
class SnapshotRetypeSpec extends SparkSpec {
  import spark.implicits._

  private def newDir(tag: String): String =
    Files.createTempDirectory(s"graft_retype_$tag").toString + "/st"

  private def narrow(rows: Seq[(Int, String, Float)]) =
    rows.toDF("k", "p", "f")

  test("int->long: head reads wide (old gens upcast), values past 2^31 " +
    "land, time travel reads the narrow type, rollback restores it") {
    val dir = newDir("widen")
    SnapshotStore.write(narrow(Seq((1, "p0", 1.5f), (2, "p1", 2.5f))),
      dir, "p")
    SnapshotStore.retypeColumn(spark, dir, "k", LongType)
    SnapshotStore.append(
      Seq((10000000000L, "p0", 3.5f)).toDF("k", "p", "f"), dir, "p")
    val head = SnapshotStore.read(spark, dir)
    assert(head.schema("k").dataType == LongType)
    assert(head.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 10000000000L))
    val v1 = SnapshotStore.read(spark, dir, Some(1))
    assert(v1.schema("k").dataType == IntegerType,
      "time travel reads the version's own (narrow) type")
    assert(v1.select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
    // v2 is the retype commit itself: same rows, wide type
    val v2 = SnapshotStore.read(spark, dir, Some(2))
    assert(v2.schema("k").dataType == LongType && v2.count() == 2)
    SnapshotStore.rollback(spark, dir, 1)
    val back = SnapshotStore.read(spark, dir)
    assert(back.schema("k").dataType == IntegerType && back.count() == 2,
      "rollback to a pre-retype version restores the narrow schema and " +
        "references no wide gen")
  }

  test("writer contract after a retype: a NARROW batch is accepted (the " +
    "recorded wide type wins), an implicitly-WIDENING batch is refused " +
    "with a pointer at retypeColumn") {
    val dir = newDir("writers")
    SnapshotStore.write(narrow(Seq((1, "p0", 1.5f))), dir, "p")
    // wider-than-recorded batch, no retype: refused
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.append(Seq((5L, "p0", 9.9f)).toDF("k", "p", "f"),
        dir, "p")
    }
    assert(e.getMessage.contains("widen the store FIRST"))
    SnapshotStore.retypeColumn(spark, dir, "k", LongType)
    // narrow batch after the retype: accepted, store stays wide
    SnapshotStore.append(narrow(Seq((7, "p1", 7.5f))), dir, "p")
    val head = SnapshotStore.read(spark, dir)
    assert(head.schema("k").dataType == LongType)
    assert(head.select("k").as[Long].collect().sorted.toSeq == Seq(1L, 7L))
    // merge with a narrow batch also flows
    SnapshotStore.merge(spark, dir,
      Seq((1, "p0", 100.5f)).toDF("k", "p", "f"), "p", Seq("k"))
    assert(SnapshotStore.read(spark, dir).filter(col("k") === 1L)
      .select("f").as[Float].collect().toSeq == Seq(100.5f))
  }

  test("the widening matrix: float->double and date->timestamp_ntz " +
    "accepted; long->double, date->timestamp(tz), narrowing, string " +
    "refused; unknown column refused") {
    val dir = newDir("matrix")
    val df = Seq((1, "p0", 1.5f, java.sql.Date.valueOf("2024-01-02"), "s"))
      .toDF("k", "p", "f", "d", "txt")
    SnapshotStore.write(df, dir, "p")
    SnapshotStore.retypeColumn(spark, dir, "f", DoubleType)
    SnapshotStore.retypeColumn(spark, dir, "d", TimestampNTZType)
    val head = SnapshotStore.read(spark, dir)
    assert(head.schema("f").dataType == DoubleType &&
      head.schema("d").dataType == TimestampNTZType)
    assert(head.select("f").as[Double].collect().toSeq == Seq(1.5))
    assert(head.select(col("d").cast("string")).as[String].collect()
      .toSeq == Seq("2024-01-02 00:00:00"))
    SnapshotStore.retypeColumn(spark, dir, "k", LongType)
    def refuse(c: String, t: DataType, frag: String): Unit = {
      val e = intercept[IllegalArgumentException](
        SnapshotStore.retypeColumn(spark, dir, c, t))
      assert(e.getMessage.contains(frag), s"$c -> $t: ${e.getMessage}")
    }
    refuse("k", DoubleType, "unsupported retype") // long -> double rounds
    refuse("k", IntegerType, "unsupported retype") // narrowing
    refuse("txt", LongType, "unsupported retype")
    refuse("d", TimestampNTZType, "already has type")
    intercept[IllegalArgumentException](
      SnapshotStore.retypeColumn(spark, dir, "nope", LongType))
    // tz-based timestamp is a pinned refusal (the reader rejects the
    // upcast and the zone semantics would be invented)
    val dir2 = newDir("tz")
    SnapshotStore.write(df, dir2, "p")
    refuse2(dir2)
  }

  private def refuse2(dir: String): Unit = {
    val e = intercept[IllegalArgumentException](
      SnapshotStore.retypeColumn(spark, dir, "d", TimestampType))
    assert(e.getMessage.contains("unsupported retype"))
  }

  test("composes with rename (retype under the CURRENT logical name), " +
    "stats skipping (old narrow blobs still prune wide predicates), and " +
    "the changes feed (a retype alone emits NO spurious pairs; a " +
    "cross-boundary diff casts the preimage)") {
    val dir = newDir("compose")
    def chunk(lo: Int) = (0 until 5)
      .map(i => (lo + i, "p0", (lo + i).toFloat)).toDF("k", "p", "f")
    SnapshotStore.write(chunk(0), dir, "p", statsCols = Seq("k"))
    SnapshotStore.append(chunk(100), dir, "p")
    SnapshotStore.renameColumn(spark, dir, "k", "key")
    SnapshotStore.retypeColumn(spark, dir, "key", LongType)
    // stats: the old gens' int blobs prune a long-typed predicate
    val got = SnapshotStore.readWhere(spark, dir, col("key") >= 100L)
    assert(got.count() == 5)
    def gens(files: Array[String]) =
      files.flatMap(_.split("/data/").lift(1)).map(_.split("/").head).toSet
    assert(gens(got.inputFiles).size == 1,
      "narrow-gen bounds must keep pruning after the retype")
    // changes: the retype version pair alone diffs EMPTY
    val v = SnapshotStore.headVersion(spark, dir).get
    assert(SnapshotStore.changes(spark, dir, v - 1, v, Seq("key"))
      .count() == 0,
      "a metadata-only retype must not emit spurious update pairs")
    // cross-boundary: an append after the retype diffs as inserts under
    // the TO version's wide type
    SnapshotStore.append(
      Seq((90000000000L, "p0", 9f)).toDF("key", "p", "f"), dir, "p")
    val feed = SnapshotStore.changes(spark, dir, 1, v + 1, Seq("key"))
    assert(feed.schema("key").dataType == LongType)
    assert(feed.filter(col("_change_type") === "insert")
      .select("key").as[Long].collect().sorted.toSeq ==
      ((100L to 104L) :+ 90000000000L))
  }

  test("SQL rung: graft_retype widens through pure SQL with a receipt; " +
    "a bad type name fails clearly") {
    plans.AsOf.register(spark)
    val dir = newDir("sql")
    SnapshotStore.write(narrow(Seq((1, "p0", 1f))), dir, "p")
    val r = spark.sql(
      s"SELECT * FROM graft_retype('$dir', 'k', 'long')").collect()
    assert(r.length == 1 && r(0).getString(0) == "retype" &&
      r(0).getLong(3) == 2L, s"receipt: ${r.toSeq}")
    assert(SnapshotStore.read(spark, dir).schema("k").dataType == LongType)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_retype('$dir', 'f', 'not_a_type')").collect())
    assert(e.getMessage.contains("unknown type"))
  }
}
