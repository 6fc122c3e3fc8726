package graft

/** Pins `q_media_meta`'s rows to the exact constants inlined in its DuckDB
  * VALUES oracle — the driver's hash gate compares against those constants,
  * so this spec failing means the gate would fail.
  */
class MediaOpsSpec extends SparkSpec {

  test("q_media_meta rows equal the VALUES oracle constants") {
    val got = SparkEntry.queries("q_media_meta")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getLong(8), r.getDouble(9), r.getDouble(10), r.getLong(11)))
      .toSeq
    val want = Seq(
      (1L, "image", 64, 32, 0.5, 0.0, 0.5, 0.0, 0L, 0.0, 0.0, 0L),
      (2L, "image", 16, 16, 0.0, 1.0, 0.0, 0.0, 0L, 0.0, 0.0, 0L),
      (3L, "audio", 0, 0, 0.0, 0.0, 0.0, 8000.0, 4000L, 0.5, 0.3535, 439L),
      (4L, "audio", 0, 0, 0.0, 0.0, 0.0, 8000.0, 2000L, 0.25, 0.25, 0L),
      (5L, "blob", 0, 0, 0.0, 0.0, 0.0, 0.0, 0L, 0.0, 0.0, 0L))
    assert(got == want, s"\ngot:  ${got.mkString("\n      ")}")
  }

  test("q_media_meta is deterministic across executions") {
    val a = SparkEntry.queries("q_media_meta")(spark, sf()).collect().toSeq
    val b = SparkEntry.queries("q_media_meta")(spark, sf()).collect().toSeq
    assert(a == b)
  }
}
