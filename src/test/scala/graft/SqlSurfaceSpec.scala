package graft

/** R13: the ad-hoc SQL surface — after bootstrap, plain `spark.sql` works over
  * every table, including the graft native functions (the reason the reference
  * chose ClickHouse over Kibana was "regular SQL syntax", README.md:7).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("bootstrap exposes all tables to spark.sql") {
    Tables.bootstrap(spark, sf())
    val n = spark.sql(
      """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice), 4) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin).collect()
    assert(n.length == 5)
  }

  test("the Grafana R12 query runs verbatim through spark.sql") {
    Tables.bootstrap(spark, sf())
    val rows = spark.sql(
      """SELECT date_trunc('hour', ts) AS t, count(*) AS cnt
        |FROM events GROUP BY t ORDER BY t""".stripMargin).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == 1000L)
  }

  test("native functions are SQL-callable after bootstrap") {
    Tables.bootstrap(spark, sf())
    val r = spark.sql(
      """SELECT graft_simhash64(split(text, ' ')) AS h,
        |       size(graft_shingles3(split(text, ' '))) AS n_sh,
        |       graft_parse_accesslog(
        |         '127.0.0.1 - - [06/Apr/2020:09:54:48 -0400] "GET / HTTP/1.1" 200 612 "-" "c" "-"'
        |       ).clientip AS ip
        |FROM documents LIMIT 1""".stripMargin).collect()(0)
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) > 0)
    assert(r.getString(2) == "127.0.0.1")
  }

  test("vector-quantization functions are SQL-callable after bootstrap") {
    Tables.bootstrap(spark, sf())
    val r = spark.sql(
      """SELECT graft_quantize_i8(array(0.5D, -1.0D, 0.25D)) AS q,
        |  graft_nearest_centroid(array(0.9D, 0.1D),
        |    array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS cell""".stripMargin)
      .collect()(0)
    assert(r.getSeq[Double](0) == Seq(64.0, -127.0, 32.0))
    assert(r.getInt(1) == 0)
  }
}
