package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** The general SQL surface the reference serves through ClickHouse
  * (SURVEY R12/R13: `/root/reference/README.md:7,32,49,279-286`): scans,
  * predicates, hash aggregates, grouping sets, joins of every flavor, window
  * functions, set ops, scalar functions, and the Grafana time-series queries.
  *
  * Scale notes (100 TB design):
  *  - dimension joins (`nation`, `region`, `supplier`) are explicitly
  *    `broadcast()` — the reference's load-once lookup-table pattern (R5);
  *  - fact-fact joins shuffle on their equi-keys and leave skew/partition
  *    sizing to AQE;
  *  - every aggregate is a partial-final hash aggregate (map-side combine)
  *    by construction — no `distinct` on wide rows, no driver-side loops.
  */
object Relational extends QueryModule {

  /** The q_needle_bloom store: events time-sorted into 16 range files with
    * a parquet BLOOM FILTER on `event_id` (and none elsewhere — blooms
    * cost ~1 bit/row/column, so they go only on point-lookup columns).
    * Built once per source fingerprint; BloomSkipSpec opens these files'
    * footers to pin the blooms in (and the control column's absence).
    */
  private[graft] def bloomStore(s: org.apache.spark.sql.SparkSession,
                                d: String): String = {
    val dir = StreamGate.replayCache(d, "bloomstore") { tmp =>
      t(s, d, "events")
        .select(col("ts"), col("event_id"), col("user_id"),
          col("event_type"), col("value"))
        .repartitionByRange(16, col("ts"))
        .sortWithinPartitions(col("ts"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#event_id", "true")
        .option("parquet.bloom.filter.expected.ndv#event_id", "1000000")
        .parquet(s"$tmp/store")
    }
    s"$dir/store"
  }

  def queries: Seq[(String, QFn)] = Seq(
    // R13 scan + projection + limit; filters/projection push into the parquet scan.
    "q_scan_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        // lineitem has no unique key: order by ALL output columns so ties are
        // interchangeable and the LIMIT cut is engine-independent.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .limit(100)
    }),

    // R13 predicate surface: AND/OR, BETWEEN, IN, LIKE, IS NOT NULL.
    "q_filter_pred" -> ((s, d) => {
      t(s, d, "orders")
        .filter((col("o_totalprice").between(1000, 5000) ||
          col("o_orderpriority").like("1-%")) &&
          col("o_orderstatus").isin("F", "O") &&
          col("o_custkey").isNotNull)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }),

    // TPC-H Q1 shape (R13): multi-key hash aggregate, several agg fns.
    "q_agg_hash" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q_agg_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"))
    }),

    "q_agg_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("cnt"),
          round(sum(col("l_quantity")), 4).as("sum_qty"))
        .select("gid", "l_returnflag", "l_linestatus", "cnt", "sum_qty")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, d) => {
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast(IntegerType).as("gid"), count(lit(1)).as("cnt"),
          round(sum(col("l_extendedprice")), 4).as("sum_base"))
        .select("gid", "l_returnflag", "l_linestatus", "cnt", "sum_base")
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // HLL sketch cardinality — no SQL oracle (approx); unit-tested vs exact ±5%.
    "q_approx_distinct" -> ((s, d) => {
      val got = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy(col("l_returnflag"))
        .persist()
      // in-gate ACCURACY receipt (r18): the HLL estimate must sit
      // within 4x its default relative standard deviation (0.05) of
      // the exact distinct count — the driver's own run certifies the
      // sketch, not just the row count
      val exact = t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      val viol = got.join(exact, Seq("l_returnflag"))
        .filter(abs(col("approx_parts") - col("exact_parts")) >
          col("exact_parts") * 0.2 + lit(10)).count()
      require(viol == 0,
        s"q_approx_distinct: $viol group(s) outside the 20% HLL bound")
      got
    }),

    // Fact-fact equi join (shuffle) + aggregate.
    "q_join_inner" -> ((s, d) => {
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // SURVEY §4's layout story as a GATE query: both fact tables written
    // bucketed on the order key (once per JVM+dataset,
    // BucketedTables.ensureFactBuckets), so this recurring fact-fact join
    // reads co-partitioned buckets and needs NO Exchange on either side
    // (PlanSpec pins the exchange-free SortMergeJoin; the SHUFFLE_MERGE
    // hint keeps the co-location claim exercised even where the orders
    // side would broadcast at test SF). Bucketing is pure physical layout:
    // the oracle is the plain DuckDB join over the unbucketed parquet.
    "q_join_bucketed" -> ((s, d) => {
      // the Sort-free scan is an EXPLICIT session contract (a named
      // mutation the query opts into), not a side effect of the layout
      graft.storage.BucketedTables.enableSortedBucketScan(s)
      val (liT, ordT) = graft.storage.BucketedTables.ensureFactBuckets(s, d)
      // sum_qty, not sum(l_extendedprice): a ~6e9-magnitude double sum
      // differs in the last ulp across partial-sum orders (caught by the
      // sf0.1 oracle re-run); integer-valued quantities sum order-free
      // exact. The gate certifies the JOIN layout, not FP discipline.
      s.table(liT)
        .join(s.table(ordT).hint("SHUFFLE_MERGE"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 4).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // The R5 lookup-table pattern at scale: small dims broadcast to every task.
    "q_join_broadcast" -> ((s, d) => {
      val dim = t(s, d, "nation")
        .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
      t(s, d, "supplier")
        .join(broadcast(dim), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_supp"),
          round(sum(col("s_acctbal")), 4).as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // LEFT OUTER: customers with zero orders survive with cnt 0.
    "q_join_left" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 4).as("spend"))
        .orderBy(col("c_custkey"))
    }),

    // EXISTS → left semi.
    "q_join_semi" -> ((s, d) => {
      val big = t(s, d, "orders").filter(col("o_totalprice") > 4000)
      t(s, d, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // NOT EXISTS → left anti.
    "q_join_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Equi-key + time-range predicate join (bounded interval keeps blowup keyed).
    "q_join_range" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_shipped"),
          round(sum(col("l_quantity")), 4).as("qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // As-of join: latest 'purchase' at ts ≤ each 'error' event, per user
    // (time-series nature of the table, R11 ORDER BY). Window formulation:
    // one shuffle on user_id, then a per-key ordered scan — the 100 TB shape.
    "q_join_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val joined = err.join(pur,
        col("e_user") === col("p_user") && col("p_ts") <= col("e_ts"), "left")
      val w = Window.partitionBy(col("e_id"))
        .orderBy(col("p_ts").desc_nulls_last, col("p_id").desc_nulls_last)
      joined.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("e_id"), col("e_user"), col("p_id"))
        .orderBy(col("e_id"))
    }),

    // The SAME as-of join through the native whole-operator extension
    // (graft.plans.AsOfJoin: custom LogicalPlan → Strategy → sort-merge
    // SparkPlan). Where the composed form above materializes every
    // (error, earlier purchase) pair and row_numbers one out — per-key
    // QUADRATIC — this merges the two (key,time)-sorted streams in one
    // O(n+m) pass per partition with a single candidate row of state.
    // Hash-gated against the identical DuckDB oracle as q_join_asof.
    "q_join_asof_native" -> ((s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      graft.plans.AsOf.join(err, pur,
          leftKeys = Seq("e_user"), rightKeys = Seq("p_user"),
          leftTime = "e_ts", rightTime = "p_ts", tie = Seq("p_id"))
        .select(col("e_id"), col("e_user"), col("p_id"))
        .orderBy(col("e_id"))
    }),

    // Forward as-of: the EARLIEST purchase at/after each error ("did the
    // user purchase after hitting the error?") — the same backward merge
    // over negated epoch-µs times, ties still max-p_id.
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      graft.plans.AsOf.join(err, pur,
          leftKeys = Seq("e_user"), rightKeys = Seq("p_user"),
          leftTime = "e_ts", rightTime = "p_ts", tie = Seq("p_id"),
          direction = "forward")
        .select(col("e_id"), col("e_user"), col("p_id"))
        .orderBy(col("e_id"))
    }),

    // Bounded-lookback as-of (merge_asof tolerance): same operator, but a
    // match older than 30 minutes nulls out — "the purchase that explains
    // this error, if recent enough". Same state/shuffle shape as above.
    "q_join_asof_tol" -> ((s, d) => {
      val ev = t(s, d, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
      val pur = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      graft.plans.AsOf.join(err, pur,
          leftKeys = Seq("e_user"), rightKeys = Seq("p_user"),
          leftTime = "e_ts", rightTime = "p_ts", tie = Seq("p_id"),
          tolerance = Some("30 minutes"))
        .select(col("e_id"), col("e_user"), col("p_id"))
        .orderBy(col("e_id"))
    }),

    // The SAME native operator reached through PURE SQL (R13's "regular SQL
    // syntax" surface): the graft_asof_join table-valued function. A SQL-only
    // user gets the O(n+m) AsOfJoinExec — not the per-key-quadratic
    // join+window form they would otherwise write. Identical oracle again.
    "q_join_asof_sql" -> ((s, d) => {
      val ev = t(s, d, "events")
      ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
          col("ts").as("e_ts"))
        .createOrReplaceTempView("asof_sql_err")
      ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
        .createOrReplaceTempView("asof_sql_pur")
      graft.plans.AsOf.register(s)
      s.sql(
        """SELECT e_id, e_user, p_id
          |FROM graft_asof_join('asof_sql_err', 'asof_sql_pur',
          |                     'e_user', 'p_user', 'e_ts', 'p_ts', 'p_id')
          |ORDER BY e_id""".stripMargin)
    }),

    // Ranking window functions with deterministic tie-break.
    "q_win_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rn") <= 5)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"),
          round(col("c_acctbal"), 4).as("bal"), col("rnk"), col("drnk"))
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // Running sum over an explicit ROWS frame.
    "q_win_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 4).as("running"))
        .orderBy(col("o_orderkey"))
    }),

    // lag(): inter-event gap per user in whole microseconds (no float drift).
    "q_win_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
        .orderBy(col("event_id"))
    }),

    // Multi-key sort with explicit nulls placement (R11 ORDER BY analog).
    "q_sort_multi" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderstatus").desc_nulls_last, col("o_totalprice").asc,
          col("o_orderkey"))
        .limit(500)
    }),

    "q_set_union" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val sup = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.unionByName(sup).groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("nk"))
    }),

    "q_set_intersect" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    "q_set_except" -> ((s, d) => {
      t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy(col("nk"))
    }),

    // Scalar string functions (R3/R7 string handling surface).
    "q_scalar_string" -> ((s, d) => {
      t(s, d, "part")
        .select(col("p_partkey"),
          lower(col("p_name")).as("lo"),
          upper(col("p_brand")).as("up"),
          substring(col("p_type"), 1, 5).as("sub"),
          length(col("p_name")).as("len"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
          trim(col("p_name")).as("trimmed"),
          element_at(split(col("p_name"), " "), 1).as("first_tok"))
        .orderBy(col("p_partkey"))
        .limit(300)
    }),

    // Scalar date/time functions (R7/R11/R12 time surface).
    "q_scalar_date" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          to_date(date_trunc("month", col("o_orderdate"))).as("mstart"),
          datediff(col("o_orderdate").cast("date"),
            to_date(lit("1995-01-01"))).as("days_since"))
        .orderBy(col("o_orderkey"))
        .limit(500)
    }),

    "q_scalar_math" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_discount") - 0.05), 4).as("absv"),
          ceil(col("l_extendedprice")).as("ce"),
          floor(col("l_extendedprice")).as("fl"),
          round(pow(col("l_quantity"), 2), 4).as("sq"),
          round(log(col("l_extendedprice") + 1), 4).as("lnp"),
          (col("l_orderkey") % 7).as("m7"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("ce"), col("fl"),
          col("sq"), col("lnp"), col("absv"), col("m7"))
        .limit(1000)
    }),

    // JSON escape-hatch column made queryable (R2's `blob`, README.md:90,242).
    "q_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy(col("event_id"))
    }),

    // R12 verbatim: the Grafana $timeSeries tumbling-bucket count
    // (`/root/reference/README.md:279-286`).
    "q_timeseries_count" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("t"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("t"))
    }),

    // R12 $timeFilter: closed time range + predicate over the same column.
    // The range is applied under the ns→µs conversion so it reaches the
    // parquet scan (row-group skipping — the MergeTree primary-index analog).
    "q_timeseries_filtered" -> ((s, d) => {
      graft.Tables.eventsTimeFiltered(s, d,
          "2024-01-05 00:00:00", "2024-01-20 00:00:00")
        .filter(col("ts").between(lit("2024-01-05 00:00:00").cast("timestamp"),
          lit("2024-01-20 00:00:00").cast("timestamp")) &&
          col("event_type") =!= "error")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("t"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("t"), col("event_type"))
    }),

    // R12 + R11 composed: the SAME dashboard window query routed through the
    // partitioned/sorted/manifested store and readRange's FILE-level
    // time-skipping (the sparse-index analog, `/root/reference/nginx.click:1`)
    // — planning opens only the files whose footer-derived (min,max)
    // logdatetime overlaps the window, instead of listing-and-opening the
    // whole table. PlanSpec pins the opened-file set; the oracle is plain
    // DuckDB over the ORIGINAL events parquet, so the store round-trip +
    // skipping must be value-exact, not just plan-pretty.
    "q_timeseries_skip" -> ((s, d) => {
      val store = StreamGate.replayCache(d, "tstore") { dir =>
        val ev = t(s, d, "events").select(
          to_date(col("ts")).as("logdate"), col("ts").as("logdatetime"),
          col("event_id"), col("user_id"), col("event_type"), col("value"))
        graft.storage.LogTableWriter.write(ev, dir)
        // small files on purpose: several per day, so the window prunes
        // WITHIN days too, not only across them
        graft.storage.LogTableWriter.compact(s, dir, maxRecordsPerFile = 256)
      }
      graft.storage.LogTableWriter.readRange(s, store,
          java.sql.Timestamp.valueOf("2024-01-10 06:00:00"),
          java.sql.Timestamp.valueOf("2024-01-11 12:00:00"))
        .groupBy(date_trunc("hour", col("logdatetime"))
          .cast("timestamp_ntz").as("t"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("t"))
    }),

    // R11 generalized to TWO dimensions: the same events rows written
    // z-ordered on (user_id, value) — Morton-interleaved sort key, one row
    // group per file — then scanned with a 2-D box predicate. Both filters
    // push to the parquet scan, where the z-layout's tight per-file min/max
    // footer stats prune the non-overlapping row groups on BOTH columns
    // (a single-dim sort prunes only its own column; ZOrderSpec pins the
    // footer-level advantage). Oracle is the plain box filter over the
    // ORIGINAL events parquet: the layout is pure access-path, so the
    // round-trip must be value-exact.
    "q_zorder_skip" -> ((s, d) => {
      val store = StreamGate.replayCache(d, "zstore") { dir =>
        val ev = t(s, d, "events").select(
          col("event_id"), col("user_id"), col("event_type"), col("value"))
        graft.storage.ZOrderLayout.write(ev, dir, "user_id", "value", 32)
      }
      // box bounds live inside every sf's data ranges (sf0.001 has only
      // user_id 0-14), so the gate returns rows at all scales
      s.read.parquet(store)
        .filter(col("user_id").between(3, 9) &&
          col("value").between(50.0, 150.0))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("total"))
        .orderBy(col("event_type"))
    }),

    // Needle-in-haystack point lookup over a TIME-sorted store: event_id
    // values are scattered across every file, so min/max footer stats can
    // prune nothing — per-column parquet BLOOM FILTERS can (the ClickHouse
    // bloom_filter skip-index analog, same role as nginx.click:1's sparse
    // index for non-key lookups). Pure Spark write options, zero custom
    // code; the IN-list pushes to the scan and parquet-mr consults the
    // bloom per row group. BloomSkipSpec pins blooms into the footers (and
    // their absence on a control column); the oracle is the plain IN scan
    // over the ORIGINAL events parquet — access-path-pure, value-exact.
    "q_needle_bloom" -> ((s, d) => {
      s.read.parquet(bloomStore(s, d))
        .filter(col("event_id").isin(11L, 57L, 123L))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy(col("event_id"))
    }),

    // Sum-metric per day bucket (bytes-served analog of the dashboard).
    "q_traffic_sum" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 4).as("total"), count(lit(1)).as("cnt"))
        .orderBy(col("day"))
    }),

    // Conditional aggregate: error ratio per day (status-class analog).
    "q_error_rate" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(round(sum(when(col("event_type") === "error", 1).otherwise(0)) /
          count(lit(1)), 4).as("err_rate"))
        .orderBy(col("day"))
    }),

    // Top-k heavy hitters with deterministic tie-break (top IPs/URLs analog).
    "q_topk_group" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("user_id"))
        .limit(10)
    }))

  def oracle: Seq[(String, String)] = Seq(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice LIMIT 100""".stripMargin,

    "q_filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |WHERE (o_totalprice BETWEEN 1000 AND 5000 OR o_orderpriority LIKE '1-%')
        |  AND o_orderstatus IN ('F','O') AND o_custkey IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_rollup" ->
      """SELECT CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_quantity),4) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_agg_cube" ->
      """SELECT CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
        |  l_returnflag, l_linestatus, count(*) AS cnt,
        |  round(sum(l_extendedprice),4) AS sum_base
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice),4) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_quantity),4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_supp,
        |  round(sum(s_acctbal),4) AS sum_bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(sum(coalesce(o_totalprice, 0.0)),4) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 4000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_range" ->
      """SELECT o_orderpriority, count(*) AS n_shipped,
        |  round(sum(l_quantity),4) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_asof" ->
      """WITH err AS (SELECT event_id e_id, user_id e_user, CAST(ts AS TIMESTAMP) e_ts
        |             FROM events WHERE event_type = 'error'),
        |     pur AS (SELECT event_id p_id, user_id p_user, CAST(ts AS TIMESTAMP) p_ts
        |             FROM events WHERE event_type = 'purchase'),
        |     j AS (SELECT e_id, e_user, p_id, p_ts,
        |             row_number() OVER (PARTITION BY e_id
        |               ORDER BY p_ts DESC NULLS LAST, p_id DESC NULLS LAST) rn
        |           FROM err LEFT JOIN pur
        |             ON e_user = p_user AND p_ts <= e_ts)
        |SELECT e_id, e_user, p_id FROM j WHERE rn = 1 ORDER BY e_id""".stripMargin,

    // forward: earliest following purchase; ties by greatest p_id
    "q_join_asof_fwd" ->
      """WITH err AS (SELECT event_id e_id, user_id e_user, CAST(ts AS TIMESTAMP) e_ts
        |             FROM events WHERE event_type = 'error'),
        |     pur AS (SELECT event_id p_id, user_id p_user, CAST(ts AS TIMESTAMP) p_ts
        |             FROM events WHERE event_type = 'purchase'),
        |     j AS (SELECT e_id, e_user, p_id, p_ts,
        |             row_number() OVER (PARTITION BY e_id
        |               ORDER BY p_ts ASC NULLS LAST, p_id DESC NULLS LAST) rn
        |           FROM err LEFT JOIN pur
        |             ON e_user = p_user AND p_ts >= e_ts)
        |SELECT e_id, e_user, p_id FROM j WHERE rn = 1 ORDER BY e_id""".stripMargin,

    // bounded lookback: the rn=1 row only survives if within tolerance
    "q_join_asof_tol" ->
      """WITH err AS (SELECT event_id e_id, user_id e_user, CAST(ts AS TIMESTAMP) e_ts
        |             FROM events WHERE event_type = 'error'),
        |     pur AS (SELECT event_id p_id, user_id p_user, CAST(ts AS TIMESTAMP) p_ts
        |             FROM events WHERE event_type = 'purchase'),
        |     j AS (SELECT e_id, e_user, p_id, p_ts, e_ts,
        |             row_number() OVER (PARTITION BY e_id
        |               ORDER BY p_ts DESC NULLS LAST, p_id DESC NULLS LAST) rn
        |           FROM err LEFT JOIN pur
        |             ON e_user = p_user AND p_ts <= e_ts)
        |SELECT e_id, e_user,
        |  CASE WHEN p_ts >= e_ts - INTERVAL 30 MINUTE THEN p_id END AS p_id
        |FROM j WHERE rn = 1 ORDER BY e_id""".stripMargin,

    // identical oracle: the native operator must agree with the composed form
    "q_join_asof_native" ->
      """WITH err AS (SELECT event_id e_id, user_id e_user, CAST(ts AS TIMESTAMP) e_ts
        |             FROM events WHERE event_type = 'error'),
        |     pur AS (SELECT event_id p_id, user_id p_user, CAST(ts AS TIMESTAMP) p_ts
        |             FROM events WHERE event_type = 'purchase'),
        |     j AS (SELECT e_id, e_user, p_id, p_ts,
        |             row_number() OVER (PARTITION BY e_id
        |               ORDER BY p_ts DESC NULLS LAST, p_id DESC NULLS LAST) rn
        |           FROM err LEFT JOIN pur
        |             ON e_user = p_user AND p_ts <= e_ts)
        |SELECT e_id, e_user, p_id FROM j WHERE rn = 1 ORDER BY e_id""".stripMargin,

    // identical oracle: the SQL TVF must agree with both other forms
    "q_join_asof_sql" ->
      """WITH err AS (SELECT event_id e_id, user_id e_user, CAST(ts AS TIMESTAMP) e_ts
        |             FROM events WHERE event_type = 'error'),
        |     pur AS (SELECT event_id p_id, user_id p_user, CAST(ts AS TIMESTAMP) p_ts
        |             FROM events WHERE event_type = 'purchase'),
        |     j AS (SELECT e_id, e_user, p_id, p_ts,
        |             row_number() OVER (PARTITION BY e_id
        |               ORDER BY p_ts DESC NULLS LAST, p_id DESC NULLS LAST) rn
        |           FROM err LEFT JOIN pur
        |             ON e_user = p_user AND p_ts <= e_ts)
        |SELECT e_id, e_user, p_id FROM j WHERE rn = 1 ORDER BY e_id""".stripMargin,

    "q_win_rank" ->
      """WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
        |  row_number() OVER w AS rn, rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey,
        |  round(c_acctbal,4) AS bal, CAST(rnk AS INT) AS rnk,
        |  CAST(drnk AS INT) AS drnk
        |FROM r WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin,

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_win_lag" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) -
        |    epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,

    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus DESC NULLS LAST, o_totalprice ASC, o_orderkey
        |LIMIT 500""".stripMargin,

    "q_set_union" ->
      """SELECT nk, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,

    "q_set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "q_set_except" ->
      """SELECT c_nationkey AS nk FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,

    "q_scalar_string" ->
      """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
        |  substring(p_type, 1, 5) AS sub, CAST(length(p_name) AS INT) AS len,
        |  p_brand || ':' || p_type AS cat,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
        |  trim(p_name) AS trimmed, split_part(p_name, ' ', 1) AS first_tok
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(isodow(o_orderdate) AS INT) AS isodow,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_discount - 0.05),4) AS absv,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  round(pow(l_quantity, 2),4) AS sq,
        |  round(ln(l_extendedprice + 1),4) AS lnp,
        |  l_orderkey % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, ce, fl, sq, lnp, absv, m7
        |LIMIT 1000""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_timeseries_count" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t, count(*) AS cnt
        |FROM events GROUP BY t ORDER BY t""".stripMargin,

    "q_timeseries_filtered" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t, event_type,
        |  count(*) AS cnt
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-05 00:00:00'
        |  AND TIMESTAMP '2024-01-20 00:00:00' AND event_type <> 'error'
        |GROUP BY t, event_type ORDER BY t, event_type""".stripMargin,

    // Same oracle family as q_timeseries_filtered: the store + file skipping
    // are pure access-path — results must equal the plain windowed scan.
    "q_timeseries_skip" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t, count(*) AS cnt
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-10 06:00:00'
        |  AND TIMESTAMP '2024-01-11 12:00:00'
        |GROUP BY t ORDER BY t""".stripMargin,

    // Pure access-path, like q_timeseries_skip: the z-ordered store must
    // reproduce the plain box-filtered scan exactly.
    "q_zorder_skip" ->
      """SELECT event_type, count(*) AS cnt, round(sum(value),4) AS total
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50.0 AND 150.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Access-path-pure like the two skip gates above it: the bloom store
    // must reproduce the plain IN scan exactly.
    "q_needle_bloom" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_id IN (11, 57, 123)
        |ORDER BY event_id""".stripMargin,

    "q_traffic_sum" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  round(sum(value),4) AS total, count(*) AS cnt
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q_error_rate" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |  round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |    / count(*), 4) AS err_rate
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q_topk_group" ->
      """SELECT user_id, count(*) AS cnt FROM events
        |GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10""".stripMargin)
}
