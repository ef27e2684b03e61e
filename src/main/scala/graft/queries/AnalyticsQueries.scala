package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Aggregation / join / window / top-k surface (SURVEY §7 M5) — the
  * Catalyst-native analytics the engine exposes beyond the reference's
  * writer-only operators. All sums go through DECIMAL so results are
  * order-independent (double sums are not associative), then cast to
  * DOUBLE for a stable cross-engine schema.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Integer week-of-corpus of an event ts (days since 2024-01-01 div
    * 7) — ONE definition for the cohort/overlap queries, mirrored by
    * [[eventWeekSql]] in their oracles. */
  private def eventWeek: org.apache.spark.sql.Column =
    floor(datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date")) / 7).cast("long")

  /** DuckDB mirror of [[eventWeek]]. */
  private val eventWeekSql =
    """CAST(floor(date_diff('day', DATE '2024-01-01',
      |                              CAST(ts AS DATE)) / 7) AS BIGINT)""".stripMargin

  /** Shared probe/reference sampling for the as-of join family — the
    * four variants (backward/forward/nearest/tolerance) and their four
    * oracle strings must agree on this population, so it lives once. */
  private def asOfProbesRefs(s: SparkSession,
                             dir: String): (DataFrame, DataFrame) = {
    val ev = t(s, dir, "events")
    val probes = ev.filter(col("event_id") % 10 === 7)
      .select(col("event_id"), col("user_id"), col("ts"))
    val refs = ev.filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"),
        col("event_id").as("ref_event_id"), col("value").as("ref_value"))
    (probes, refs)
  }

  /** Deterministic `partsupp` DERIVED from part × |supplier| — the
    * testdata ships no partsupp table, so the two TPC-H shapes that
    * need it (q9 profit rollup joining on BOTH keys, q20 availqty
    * semi-join) derive the same fixture in BOTH engines: 4 suppliers
    * per part via integer-only arithmetic (no RNG, no float drift),
    * availqty/supplycost keyed off (partkey, suppkey); supplycost
    * lands as exact DECIMAL(12,2) via an integer-cents × 0.01 decimal
    * multiply. The oracle reproduces it verbatim as a CTE
    * ([[partsuppSql]]). Scale posture: 4×|part| rows from one
    * projection of part plus a one-row count broadcast — no shuffle,
    * no data movement beyond the scan. */
  private def derivedPartsupp(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"))
    val sc = t(s, dir, "supplier").agg(count(lit(1)).as("sc"))
    p.crossJoin(broadcast(sc)) // one-row scalar — always broadcast-safe
      .withColumn("j", explode(array((0 until 4).map(lit(_)): _*)))
      .withColumn("ps_suppkey",
        (col("p_partkey") * 13 + col("j") * 7) % col("sc"))
      .withColumn("ps_availqty",
        (col("p_partkey") * 37 + col("ps_suppkey") * 11) % 9999 + 1)
      .withColumn("__cents",
        (col("p_partkey") * 29 + col("ps_suppkey") * 23) % 99901 + 100)
      .withColumn("ps_supplycost", expr(
        "CAST(CAST(__cents AS DECIMAL(9,0)) * CAST(0.01 AS DECIMAL(3,2)) " +
          "AS DECIMAL(12,2))"))
      .select(col("p_partkey").as("ps_partkey"), col("ps_suppkey"),
        col("ps_availqty"), col("ps_supplycost"))
  }

  /** The oracle's CTE twin of [[derivedPartsupp]] — the SAME integer
    * formulas, so both engines see one identical partsupp. */
  private val partsuppSql: String =
    """WITH s_cnt AS (SELECT COUNT(*) AS sc FROM supplier),
      |partsupp AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey * 13 + j * 7) % sc AS ps_suppkey,
      |         (p_partkey * 37 + ((p_partkey * 13 + j * 7) % sc) * 11) % 9999 + 1 AS ps_availqty,
      |         CAST(CAST((p_partkey * 29 + ((p_partkey * 13 + j * 7) % sc) * 23) % 99901 + 100 AS DECIMAL(9,0)) * CAST(0.01 AS DECIMAL(3,2)) AS DECIMAL(12,2)) AS ps_supplycost
      |  FROM part CROSS JOIN s_cnt CROSS JOIN (VALUES (0),(1),(2),(3)) AS js(j))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom-pruned selective dim⋈fact join: the part subset (one
    // brand, ~5% of parts) builds a Bloom filter that kills
    // non-matching lineitem rows AT THE SCAN, before the join
    // exchange — bit-identical to the plain join (false positives are
    // removed by the join itself), with fact-side shuffle volume cut
    // to ~the join selectivity. Explicit twin of the optimizer's
    // runtime row-level filter, which silently declines without
    // column statistics (BloomPrune scaladoc).
    "bloom_prune_join" -> ((s, dir) => {
      import graft.operators.BloomPrune
      val dim = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"), col("p_type"))
      BloomPrune.pruneInnerJoin(t(s, dir, "lineitem"), "l_partkey",
          dim, "p_partkey", expectedItems = 100000L)
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_lines"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("p_type"))
    }),

    // Multi-touch attribution, linear model: each view/click inside
    // the 7-day lookback before a purchase by the same user gets
    // value/n credit. Touches (the firehose side) map to ONE time
    // bucket each — only the small conversion side explodes (×2) —
    // and the sides meet on a (user, bucket) equi-join (Attribution
    // scaladoc).
    "attribution_linear" -> ((s, dir) => {
      import graft.operators.Attribution
      Attribution.linearCredit(t(s, dir, "events"),
          Seq("click", "view"), "purchase", lookbackUs = 7L * 86400000000L)
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_credited"),
          sum(col("credit").cast("decimal(22,6)")).cast("double")
            .as("credit"))
        .orderBy(col("touch_type"))
    }),

    // U-shaped (position) attribution: 0.4 first / 0.4 last / 0.2
    // split across middles — same matched-pair plan, credit keyed on
    // the per-conversion rank (deterministic: ties break on event id).
    "attribution_position" -> ((s, dir) => {
      import graft.operators.Attribution
      Attribution.positionCredit(t(s, dir, "events"),
          Seq("click", "view"), "purchase", lookbackUs = 7L * 86400000000L)
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_credited"),
          sum(col("credit").cast("decimal(22,6)")).cast("double")
            .as("credit"))
        .orderBy(col("touch_type"))
    }),

    // TPC-H Q1-style pricing summary. Group-by-agg with partial
    // (map-side) aggregation — one shuffle on the tiny group key.
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(22,6)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3-style: dimension filter + two joins + group + top-k.
    // lineitem (the 100 TB side) never shuffles for a broadcast-able
    // join, only for the final aggregation.
    "q3_join_topk" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) < lit("1995-03-15"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("o_orderdate"))
      val li = t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) > lit("1995-03-15"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      // customer scales with SF (1-in-5 segment selectivity is still
      // billions of keys at the 100 TB posture) → no pinned broadcast;
      // Catalyst's size stats / AQE pick broadcast at small SF and
      // sort-merge at scale. Same rule as q5/q18/star_join.
      li.join(ord.join(cust,
          col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10-style: revenue lost to returned items per customer.
    // The returnflag + date filters push to the scans; nation is the
    // only pinned broadcast (genuinely constant-size) — the
    // li⋈ord⋈cust strategies are AQE's call, since customer/orders
    // scale with SF (the r3 verdict's broadcast rule).
    "q10_returned_items" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
          to_date(col("o_orderdate")) < lit("1997-01-01"))
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q16-style: distinct suppliers per part profile, excluding
    // one brand and suppliers "under complaint" (acctbal < 2000 stands
    // in for the NOT IN subquery). countDistinct rides the
    // (brand, type, size) shuffle; the complaint anti-join is against
    // an SF-scaling table, so its strategy is AQE's call.
    "q16_part_suppliers" -> ((s, dir) => {
      val pt = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#13")
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSupp = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 2000)
        .select(col("s_suppkey"))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(pt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q14-style promo revenue share: conditional aggregation
    // over one join — both sums ride the same shuffle; DECIMAL sums
    // keep the division's operands bit-identical across engines.
    "q14_promo_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1996-04-01"))
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val pt = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0)
          * sum(when(col("p_type") === "PROMO", rev)
              .otherwise(lit(0).cast("decimal(22,6)"))).cast("double")
          / sum(rev).cast("double")).as("promo_share"))
        .orderBy(col("promo_share")) // 1 row; contract wants a total order
    }),

    // Window: top-3 highest-value events per user (row_number over a
    // per-user ordering; single shuffle on user_id).
    "window_topk_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .withColumn("rnk", row_number().over(w).cast("long")) // bigint: DuckDB row_number parity
        .filter(col("rnk") <= 3)
        .orderBy(col("user_id"), col("rnk"))
    }),

    // Rollup-style two-level aggregate with HAVING semantics.
    "agg_having" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_spend"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("o_custkey"))),

    // Tumbling daily window over the event stream (batch form of the
    // streaming windowed aggregation; partial agg before one shuffle).
    "events_window_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy(col("day"), col("event_type"))),

    // Gap-based sessionization (30-min inactivity) — one shuffle on the
    // user key; streaming twin: graft.streaming.EventStreams.sessionize.
    "sessionize_gap" -> ((s, dir) =>
      graft.operators.Sessionize.sessions(
        t(s, dir, "events"), "user_id", "ts", "event_id", "value")
        .orderBy(col("user_id"), col("session_id"))),

    // Window frame: running revenue per customer in order-date order.
    "running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"))
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Offset windows: each order beside its customer's previous/next
    // order value (lag/lead share running_total's single per-customer
    // shuffle and sort).
    "lead_lag_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice").cast("double").as("price"))
        .withColumn("prev_price", lag(col("price"), 1).over(w))
        .withColumn("next_price", lead(col("price"), 1).over(w))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Set ops: customers active in 1995 but not 1996 (EXCEPT), and the
    // 1995∩1996 overlap (INTERSECT), tagged and unioned.
    "set_ops_customers" -> ((s, dir) => {
      def active(yr: Int) = t(s, dir, "orders")
        .filter(year(to_date(col("o_orderdate"))) === yr)
        .select(col("o_custkey"))
      val only95 = active(1995).except(active(1996))
        .withColumn("segment", lit("only_1995"))
      val both = active(1995).intersect(active(1996))
        .withColumn("segment", lit("both"))
      only95.unionByName(both).orderBy(col("segment"), col("o_custkey"))
    }),

    // Correlated EXISTS subquery — Catalyst decorrelates to a semi-join.
    "exists_high_value" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_v")
      t(s, dir, "customer").createOrReplaceTempView("graft_customer_v")
      s.sql("""
        SELECT c_custkey, c_name FROM graft_customer_v c
        WHERE EXISTS (SELECT 1 FROM graft_orders_v o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        ORDER BY c_custkey""")
    }),

    // Scalar subquery: orders above the global average price.
    "above_avg_orders" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("graft_orders_v2")
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM graft_orders_v2
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5
                              FROM graft_orders_v2)
        ORDER BY o_orderkey""")
    }),

    // Pivot: per-user event-type counts as columns (explicit value list
    // — no driver-side distinct scan to discover columns).
    "pivot_event_counts" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))),

    // Rollup: order counts at (status, year), per-status, and grand
    // total levels in one pass.
    "rollup_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          year(to_date(col("o_orderdate"))).as("o_year"))
        .rollup(col("o_orderstatus"), col("o_year"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_year").asc_nulls_first)),

    // Point-in-interval range join, bucketed to an equi-join (the raw
    // theta formulation nested-loops): lineitem ship days against
    // 7-day windows opened by a sample of orders.
    "range_join_count" -> ((s, dir) => {
      import graft.operators.RangeJoin
      val intervals = t(s, dir, "orders")
        .filter(col("o_orderkey") % 201 === 0)
        .select(col("o_orderkey").as("interval_id"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("lo"))
        .withColumn("hi", col("lo") + 7)
      val facts = t(s, dir, "lineitem")
        .select(datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("ship_day"))
      RangeJoin.pointInInterval(facts, intervals, "ship_day", "lo", "hi",
          bucketWidth = 7L)
        .groupBy("interval_id").agg(count(lit(1)).as("n_shipped"))
        .orderBy(col("interval_id"))
    }),

    // Cube: all four grouping combinations of (status, priority-ish
    // bucket) in one pass — ROLLUP's full-lattice sibling.
    "cube_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderstatus"),
          (col("o_orderkey") % 3).as("o_bucket"))
        .cube(col("o_orderstatus"), col("o_bucket"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_bucket").asc_nulls_first)),

    // Explicit GROUPING SETS — per-status totals, per-priority totals,
    // and the grand total in ONE aggregation pass (the cube/rollup
    // sibling where the wanted combinations are irregular).
    "grouping_sets_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Per-group z-score outliers with EXACT-SUM variance: sums of v
    // and v² ride decimals (order-independent exact — stddev_samp's
    // running merge is partitioning-dependent in the last ULP and
    // would flap a hash gate), variance/z derived from the exact sums
    // in mirrored double arithmetic. One aggregation + one broadcast
    // compare-scan. Gate threshold is 1.5 sigma: the synthetic price
    // distribution is near-uniform (max |z| = sqrt(3) ~ 1.73), so a
    // classic 3-sigma cut would select nothing at ANY scale factor —
    // the operator shape, not the cutoff, is what's under test.
    "zscore_outliers" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
      val st = o.groupBy(col("o_orderstatus")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sx"),
        // the square is taken IN decimal (v exact at 2 decimals, the
        // product exact at 4) — squaring in double and casting down
        // rounds half-up in Spark but half-even in DuckDB and flapped
        // the gate by 3 ULPs; exact rationals convert identically
        sum(col("o_totalprice").cast("decimal(12,2)") *
            col("o_totalprice").cast("decimal(12,2)"))
          .cast("double").as("sxx"))
      o.join(broadcast(st), "o_orderstatus")
        .withColumn("z",
          (col("o_totalprice") - col("sx") / col("n")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1)))
        .filter(abs(col("z")) > 1.5)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("z"))
        .orderBy(col("o_orderkey"))
    }),

    // TPC-H Q5-style: local-supplier revenue per nation in one region.
    // Six-table join. Broadcast hints ONLY on nation/region — genuinely
    // constant-size at any SF. customer/supplier grow linearly with
    // scale factor (multi-TB at the 100 TB posture), so their join
    // strategy is delegated to AQE: below the auto-broadcast threshold
    // it picks broadcast anyway (sf0.1 plans are unchanged); at scale
    // it falls back to a shuffle join instead of OOMing the driver on a
    // forced broadcast. ScaleSpec pins the delegation.
    "q5_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1995-01-01") &&
          to_date(col("o_orderdate")) < lit("1996-01-01"))
      val supp = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q18-style: large-quantity orders (aggregate → having →
    // join back to the order/customer detail).
    "q18_large_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
        .filter(col("total_qty") > 250)
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      // customer scales with SF — no broadcast hint; AQE broadcasts it
      // at small SF and shuffles at scale (see q5 comment).
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_orderdate"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    }),

    // Exact interpolated percentiles per group (≡ DuckDB
    // `quantile_cont`), via the bounded-memory nominate/locate/verify
    // plan — naked `percentile()` over a 3-cardinality key buffers the
    // whole table into three aggregation buffers, an executor OOM at
    // 100 TB ([[graft.operators.Percentiles]]; bit-equality with
    // `percentile()` is spec-pinned, hash-equality with the oracle
    // unchanged).
    "price_percentiles" -> ((s, dir) =>
      graft.operators.Percentiles.exactGroupedPercentiles(
          t(s, dir, "orders"), Seq("o_orderstatus"), "o_totalprice",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
        .orderBy(col("o_orderstatus"))),

    // Robust outlier profile per group: median + MAD (median absolute
    // deviation) via TWO bounded-memory exact-percentile passes
    // ([[graft.operators.Percentiles]] composing with itself — the
    // operator is a building block, not just a query), then the
    // standard |v − med| > 3·1.4826·MAD outlier count. Naked
    // `percentile()` would buffer the table twice over a 3-key group;
    // this stays bounded at any scale: the operator's driver-side
    // count routing proves which groups fit the classic buffer (they
    // take one plain aggregation — the r6 ~35-stage plan is gone;
    // job count spec-pinned in PercentilesSpec) and sends only
    // oversized groups through the sketch passes. Hash-green: exact
    // interpolated medians on both engines, integer outlier counts.
    "mad_outliers" -> ((s, dir) => {
      import graft.operators.Percentiles
      val ord = t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
      val med = Percentiles.exactGroupedPercentiles(
        ord, Seq("o_orderstatus"), "o_totalprice", Seq("med" -> 0.5))
      val dev = ord.join(broadcast(med), Seq("o_orderstatus"))
        .withColumn("dev", abs(col("o_totalprice") - col("med")))
      val mad = Percentiles.exactGroupedPercentiles(
        dev, Seq("o_orderstatus"), "dev", Seq("mad" -> 0.5))
      dev.join(broadcast(mad), Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"))
        .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
          sum(when(col("dev") > col("mad") * lit(3.0) * lit(1.4826), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy(col("o_orderstatus"))
    }),

    // The 100 TB percentile path: Spark's Greenwald–Khanna sketch
    // (approx_percentile) — exact `percentile` buffers every value per
    // group; the sketch keeps bounded state over the shuffle. Rows-only
    // gate (approximation isn't oracle-reproducible); error bound
    // pinned in SketchSpec against the exact twin.
    "price_percentiles_approx" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("approx_percentile(o_totalprice, 0.25, 10000)").as("p25"),
          expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
          expr("approx_percentile(o_totalprice, 0.75, 10000)").as("p75"))
        .orderBy(col("o_orderstatus"))),

    // As-of join: each probe event picks up the latest reference event
    // at-or-before its timestamp (union+window trick, one shuffle —
    // graft.operators.AsOfJoin). DuckDB oracle uses native ASOF JOIN.
    "asof_join" -> ((s, dir) => {
      val (probes, refs) = asOfProbesRefs(s, dir)
      graft.operators.AsOfJoin.asOf(probes, refs, Seq("user_id"),
          "ts", "ts", Seq("ref_event_id", "ref_value"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: first reference event at-or-after each probe —
    // the same one-shuffle carry over the reversed time ordering.
    "asof_join_forward" -> ((s, dir) => {
      val (probes, refs) = asOfProbesRefs(s, dir)
      graft.operators.AsOfJoin.asOf(probes, refs, Seq("user_id"),
          "ts", "ts", Seq("ref_event_id", "ref_value"),
          direction = "forward")
        .orderBy(col("event_id"))
    }),

    // Nearest as-of: closer of the backward/forward matches, ties to
    // backward; timestamp distances compare in exact integer micros on
    // BOTH engines (unix_micros / epoch_us), so ties are bit-stable.
    "asof_join_nearest" -> ((s, dir) => {
      val (probes, refs) = asOfProbesRefs(s, dir)
      graft.operators.AsOfJoin.asOf(probes, refs, Seq("user_id"),
          "ts", "ts", Seq("ref_event_id", "ref_value"),
          direction = "nearest")
        .orderBy(col("event_id"))
    }),

    // Tolerance-bounded as-of: the backward carry, but matches farther
    // than 10 minutes yield NULL payload (pandas merge_asof semantics
    // — a stale reference is no reference). Distance compares in exact
    // integer micros on both engines.
    "asof_join_tolerance" -> ((s, dir) => {
      val (probes, refs) = asOfProbesRefs(s, dir)
      graft.operators.AsOfJoin.asOf(probes, refs, Seq("user_id"),
          "ts", "ts", Seq("ref_event_id", "ref_value"),
          tolerance = Some(600L * 1000000L))
        .orderBy(col("event_id"))
    }),

    // Week-over-week audience overlap from PER-GROUP KMV sketches:
    // one pass builds a distinct-user synopsis per week (map-side
    // partials, ≤ k longs each over the shuffle), then consecutive
    // weeks compare by SET ALGEBRA on the synopses — at 100 TB the
    // "returning users" question never joins week against week.
    // Hash-green: under-full sketches are exact (corpus_overlap_kmv's
    // lever), so the estimates equal DuckDB's exact set SQL.
    "weekly_user_overlap_kmv" -> ((s, dir) => {
      import graft.functions.KmvFunctions._
      val week = eventWeek
      // k derived from a per-week HLL probe (largest week bounds all),
      // so the exactness gate never hits a hard-coded saturation wall
      val kk = kmvKFor(t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(week.as("week"))
        .agg(approx_count_distinct(col("user_id")).as("d"))
        // max over ZERO groups is NULL — empty input sizes k minimally
        .agg(coalesce(max(col("d")), lit(0L))).head.getLong(0))
      // NULL user_id excluded EXPLICITLY on both sides (kmvState skips
      // NULLs; without the mirror filter the oracle's week totals
      // would count a NULL-user group the sketch never sees)
      val sk = t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(week.as("week"))
        .agg(kmvState(col("user_id"), kk).as("sk"))
        // the hash gate compares against EXACT set SQL, which only
        // holds while every weekly sketch is under-full — a quietly
        // saturated sketch at a bigger SF must fail loud, not mismatch
        .select(col("week"),
          kmvAssertUnderFull(col("sk"), kk, "weekly_user_overlap_kmv")
            .as("sk"))
      val a = sk.select(col("week"), col("sk"))
      val b = sk.select((col("week") - 1L).as("week"), col("sk").as("sk_next"))
      a.join(b, "week")
        .select(col("week"),
          kmvSetEstimates(col("sk"), col("sk_next"), kk).as("e"))
        .select(col("week"),
          col("e.est_a").cast("long").as("n_week"),
          col("e.est_b").cast("long").as("n_next"),
          col("e.est_intersection").cast("long").as("n_returning"),
          col("e.jaccard").as("jaccard"))
        .orderBy(col("week"))
    }),

    // The remaining rank-window family in one query: rank, dense_rank,
    // percent_rank, cume_dist, ntile — per status, totally ordered by
    // (price, orderkey) so every function is deterministic. One
    // shuffle, one window pass. Kept small via a key filter.
    "window_rank_family" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .withColumn("prank", percent_rank().over(w))
        .withColumn("cdist", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .filter(col("o_orderkey") % 20 === 0)
        .orderBy(col("o_orderkey"))
    }),

    // Top event PATHS: the most frequent 3-step event-type sequences
    // across users — two leads over the same user-keyed window the
    // transition matrix uses (ONE shuffle), then a path aggregation
    // and a TakeOrderedAndProject top-20. Hash-green.
    "event_paths_top" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(20)
    }),

    // Markov transition matrix of the event stream: count + row-
    // normalized probability for each (event_type → next event_type)
    // step per user. ONE user-keyed window (lead over the total
    // (ts, event_id) order) + one pair aggregation; the probability
    // normalizer is a partition window over the 25-row result. The
    // behavioral-model fit of product analytics, hash-green.
    "event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .orderBy(col("from_type"), col("to_type"))
    }),

    // RFM segmentation with BOUNDED-memory quartile thresholds: the
    // customer aggregate is SF-scaling, so the three per-dimension
    // quartile bands come from the exact-percentile operator (constant
    // group — never a global ntile sort, never a buffer-the-table
    // percentile()), then score = 1 + #thresholds strictly below the
    // value, broadcast-compared in one scan. Hash-green.
    "rfm_segments" -> ((s, dir) => {
      import graft.operators.Percentiles
      val custs = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          datediff(max(to_date(col("o_orderdate"))),
            lit("1970-01-01").cast("date")).cast("double").as("rec_days"),
          count(lit(1)).cast("double").as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("monetary"))
        .withColumn("__g", lit(1))
        // materialized ONCE: the three eager threshold calls below each
        // run count-probe + band jobs over this frame, and the final
        // compare-scan reads it again — without this the SF-scaling
        // orders aggregation re-runs ~7 times
        .localCheckpoint(true)
      def thr(vc: String, p: String) = broadcast(
        Percentiles.exactGroupedPercentiles(custs, Seq("__g"), vc,
          Seq(s"${p}25" -> 0.25, s"${p}50" -> 0.5, s"${p}75" -> 0.75))
          .drop("__g"))
      def score(v: org.apache.spark.sql.Column, p: String) =
        lit(1L) + when(col(s"${p}25") < v, 1L).otherwise(0L) +
          when(col(s"${p}50") < v, 1L).otherwise(0L) +
          when(col(s"${p}75") < v, 1L).otherwise(0L)
      custs.crossJoin(thr("rec_days", "r"))
        .crossJoin(thr("frequency", "f"))
        .crossJoin(thr("monetary", "m"))
        .select(col("o_custkey"),
          score(col("rec_days"), "r").as("r_score"),
          score(col("frequency"), "f").as("f_score"),
          score(col("monetary"), "m").as("m_score"))
        .withColumn("segment",
          concat(col("r_score"), col("f_score"), col("m_score")))
        .orderBy(col("o_custkey"))
    }),

    // Exact equi-width histogram: min/max in one scalar aggregate
    // (broadcast), bucket index by mirrored double arithmetic in the
    // scan — the exact twin of histogram_numeric's approximation.
    "price_histogram" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_totalprice").as("v"))
      val mm = o.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      o.crossJoin(broadcast(mm))
        .select(least(floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / 20)), lit(19.0))
          .cast("long").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // PageRank over the customer↔supplier interaction graph (edges
    // both ways per distinct trading pair) — the domain-authority
    // prior a crawl-curation pipeline computes over its link graph.
    // Six power-iteration rounds with ALL arithmetic in integer
    // nano-units (floor division everywhere), so the ranking is a
    // pure function of the graph and the oracle replays it exactly
    // with six unrolled CTE rounds. Per round: one src-keyed join +
    // one dst-keyed aggregation over the edge list, no driver state.
    "supplier_pagerank" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      // rankDenom = 0 → auto-scale max(1e9, 1000·N): the quantum guard
      // can never trip as the graph grows with SF (oracle mirrors the
      // GREATEST in its rd CTE)
      graft.operators.Graph.pageRankQ(edges, "src", "dst", iterations = 6,
          rankDenom = 0L)
        .orderBy(col("rank_q").desc, col("id"))
    }),

    // HITS over the DIRECTED customer→supplier trading graph: hubs =
    // customers aggregating across good suppliers, authorities =
    // suppliers trading with good customers — the two-sided quality
    // signal PageRank's single score conflates. Three rounds, integer
    // max-rescaled arithmetic (Graph.hitsQ), replayed exactly by
    // twelve unrolled CTEs. Hash-green.
    "hits_trading" -> ((s, dir) => {
      val pairs = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
      graft.operators.Graph.hitsQ(pairs, "src", "dst", iterations = 3)
        .orderBy(col("id"))
    }),

    // Per-node triangle counts over the part co-purchase graph (parts
    // sharing an order are linked; a triangle = three parts pairwise
    // co-purchased — the cohesion signal community curation uses).
    // Degree-oriented wedge join (Graph.triangleCounts): out-degree
    // capped at O(√E) by orientation, so hub parts can't explode the
    // wedge stage — the O(E^1.5) bound, never the naive per-node
    // quadratic. Hash-green: exact counts vs DuckDB's three-way
    // canonical self-join.
    "copurchase_triangles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.triangleCounts(edges, "src", "dst")
        .select(col("id").as("p_partkey"), col("triangles"))
        .orderBy(col("p_partkey"))
    }),

    // 3-core of the same part co-purchase graph: the density filter
    // that separates parts embedded in a cohesive co-purchase
    // COMMUNITY from star hubs (raw degree keeps a hub; the core
    // requires its NEIGHBORS to stay dense too). Synchronous peel to
    // the unique fixpoint (Graph.kCore, order-independent), replayed
    // exactly by 8 unrolled peel CTEs — convergence is 2–4 rounds at
    // sf0.001–0.1 and peeling past the fixpoint is a no-op, so the
    // deeper unroll always agrees. Hash-green.
    "copurchase_kcore" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.kCore(edges, "src", "dst", k = 3)
        .select(col("id").as("p_partkey"), col("core_deg"))
        .orderBy(col("p_partkey"))
    }),

    // Ordered funnel over the event stream: signup → first view AFTER
    // it → first purchase after THAT, per user — two window passes
    // over ONE user-partitioned shuffle (stage timestamps chain
    // through the same partition), then a single count row. The
    // sequential-conversion shape of product analytics. Hash-green.
    "funnel_stages" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      val ev = t(s, dir, "events")
        .withColumn("t1",
          min(when(col("event_type") === "signup", col("ts"))).over(byUser))
      val staged = ev
        .withColumn("t2",
          min(when(col("event_type") === "view" && col("ts") > col("t1"),
            col("ts"))).over(byUser))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
            col("ts"))).over(byUser))
      staged.groupBy(col("user_id"))
        .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
          max(col("t3")).as("t3"))
        .agg(
          count(col("t1")).as("n_signup"),
          count(col("t2")).as("n_view_after"),
          count(col("t3")).as("n_purchase_after"))
        .orderBy(col("n_signup"))
    }),

    // Weekly cohort retention: users grouped by first-activity week,
    // counted per (cohort_week, week_offset) of later activity —
    // integer week arithmetic end to end, two aggregations, no
    // self-join of the raw stream. Hash-green.
    "cohort_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val week = eventWeek
      val activity = ev.select(col("user_id"), week.as("week")).distinct()
      val cohorts = activity.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      activity.join(cohorts, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Pairwise Pearson correlations of the lineitem measures in ONE
    // aggregate pass (the co-moment aggregates fuse into a single
    // scan — a profiling pipeline never re-reads the fact table per
    // pair). Rounded to 9 decimals: corr is a co-moment ratio, engine
    // formulas agree far below 1e-9 (the psi_term precedent).
    "corr_matrix" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 9)
            .as("corr_qty_price"),
          round(corr(col("l_quantity"), col("l_discount")), 9)
            .as("corr_qty_disc"),
          round(corr(col("l_extendedprice"), col("l_discount")), 9)
            .as("corr_price_disc"))
        .orderBy(col("corr_qty_price"))),

    // Mutual information between the two lineitem category axes:
    // I(X;Y) terms p(x,y)·ln(p(x,y)/(p(x)p(y))) from EXACT counts —
    // the feature-dependence profile. One grouped count, then window
    // sums over the (category-cardinality-sized) contingency table.
    "mutual_information" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cnt = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
      val all = Window.partitionBy()
      val byF = Window.partitionBy(col("l_returnflag"))
      val byS = Window.partitionBy(col("l_linestatus"))
      cnt
        .withColumn("total", sum(col("n")).over(all))
        .withColumn("pxy", col("n").cast("double") / col("total"))
        .withColumn("px",
          sum(col("n")).over(byF).cast("double") / col("total"))
        .withColumn("py",
          sum(col("n")).over(byS).cast("double") / col("total"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          round(col("pxy") * log(col("pxy") / (col("px") * col("py"))), 9)
            .as("mi_term"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Time-series resampling: a regular 1-day grid per user (min→max
    // event day), value carried forward via ONE as-of join — the
    // gap-fill/alignment primitive of feature pipelines (no per-step
    // self-join, no window over the raw stream; grid explode is a
    // codegen'd sequence()). References are first made UNIQUE per
    // (user, ts) (max-event_id sample) so the as-of match is
    // deterministic on both engines — DuckDB's ASOF JOIN breaks
    // equal-ts ties arbitrarily otherwise. Hash-green.
    // Linear gap interpolation (TimeSeries.interpolateLinear): values
    // NULLed on a deterministic pattern, repaired from the nearest
    // observations on the micro-second time axis — ONE window shuffle
    // (all four helper frames share the user partition + (ts, id)
    // order). Hash-green: identical IEEE double expression both sides.
    "interpolate_gaps" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the
          // cast is wall-clock-identity and matches epoch_us(ts)
          expr("unix_micros(cast(ts as timestamp))").as("tsu"),
          when(col("event_id") % 7 === 0, lit(null))
            .otherwise(col("value")).as("v"))
      graft.operators.TimeSeries.interpolateLinear(ev, Seq("user_id"),
          "tsu", "v", orderCols = Seq("event_id"))
        .filter(col("event_id") % 7 === 0) // report the repaired rows
        .select(col("user_id"), col("event_id"), col("tsu"),
          col("value_filled"))
        .orderBy(col("user_id"), col("tsu"), col("event_id"))
    }),

    // Seasonal count anomalies (TimeSeries.seasonalCountAnomalies):
    // hourly event counts per type, each calendar date scored against
    // its (type, hour-of-day) cell's cross-date distribution — the
    // traffic-spike/outage detector that respects the daily rhythm.
    // All-integer moments (counts are exact in any summation order, no
    // decimal machinery needed); zero-variance cells excluded by the
    // EXACT identity n·Σc² = (Σc)². Threshold 2.5σ: ~30 observed dates
    // per cell bound |z| near √29, and the synthetic Poisson-ish counts
    // put ~1% of buckets past 2.5 at any SF — 3σ would flag almost
    // nothing and test only the empty set. Hash-green.
    "hourly_count_anomalies" -> ((s, dir) =>
      graft.operators.TimeSeries.seasonalCountAnomalies(
          t(s, dir, "events"), Seq("event_type"),
          hour(col("ts")).cast("long"), to_date(col("ts")),
          minSigma = 2.5)
        .orderBy(col("event_type"), col("season"), col("instance"))),

    "resample_events" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val refs = ev.groupBy(col("user_id"), col("ts"))
        .agg(max_by(col("value"), col("event_id")).as("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("day", min(col("ts"))).as("d0"),
          date_trunc("day", max(col("ts"))).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"),
            expr("interval 1 day"))).as("grid_ts"))
      graft.operators.AsOfJoin.asOf(grid, refs, Seq("user_id"),
          "grid_ts", "ts", Seq("value"), direction = "backward")
        .orderBy(col("user_id"), col("grid_ts"))
    }),

    // Weakly connected components over the co-purchase graph (same
    // sampled edge set as copurchase_kcore), via the dedup engine's
    // min-label machinery (Dedup.duplicateClusters: driver union-find
    // under the probe cap, distributed pointer-jumping loop above it
    // — identical semantics, spec-pinned). The graph-analytics face
    // of the same component problem near-dup clustering solves.
    "copurchase_components" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("id_a"), col("y.pk").as("id_b"))
      graft.operators.Dedup.duplicateClusters(pairs)
        .select(col("id").as("p_partkey"), col("cluster").as("component"))
        .orderBy(col("p_partkey"))
    }),

    // Multi-source BFS hop levels over the co-purchase graph (same
    // sampled edge set as copurchase_kcore): per part, the shortest
    // path length from any seed part — per round ONE frontier join +
    // one anti-join, eagerly checkpointed (Graph.bfsLevels). Oracle
    // replays it with a recursive min-hop CTE. Hash-green.
    "part_bfs_hops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 199 === 0)
        .select(col("p_partkey"))
      graft.operators.Graph.bfsLevels(edges, "src", "dst",
          seeds, "p_partkey", maxHops = 4)
        .select(col("id").as("p_partkey"), col("hop").cast("long").as("hop"))
        .orderBy(col("p_partkey"))
    }),

    // Link prediction over the co-purchase graph (same sampled edge
    // set as copurchase_kcore): common-neighbor count, node Jaccard,
    // Adamic–Adar for every non-adjacent pair sharing a neighbor —
    // the "customers who bought X also bought Y" candidate generator.
    // Pairs arise ONLY from the wedge join keyed on the shared
    // neighbor (Graph.linkPredict; maxSpokeDeg caps hub fanout, far
    // above any gate-SF degree but mirrored in the oracle as
    // semantics). AA terms are 1/round(ln deg, 9) summed via DECIMAL.
    "copurchase_link_predict" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("src"), col("y.pk").as("dst"))
      graft.operators.Graph.linkPredict(edges, "src", "dst",
          maxSpokeDeg = 100, minCommon = 1)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Golden-record survivorship — the step that completes the ER
    // pipeline (fuzzy candidate pairs → clusters → ONE surviving
    // record per entity). Fuzzy-name candidates are BLOCKED on
    // c_nationkey (the standard ER blocking key — without it the
    // synthetic "Customer#NNN" names chain into one giant component
    // under 1-edit flips and the merge degenerates to a single row);
    // unclustered customers are their own entity. Field rules: min
    // custkey (stable surviving id), longest name (tie → smallest),
    // max acctbal, mode nationkey / mktsegment (tie → smallest) —
    // every rule deterministic, so the golden record is a pure
    // function of the cluster contents (RecordLinkage.goldenRecord).
    "er_golden_record" -> ((s, dir) => {
      import graft.operators.RecordLinkage._
      val cust = t(s, dir, "customer").filter(col("c_custkey") % 10 === 0)
      val nat = cust.select(col("c_custkey"), col("c_nationkey"))
      val blocked = graft.operators.FuzzyJoin.selfJoin(cust, "c_custkey",
          "c_name", maxDist = 1)
        .join(nat.select(col("c_custkey").as("id_a"),
          col("c_nationkey").as("nk_a")), "id_a")
        .join(nat.select(col("c_custkey").as("id_b"),
          col("c_nationkey").as("nk_b")), "id_b")
        .filter(col("nk_a") === col("nk_b"))
        .select(col("id_a"), col("id_b"))
      val clusters = graft.operators.Dedup.duplicateClusters(blocked)
      val recs = cust
        .join(clusters.withColumnRenamed("id", "c_custkey"),
          Seq("c_custkey"), "left")
        .withColumn("entity", coalesce(col("cluster"), col("c_custkey")))
      goldenRecord(recs, "entity", Seq(
          "c_custkey" -> MinRule, "c_name" -> LongestRule,
          "c_acctbal" -> MaxRule, "c_nationkey" -> ModeRule,
          "c_mktsegment" -> ModeRule))
        .orderBy(col("cluster"))
    }),

    // Lagged cross-correlation between the daily view and purchase
    // volumes at lags −3..+3 — "do purchases follow views by k days?".
    // Pearson r from the SIX exact integer sums through one
    // closed-form IEEE expression — identical op order both engines,
    // so the statistic hash-matches. The cross products n·Σxy and
    // Σx·Σy are ~n² times the per-day products, so they widen to
    // DECIMAL before multiplying (the RankStats dprod discipline —
    // LONG would silently wrap at large event volumes while the
    // oracle's BIGINT raises; r9 ADVICE). The lag axis is a 7-row
    // broadcast; the calendar self-join keys on (day − lag).
    "xcorr_view_purchase" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val lags = s.range(-3, 4)
        .select(col("id").cast("int").as("lag"))
      val d19 = (c: String) => col(c).cast("decimal(19,0)")
      val n = col("n_days").cast("decimal(19,0)")
      daily.select(col("day"), col("x")).crossJoin(broadcast(lags))
        .join(daily.select(col("day").as("yday"), col("y")),
          col("yday") === date_sub(col("day"), col("lag")))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag").cast("long").as("lag"), col("n_days"),
          ((n * d19("sxy") - d19("sx") * d19("sy")).cast("double") /
            (sqrt((n * d19("sxx") - d19("sx") * d19("sx"))
              .cast("double")) *
              sqrt((n * d19("syy") - d19("sy") * d19("sy"))
                .cast("double")))).as("r"))
        .orderBy(col("lag"))
    }),

    // Seasonal-naive forecast with MASE evaluation: per event type,
    // forecast each of the series' LAST 7 days as "same day last
    // week", score MAE over that holdout, and normalize by the
    // in-sample naive MAE (Hyndman's MASE — the scale-free baseline
    // every fancier forecaster must beat). Exact integer count
    // arithmetic until the three final divisions; lag-7 is a CALENDAR
    // self-join (robust to missing days, unlike a row-offset lag).
    "forecast_seasonal_naive" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val horizon = daily.groupBy("event_type")
        .agg(date_sub(max(col("day")), 6).as("h_start"))
      val lagged = daily.as("c").join(
          daily.select(col("event_type"), col("day").as("lag_day"),
            col("n").as("n_lag")).as("l"),
          col("c.event_type") === col("l.event_type") &&
            col("c.day") === date_add(col("lag_day"), 7))
        .select(col("c.event_type").as("event_type"), col("day"),
          col("n"), col("n_lag"))
        .join(horizon, Seq("event_type"))
        .withColumn("abs_err", abs(col("n") - col("n_lag")))
        .withColumn("holdout", col("day") >= col("h_start"))
      lagged.groupBy("event_type").agg(
          sum(when(col("holdout"), 1L).otherwise(0L)).as("n_holdout"),
          sum(when(col("holdout"), col("abs_err"))).as("err_holdout"),
          sum(when(!col("holdout"), 1L).otherwise(0L)).as("n_train"),
          sum(when(!col("holdout"), col("abs_err"))).as("err_train"))
        .select(col("event_type"), col("n_holdout"), col("n_train"),
          (col("err_holdout").cast("double") /
            col("n_holdout").cast("double")).as("mae"),
          ((col("err_holdout").cast("double") /
            col("n_holdout").cast("double")) /
            (col("err_train").cast("double") /
              col("n_train").cast("double"))).as("mase"))
        .orderBy(col("event_type"))
    }),

    // CUSUM change-point scan over the daily event volume: S_t =
    // Σ(x−μ) random-walks near zero for a stable series and ramps
    // from a level shift onward; argmax|S| locates the change
    // (TimeSeries.cusum — the window cumsum evaluates in frame order,
    // so the float accumulation is bit-stable cross-engine).
    "cusum_changepoint" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .cast("long").as("day_no"))
        .agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.cusum(daily, Seq("event_type"),
          "day_no", "n")
        .groupBy("event_type").agg(
          count(lit(1)).as("n_days"),
          max(col("mu")).as("mu"),
          max(col("abs_s")).as("max_abs_s"),
          (-max(struct(col("abs_s"), (-col("day_no")).as("nd")))
            .getField("nd")).as("change_day"))
        .orderBy(col("event_type"))
    }),

    // Two-proportion z-test on an A/B split (user_id parity): did
    // variant B convert (≥1 HIGH-VALUE purchase — value > 180; "any
    // purchase" saturates at 100% on this data, degenerating the
    // pooled variance to zero) at a different rate than A?
    // Exact integer counts into the one closed-form z expression —
    // sqrt is IEEE-correctly-rounded on both engines, so the
    // statistic hash-matches. The experiment-analysis face of the
    // engine's statistics surface.
    "ab_conversion_ztest" -> ((s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") > 180.0, 1L).otherwise(0L)).as("converted"))
        .withColumn("variant", pmod(col("user_id"), lit(2)))
      val agg = perUser.groupBy().agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === 0, col("converted"))).as("x_a"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === 1, col("converted"))).as("x_b"))
      agg.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
          (col("x_a").cast("double") / col("n_a").cast("double"))
            .as("p_a"),
          (col("x_b").cast("double") / col("n_b").cast("double"))
            .as("p_b"),
          ((col("x_a") + col("x_b")).cast("double") /
            (col("n_a") + col("n_b")).cast("double")).as("p_pool"))
        .withColumn("z",
          (col("p_a") - col("p_b")) /
            sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double"))))
    }),

    // Right-to-erasure cascade audit: deletion requests for a set of
    // customers walk the FK chain customer → orders → lineitem, and
    // each table reports rows removed vs held — the governance
    // evidence before the purge runs. Pure semi-join composition in
    // ONE lazy plan (Privacy.forgetCascadeAudit). Hash-green.
    "forget_user_cascade" -> ((s, dir) => {
      import graft.operators.Privacy
      val req = t(s, dir, "customer").filter(col("c_custkey") % 101 === 0)
      Privacy.forgetCascadeAudit(req, "c_custkey", Seq(
          Privacy.CascadeStep("1_customer", t(s, dir, "customer"),
            "c_custkey", Some("c_custkey")),
          Privacy.CascadeStep("2_orders", t(s, dir, "orders"),
            "o_custkey", Some("o_orderkey")),
          Privacy.CascadeStep("3_lineitem", t(s, dir, "lineitem"),
            "l_orderkey")))
        .orderBy(col("tbl"))
    }),

    // Bitemporal as-of reconstruction: every order carries TWO
    // versions (the original, transaction-visible from the order
    // date; a correction visible 30 days later), each valid for 90
    // days of business time. The query answers "what did we BELIEVE
    // on T about the state valid at V" — both temporal axes filtered
    // independently; exactly one version per order survives a fixed
    // T. The valid-time twin of scd2_as_of's transaction-time read.
    "bitemporal_as_of" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice"), to_date(col("o_orderdate")).as("d"))
      def version(n: Int, txFrom: org.apache.spark.sql.Column,
                  txTo: org.apache.spark.sql.Column,
                  price: org.apache.spark.sql.Column) =
        ord.select(col("o_orderkey"), lit(n).cast("long").as("version"),
          price.as("price"), col("d").as("valid_from"),
          date_add(col("d"), 90).as("valid_to"),
          txFrom.as("tx_from"), txTo.as("tx_to"))
      val bt = version(1, col("d"), date_add(col("d"), 30),
          col("o_totalprice"))
        .unionByName(version(2, date_add(col("d"), 30),
          lit("9999-12-31").cast("date"), col("o_totalprice") + 10.0))
      val v = lit("1996-03-01").cast("date")
      val tt = lit("1996-02-01").cast("date")
      bt.filter(col("valid_from") <= v && v < col("valid_to") &&
          col("tx_from") <= tt && tt < col("tx_to"))
        .orderBy(col("o_orderkey"))
    }),

    // k-anonymity audit: quasi-identifier (nation, segment) groups
    // with fewer than 10 members — the re-identification exposure a
    // release gate reads. One partial-aggregated shuffle (Privacy
    // scaladoc). Hash-green.
    "k_anonymity_audit" -> ((s, dir) =>
      graft.operators.Privacy.kAnonymityViolations(
          t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // l-diversity audit: (nation, segment) groups whose account-
    // balance band (thousands) shows fewer than 8 distinct values —
    // homogeneity leaks that survive k-anonymity. Hash-green.
    "l_diversity_audit" -> ((s, dir) =>
      graft.operators.Privacy.lDiversityViolations(
          t(s, dir, "customer").withColumn("bal_band",
            floor(col("c_acctbal") / 1000).cast("int")),
          Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 8)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))),

    // Market-basket association rules over order baskets: directed
    // part pairs with support/confidence/lift from exact integer
    // counts — per-basket self-join fanout only, ratios are single
    // IEEE divisions (MarketBasket scaladoc). Hash-green.
    "basket_rules" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.MarketBasket.pairRules(li, "l_orderkey", "l_partkey",
          minPairCount = 2)
        .orderBy(col("antecedent"), col("consequent"))
    }),

    // Fellegi–Sunter record-linkage scoring over blocked candidates:
    // the fuzzy name pairs get per-field agreement log-odds weights
    // (literals — the transcendental stays out of the plan, scores are
    // bit-stable) summed to a match score. Scoring is pure per-row
    // expression over the banded candidate set — no extra shuffle, no
    // cartesian (RecordLinkage scaladoc).
    "er_score_pairs" -> ((s, dir) => {
      import graft.operators.RecordLinkage
      val cust = t(s, dir, "customer")
      val pairs = graft.operators.FuzzyJoin.selfJoin(
          cust, "c_custkey", "c_name", maxDist = 1)
        .join(cust.select(col("c_custkey").as("id_a"),
          col("c_nationkey").as("nation_a"),
          col("c_mktsegment").as("seg_a"),
          col("c_acctbal").as("bal_a")), Seq("id_a"))
        .join(cust.select(col("c_custkey").as("id_b"),
          col("c_nationkey").as("nation_b"),
          col("c_mktsegment").as("seg_b"),
          col("c_acctbal").as("bal_b")), Seq("id_b"))
      RecordLinkage.score(pairs, Seq(
          RecordLinkage.Field("name", col("dist") === 0, 6.0, -0.5),
          RecordLinkage.Field("nation", col("nation_a") === col("nation_b"),
            2.0, -0.3),
          RecordLinkage.Field("segment", col("seg_a") === col("seg_b"),
            1.5, -0.4),
          RecordLinkage.Field("acctbal",
            abs(col("bal_a") - col("bal_b")) < 100.0, 1.0, -0.2)))
        .select(col("id_a"), col("id_b"), col("w_name"), col("w_nation"),
          col("w_segment"), col("w_acctbal"), col("score"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // EXACT two-sample Kolmogorov–Smirnov drift between early and
    // late shipment prices: integer cumsum arithmetic end to end, one
    // division at the end (Drift.ksStatistic scaladoc) — the band-free
    // complement of the PSI monitors.
    "ks_price_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cut = to_date(col("l_shipdate")) < lit("1996-01-01")
      graft.operators.Drift.ksStatistic(
        li.filter(cut).select(col("l_extendedprice")),
        li.filter(!cut).select(col("l_extendedprice")),
        "l_extendedprice")
    }),

    // The documented escape hatch of the value-grid contract,
    // exercised END TO END: quantize each side onto its own 1000-point
    // uniform grid (ValueGrid.quantize — bucket LEFT EDGES, top edge
    // clamped) and run the same exact-KS machinery on the bounded
    // axis. Hash-green: the oracle mirrors the left-edge double
    // arithmetic term for term, so the path users are told to take
    // when ksStatistic refuses an unbounded grid is proven
    // cross-engine exact, not just runnable.
    "ks_price_drift_quantized" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cut = to_date(col("l_shipdate")) < lit("1996-01-01")
      def q(df: org.apache.spark.sql.DataFrame) =
        graft.operators.ValueGrid.quantize(df, "l_extendedprice", 1000)
      graft.operators.Drift.ksStatistic(
        q(li.filter(cut).select(col("l_extendedprice"))),
        q(li.filter(!cut).select(col("l_extendedprice"))),
        "l_extendedprice", maxGrid = 2000)
    }),

    // Edit-distance-bounded self-join on customer names (SymSpell
    // deletion-neighborhood candidates + exact levenshtein verify —
    // graft.operators.FuzzyJoin): entity resolution without a
    // cartesian. Hash-green: classic Wagner–Fischer on both engines;
    // the oracle brute-forces the cross join at gate SF.
    "fuzzy_selfjoin_names" -> ((s, dir) =>
      graft.operators.FuzzyJoin.selfJoin(
          t(s, dir, "customer"), "c_custkey", "c_name", maxDist = 1)
        .orderBy(col("id_a"), col("id_b"))),

    // Leakage-safe split over the fuzzy-duplicate graph: every
    // near-duplicate family (transitive levenshtein<=1 name cluster)
    // inherits ONE split from its min-id representative, so a record
    // can never sit in train while its near-copy sits in test — the
    // eval-contamination guard a per-id split cannot give. Hash-green:
    // recursive-CTE clusters + the sample_split md5 arithmetic.
    "leakage_safe_split" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"))
      val pairs = graft.operators.FuzzyJoin.selfJoin(
        cust, "c_custkey", "c_name", maxDist = 1)
      graft.operators.Sampling.leakageSafeSplit(cust, pairs,
          "c_custkey", trainPct = 80, valPct = 10)
        .select(col("c_custkey"), col("split_key"), col("split"))
        .orderBy(col("c_custkey"))
    }),

    // Two-sided fuzzy join (FuzzyJoin.join — the product-capped
    // candidate scheme): clean customer names against a
    // deterministically dirtied twin (char 10 deleted, ids offset),
    // the record-linkage shape. Hash-green: the oracle brute-forces
    // the cross join with DuckDB levenshtein at gate SF.
    "fuzzy_join_twosided" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").cast("long").as("c_custkey"),
          col("c_name"))
      val dirty = cust.select((col("c_custkey") + lit(1000000L)).as("d_id"),
        concat(substring(col("c_name"), 1, 9),
          expr("substring(c_name, 11, length(c_name))")).as("d_name"))
      graft.operators.FuzzyJoin.join(cust, "c_custkey", "c_name",
          dirty, "d_id", "d_name", maxDist = 1)
        .orderBy(col("left_id"), col("right_id"))
    }),

    // Entity-resolution clusters: connected components over the
    // edit-distance pair graph (FuzzyJoin candidates + min-label
    // propagation to fixpoint — the same clustering the jaccard dedup
    // family uses). Hash-green: the oracle brute-forces levenshtein
    // pairs at gate SF and clusters them with a recursive CTE.
    // Sampled 1-in-10 (the dedup_clusters discipline): synthetic
    // "Customer#NNN" names are a near-clique under 1-edit digit
    // flips, and BOTH the iterative propagation and the oracle's
    // recursive reach table scale with component size — the sample
    // keeps the gate query iteration-cheap at every SF while still
    // exercising multi-node chains.
    "fuzzy_clusters" -> ((s, dir) =>
      graft.operators.Dedup.duplicateClusters(
          graft.operators.FuzzyJoin.selfJoin(
            t(s, dir, "customer").filter(col("c_custkey") % 10 === 0),
            "c_custkey", "c_name", maxDist = 1))
        .orderBy(col("id"))),

    // Corpus-drift profile, numeric: PSI of o_totalprice between the
    // pre- and post-1995-06-17 order snapshots over the BASELINE's
    // exact decile bands (graft.operators.Drift — each snapshot
    // scanned once; edges via the bounded-memory percentile operator).
    // psi_term rounds to 9 decimals on both engines (ln ulp).
    "drift_price_bands" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val split = lit("1995-06-17")
      graft.operators.Drift.numericPsi(
          ord.filter(to_date(col("o_orderdate")) < split),
          ord.filter(to_date(col("o_orderdate")) >= split),
          "o_totalprice", buckets = 10)
        .drop("lo", "hi")
        .orderBy(col("bucket"))
    }),

    // Corpus-drift profile, categorical: return-flag mix shift between
    // pre- and post-1998H2 lineitems — one row per category seen in
    // EITHER snapshot (vanished/novel categories are the drift worth
    // flagging; ε-smoothed term instead of ±∞).
    "drift_return_flags" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val split = lit("1998-06-01")
      graft.operators.Drift.categoricalPsi(
          li.filter(to_date(col("l_shipdate")) < split),
          li.filter(to_date(col("l_shipdate")) >= split),
          "l_returnflag")
        .orderBy(col("category"))
    }),

    // Chi-square independence + Cramér's V between event type and
    // weekday — "does behavior depend on the day?". Exact integer
    // contingency counts over a FULL category spine (zero cells
    // contribute their expected mass); expected counts and χ² terms
    // are doubles rounded to 6, summed through DECIMAL; V =
    // round(sqrt(χ²/(N·min(r−1,c−1))), 9).
    "cramers_v_events" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type").as("et"),
          dayofweek(col("ts")).cast("long").as("dow"))
      val cells = ev.groupBy("et", "dow").agg(count(lit(1)).as("o"))
      val spine = cells.select("et").distinct()
        .crossJoin(cells.select("dow").distinct())
      val full = spine.join(cells, Seq("et", "dow"), "left")
        .na.fill(0L, Seq("o"))
      val w = Window.partitionBy()
      val joined = full
        .withColumn("rt", sum(col("o")).over(Window.partitionBy("et")))
        .withColumn("ct", sum(col("o")).over(Window.partitionBy("dow")))
        .withColumn("n", sum(col("o")).over(w))
        .withColumn("e", col("rt").cast("double") *
          col("ct").cast("double") / col("n").cast("double"))
        .withColumn("term", round(
          (col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"), 6))
      joined.groupBy().agg(
          max(col("n")).as("n"),
          countDistinct(col("et")).as("r"),
          countDistinct(col("dow")).as("c"),
          sum(col("term").cast("decimal(28,12)")).cast("double")
            .as("chi2"))
        .select(col("n"), col("r"), col("c"), col("chi2"),
          round(sqrt(col("chi2") /
            (col("n").cast("double") *
              least(col("r") - 1, col("c") - 1).cast("double"))), 9)
            .as("cramers_v"))
    }),

    // Degree assortativity of the co-purchase graph (Newman r): do
    // hub parts co-purchase with hubs? Pearson over the degree pairs
    // at every edge stub — both orientations of each edge, so the
    // statistic is symmetric and Σx = Σy. Exact integer sums through
    // one closed-form IEEE expression (the xcorr discipline).
    "degree_assortativity" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("u"), col("y.pk").as("v"))
        .distinct()
      val deg = e.select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val stubs = e.unionByName(
          e.select(col("v").as("u"), col("u").as("v")))
        .join(deg.select(col("id").as("u"), col("deg").as("dx")), "u")
        .join(deg.select(col("id").as("v"), col("deg").as("dy")), "v")
      // m·Σxy and Σx·Σy are ~m² the per-stub products: widen to
      // DECIMAL before multiplying so nothing wraps (r9 ADVICE)
      val d19 = (c: String) => col(c).cast("decimal(19,0)")
      val m = col("m").cast("decimal(19,0)")
      stubs.agg(count(lit(1)).as("m"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dy")).as("sxy"),
          sum(col("dx") * col("dx")).as("sxx"))
        .select(col("m"),
          ((m * d19("sxy") - d19("sx") * d19("sy")).cast("double") /
            (m * d19("sxx") - d19("sx") * d19("sx")).cast("double"))
            .as("assortativity"))
    }),

    // 2D Pareto frontier (Skyline.frontier2d): the cheapest part at
    // every size level no larger part undercuts — minimize price,
    // maximize size (negated). Sort–prefix-min identity over the
    // price GRID instead of the naive O(n²) dominance anti-join; the
    // oracle replays the same window (a NOT EXISTS twin is quadratic
    // in DuckDB too).
    "pareto_price_size" -> ((s, dir) => {
      val p = t(s, dir, "part").withColumn("neg_size", -col("p_size"))
      graft.operators.Skyline.frontier2d(p, "p_retailprice", "neg_size")
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_retailprice"), col("p_partkey"))
    }),

    // Local clustering coefficient over the co-purchase graph:
    // 2T / (deg·(deg−1)) per node — triangle closure rate, the
    // community-density complement of k-core's global filter. Pure
    // composition: Graph.triangleCounts (degree-oriented wedges) +
    // one degree aggregate + one left join; single IEEE division.
    "copurchase_clustering" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.as("x").join(li.as("y"), Seq("ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("u"), col("y.pk").as("v"))
        .distinct()
      val deg = e.select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val tri = graft.operators.Graph.triangleCounts(e, "u", "v")
      deg.join(tri, Seq("id"), "left")
        .na.fill(0L, Seq("triangles"))
        .filter(col("deg") >= 2)
        .select(col("id").as("p_partkey"), col("deg"), col("triangles"),
          ((col("triangles") * 2).cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double")).as("coeff"))
        .orderBy(col("p_partkey"))
    }),

    // Dyadic exponential smoothing of daily event volume: an 8-tap
    // EWMA truncation with power-of-two weights 128..1 — every
    // product and both sums are EXACT integers (a true recursive EWMA
    // accumulates float rounding; dyadic taps don't), one final
    // division per row. Warm-up rows renormalize over the taps
    // PRESENT (exact integer denominator) instead of emitting NULLs.
    // Row-based taps — resample to a gap-free grid upstream if the
    // calendar has holes (this corpus is gap-free daily).
    "ewma_event_volume" -> ((s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val taps = (0 to 7).map(k => (lag(col("n"), k).over(w),
        lit(1L << (7 - k))))
      val num = taps.map { case (x, wt) =>
        coalesce(x, lit(0L)) * wt }.reduce(_ + _)
      val den = taps.map { case (x, wt) =>
        when(x.isNotNull, wt).otherwise(lit(0L)) }.reduce(_ + _)
      daily.withColumn("smooth",
          (num.cast("double") / den.cast("double")))
        .orderBy(col("event_type"), col("day"))
    }),

    // Kaplan–Meier user-retention curve: per user, duration = days
    // between first and last activity; churned if the last activity
    // predates the corpus end by > 3 days, else right-censored (still
    // active — the unfinished lifetime KM exists to handle).
    // TimeSeries.kaplanMeier keeps the survival product in log space
    // (9-decimal ln terms through an exact DECIMAL window cumsum),
    // so the curve hash-matches the oracle.
    "survival_retention" -> ((s, dir) => {
      // 1-in-20 event sample: full streams make every user span the
      // whole corpus window (3 distinct durations — a degenerate
      // curve); sparse activity spreads lifetimes across the range
      val peru = t(s, dir, "events")
        .filter(col("event_id") % 20 === 0)
        .groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
      val subj = peru
        .withColumn("cend", max(col("d1")).over(Window.partitionBy()))
        .select(datediff(col("d1"), col("d0")).cast("long").as("dur"),
          when(col("d1") <= date_sub(col("cend"), 3), 1L).otherwise(0L)
            .as("churned"))
      graft.operators.TimeSeries.kaplanMeier(subj, "dur", "churned")
    }),

    // Jensen–Shannon drift of the event-type mix between the first
    // and second half of the corpus window — the BOUNDED complement
    // of the PSI monitors (a category present on one side only gets a
    // finite term with NO ε-smoothing; Σ jsd_term ≤ ln 2). Same
    // two-aggregate + category-sized-join shape as categoricalPsi
    // (Drift.jensenShannon); terms round to 9 decimals.
    "js_drift_event_mix" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val split = lit("2024-01-16").cast("date")
      graft.operators.Drift.jensenShannon(
          ev.filter(to_date(col("ts")) < split),
          ev.filter(to_date(col("ts")) >= split),
          "event_type")
        .orderBy(col("category"))
    }),

    // Benford first-digit audit of order totals — the classic
    // fabricated-amounts screen (DataChecks.benfordAudit). Prices
    // become EXACT integer cents via a DECIMAL(18,2)·100 cast (never
    // double formatting), so the first significant digit is integer
    // string arithmetic on both engines; expected rates round ln-ulp
    // style. TPC-H-ish prices span only ~2.7 decades, so the audit
    // legitimately FLAGS them — the gate checks the arithmetic, not
    // conformance.
    "benford_price_audit" -> ((s, dir) =>
      graft.operators.DataChecks.benfordAudit(t(s, dir, "orders"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long"))),

    // Revenue concentration per market segment: exact-DECIMAL Gini
    // coefficient (rank-weighted sum form over customers sorted by
    // revenue, custkey tiebreak) and Herfindahl–Hirschman index
    // (Σ share²) — the inequality lens on the customer base. All
    // sums stay DECIMAL-exact; the three final divisions are the
    // only doubles, identical op order both engines.
    "revenue_concentration" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        // narrow the sum back to (18,2) — a (28,2) square would blow
        // the 38-digit ceiling and BOTH engines would degrade (to
        // rounded decimal here, to double there); one customer's
        // revenue fits 16 integer digits at any SF
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(18,2)").as("rev"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("rev"), col("c_custkey"))
      val nd = col("n_cust").cast("double")
      rev.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("rev")).as("tot"),
          sum(col("i") * col("rev")).as("irev"),
          sum(col("rev") * col("rev")).as("rev2"))
        // round to 12 decimals: the wide-DECIMAL→DOUBLE cast is not
        // correctly rounded in every engine at 20 significant digits
        // (measured one-ulp drift on rev²), and an inequality index
        // is never read below 1e-12
        .select(col("c_mktsegment"), col("n_cust"),
          col("tot").cast("double").as("total_rev"),
          round(lit(2.0) * col("irev").cast("double") /
            (nd * col("tot").cast("double")) -
            (col("n_cust") + 1).cast("double") / nd, 12).as("gini"),
          round(col("rev2").cast("double") /
            (col("tot").cast("double") * col("tot").cast("double")), 12)
            .as("hhi"))
        .orderBy(col("c_mktsegment"))
    }),

    // Winsorization (Percentiles.winsorize): clamp order prices into
    // the per-status exact [p05, p95] band — the CLAMP twin of the
    // mad_outliers DROP, bounded-memory at any group size. Output is
    // order-independent exact stats (count/min/max of the clamped
    // column) per group.
    "winsorize_prices" -> ((s, dir) => {
      val w = graft.operators.Percentiles.winsorize(
        t(s, dir, "orders"), Seq("o_orderstatus"), "o_totalprice",
        lo = 0.05, hi = 0.95, as = "w_price")
      w.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), min(col("w_price")).as("min_w"),
          max(col("w_price")).as("max_w"))
        .orderBy(col("o_orderstatus"))
    }),

    // Interval×interval overlap join, bucketed to an equi-join (the
    // raw theta form nested-loops): 7-day windows from one order
    // sample against 5-day windows from another. Pairs meet in their
    // first shared bucket only — dedup by arithmetic, no distinct.
    "interval_overlap_count" -> ((s, dir) => {
      import graft.operators.RangeJoin
      def sample(mod: Int, width: Int, p: String) =
        t(s, dir, "orders").filter(col("o_orderkey") % mod === 0)
          .select(col("o_orderkey").as(s"${p}_id"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long").as(s"${p}_lo"))
          .withColumn(s"${p}_hi", col(s"${p}_lo") + width)
      RangeJoin.intervalOverlap(sample(201, 7, "a"), sample(157, 5, "b"),
          "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 7L)
        .groupBy(col("a_id")).agg(count(lit(1)).as("n_overlap"))
        .orderBy(col("a_id"))
    }),

    // Custom TypedImperativeAggregate: linear-counting distinct sketch
    // (fixed-size bitmap over the shuffle). Rows-only: the estimator is
    // not SQL-expressible; accuracy is spec-tested against exact counts.
    "approx_distinct_sketch" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(graft.functions.SketchFunctions.approxDistinct(col("user_id"))
          .as("approx_users"))
        .orderBy(col("event_type"))),

    // Multi-way star join over the dimension chain. nation/region are
    // constant-size → pinned broadcast; customer scales with SF → AQE
    // decides (see q5 comment).
    "star_join_agg" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q4-style: order counts per priority where at least one
    // line item shipped >60 days after the order date (the testdata
    // carries no commit/receipt dates, so late shipment stands in for
    // commit<receipt). Catalyst plans the EXISTS as a left-semi join —
    // lineitem never duplicates orders rows, and the non-equi date
    // condition rides the semi-join, not a post-join filter.
    "q4_order_priority" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(to_date(col("o_orderdate")) >= lit("1995-07-01") &&
          to_date(col("o_orderdate")) < lit("1995-10-01"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            to_date(col("l_shipdate")) >
              date_add(to_date(col("o_orderdate")), 60),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q7-style: shipping volume between two nations by year.
    // The two nation aliases are filtered to the two names BEFORE the
    // joins, so the 2-row broadcasts prune supplier/customer early;
    // only the cross-pair OR runs post-join. supplier/customer scale
    // with SF → their strategies stay AQE's call (q5 comment).
    "q7_nation_volume" -> ((s, dir) => {
      val pair = Seq("NATION_11", "NATION_20")
      val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1995-01-01") &&
          to_date(col("l_shipdate")) <= lit("1996-12-31"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(to_date(col("l_shipdate"))).cast("long").as("l_year"),
          col("l_extendedprice"), col("l_discount"))
      li.join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q13-style: distribution of customers by order count,
    // including zero-order customers (the left join keeps them; the
    // ON-clause priority filter must NOT drop them, unlike a WHERE).
    // Two aggregations: per-customer counts ride the custkey shuffle,
    // the tiny distribution rides a second shuffle on the count.
    "q13_order_distribution" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q17-style: revenue from small-quantity line items, where
    // "small" is relative to the part's own average quantity. The
    // correlated per-part average is a WINDOW over the brand-filtered
    // join — one partkey shuffle, no join-back, no second lineitem
    // scan. The threshold compares in exact integer/decimal arithmetic
    // (qty*n*5 < sum ⟺ qty < 0.2*avg) so boundary rows can't drift
    // between engines; only the final 1-row division goes to double.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val pt = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#12").select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast("decimal(18,2)").as("qty"),
          col("l_extendedprice"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .withColumn("sum_qty", sum(col("qty")).over(w))
        .withColumn("n_li", count(lit(1)).over(w))
        .filter(col("qty") * col("n_li") * 5 < col("sum_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
        .orderBy(col("avg_yearly")) // 1 row; contract wants a total order
    }),

    // TPC-H Q19-style: disjunctive brand/size/quantity brackets.
    // Catalyst distributes the cross-table OR into single-table
    // disjunctions and pushes each to its scan (PushedFilters shows
    // Or(And(quantity≥1,quantity≤11),…) on lineitem and the brand/size
    // disjunction on part) — at 100 TB that's row-group min/max
    // skipping on both sides with no hand-written superset bounds.
    "q19_disjunctive" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
      val pt = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue")) // 1 row; contract wants a total order
    }),

    // TPC-H Q6: the canonical scan-efficiency query — every predicate
    // pushes to the parquet scan (row-group min/max skipping), one
    // partial-aggregated sum, zero joins. At 100 TB this is the query
    // whose cost is pure I/O; anything beyond a single scan + scalar
    // agg in the plan is a bug.
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1995-01-01") &&
          to_date(col("l_shipdate")) < lit("1996-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(22,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue"))), // 1 row; contract wants a total order

    // TPC-H Q15-style: supplier(s) with the quarter's maximum revenue,
    // ties kept. The scalar-subquery formulation (rev → max → probe
    // rev) plans TWO lineitem scans — exchange reuse does not fire
    // across the differently-pruned subtrees — so the max runs as a
    // deliberate single-partition window over the per-supplier
    // aggregate instead: rev is SF-linear but SLIM (suppkey, revenue —
    // tens of MB at 100 TB), and one narrow pass over it beats
    // rescanning the fact table. supplier's join stays AQE's call.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1995-01-01") &&
          to_date(col("l_shipdate")) < lit("1995-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("total_revenue"))
      rev.withColumn("max_revenue",
          max(col("total_revenue")).over(Window.partitionBy(lit(0))))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q8-style: one nation's market share of ECONOMY-part
    // revenue sold into ASIA, by ship year. Both conditional and total
    // sums ride ONE shuffle on the year key; nation/region broadcasts
    // prune customers to the region before the fact joins;
    // customer/supplier/orders strategies stay AQE's call.
    "q8_market_share" -> ((s, dir) => {
      val pt = t(s, dir, "part")
        .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      val reg = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val custSide = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(t(s, dir, "orders")
          .filter(to_date(col("o_orderdate")) >= lit("1995-01-01") &&
            to_date(col("o_orderdate")) <= lit("1996-12-31"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(to_date(col("o_orderdate"))).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(custSide, col("o_custkey") === col("c_custkey"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_20", rev)
            .otherwise(lit(0).cast("decimal(22,6)"))).cast("double")
          / sum(rev).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q22-style: well-funded customers who never placed a large
    // order, per nation (the testdata has no phone column, so
    // nationkey stands in for the country code; every customer has
    // SOME order in this data, so "large order" stands in for "any").
    // The global average is ONE decimal-exact aggregate broadcast as a
    // scalar — no driver collect — and the no-large-order test is an
    // anti-join that AQE sizes (orders scales with SF).
    "q22_inactive_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("totacctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // Time-based rolling aggregate — the RANGE-frame window shape
    // (every other window here is row-framed): per-customer 7-day
    // rolling revenue where the frame is defined by the ORDER-BY
    // VALUE (epoch day), not row offsets, so sparse/bursty order
    // histories aggregate correctly. One custkey shuffle; frame state
    // is bounded by the 7-day span, not the partition.
    "rolling_revenue_7d" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_day"))
        .rangeBetween(-6, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("epoch_day"),
          col("o_totalprice"))
        .withColumn("rolling_7d",
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
          col("rolling_7d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // TPC-H Q12-style: late-shipped line items split into high/low
    // priority classes (the testdata has no shipmode/commit/receipt
    // columns, so l_linestatus stands in for the mode and "late" means
    // shipped >30 days after the order date). One li⋈ord join — both
    // sides SF-scaling, strategy stays AQE's call — then both
    // conditional counts ride ONE shuffle on the 2-value group key.
    "q12_late_lines" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(to_date(col("l_shipdate")) >
          date_add(to_date(col("o_orderdate")), 30))
        .groupBy(col("l_linestatus"))
        .agg(count(when(hi, lit(1))).as("high_count"),
          count(when(!hi, lit(1))).as("low_count"))
        .orderBy(col("l_linestatus"))
    }),

    // TPC-H Q21-style: suppliers who were the ONLY late supplier on a
    // finished multi-supplier order (no commit/receipt dates in the
    // testdata, so late := shipped >85 days after the order date).
    // The reference formulation's double EXISTS/NOT EXISTS self-joins
    // of lineitem decorrelate into ONE (orderkey, suppkey) aggregation
    // + ONE orderkey window over the slim per-supplier rows — the
    // 100 TB fact table is scanned once and never self-joined;
    // supplier joins the already-tiny survivors and stays AQE's call.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val late = (to_date(col("l_shipdate")) >
        date_add(to_date(col("o_orderdate")), 85)).cast("int")
      val per = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(late).as("late"))
      val w = Window.partitionBy(col("l_orderkey"))
      per
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late", sum(col("late")).over(w))
        .filter(col("late") === 1 && col("n_supp") > 1 && col("n_late") === 1)
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // TPC-H Q2-style: each part's cheapest ASIA supplier, ties kept
    // (no partsupp table in the testdata, so the observed minimum line
    // price per (part, supplier) stands in for ps_supplycost). The
    // correlated min-subquery decorrelates into a window MIN over the
    // per-pair aggregate — the fact table is scanned ONCE; the
    // region/nation broadcasts prune suppliers before the fact join;
    // the supplier⋈lineitem strategy stays AQE's call (supplier scales
    // with SF). MIN of a double is exact, so no decimal staging needed.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val asiaSupp = t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"))
      val offers = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"))
        .agg(min(col("l_extendedprice")).as("price"))
      val w = Window.partitionBy(col("l_partkey"))
      offers.withColumn("min_price", min(col("price")).over(w))
        .filter(col("price") === col("min_price"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("price"))
        .orderBy(col("p_partkey"), col("s_suppkey"))
    }),

    // TPC-H Q9: profit by nation and order year, joining the derived
    // partsupp on BOTH keys (the two-key dimension join q9 exists to
    // exercise). Filters first: the name filter prunes part before any
    // join; partsupp is 4×|part| (SF-scaling → strategy is AQE's
    // call); nation is the only pinned broadcast. Profit terms are
    // exact decimals; only the reported sum goes to double.
    "q9_product_profit" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        year(to_date(col("o_orderdate"))).cast("long").as("o_year"))
      li.join(redParts, col("l_partkey") === col("p_partkey"))
        .join(derivedPartsupp(s, dir),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(22,6)") -
            (col("ps_supplycost") * col("l_quantity").cast("decimal(12,2)"))
              .cast("decimal(22,6)"))
          .cast("double").as("sum_profit"))
        .select(col("n_name").as("nation"), col("o_year"), col("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q20: suppliers in one nation holding excess stock of promo
    // parts — the nested-semi-join shape over availqty. The inner
    // quantity rollup shuffles on the SAME (partkey, suppkey) pair the
    // partsupp join needs; the threshold compares 2·availqty > qty in
    // exact integer/decimal arithmetic (0.5·qty would promote to
    // double at DuckDB's decimal-width cap — the q11 drift class).
    // The final supplier semi-join strategy is AQE's call.
    "q20_promo_suppliers" -> ((s, dir) => {
      val promo = t(s, dir, "part")
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      val ship = t(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
          to_date(col("l_shipdate")) < lit("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      val picks = derivedPartsupp(s, dir)
        .join(promo, col("ps_partkey") === col("p_partkey"))
        .join(ship, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .filter(col("ps_availqty") * 2 > col("qty"))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_18")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(picks, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q2 FAITHFUL (over the derived partsupp): min-supply-cost
    // supplier per part within one region, part filter on type+size.
    // The correlated min-cost subquery decorrelates to a window over
    // ONE partition shuffle of the region-restricted partsupp —
    // never a self-join. partsupp/supplier scale with SF → AQE;
    // nation/region constant → pinned broadcasts.
    "q2_min_cost_supplier_ps" -> ((s, dir) => {
      val euro = derivedPartsupp(s, dir)
        .join(t(s, dir, "supplier").select(col("s_suppkey"),
          col("s_nationkey"), col("s_acctbal"), col("s_name")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
      val w = Window.partitionBy(col("ps_partkey"))
      euro.withColumn("min_cost", min(col("ps_supplycost")).over(w))
        .filter(col("ps_supplycost") === col("min_cost"))
        .join(t(s, dir, "part")
          .filter(col("p_type") === "ECONOMY" && col("p_size") < 25)
          .select(col("p_partkey")),
          col("p_partkey") === col("ps_partkey"))
        .select(col("p_partkey"), col("s_name"), col("n_name"),
          col("s_acctbal"), col("ps_supplycost").cast("double")
            .as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11 FAITHFUL (over the derived partsupp): parts whose
    // single-nation stock value (supplycost·availqty) exceeds 0.1% of
    // that nation's total. Value terms are exact decimals; the
    // threshold compares in DOUBLE on both engines (decimal×1000
    // exceeds DuckDB's width cap — the q11-analog drift class).
    "q11_important_parts_ps" -> ((s, dir) => {
      val natps = derivedPartsupp(s, dir)
        .join(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
          col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_18")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty").cast("decimal(6,0)"))
            .cast("decimal(22,2)").as("v"))
      natps.groupBy(col("ps_partkey")).agg(sum(col("v")).as("value"))
        .withColumn("total", sum(col("value")).over(Window.partitionBy(lit(0))))
        .filter(col("value").cast("double") * 1000 >
          col("total").cast("double"))
        .select(col("ps_partkey").as("p_partkey"),
          col("value").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    }),

    // TPC-H Q11-style: parts whose single-nation line value exceeds
    // 0.1% of that nation's total (lineitem value stands in for
    // supplycost·availqty — no partsupp). The global total is a
    // single-partition window over the already-aggregated per-part
    // rows (q15's pattern: SF-linear but slim — never a second fact
    // scan). The threshold compares in DOUBLE on BOTH engines: DuckDB
    // promotes v*1000 to double anyway (DECIMAL(38,4)×INT would
    // exceed width 38) while Spark keeps a precision-reduced decimal,
    // so the explicit double cast is the one representation both
    // engines compute identically (IEEE ops over the exact decimal
    // sums are deterministic).
    "q11_important_parts" -> ((s, dir) => {
      val value = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            col("l_quantity").cast("decimal(18,2)")).as("v"))
        .join(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_20")
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("v")).as("value"))
      value.withColumn("total",
          sum(col("value")).over(Window.partitionBy(lit(0))))
        .filter(col("value").cast("double") * 1000 >
          col("total").cast("double"))
        .select(col("l_partkey").as("p_partkey"),
          col("value").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    }),

    // Spearman rank correlation between quantity and discount per
    // return flag — computed from the (flag, qty, disc) contingency
    // table, NOT a per-row rank window: one grouped count compresses
    // the fact table to ≤ flag×50×11 cells, marginal tie-averaged
    // ranks (doubled, so integral) come from windows over THOSE
    // cells, and the five moment sums accumulate in DECIMAL — the
    // rank test that never total-sorts the fact table
    // (operators/RankStats.spearmanFromCells).
    "spearman_qty_discount" -> ((s, dir) => {
      val cells = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").as("qty"),
          col("l_discount").as("disc"))
        .agg(count(lit(1)).as("cn"))
      graft.operators.RankStats.spearmanFromCells(cells,
          Seq("l_returnflag"), "qty", "disc", "cn")
        .orderBy(col("l_returnflag"))
    }),

    // Mann-Whitney U: do purchase events carry a different `value`
    // distribution than view events? Rank-sum over the grouped
    // distinct-value table (RankStats.mannWhitney): the scan is one
    // hash aggregation; the ordered pass touches only distinct
    // values; doubled ranks keep everything integral until the
    // tie-corrected z. The non-parametric sibling of
    // ab_conversion_ztest.
    "mann_whitney_value" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "view"))
      graft.operators.RankStats.mannWhitney(ev,
          col("event_type") === "purchase", "value")
        .orderBy(col("n1"))
    }),

    // Per-event-type Shannon entropy of the hour-of-day distribution
    // (RankStats.entropyProfile): a flat 24-cell spread scores high,
    // a bursty bot-like type scores low — the temporal-diversity
    // profile of a behavioral pipeline. Exact cell counts; p·ln p
    // terms rounded per cell then DECIMAL-summed (the chi-square
    // accumulation discipline), so the scalar survives any partition
    // order.
    "hourly_entropy_profile" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      graft.operators.RankStats.entropyProfile(ev,
          Seq("event_type"), "hr")
        .select(col("event_type"), col("n"), col("k"),
          col("entropy"), col("norm_entropy"))
        .orderBy(col("event_type"))
    }),

    // Discount elasticity of demand per brand: OLS slope of
    // ln(quantity) on ln(1 − discount) — the price-response curve —
    // computed from the (brand, discount, quantity) contingency
    // cells (25×11×50 max), never per row: log terms are evaluated
    // once per cell, rounded, DECIMAL-weighted by the exact cell
    // count, and the closed-form slope runs over five exact sums.
    // Part is a broadcast dimension join.
    "discount_elasticity" -> ((s, dir) => {
      val cells = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_discount").as("disc"),
          col("l_quantity").as("qty"))
        .agg(count(lit(1)).as("cn"))
      val terms = cells
        .withColumn("x", round(log(lit(1.0) - col("disc")), 9))
        .withColumn("y", round(log(col("qty")), 9))
      // count-weighted log terms multiply in DOUBLE (exact longs ×
      // rounded logs — deterministic), round, then DECIMAL-sum: the
      // chi-square accumulation pattern, dodging engine-specific
      // decimal-product scale clamping.
      val dec = (c: org.apache.spark.sql.Column) =>
        sum(round(c, 6).cast("decimal(28,12)"))
      val agg = terms.groupBy(col("p_brand")).agg(
        sum(col("cn")).as("n"),
        dec(col("cn") * col("x")).as("sx"),
        dec(col("cn") * col("y")).as("sy"),
        dec(col("cn") * col("x") * col("y")).as("sxy"),
        dec(col("cn") * col("x") * col("x")).as("sxx"))
      val d = (c: String) => col(c).cast("double")
      agg.select(col("p_brand"), col("n"),
          round((d("n") * d("sxy") - d("sx") * d("sy")) /
            (d("n") * d("sxx") - d("sx") * d("sx")), 6).as("elasticity"),
          round((d("sy") - ((d("n") * d("sxy") - d("sx") * d("sy")) /
            (d("n") * d("sxx") - d("sx") * d("sx"))) * d("sx")) / d("n"), 6)
            .as("intercept"))
        .orderBy(col("p_brand"))
    }))

  /** Unrolled power-iteration rounds for the supplier_pagerank oracle
    * (DuckDB forbids aggregates over a recursive CTE reference, so the
    * fixed round count is spelled out as chained CTEs — mirroring
    * Graph.pageRankQ's integer arithmetic term for term). */
  /** Unrolled integer PageRank rounds over a caller-supplied
    * undirected pair set: `pairsSql` must define a CTE body producing
    * (src, dst) — the helper adds the direction union (skipped when
    * `directed`), degrees, the auto-scaled denominator, and `iters`
    * unrolled rounds, mirroring Graph.pageRankQ's nano-unit floor
    * arithmetic term for term. */
  private[queries] def pageRankCtes(iters: Int, pairsSql: String,
                                    directed: Boolean = false): String = {
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT nd.id,
         |    (CAST(15 AS BIGINT) * rd.rd) // (100 * n.cnt)
         |      + (CAST(85 AS BIGINT) * COALESCE(s.msum, 0)) // 100 AS rank_q
         |  FROM nodes nd CROSS JOIN n CROSS JOIN rd
         |  LEFT JOIN (
         |    SELECT e.dst AS id, SUM(p.rank_q // d.outdeg) AS msum
         |    FROM edges e
         |    JOIN pr${i - 1} p ON e.src = p.id
         |    JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) s ON nd.id = s.id)""".stripMargin
    }.mkString(",\n")
    s"""pairs AS ($pairsSql),
       |edges AS (
       |  SELECT src, dst FROM pairs${
         if (directed) ""
         else "\n  UNION ALL\n  SELECT dst AS src, src AS dst FROM pairs"}),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS id FROM edges
       |          UNION SELECT DISTINCT dst FROM edges),
       |n AS (SELECT COUNT(*) AS cnt FROM nodes),
       |rd AS (SELECT GREATEST(CAST(1000000000 AS BIGINT), 1000 * cnt) AS rd
       |       FROM n),
       |pr0 AS (SELECT id, rd.rd // n.cnt AS rank_q FROM nodes, n, rd),
       |$rounds""".stripMargin
  }

  /** The customer↔supplier trading pairs for [[pageRankCtes]] —
    * supplier_pagerank's original edge definition. */
  private val tradingPairsSql =
    """
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin

  /** Unrolled HITS rounds for the hits_trading oracle — mirrors
    * Graph.hitsQ's integer max-rescale arithmetic term for term. */
  private def hitsCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS (
         |  SELECT p.dst AS id, SUM(h.hub_q) AS raw
         |  FROM pairs p JOIN h${i - 1} h ON p.src = h.id GROUP BY p.dst),
         |am$i AS (SELECT MAX(raw) AS m FROM ar$i),
         |a$i AS (
         |  SELECT nd.id,
         |    CAST(COALESCE(r.raw, 0) * 1000000 // x.m AS BIGINT) AS auth_q
         |  FROM nodes nd LEFT JOIN ar$i r ON nd.id = r.id
         |  CROSS JOIN am$i x),
         |hr$i AS (
         |  SELECT p.src AS id, SUM(a.auth_q) AS raw
         |  FROM pairs p JOIN a$i a ON p.dst = a.id GROUP BY p.src),
         |hm$i AS (SELECT MAX(raw) AS m FROM hr$i),
         |h$i AS (
         |  SELECT nd.id,
         |    CAST(COALESCE(r.raw, 0) * 1000000 // x.m AS BIGINT) AS hub_q
         |  FROM nodes nd LEFT JOIN hr$i r ON nd.id = r.id
         |  CROSS JOIN hm$i x)""".stripMargin
    }.mkString(",\n")
    s"""pairs AS (
       |  SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
       |         's' || CAST(l.l_suppkey AS VARCHAR) AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |nodes AS (SELECT DISTINCT src AS id FROM pairs
       |          UNION SELECT DISTINCT dst FROM pairs),
       |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS hub_q FROM nodes),
       |$rounds""".stripMargin
  }

  /** Unrolled synchronous-peel rounds for the copurchase_kcore oracle
    * — each round recomputes degrees among the survivors and drops
    * nodes below k; past the fixpoint rounds are no-ops, so any
    * unroll ≥ the convergence depth (2–4 at gate SFs) replays
    * Graph.kCore exactly. MATERIALIZED is load-bearing: each round
    * references the previous survivor CTE twice, so DuckDB's default
    * inlining would expand the chain 2^rounds times (observed as a
    * file-handle explosion re-opening the parquet per inlined scan). */
  private def kCoreCtes(rounds: Int, k: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT id, COUNT(*) AS c FROM (
         |    SELECT e.u AS id FROM e
         |    JOIN n${i - 1} a ON e.u = a.id JOIN n${i - 1} b ON e.v = b.id
         |    UNION ALL
         |    SELECT e.v FROM e
         |    JOIN n${i - 1} a ON e.u = a.id JOIN n${i - 1} b ON e.v = b.id
         |  ) t GROUP BY id),
         |n$i AS MATERIALIZED (SELECT id FROM d$i WHERE c >= $k)""".stripMargin
    }.mkString(",\n")
    s"""li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem WHERE l_orderkey % 50 = 0),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT x.pk AS u, y.pk AS v
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
       |n0 AS MATERIALIZED (SELECT u AS id FROM e UNION SELECT v FROM e),
       |$rs""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "forecast_seasonal_naive" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (
        |  SELECT event_type, MAX(day) - 6 AS h_start
        |  FROM daily GROUP BY 1),
        |lagged AS (
        |  SELECT c.event_type, c.day, c.n, l.n AS n_lag
        |  FROM daily c JOIN daily l
        |    ON c.event_type = l.event_type AND c.day = l.day + 7),
        |j AS (
        |  SELECT lg.event_type, ABS(lg.n - lg.n_lag) AS abs_err,
        |         lg.day >= h.h_start AS holdout
        |  FROM lagged lg JOIN h ON lg.event_type = h.event_type)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN holdout THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_holdout,
        |  CAST(SUM(CASE WHEN NOT holdout THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  CAST(SUM(CASE WHEN holdout THEN abs_err END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN holdout THEN 1 ELSE 0 END) AS DOUBLE)
        |    AS mae,
        |  (CAST(SUM(CASE WHEN holdout THEN abs_err END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN holdout THEN 1 ELSE 0 END) AS DOUBLE))
        |  / (CAST(SUM(CASE WHEN NOT holdout THEN abs_err END) AS DOUBLE)
        |    / CAST(SUM(CASE WHEN NOT holdout THEN 1 ELSE 0 END)
        |           AS DOUBLE)) AS mase
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT)
        |           AS day_no,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type,
        |         CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
        |  FROM daily GROUP BY 1),
        |c AS (
        |  SELECT d.event_type, d.day_no, m.mu,
        |         SUM(CAST(d.n AS DOUBLE) - m.mu)
        |           OVER (PARTITION BY d.event_type ORDER BY d.day_no
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS s
        |  FROM daily d JOIN m USING (event_type)),
        |x AS (
        |  SELECT *, MAX(ABS(s)) OVER (PARTITION BY event_type) AS mx
        |  FROM c)
        |SELECT event_type, COUNT(*) AS n_days, MAX(mu) AS mu,
        |       MAX(ABS(s)) AS max_abs_s,
        |       CAST(MIN(CASE WHEN ABS(s) = mx THEN day_no END) AS BIGINT)
        |         AS change_day
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ab_conversion_ztest" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         MAX(CASE WHEN event_type = 'purchase' AND value > 180.0
        |             THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1),
        |v AS (SELECT *, user_id % 2 AS variant FROM pu),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END)
        |         AS BIGINT) AS x_a,
        |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END)
        |         AS BIGINT) AS x_b
        |  FROM v),
        |p AS (
        |  SELECT *,
        |    CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
        |    CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
        |    CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
        |      AS p_pool
        |  FROM a)
        |SELECT n_a, x_a, n_b, x_b, p_a, p_b, p_pool,
        |       (p_a - p_b) /
        |         sqrt(p_pool * (CAST(1.0 AS DOUBLE) - p_pool) *
        |              (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE) +
        |               CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))) AS z
        |FROM p ORDER BY n_a""".stripMargin,
    "forget_user_cascade" ->
      """WITH req AS (
        |  SELECT DISTINCT c_custkey AS k FROM customer
        |  WHERE c_custkey % 101 = 0),
        |delc AS (SELECT c_custkey FROM customer SEMI JOIN req
        |         ON c_custkey = k),
        |delo AS (SELECT o_orderkey FROM orders SEMI JOIN delc
        |         ON o_custkey = c_custkey),
        |dell AS (SELECT l_orderkey FROM lineitem SEMI JOIN delo
        |         ON l_orderkey = o_orderkey)
        |SELECT * FROM (
        |  SELECT '1_customer' AS tbl,
        |         (SELECT COUNT(*) FROM customer) AS n_total,
        |         (SELECT COUNT(*) FROM delc) AS n_deleted
        |  UNION ALL
        |  SELECT '2_orders',
        |         (SELECT COUNT(*) FROM orders),
        |         (SELECT COUNT(*) FROM delo)
        |  UNION ALL
        |  SELECT '3_lineitem',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM dell))
        |ORDER BY tbl""".stripMargin,
    "bitemporal_as_of" ->
      """WITH ord AS (
        |  SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |bt AS (
        |  SELECT o_orderkey, CAST(1 AS BIGINT) AS version,
        |         o_totalprice AS price, d AS valid_from,
        |         d + 90 AS valid_to, d AS tx_from, d + 30 AS tx_to
        |  FROM ord
        |  UNION ALL
        |  SELECT o_orderkey, CAST(2 AS BIGINT),
        |         o_totalprice + 10.0, d, d + 90,
        |         d + 30, DATE '9999-12-31'
        |  FROM ord)
        |SELECT * FROM bt
        |WHERE valid_from <= DATE '1996-03-01'
        |  AND DATE '1996-03-01' < valid_to
        |  AND tx_from <= DATE '1996-02-01'
        |  AND DATE '1996-02-01' < tx_to
        |ORDER BY o_orderkey""".stripMargin,
    "copurchase_components" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |p AS (
        |  SELECT x.pk AS id_a, y.pk AS id_b
        |  FROM li x JOIN li y USING (ok) WHERE x.pk < y.pk),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS p_partkey, MIN(lbl) AS component
        |FROM reach GROUP BY id ORDER BY p_partkey""".stripMargin,
    "copurchase_link_predict" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |e AS (
        |  SELECT DISTINCT LEAST(x.pk, y.pk) AS u, GREATEST(x.pk, y.pk) AS v
        |  FROM li x JOIN li y USING (ok) WHERE x.pk < y.pk),
        |adj AS (
        |  SELECT u AS w, v AS n FROM e
        |  UNION ALL SELECT v AS w, u AS n FROM e),
        |deg AS (SELECT w AS id, COUNT(*) AS deg FROM adj GROUP BY 1),
        |sp AS (
        |  SELECT a.w, a.n, d.deg AS dw
        |  FROM adj a JOIN deg d ON a.w = d.id WHERE d.deg <= 100),
        |p AS (
        |  SELECT l.n AS id_a, r.n AS id_b,
        |         CAST(COUNT(*) AS BIGINT) AS common,
        |         CAST(SUM(CAST(
        |             CAST(1.0 AS DOUBLE)
        |               / round(ln(CAST(l.dw AS DOUBLE)), 9)
        |           AS DECIMAL(28,12))) AS DOUBLE) AS adamic_adar
        |  FROM sp l JOIN sp r ON l.w = r.w AND l.n < r.n
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 1),
        |np AS (
        |  SELECT p.* FROM p ANTI JOIN e
        |  ON p.id_a = e.u AND p.id_b = e.v)
        |SELECT np.id_a, np.id_b, np.common,
        |       CAST(np.common AS DOUBLE)
        |         / CAST(da.deg + db.deg - np.common AS DOUBLE) AS jaccard,
        |       np.adamic_adar
        |FROM np JOIN deg da ON np.id_a = da.id
        |        JOIN deg db ON np.id_b = db.id
        |ORDER BY np.id_a, np.id_b""".stripMargin,
    "er_golden_record" ->
      """WITH RECURSIVE cust AS (
        |  SELECT * FROM customer WHERE c_custkey % 10 = 0),
        |pairs AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM cust a JOIN cust b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1
        |    AND a.c_nationkey = b.c_nationkey),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
        |cl AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
        |recs AS (
        |  SELECT c.*, COALESCE(cl.cluster, c.c_custkey) AS entity
        |  FROM cust c LEFT JOIN cl ON c.c_custkey = cl.id),
        |base AS (
        |  SELECT entity, CAST(COUNT(*) AS BIGINT) AS n_members,
        |         MIN(c_custkey) AS c_custkey, MAX(c_acctbal) AS c_acctbal
        |  FROM recs GROUP BY entity),
        |nm AS (
        |  SELECT entity, c_name FROM (
        |    SELECT entity, c_name, ROW_NUMBER() OVER (
        |      PARTITION BY entity
        |      ORDER BY length(c_name) DESC, c_name ASC) AS rn
        |    FROM recs WHERE c_name IS NOT NULL) WHERE rn = 1),
        |nk AS (
        |  SELECT entity, c_nationkey FROM (
        |    SELECT entity, c_nationkey, ROW_NUMBER() OVER (
        |      PARTITION BY entity
        |      ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
        |    FROM recs WHERE c_nationkey IS NOT NULL
        |    GROUP BY entity, c_nationkey) WHERE rn = 1),
        |mk AS (
        |  SELECT entity, c_mktsegment FROM (
        |    SELECT entity, c_mktsegment, ROW_NUMBER() OVER (
        |      PARTITION BY entity
        |      ORDER BY COUNT(*) DESC, c_mktsegment ASC) AS rn
        |    FROM recs WHERE c_mktsegment IS NOT NULL
        |    GROUP BY entity, c_mktsegment) WHERE rn = 1)
        |SELECT base.entity AS cluster, base.n_members, base.c_custkey,
        |       nm.c_name, base.c_acctbal, nk.c_nationkey, mk.c_mktsegment
        |FROM base
        |LEFT JOIN nm USING (entity)
        |LEFT JOIN nk USING (entity)
        |LEFT JOIN mk USING (entity)
        |ORDER BY cluster""".stripMargin,
    "xcorr_view_purchase" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS x,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |              END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |lags AS (SELECT UNNEST(range(-3, 4)) AS lag),
        |j AS (
        |  SELECT l.lag, a.x, b.y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.day = a.day - CAST(l.lag AS INTEGER)),
        |sums AS (
        |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(x) AS DECIMAL(19,0)) AS sx,
        |         CAST(SUM(y) AS DECIMAL(19,0)) AS sy,
        |         CAST(SUM(x * y) AS DECIMAL(19,0)) AS sxy,
        |         CAST(SUM(x * x) AS DECIMAL(19,0)) AS sxx,
        |         CAST(SUM(y * y) AS DECIMAL(19,0)) AS syy
        |  FROM j GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_days,
        |       CAST(CAST(n_days AS DECIMAL(19,0)) * sxy - sx * sy AS DOUBLE)
        |         / (sqrt(CAST(CAST(n_days AS DECIMAL(19,0)) * sxx
        |                      - sx * sx AS DOUBLE))
        |            * sqrt(CAST(CAST(n_days AS DECIMAL(19,0)) * syy
        |                        - sy * sy AS DOUBLE))) AS r
        |FROM sums ORDER BY lag""".stripMargin,
    "part_bfs_hops" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |e AS (
        |  SELECT x.pk AS src, y.pk AS dst
        |  FROM li x JOIN li y USING (ok) WHERE x.pk < y.pk),
        |und AS (
        |  SELECT src AS s, dst AS d FROM e
        |  UNION SELECT dst, src FROM e),
        |seeds AS (
        |  SELECT DISTINCT p_partkey AS id FROM part
        |  WHERE p_partkey % 199 = 0),
        |r AS (
        |  SELECT id, 0 AS hop FROM seeds
        |  UNION
        |  SELECT u.d, r.hop + 1 FROM r JOIN und u ON u.s = r.id
        |  WHERE r.hop < 4)
        |SELECT id AS p_partkey, CAST(MIN(hop) AS BIGINT) AS hop
        |FROM r GROUP BY id ORDER BY p_partkey""".stripMargin,
    "k_anonymity_audit" ->
      """SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_n
        |FROM customer
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING COUNT(*) < 10
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "l_diversity_audit" ->
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(FLOOR(c_acctbal / 1000) AS INTEGER) AS bal_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_n,
        |       COUNT(DISTINCT bal_band) AS sensitive_distinct
        |FROM b
        |GROUP BY c_nationkey, c_mktsegment
        |HAVING COUNT(DISTINCT bal_band) < 8
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "basket_rules" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |nb AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
        |itemn AS (SELECT i, COUNT(*) AS n_i FROM bi GROUP BY i),
        |pairn AS (
        |  SELECT x.i AS a, y.i AS c, COUNT(*) AS n_ab
        |  FROM bi x JOIN bi y USING (b) WHERE x.i < y.i
        |  GROUP BY x.i, y.i HAVING COUNT(*) >= 2),
        |directed AS (
        |  SELECT a, c, n_ab FROM pairn
        |  UNION ALL SELECT c, a, n_ab FROM pairn)
        |SELECT d.a AS antecedent, d.c AS consequent, d.n_ab,
        |       ia.n_i AS n_a, ic.n_i AS n_c,
        |       CAST(d.n_ab AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
        |       CAST(d.n_ab AS DOUBLE) / CAST(ia.n_i AS DOUBLE)
        |         AS confidence,
        |       CAST(d.n_ab * nb.n AS DOUBLE) /
        |         CAST(ia.n_i * ic.n_i AS DOUBLE) AS lift
        |FROM directed d
        |JOIN itemn ia ON ia.i = d.a
        |JOIN itemn ic ON ic.i = d.c
        |CROSS JOIN nb
        |ORDER BY antecedent, consequent""".stripMargin,
    "er_score_pairs" ->
      """WITH p AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |         levenshtein(a.c_name, b.c_name) AS dist,
        |         a.c_nationkey AS nation_a, b.c_nationkey AS nation_b,
        |         a.c_mktsegment AS seg_a, b.c_mktsegment AS seg_b,
        |         a.c_acctbal AS bal_a, b.c_acctbal AS bal_b
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |w AS (
        |  SELECT id_a, id_b,
        |    CASE WHEN dist = 0 THEN CAST(6.0 AS DOUBLE)
        |         ELSE CAST(-0.5 AS DOUBLE) END AS w_name,
        |    CASE WHEN nation_a = nation_b THEN CAST(2.0 AS DOUBLE)
        |         ELSE CAST(-0.3 AS DOUBLE) END AS w_nation,
        |    CASE WHEN seg_a = seg_b THEN CAST(1.5 AS DOUBLE)
        |         ELSE CAST(-0.4 AS DOUBLE) END AS w_segment,
        |    CASE WHEN ABS(bal_a - bal_b) < 100.0 THEN CAST(1.0 AS DOUBLE)
        |         ELSE CAST(-0.2 AS DOUBLE) END AS w_acctbal
        |  FROM p)
        |SELECT id_a, id_b, w_name, w_nation, w_segment, w_acctbal,
        |       w_name + w_nation + w_segment + w_acctbal AS score
        |FROM w ORDER BY id_a, id_b""".stripMargin,
    "ks_price_drift" ->
      """WITH b AS (
        |  SELECT l_extendedprice AS v, COUNT(*) AS nb FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01' GROUP BY 1),
        |c AS (
        |  SELECT l_extendedprice AS v, COUNT(*) AS nc FROM lineitem
        |  WHERE NOT (CAST(l_shipdate AS DATE) < DATE '1996-01-01')
        |  GROUP BY 1),
        |u AS (
        |  SELECT COALESCE(b.v, c.v) AS v, COALESCE(nb, 0) AS nb,
        |         COALESCE(nc, 0) AS nc
        |  FROM b FULL OUTER JOIN c ON b.v = c.v),
        |d AS (
        |  SELECT v,
        |    CAST(SUM(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |    CAST(SUM(nc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
        |    CAST(SUM(nb) OVER () AS BIGINT) AS tb,
        |    CAST(SUM(nc) OVER () AS BIGINT) AS tc
        |  FROM u),
        |e AS (SELECT v, ABS(cb * tc - cc * tb) AS diff, tb, tc FROM d),
        |m AS (SELECT MAX(diff) AS mx FROM e)
        |SELECT MAX(tb) AS n_base, MAX(tc) AS n_cur,
        |       CAST(MAX(diff) AS DOUBLE) /
        |         CAST(MAX(tb) * MAX(tc) AS DOUBLE) AS ks_d,
        |       CAST((SELECT MIN(v) FROM e, m WHERE e.diff = m.mx)
        |         AS DOUBLE) AS ks_at
        |FROM e""".stripMargin,
    // ValueGrid.quantize mirrored term for term (per-side min/max,
    // step = (hi-lo)/1000, LEFT edge lo + k*step, top edge clamped to
    // bucket 999), then the identical exact-KS tail
    "ks_price_drift_quantized" ->
      """WITH braw AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01'),
        |craw AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem
        |  WHERE NOT (CAST(l_shipdate AS DATE) < DATE '1996-01-01')),
        |bmm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM braw),
        |cmm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM craw),
        |bq AS (
        |  SELECT CASE WHEN bmm.lo = bmm.hi THEN v
        |    ELSE bmm.lo + LEAST(FLOOR((v - bmm.lo) /
        |           ((bmm.hi - bmm.lo) / 1000)), 999) *
        |         ((bmm.hi - bmm.lo) / 1000) END AS v
        |  FROM braw, bmm),
        |cq AS (
        |  SELECT CASE WHEN cmm.lo = cmm.hi THEN v
        |    ELSE cmm.lo + LEAST(FLOOR((v - cmm.lo) /
        |           ((cmm.hi - cmm.lo) / 1000)), 999) *
        |         ((cmm.hi - cmm.lo) / 1000) END AS v
        |  FROM craw, cmm),
        |b AS (SELECT v, COUNT(*) AS nb FROM bq GROUP BY 1),
        |c AS (SELECT v, COUNT(*) AS nc FROM cq GROUP BY 1),
        |u AS (
        |  SELECT COALESCE(b.v, c.v) AS v, COALESCE(nb, 0) AS nb,
        |         COALESCE(nc, 0) AS nc
        |  FROM b FULL OUTER JOIN c ON b.v = c.v),
        |d AS (
        |  SELECT v,
        |    CAST(SUM(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
        |    CAST(SUM(nc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cc,
        |    CAST(SUM(nb) OVER () AS BIGINT) AS tb,
        |    CAST(SUM(nc) OVER () AS BIGINT) AS tc
        |  FROM u),
        |e AS (SELECT v, ABS(cb * tc - cc * tb) AS diff, tb, tc FROM d),
        |m AS (SELECT MAX(diff) AS mx FROM e)
        |SELECT MAX(tb) AS n_base, MAX(tc) AS n_cur,
        |       CAST(MAX(diff) AS DOUBLE) /
        |         CAST(MAX(tb) * MAX(tc) AS DOUBLE) AS ks_d,
        |       CAST((SELECT MIN(v) FROM e, m WHERE e.diff = m.mx)
        |         AS DOUBLE) AS ks_at
        |FROM e""".stripMargin,
    // plain join — the Bloom prune must be invisible in the result
    "bloom_prune_join" ->
      """SELECT p_type, COUNT(*) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |                     AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "attribution_linear" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, epoch_us(ts) AS conv_us,
        |         value
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT event_id AS touch_id, user_id, epoch_us(ts) AS touch_us,
        |         event_type AS touch_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT c.conv_id, c.value, t.touch_type
        |  FROM conv c JOIN tch t USING (user_id)
        |  WHERE t.touch_us >= c.conv_us - 604800000000
        |    AND t.touch_us < c.conv_us),
        |n AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY conv_id) AS nt FROM j)
        |SELECT touch_type, COUNT(*) AS n_credited,
        |       CAST(SUM(CAST(value / nt AS DECIMAL(22,6))) AS DOUBLE)
        |         AS credit
        |FROM n GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    "attribution_position" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, epoch_us(ts) AS conv_us,
        |         value
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT event_id AS touch_id, user_id, epoch_us(ts) AS touch_us,
        |         event_type AS touch_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (
        |  SELECT c.conv_id, c.value, t.touch_type, t.touch_us, t.touch_id
        |  FROM conv c JOIN tch t USING (user_id)
        |  WHERE t.touch_us >= c.conv_us - 604800000000
        |    AND t.touch_us < c.conv_us),
        |n AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY conv_id) AS nt,
        |         ROW_NUMBER() OVER (PARTITION BY conv_id
        |                            ORDER BY touch_us, touch_id) AS rn
        |  FROM j),
        |w AS (
        |  SELECT touch_type,
        |         CASE WHEN nt = 1 THEN value
        |              WHEN nt = 2 THEN value * 0.5
        |              WHEN rn = 1 OR rn = nt THEN value * 0.4
        |              ELSE value * 0.2 / (nt - 2) END AS credit
        |  FROM n)
        |SELECT touch_type, COUNT(*) AS n_credited,
        |       CAST(SUM(CAST(credit AS DECIMAL(22,6))) AS DOUBLE)
        |         AS credit
        |FROM w GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    "copurchase_kcore" ->
      s"""WITH ${kCoreCtes(8, 3)}
         |SELECT id AS p_partkey, c AS core_deg
         |FROM d8 WHERE c >= 3 ORDER BY p_partkey""".stripMargin,
    "hits_trading" ->
      s"""WITH ${hitsCtes(3)}
         |SELECT h.id, h.hub_q, a.auth_q
         |FROM h3 h JOIN a3 a USING (id) ORDER BY h.id""".stripMargin,
    // canonical u<v edges; each triangle counted once as a<b<c, then
    // every corner credited — orientation-free, so it cross-checks the
    // degree-oriented Spark plan rather than mirroring it
    "copurchase_triangles" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |e AS (
        |  SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |t AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT a AS id FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t)
        |SELECT id AS p_partkey, COUNT(*) AS triangles
        |FROM corners GROUP BY id ORDER BY p_partkey""".stripMargin,
    "supplier_pagerank" ->
      s"""WITH ${pageRankCtes(6, tradingPairsSql)}
         |SELECT id, CAST(rank_q AS BIGINT) AS rank_q
         |FROM pr6 ORDER BY rank_q DESC, id""".stripMargin,
    "window_rank_family" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice, o_orderkey)
        |QUALIFY o_orderkey % 20 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "event_paths_top" ->
      """WITH e AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events WHERE user_id IS NOT NULL
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || t2 || '>' || t3 AS path,
        |       COUNT(*) AS n
        |FROM e WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "event_transitions" ->
      """WITH e AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events WHERE user_id IS NOT NULL),
        |tr AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |         COUNT(*) AS n
        |  FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
        |FROM tr ORDER BY from_type, to_type""".stripMargin,
    // quantile_cont == Spark percentile interpolation (the
    // price_percentiles precedent); score arithmetic mirrored
    "rfm_segments" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(DATEDIFF('day', DATE '1970-01-01',
        |                  MAX(CAST(o_orderdate AS DATE))) AS DOUBLE)
        |      AS rec_days,
        |    CAST(COUNT(*) AS DOUBLE) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS monetary
        |  FROM orders GROUP BY o_custkey),
        |t AS (
        |  SELECT quantile_cont(rec_days, 0.25) AS r25,
        |         quantile_cont(rec_days, 0.5) AS r50,
        |         quantile_cont(rec_days, 0.75) AS r75,
        |         quantile_cont(frequency, 0.25) AS f25,
        |         quantile_cont(frequency, 0.5) AS f50,
        |         quantile_cont(frequency, 0.75) AS f75,
        |         quantile_cont(monetary, 0.25) AS m25,
        |         quantile_cont(monetary, 0.5) AS m50,
        |         quantile_cont(monetary, 0.75) AS m75
        |  FROM c),
        |s AS (
        |  SELECT o_custkey,
        |    1 + CAST(rec_days > r25 AS BIGINT)
        |      + CAST(rec_days > r50 AS BIGINT)
        |      + CAST(rec_days > r75 AS BIGINT) AS r_score,
        |    1 + CAST(frequency > f25 AS BIGINT)
        |      + CAST(frequency > f50 AS BIGINT)
        |      + CAST(frequency > f75 AS BIGINT) AS f_score,
        |    1 + CAST(monetary > m25 AS BIGINT)
        |      + CAST(monetary > m50 AS BIGINT)
        |      + CAST(monetary > m75 AS BIGINT) AS m_score
        |  FROM c CROSS JOIN t)
        |SELECT o_custkey, r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM s ORDER BY o_custkey""".stripMargin,
    "price_histogram" ->
      """WITH mm AS (
        |  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |  FROM orders)
        |SELECT CAST(LEAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20)),
        |                  19.0) AS BIGINT) AS bucket,
        |       COUNT(*) AS n
        |FROM orders CROSS JOIN mm
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_topk" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
        |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q16_part_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |ANTI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000) b
        |  ON l_suppkey = b.s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "window_topk_per_user" ->
      """SELECT user_id, event_id, event_type, value, rnk FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rnk
        |  FROM events)
        |WHERE rnk <= 3
        |ORDER BY user_id, rnk""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
        |ORDER BY o_custkey""".stripMargin,
    "events_window_agg" ->
      """SELECT date_trunc('day', ts) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('day', ts), event_type
        |ORDER BY day, event_type""".stripMargin,
    "running_total" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |         OVER (PARTITION BY o_custkey
        |               ORDER BY o_orderdate, o_orderkey
        |               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "lead_lag_orders" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(o_totalprice AS DOUBLE) AS price,
        |  LAG(CAST(o_totalprice AS DOUBLE), 1) OVER w AS prev_price,
        |  LEAD(CAST(o_totalprice AS DOUBLE), 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "set_ops_customers" ->
      """WITH a95 AS (SELECT o_custkey FROM orders
        |             WHERE year(CAST(o_orderdate AS DATE)) = 1995),
        |     a96 AS (SELECT o_custkey FROM orders
        |             WHERE year(CAST(o_orderdate AS DATE)) = 1996)
        |SELECT * FROM (
        |  SELECT o_custkey, 'only_1995' AS segment
        |  FROM (SELECT o_custkey FROM a95 EXCEPT SELECT o_custkey FROM a96)
        |  UNION ALL
        |  SELECT o_custkey, 'both' AS segment
        |  FROM (SELECT o_custkey FROM a95 INTERSECT SELECT o_custkey FROM a96))
        |ORDER BY segment, o_custkey""".stripMargin,
    "exists_high_value" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "above_avg_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "pivot_event_counts" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'error') AS error,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "rollup_orders" ->
      """SELECT o_orderstatus, o_year, COUNT(*) AS n_orders FROM (
        |  SELECT o_orderstatus,
        |         year(CAST(o_orderdate AS DATE)) AS o_year
        |  FROM orders)
        |GROUP BY ROLLUP (o_orderstatus, o_year)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_year ASC NULLS FIRST""".stripMargin,
    "range_join_count" ->
      """WITH intervals AS (
        |  SELECT o_orderkey AS interval_id,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS lo
        |  FROM orders WHERE o_orderkey % 201 = 0),
        |facts AS (
        |  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ship_day
        |  FROM lineitem)
        |SELECT interval_id, COUNT(*) AS n_shipped
        |FROM facts f JOIN intervals i
        |  ON f.ship_day >= i.lo AND f.ship_day < i.lo + 7
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin,
    "cube_orders" ->
      """SELECT o_orderstatus, o_bucket, COUNT(*) AS n_orders FROM (
        |  SELECT o_orderstatus, o_orderkey % 3 AS o_bucket FROM orders)
        |GROUP BY CUBE (o_orderstatus, o_bucket)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_bucket ASC NULLS FIRST""".stripMargin,
    "grouping_sets_orders" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    // identical exact-sum arithmetic, identical double op order
    "zscore_outliers" ->
      """WITH st AS (
        |  SELECT o_orderstatus, COUNT(*) AS n,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))
        |             * CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  (o_totalprice - sx / n)
        |    / sqrt((sxx - sx * sx / n) / (n - 1)) AS z
        |FROM orders JOIN st USING (o_orderstatus)
        |WHERE ABS((o_totalprice - sx / n)
        |          / sqrt((sxx - sx * sx / n) / (n - 1))) > 1.5
        |ORDER BY o_orderkey""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250
        |)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS o_orderdate,
        |       o_totalprice, total_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "price_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "sessionize_gap" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), ids AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM ids GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "asof_join" ->
      """SELECT l.event_id, l.user_id, l.ts, r.ref_event_id, r.ref_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_id % 10 = 7) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS rts, event_id AS ref_event_id,
        |             value AS ref_value
        |      FROM events WHERE event_id % 3 = 0) r
        |  ON l.user_id = r.user_id AND r.rts <= l.ts
        |ORDER BY l.event_id""".stripMargin,
    "q14_promo_share" ->
      """SELECT 100.0
        |  * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
        |             ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
        |  AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |ORDER BY promo_share""".stripMargin,
    "asof_join_forward" ->
      """SELECT l.event_id, l.user_id, l.ts, r.ref_event_id, r.ref_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_id % 10 = 7) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS rts, event_id AS ref_event_id,
        |             value AS ref_value
        |      FROM events WHERE event_id % 3 = 0) r
        |  ON l.user_id = r.user_id AND r.rts >= l.ts
        |ORDER BY l.event_id""".stripMargin,
    "asof_join_nearest" ->
      """SELECT l.event_id, l.user_id, l.ts, r.ref_event_id, r.ref_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_id % 10 = 7) l
        |LEFT JOIN LATERAL (
        |  SELECT ref_event_id, ref_value
        |  FROM (SELECT user_id, ts AS rts, event_id AS ref_event_id,
        |               value AS ref_value
        |        FROM events WHERE event_id % 3 = 0) x
        |  WHERE x.user_id = l.user_id
        |  ORDER BY ABS(epoch_us(x.rts) - epoch_us(l.ts)), x.rts
        |  LIMIT 1) r ON true
        |ORDER BY l.event_id""".stripMargin,
    "star_join_agg" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "asof_join_tolerance" ->
      """SELECT l.event_id, l.user_id, l.ts,
        |  CASE WHEN epoch_us(l.ts) - epoch_us(r.rts) <= 600000000
        |       THEN r.ref_event_id END AS ref_event_id,
        |  CASE WHEN epoch_us(l.ts) - epoch_us(r.rts) <= 600000000
        |       THEN r.ref_value END AS ref_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_id % 10 = 7) l
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts AS rts, event_id AS ref_event_id,
        |             value AS ref_value
        |      FROM events WHERE event_id % 3 = 0) r
        |  ON l.user_id = r.user_id AND r.rts <= l.ts
        |ORDER BY l.event_id""".stripMargin,
    "mad_outliers" ->
      """WITH m AS (
        |  SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) AS med
        |  FROM orders GROUP BY o_orderstatus),
        |d AS (
        |  SELECT o.o_orderstatus, ABS(o.o_totalprice - m.med) AS dev, m.med
        |  FROM orders o JOIN m USING (o_orderstatus)),
        |mm AS (
        |  SELECT o_orderstatus, quantile_cont(dev, 0.5) AS mad
        |  FROM d GROUP BY o_orderstatus)
        |SELECT d.o_orderstatus,
        |       ANY_VALUE(d.med) AS med, ANY_VALUE(mm.mad) AS mad,
        |       CAST(SUM(CASE WHEN d.dev > mm.mad * 3.0 * 1.4826
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mm USING (o_orderstatus)
        |GROUP BY d.o_orderstatus
        |ORDER BY d.o_orderstatus""".stripMargin,
    "weekly_user_overlap_kmv" ->
      s"""WITH a AS (
        |  SELECT $eventWeekSql AS week,
        |         user_id
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT week, COUNT(*) AS n FROM a GROUP BY week),
        |ov AS (
        |  SELECT x.week, COUNT(*) AS n_returning
        |  FROM a x JOIN a y ON x.user_id = y.user_id
        |                    AND y.week = x.week + 1
        |  GROUP BY x.week)
        |SELECT w.week, w.n AS n_week, w2.n AS n_next,
        |       COALESCE(ov.n_returning, 0) AS n_returning,
        |       CAST(COALESCE(ov.n_returning, 0) AS DOUBLE)
        |         / (w.n + w2.n - COALESCE(ov.n_returning, 0)) AS jaccard
        |FROM w JOIN w w2 ON w2.week = w.week + 1
        |LEFT JOIN ov ON ov.week = w.week
        |ORDER BY w.week""".stripMargin,
    "funnel_stages" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, ts, event_type, t1,
        |    MIN(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT user_id, t1, t2,
        |    MIN(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        |      FROM s3 GROUP BY user_id)
        |SELECT COUNT(t1) AS n_signup, COUNT(t2) AS n_view_after,
        |       COUNT(t3) AS n_purchase_after
        |FROM u ORDER BY n_signup""".stripMargin,
    "cohort_retention" ->
      s"""WITH a AS (
        |  SELECT DISTINCT user_id,
        |    $eventWeekSql AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY user_id)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |       COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY c.cohort_week, a.week - c.cohort_week
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "corr_matrix" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 9) AS corr_qty_price,
        |       round(corr(l_quantity, l_discount), 9) AS corr_qty_disc,
        |       round(corr(l_extendedprice, l_discount), 9) AS corr_price_disc
        |FROM lineitem
        |ORDER BY corr_qty_price""".stripMargin,
    "mutual_information" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus),
        |w AS (
        |  SELECT l_returnflag, l_linestatus, n,
        |    CAST(SUM(n) OVER () AS BIGINT) AS total,
        |    CAST(SUM(n) OVER (PARTITION BY l_returnflag) AS BIGINT) AS nx,
        |    CAST(SUM(n) OVER (PARTITION BY l_linestatus) AS BIGINT) AS ny
        |  FROM c)
        |SELECT l_returnflag, l_linestatus, n,
        |  round((CAST(n AS DOUBLE) / total) *
        |    ln((CAST(n AS DOUBLE) / total) /
        |       ((CAST(nx AS DOUBLE) / total) * (CAST(ny AS DOUBLE) / total))),
        |    9) AS mi_term
        |FROM w
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // mirrors TimeSeries.interpolateLinear term for term (same window
    // frames, same IEEE double expression order)
    "interpolate_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE user_id IS NOT NULL),
        |w AS (
        |  SELECT user_id, event_id, tsu, v,
        |    last_value(CAST(v AS DOUBLE) IGNORE NULLS) OVER wb AS prev_v,
        |    last_value(CASE WHEN v IS NOT NULL
        |                    THEN CAST(tsu AS DOUBLE) END IGNORE NULLS)
        |      OVER wb AS prev_t,
        |    first_value(CAST(v AS DOUBLE) IGNORE NULLS) OVER wf AS next_v,
        |    first_value(CASE WHEN v IS NOT NULL
        |                     THEN CAST(tsu AS DOUBLE) END IGNORE NULLS)
        |      OVER wf AS next_t
        |  FROM e
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY tsu, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY tsu, event_id
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, event_id, tsu,
        |  CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |       WHEN prev_v IS NULL THEN next_v
        |       WHEN next_v IS NULL THEN prev_v
        |       WHEN next_t = prev_t THEN prev_v
        |       ELSE prev_v + (next_v - prev_v)
        |            * (CAST(tsu AS DOUBLE) - prev_t) / (next_t - prev_t)
        |  END AS value_filled
        |FROM w WHERE event_id % 7 = 0
        |ORDER BY user_id, tsu, event_id""".stripMargin,
    // mirrors TimeSeries.seasonalCountAnomalies: integer moments, the
    // exact zero-variance identity, the same double z expression
    "hourly_count_anomalies" ->
      """WITH b AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS season,
        |         CAST(ts AS DATE) AS instance, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT event_type, season, COUNT(*) AS n,
        |         SUM(cnt) AS sx, SUM(cnt * cnt) AS sxx
        |  FROM b GROUP BY 1, 2
        |  HAVING COUNT(*) >= 2
        |     AND COUNT(*) * SUM(cnt * cnt) <> SUM(cnt) * SUM(cnt))
        |SELECT b.event_type, b.season, b.instance, b.cnt,
        |  (b.cnt - CAST(c.sx AS DOUBLE) / c.n)
        |    / sqrt((c.sxx - CAST(c.sx AS DOUBLE) * c.sx / c.n) / (c.n - 1))
        |    AS z
        |FROM b JOIN c USING (event_type, season)
        |WHERE ABS((b.cnt - CAST(c.sx AS DOUBLE) / c.n)
        |    / sqrt((c.sxx - CAST(c.sx AS DOUBLE) * c.sx / c.n) / (c.n - 1)))
        |    >= 2.5
        |ORDER BY event_type, season, instance""".stripMargin,
    "resample_events" ->
      """WITH r AS (
        |  SELECT user_id AS r_uid, CAST(ts AS TIMESTAMP) AS r_ts,
        |         arg_max(value, event_id) AS value
        |  FROM events GROUP BY user_id, CAST(ts AS TIMESTAMP)),
        |b AS (SELECT user_id, date_trunc('day', MIN(ts)) AS d0,
        |             date_trunc('day', MAX(ts)) AS d1
        |      FROM events GROUP BY user_id),
        |g AS (SELECT user_id,
        |        unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |          CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS grid_ts
        |      FROM b)
        |SELECT g.user_id, g.grid_ts, r.value
        |FROM g ASOF LEFT JOIN r
        |  ON g.user_id = r.r_uid AND g.grid_ts >= r.r_ts
        |ORDER BY g.user_id, g.grid_ts""".stripMargin,
    "fuzzy_selfjoin_names" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "fuzzy_join_twosided" ->
      """WITH dirty AS (
        |  SELECT CAST(c_custkey + 1000000 AS BIGINT) AS d_id,
        |         substr(c_name, 1, 9) || substr(c_name, 11) AS d_name
        |  FROM customer)
        |SELECT CAST(a.c_custkey AS BIGINT) AS left_id, d.d_id AS right_id,
        |       CAST(levenshtein(a.c_name, d.d_name) AS BIGINT) AS dist
        |FROM customer a JOIN dirty d
        |  ON levenshtein(a.c_name, d.d_name) <= 1
        |ORDER BY left_id, right_id""".stripMargin,
    "fuzzy_clusters" ->
      """WITH RECURSIVE cust AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 = 0),
        |pairs AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM cust a JOIN cust b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,
    // fuzzy_clusters' recursive CTE + sample_split's md5 bucket over
    // the cluster representative (self for unclustered ids)
    "leakage_safe_split" ->
      """WITH RECURSIVE cust AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_custkey % 10 = 0),
        |pairs AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM cust a JOIN cust b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach(id, lbl) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.id),
        |cl AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),
        |k AS (
        |  SELECT c.c_custkey,
        |         COALESCE(cl.cluster, c.c_custkey) AS split_key
        |  FROM cust c LEFT JOIN cl ON c.c_custkey = cl.id)
        |SELECT c_custkey, split_key,
        |  CASE WHEN b < 80 THEN 'train'
        |       WHEN b < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT c_custkey, split_key,
        |        CAST(('0x' || substring(md5(CAST(split_key AS VARCHAR)), 1, 8))
        |             AS BIGINT) % 100 AS b
        |      FROM k)
        |ORDER BY c_custkey""".stripMargin,
    "drift_price_bands" ->
      """WITH b AS (SELECT o_totalprice AS v FROM orders
        |           WHERE CAST(o_orderdate AS DATE) < DATE '1995-06-17'),
        |c AS (SELECT o_totalprice AS v FROM orders
        |      WHERE CAST(o_orderdate AS DATE) >= DATE '1995-06-17'),
        |e AS (SELECT quantile_cont(v, 0.1) AS e1, quantile_cont(v, 0.2) AS e2,
        |             quantile_cont(v, 0.3) AS e3, quantile_cont(v, 0.4) AS e4,
        |             quantile_cont(v, 0.5) AS e5, quantile_cont(v, 0.6) AS e6,
        |             quantile_cont(v, 0.7) AS e7, quantile_cont(v, 0.8) AS e8,
        |             quantile_cont(v, 0.9) AS e9 FROM b),
        |bb AS (SELECT CASE WHEN v <= e1 THEN 0 WHEN v <= e2 THEN 1
        |                   WHEN v <= e3 THEN 2 WHEN v <= e4 THEN 3
        |                   WHEN v <= e5 THEN 4 WHEN v <= e6 THEN 5
        |                   WHEN v <= e7 THEN 6 WHEN v <= e8 THEN 7
        |                   WHEN v <= e9 THEN 8 ELSE 9 END AS bucket
        |       FROM b, e),
        |cb AS (SELECT CASE WHEN v <= e1 THEN 0 WHEN v <= e2 THEN 1
        |                   WHEN v <= e3 THEN 2 WHEN v <= e4 THEN 3
        |                   WHEN v <= e5 THEN 4 WHEN v <= e6 THEN 5
        |                   WHEN v <= e7 THEN 6 WHEN v <= e8 THEN 7
        |                   WHEN v <= e9 THEN 8 ELSE 9 END AS bucket
        |       FROM c, e),
        |bn AS (SELECT bucket, COUNT(*) AS n FROM bb GROUP BY bucket),
        |cn AS (SELECT bucket, COUNT(*) AS n FROM cb GROUP BY bucket),
        |k AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(10)),
        |j AS (SELECT k.bucket, COALESCE(bn.n, 0) AS base_n,
        |             COALESCE(cn.n, 0) AS cur_n
        |      FROM k LEFT JOIN bn ON k.bucket = bn.bucket
        |             LEFT JOIN cn ON k.bucket = cn.bucket),
        |t AS (SELECT CAST(SUM(base_n) AS DOUBLE) AS bt,
        |             CAST(SUM(cur_n) AS DOUBLE) AS ct FROM j)
        |SELECT bucket, base_n, cur_n,
        |       base_n / bt AS base_rate, cur_n / ct AS cur_rate,
        |       ROUND((GREATEST(cur_n / ct, 1e-6) - GREATEST(base_n / bt, 1e-6))
        |             * LN(GREATEST(cur_n / ct, 1e-6)
        |                  / GREATEST(base_n / bt, 1e-6)), 9) AS psi_term
        |FROM j, t ORDER BY bucket""".stripMargin,
    "drift_return_flags" ->
      """WITH b AS (SELECT l_returnflag AS category FROM lineitem
        |           WHERE CAST(l_shipdate AS DATE) < DATE '1998-06-01'),
        |c AS (SELECT l_returnflag AS category FROM lineitem
        |      WHERE CAST(l_shipdate AS DATE) >= DATE '1998-06-01'),
        |bn AS (SELECT category, COUNT(*) AS base_n FROM b GROUP BY category),
        |cn AS (SELECT category, COUNT(*) AS cur_n FROM c GROUP BY category),
        |j AS (SELECT COALESCE(bn.category, cn.category) AS category,
        |             COALESCE(base_n, 0) AS base_n,
        |             COALESCE(cur_n, 0) AS cur_n
        |      FROM bn FULL OUTER JOIN cn ON bn.category = cn.category),
        |t AS (SELECT CAST(SUM(base_n) AS DOUBLE) AS bt,
        |             CAST(SUM(cur_n) AS DOUBLE) AS ct FROM j)
        |SELECT category, base_n, cur_n,
        |       base_n / bt AS base_rate, cur_n / ct AS cur_rate,
        |       ROUND((GREATEST(cur_n / ct, 1e-6) - GREATEST(base_n / bt, 1e-6))
        |             * LN(GREATEST(cur_n / ct, 1e-6)
        |                  / GREATEST(base_n / bt, 1e-6)), 9) AS psi_term
        |FROM j, t ORDER BY category""".stripMargin,
    // DuckDB dayofweek is 0=Sunday..6; Spark is 1..7 — the +1 aligns
    "cramers_v_events" ->
      """WITH ev AS (
        |  SELECT event_type AS et,
        |         CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow
        |  FROM events),
        |cells AS (SELECT et, dow, CAST(COUNT(*) AS BIGINT) AS o
        |          FROM ev GROUP BY 1, 2),
        |spine AS (
        |  SELECT a.et, b.dow
        |  FROM (SELECT DISTINCT et FROM cells) a
        |  CROSS JOIN (SELECT DISTINCT dow FROM cells) b),
        |full_t AS (
        |  SELECT s.et, s.dow, COALESCE(c.o, 0) AS o
        |  FROM spine s LEFT JOIN cells c
        |    ON s.et = c.et AND s.dow = c.dow),
        |m AS (
        |  SELECT *,
        |    CAST(SUM(o) OVER (PARTITION BY et) AS BIGINT) AS rt,
        |    CAST(SUM(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM full_t),
        |terms AS (
        |  SELECT *,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS e
        |  FROM m),
        |agg AS (
        |  SELECT MAX(n) AS n,
        |         CAST(COUNT(DISTINCT et) AS BIGINT) AS r,
        |         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c,
        |         CAST(SUM(CAST(round(
        |             (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
        |               / e, 6) AS DECIMAL(28,12))) AS DOUBLE) AS chi2
        |  FROM terms)
        |SELECT n, r, c, chi2,
        |       round(sqrt(chi2 / (CAST(n AS DOUBLE)
        |         * CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 9) AS cramers_v
        |FROM agg ORDER BY n""".stripMargin,
    "degree_assortativity" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |e AS (
        |  SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |deg AS (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |stubs AS (
        |  SELECT s.u, s.v, du.deg AS dx, dv.deg AS dy
        |  FROM (SELECT u, v FROM e UNION ALL SELECT v, u FROM e) s
        |  JOIN deg du ON s.u = du.id
        |  JOIN deg dv ON s.v = dv.id),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |         CAST(SUM(dx) AS DECIMAL(19,0)) AS sx,
        |         CAST(SUM(dy) AS DECIMAL(19,0)) AS sy,
        |         CAST(SUM(dx * dy) AS DECIMAL(19,0)) AS sxy,
        |         CAST(SUM(dx * dx) AS DECIMAL(19,0)) AS sxx
        |  FROM stubs)
        |SELECT m,
        |       CAST(CAST(m AS DECIMAL(19,0)) * sxy - sx * sy AS DOUBLE)
        |         / CAST(CAST(m AS DECIMAL(19,0)) * sxx
        |                - sx * sx AS DOUBLE) AS assortativity
        |FROM a ORDER BY m""".stripMargin,
    "pareto_price_size" ->
      """WITH c AS (
        |  SELECT p_partkey, p_retailprice, -p_size AS neg_size, p_size
        |  FROM part
        |  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
        |b AS (
        |  SELECT p_retailprice AS x, MIN(neg_size) AS best
        |  FROM c GROUP BY 1),
        |f AS (
        |  SELECT x, best, MIN(best) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM b),
        |fx AS (SELECT x, best FROM f WHERE prev IS NULL OR best < prev)
        |SELECT c.p_partkey, c.p_retailprice, c.p_size
        |FROM c JOIN fx ON c.p_retailprice = fx.x AND c.neg_size = fx.best
        |ORDER BY c.p_retailprice, c.p_partkey""".stripMargin,
    "copurchase_clustering" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |e AS (
        |  SELECT DISTINCT x.pk AS u, y.pk AS v
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |deg AS (
        |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |t AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (
        |  SELECT a AS id FROM t
        |  UNION ALL SELECT b FROM t
        |  UNION ALL SELECT c FROM t),
        |tri AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS triangles
        |        FROM corners GROUP BY 1)
        |SELECT d.id AS p_partkey, d.deg,
        |       COALESCE(tri.triangles, 0) AS triangles,
        |       CAST(COALESCE(tri.triangles, 0) * 2 AS DOUBLE)
        |         / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS coeff
        |FROM deg d LEFT JOIN tri ON d.id = tri.id
        |WHERE d.deg >= 2 ORDER BY p_partkey""".stripMargin,
    "ewma_event_volume" -> {
      val num = (0 to 7).map(k =>
        s"COALESCE(LAG(n, $k) OVER w, 0) * ${1L << (7 - k)}")
        .mkString(" + ")
      val den = (0 to 7).map(k =>
        s"CASE WHEN LAG(n, $k) OVER w IS NOT NULL" +
          s" THEN ${1L << (7 - k)} ELSE 0 END").mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, day, n,
         |       CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS smooth
         |FROM daily
         |WINDOW w AS (PARTITION BY event_type ORDER BY day)
         |ORDER BY event_type, day""".stripMargin
    },
    "survival_retention" ->
      """WITH pu AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
        |         MAX(CAST(ts AS DATE)) AS d1
        |  FROM events WHERE event_id % 20 = 0 GROUP BY 1),
        |s AS (
        |  SELECT CAST(d1 - d0 AS BIGINT) AS duration,
        |         CASE WHEN d1 <= (SELECT MAX(d1) FROM pu) - 3
        |              THEN 1 ELSE 0 END AS ev
        |  FROM pu),
        |g AS (
        |  SELECT duration, CAST(COUNT(*) AS BIGINT) AS n_at,
        |         CAST(SUM(ev) AS BIGINT) AS n_events
        |  FROM s GROUP BY 1),
        |r AS (
        |  SELECT *, CAST(SUM(n_at) OVER (ORDER BY duration DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_risk
        |  FROM g),
        |h AS (
        |  SELECT *,
        |    CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
        |    MAX(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
        |      OVER (ORDER BY duration
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS dead
        |  FROM r),
        |l AS (
        |  SELECT *, CAST(SUM(CAST(
        |      CASE WHEN n_events < n_risk
        |           THEN round(ln(1.0 - hazard), 9) ELSE 0.0 END
        |      AS DECIMAL(28,12))) OVER (ORDER BY duration
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS ls
        |  FROM h)
        |SELECT duration, n_risk, n_events,
        |       CAST(n_at - n_events AS BIGINT) AS n_censored, hazard,
        |       CASE WHEN dead = 0 THEN ls END AS log_surv,
        |       CASE WHEN dead = 1 THEN 0.0
        |            ELSE round(exp(ls), 9) END AS surv
        |FROM l ORDER BY duration""".stripMargin,
    "js_drift_event_mix" ->
      """WITH bn AS (
        |  SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS base_n
        |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-16'
        |  GROUP BY 1),
        |cn AS (
        |  SELECT event_type AS category, CAST(COUNT(*) AS BIGINT) AS cur_n
        |  FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-16'
        |  GROUP BY 1),
        |j AS (SELECT COALESCE(bn.category, cn.category) AS category,
        |             COALESCE(base_n, 0) AS base_n,
        |             COALESCE(cur_n, 0) AS cur_n
        |      FROM bn FULL OUTER JOIN cn ON bn.category = cn.category),
        |t AS (SELECT CAST(SUM(base_n) AS DOUBLE) AS bt,
        |             CAST(SUM(cur_n) AS DOUBLE) AS ct FROM j),
        |r AS (SELECT j.*, base_n / bt AS base_rate,
        |             cur_n / ct AS cur_rate
        |      FROM j, t)
        |SELECT category, base_n, cur_n, base_rate, cur_rate,
        |       ROUND(
        |         CASE WHEN base_n > 0 THEN
        |           0.5 * base_rate
        |             * LN(base_rate / ((base_rate + cur_rate) / 2.0))
        |         ELSE 0.0 END
        |         + CASE WHEN cur_n > 0 THEN
        |             0.5 * cur_rate
        |               * LN(cur_rate / ((base_rate + cur_rate) / 2.0))
        |           ELSE 0.0 END, 9) AS jsd_term
        |FROM r ORDER BY category""".stripMargin,
    "benford_price_audit" ->
      """WITH u AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS c
        |  FROM orders),
        |d AS (
        |  SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
        |           AS digit
        |  FROM u WHERE c > 0),
        |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM d GROUP BY 1),
        |spine AS (SELECT CAST(UNNEST(range(1, 10)) AS INTEGER) AS digit),
        |f AS (SELECT s.digit, COALESCE(g.n, 0) AS n
        |      FROM spine s LEFT JOIN g USING (digit)),
        |w AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS n_total,
        |             ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 9)
        |               AS p_exp
        |      FROM f)
        |SELECT digit, n, n_total,
        |       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS p_obs,
        |       p_exp,
        |       ROUND((CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) * p_exp)
        |             * (CAST(n AS DOUBLE) - CAST(n_total AS DOUBLE) * p_exp)
        |             / (CAST(n_total AS DOUBLE) * p_exp), 6) AS chi_term
        |FROM w ORDER BY digit""".stripMargin,
    "revenue_concentration" ->
      """WITH rev AS (
        |  SELECT c_mktsegment, c_custkey,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |              AS DECIMAL(18,2)) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY c_mktsegment
        |      ORDER BY rev, c_custkey) AS BIGINT) AS i
        |  FROM rev),
        |a AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |         SUM(rev) AS tot,
        |         SUM(i * rev) AS irev,
        |         SUM(rev * rev) AS rev2
        |  FROM rk GROUP BY 1)
        |SELECT c_mktsegment, n_cust,
        |       CAST(tot AS DOUBLE) AS total_rev,
        |       ROUND(2.0 * CAST(irev AS DOUBLE)
        |         / (CAST(n_cust AS DOUBLE) * CAST(tot AS DOUBLE))
        |         - CAST(n_cust + 1 AS DOUBLE) / CAST(n_cust AS DOUBLE),
        |         12) AS gini,
        |       ROUND(CAST(rev2 AS DOUBLE)
        |         / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 12) AS hhi
        |FROM a ORDER BY c_mktsegment""".stripMargin,
    "winsorize_prices" ->
      """WITH band AS (
        |  SELECT o_orderstatus,
        |         quantile_cont(o_totalprice, 0.05) AS lo,
        |         quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY o_orderstatus),
        |w AS (
        |  SELECT o.o_orderstatus,
        |         LEAST(GREATEST(o.o_totalprice, b.lo), b.hi) AS w_price
        |  FROM orders o JOIN band b USING (o_orderstatus))
        |SELECT o_orderstatus, COUNT(*) AS n,
        |       MIN(w_price) AS min_w, MAX(w_price) AS max_w
        |FROM w GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "interval_overlap_count" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_id,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_lo
        |  FROM orders WHERE o_orderkey % 201 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_id,
        |         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS b_lo
        |  FROM orders WHERE o_orderkey % 157 = 0)
        |SELECT a_id, COUNT(*) AS n_overlap
        |FROM a JOIN b ON a_lo < b_lo + 5 AND b_lo < a_lo + 7
        |GROUP BY a_id ORDER BY a_id""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1995-07-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1995-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND CAST(l_shipdate AS DATE) >
        |                    CAST(o_orderdate AS DATE) + 60)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_11', 'NATION_20')
        |    AND n2.n_name IN ('NATION_11', 'NATION_20')
        |    AND n1.n_name <> n2.n_name
        |    AND CAST(l_shipdate AS DATE)
        |        BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |            AS DOUBLE) / 7.0 AS avg_yearly
        |FROM (
        |  SELECT l_extendedprice,
        |         CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |           OVER (PARTITION BY l_partkey) AS sum_qty,
        |         COUNT(*) OVER (PARTITION BY l_partkey) AS n_li
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12')
        |WHERE qty * n_li * 5 < sum_qty
        |ORDER BY avg_yearly""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |            AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 20 AND 30)
        |ORDER BY revenue""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount
        |            AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |ORDER BY revenue""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(22,6))) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1995-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_20'
        |           THEN CAST(volume AS DECIMAL(22,6))
        |           ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(volume AS DECIMAL(22,6))) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
        |         n2.n_name AS supp_nation,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |    AND CAST(o_orderdate AS DATE)
        |        BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q22_inactive_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |ANTI JOIN (SELECT o_custkey FROM orders
        |           WHERE o_totalprice > 400000) o
        |  ON c_custkey = o.o_custkey
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |                               AS DOUBLE) / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "rolling_revenue_7d" ->
      """SELECT o_custkey, o_orderkey, epoch_day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY epoch_day
        |          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS rolling_7d
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |             AS BIGINT) AS epoch_day
        |      FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_late_lines" ->
      """SELECT l_linestatus,
        |  COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |    AS high_count,
        |  COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
        |    AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH per AS (
        |  SELECT l_orderkey, l_suppkey,
        |         MAX(CASE WHEN CAST(l_shipdate AS DATE) >
        |                       CAST(o_orderdate AS DATE) + 85
        |                  THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY l_orderkey, l_suppkey),
        |win AS (
        |  SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |         SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
        |  FROM per)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM win JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND n_supp > 1 AND n_late = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey AS p_partkey, s_suppkey, s_name,
        |         MIN(l_extendedprice) AS price
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY l_partkey, s_suppkey, s_name)
        |SELECT p_partkey, s_suppkey, s_name, price FROM (
        |  SELECT *, MIN(price) OVER (PARTITION BY p_partkey) AS min_price
        |  FROM offers)
        |WHERE price = min_price
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q2_min_cost_supplier_ps" -> (partsuppSql +
      """,
        |euro AS (
        |  SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        |  FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |best AS (
        |  SELECT *, MIN(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
        |  FROM euro)
        |SELECT p_partkey, s_name, n_name, s_acctbal,
        |       CAST(ps_supplycost AS DOUBLE) AS supply_cost
        |FROM best JOIN part ON p_partkey = ps_partkey
        |WHERE ps_supplycost = min_cost AND p_type = 'ECONOMY' AND p_size < 25
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin),
    "q11_important_parts_ps" -> (partsuppSql +
      """,
        |natps AS (
        |  SELECT ps_partkey,
        |         CAST(ps_supplycost * CAST(ps_availqty AS DECIMAL(6,0)) AS DECIMAL(22,2)) AS v
        |  FROM partsupp
        |  JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_18'),
        |val AS (SELECT ps_partkey, SUM(v) AS value FROM natps GROUP BY ps_partkey)
        |SELECT ps_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
        |FROM (SELECT *, SUM(value) OVER () AS total FROM val)
        |WHERE CAST(value AS DOUBLE) * 1000 > CAST(total AS DOUBLE)
        |ORDER BY part_value DESC, p_partkey""".stripMargin),
    "q9_product_profit" -> (partsuppSql +
      """
        |SELECT n_name AS nation, EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)) -
        |           CAST(ps_supplycost * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(22,6))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY nation, o_year DESC""".stripMargin),
    "q20_promo_suppliers" -> (partsuppSql +
      """,
        |ship AS (
        |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
        |  GROUP BY l_partkey, l_suppkey),
        |picks AS (
        |  SELECT DISTINCT ps_suppkey FROM partsupp
        |  JOIN part ON p_partkey = ps_partkey
        |  JOIN ship ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |  WHERE p_name LIKE 'red%' AND ps_availqty * 2 > qty)
        |SELECT s_suppkey, s_name FROM supplier
        |SEMI JOIN picks ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_18'
        |ORDER BY s_suppkey""".stripMargin),
    "q11_important_parts" ->
      """WITH val AS (
        |  SELECT l_partkey AS p_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_quantity AS DECIMAL(18,2))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_20'
        |  GROUP BY l_partkey)
        |SELECT p_partkey, CAST(v AS DOUBLE) AS part_value FROM (
        |  SELECT *, SUM(v) OVER () AS total FROM val)
        |WHERE CAST(v AS DOUBLE) * 1000 > CAST(total AS DOUBLE)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,

    // mirrors RankStats.spearmanFromCells: doubled tie-averaged ranks
    // from the contingency-cell marginals, DECIMAL moment sums, the
    // Pearson-on-ranks closed form in double
    "spearman_qty_discount" ->
      """WITH cells AS (
        |  SELECT l_returnflag, l_quantity AS qty, l_discount AS disc,
        |         COUNT(*) AS cn
        |  FROM lineitem GROUP BY 1, 2, 3),
        |gx AS (SELECT l_returnflag, qty, SUM(cn) AS tx
        |       FROM cells GROUP BY 1, 2),
        |rx AS (
        |  SELECT l_returnflag, qty,
        |    2 * COALESCE(SUM(tx) OVER (PARTITION BY l_returnflag
        |          ORDER BY qty
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + tx + 1 AS r2x
        |  FROM gx),
        |gy AS (SELECT l_returnflag, disc, SUM(cn) AS ty
        |       FROM cells GROUP BY 1, 2),
        |ry AS (
        |  SELECT l_returnflag, disc,
        |    2 * COALESCE(SUM(ty) OVER (PARTITION BY l_returnflag
        |          ORDER BY disc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + ty + 1 AS r2y
        |  FROM gy),
        |a AS (
        |  -- every factor at DECIMAL(19,0): the Spark side's headroom
        |  -- (r2 = 2N+t+1 exceeds 1e12 beyond ~5e11 rows per group —
        |  -- narrower casts made the ORACLE the scale ceiling; r9
        |  -- ADVICE)
        |  SELECT c.l_returnflag,
        |    SUM(CAST(c.cn AS DECIMAL(38,0))) AS s1,
        |    SUM(CAST(c.cn AS DECIMAL(19,0)) * CAST(rx.r2x AS DECIMAL(19,0)))
        |      AS sx,
        |    SUM(CAST(c.cn AS DECIMAL(19,0)) * CAST(ry.r2y AS DECIMAL(19,0)))
        |      AS sy,
        |    SUM(CAST(c.cn AS DECIMAL(19,0)) * CAST(rx.r2x AS DECIMAL(19,0))
        |        * CAST(ry.r2y AS DECIMAL(19,0))) AS sxy,
        |    SUM(CAST(c.cn AS DECIMAL(19,0)) * CAST(rx.r2x AS DECIMAL(19,0))
        |        * CAST(rx.r2x AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(c.cn AS DECIMAL(19,0)) * CAST(ry.r2y AS DECIMAL(19,0))
        |        * CAST(ry.r2y AS DECIMAL(19,0))) AS syy
        |  FROM cells c
        |  JOIN rx ON c.l_returnflag = rx.l_returnflag AND c.qty = rx.qty
        |  JOIN ry ON c.l_returnflag = ry.l_returnflag AND c.disc = ry.disc
        |  GROUP BY 1)
        |SELECT l_returnflag, CAST(s1 AS BIGINT) AS n,
        |  round((CAST(s1 AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(s1 AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS rho
        |FROM a
        |ORDER BY l_returnflag""".stripMargin,

    // mirrors RankStats.mannWhitney: grouped distinct-value table,
    // doubled ranks, DECIMAL rank/tie sums, tie-corrected z in double
    "mann_whitney_value" ->
      """WITH f AS (
        |  SELECT value AS v, event_type FROM events
        |  WHERE event_type IN ('purchase', 'view')
        |    AND value IS NOT NULL),
        |cells AS (
        |  SELECT v,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END) AS nb
        |  FROM f GROUP BY v),
        |r AS (
        |  SELECT na, nb, na + nb AS t,
        |    2 * COALESCE(SUM(na + nb) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (na + nb) + 1 AS r2
        |  FROM cells),
        |a AS (
        |  -- DECIMAL(19,0) factors: the Spark dprod headroom (r9
        |  -- ADVICE — narrower casts made the oracle the scale
        |  -- ceiling); engines clamp the product at DECIMAL(38,0)
        |  SELECT SUM(CAST(na AS DECIMAL(38,0))) AS n1,
        |    SUM(CAST(nb AS DECIMAL(38,0))) AS n2,
        |    SUM(CAST(na AS DECIMAL(19,0)) * CAST(r2 AS DECIMAL(19,0)))
        |      AS r1_2,
        |    SUM(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
        |        * CAST(t AS DECIMAL(19,0))) AS t3,
        |    SUM(CAST(t AS DECIMAL(38,0))) AS t1
        |  FROM r)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |  (CAST(r1_2 AS DOUBLE)
        |    - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0 AS u1,
        |  round(CAST(r1_2 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)), 9)
        |    AS r1_mean,
        |  round(((CAST(r1_2 AS DOUBLE)
        |          - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1.0)) / 2.0
        |         - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
        |      * (((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0)
        |         - (CAST(t3 AS DOUBLE) - CAST(t1 AS DOUBLE))
        |           / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
        |              * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0)))),
        |    9) AS z
        |FROM a
        |ORDER BY n1""".stripMargin,

    // mirrors RankStats.entropyProfile: exact cell counts, p·ln p
    // rounded per cell, DECIMAL-summed; norm divides the UNROUNDED
    // entropy by ln(k)
    "hourly_entropy_profile" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
        |         COUNT(*) AS cn
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, cn,
        |    SUM(cn) OVER (PARTITION BY event_type) AS n,
        |    COUNT(*) OVER (PARTITION BY event_type) AS k
        |  FROM cells),
        |t2 AS (
        |  SELECT event_type, n, k,
        |    CAST(round((CAST(cn AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(cn AS DOUBLE) / CAST(n AS DOUBLE)), 9)
        |      AS DECIMAL(28,12)) AS term
        |  FROM w)
        |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  round(CAST(-SUM(term) AS DOUBLE), 9) AS entropy,
        |  round(CASE WHEN k > 1
        |    THEN CAST(-SUM(term) AS DOUBLE) / ln(CAST(k AS DOUBLE))
        |    ELSE 0.0 END, 9) AS norm_entropy
        |FROM t2 GROUP BY event_type, n, k
        |ORDER BY event_type""".stripMargin,

    // mirrors discount_elasticity: per-cell count-weighted log terms
    // multiplied in double, rounded, DECIMAL-summed; OLS closed form
    "discount_elasticity" ->
      """WITH cells AS (
        |  SELECT p_brand, l_discount AS disc, l_quantity AS qty,
        |         COUNT(*) AS cn
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3),
        |t2 AS (
        |  SELECT p_brand, cn,
        |    round(ln(1.0 - disc), 9) AS x,
        |    round(ln(qty), 9) AS y
        |  FROM cells),
        |a AS (
        |  SELECT p_brand, SUM(cn) AS n,
        |    SUM(CAST(round(cn * x, 6) AS DECIMAL(28,12))) AS sx,
        |    SUM(CAST(round(cn * y, 6) AS DECIMAL(28,12))) AS sy,
        |    SUM(CAST(round(cn * x * y, 6) AS DECIMAL(28,12))) AS sxy,
        |    SUM(CAST(round(cn * x * x, 6) AS DECIMAL(28,12))) AS sxx
        |  FROM t2 GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS elasticity,
        |  round((CAST(sy AS DOUBLE)
        |     - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |       * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
        |FROM a
        |ORDER BY p_brand""".stripMargin)
}
