package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Gold-layer analytic data marts — the reference's "Gold Layer (Analytics)"
  * box (finnoio/jobhouse docs/Pipeline Architecture.mermaid) re-expressed as
  * declarative Spark plans over the star schema.
  *
  * Design notes (100 TB posture):
  *  - Every query is a pure DataFrame plan: filters/projections reach the
  *    parquet scan (PushedFilters), Catalyst reorders joins, AQE re-plans.
  *  - Dimension tables (region/nation/supplier/part/customer-side lookups)
  *    are broadcast-joined; only fact-fact joins shuffle.
  *  - Double aggregates are rounded on output (and identically in the DuckDB
  *    oracles) so the correctness hash is stable across summation orders.
  *  - Top-k always carries a unique tiebreaker so LIMIT is deterministic.
  */
object Marts {
  import Tables._

  /** TPC-H Q1-style pricing summary: single scan, map-side partial agg. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** Selective filter + narrow projection; both must reach the scan. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_returnflag") === "R" && col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate").cast("date").as("ship_date"))

  /** TPC-H Q3-style: dim-filtered 3-way join, agg, deterministic top-10. */
  def q03TopUnshipped(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1997-01-01"))
    val l = lineitem(s, d).filter(col("l_shipdate") > lit("1997-01-01"))
    broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style EXISTS: left-semi join with a cross-side predicate. */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1995-04-01"))
    o.join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q5-style star join: broadcast dims, shuffle the fact chain. */
  def q05RegionalRevenue(s: SparkSession, d: String): DataFrame = {
    val dims = broadcast(
      region(s, d).filter(col("r_name") === "ASIA")
        .join(nation(s, d), col("r_regionkey") === col("n_regionkey")))
    customer(s, d)
      .join(dims, col("c_nationkey") === col("n_nationkey"))
      .join(orders(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1997-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** TPC-H Q6-style: scan-local agg, zero shuffles beyond the final reduce. */
  def q06RevenueDelta(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** Ranked window per segment (high-cardinality partition key). */
  def q07WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    customer(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "rk")
  }

  /** Running total per customer (rows-unbounded window). */
  def q08RunningTotal(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(w), 2).as("running_spend"))
  }

  /** Exact distinct aggregation (expand + two-phase agg under the hood). */
  def q09DistinctAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("distinct_parts"),
        countDistinct("l_suppkey").as("distinct_supps"))

  /** Global top-k → TakeOrderedAndProject, O(k) per partition. */
  def q10TopkOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("order_date"))

  /** Pivot-style conditional aggregation in one pass. */
  def q11ConditionalAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_quantity") > 25, col("l_extendedprice")).otherwise(0.0)), 2).as("rev_bulk"),
        round(sum(when(col("l_quantity") <= 25, col("l_extendedprice")).otherwise(0.0)), 2).as("rev_small"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("n_bulk"))

  /** Union of heterogeneous branches aligned by name. */
  def q12UnionAll(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
    val p = supplier(s, d).filter(col("s_acctbal") > 9000)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"), lit("supplier").as("kind"))
    c.unionByName(p)
  }

  /** Left-outer join preserving zero-order customers. */
  def q13OuterJoinCount(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("num_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spend"))

  /** NOT EXISTS → left-anti join (customers who never placed a big order). */
  def q14AntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** IN-subquery → left-semi join. */
  def q15SemiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")

  /** Scalar subquery: broadcast a 1-row aggregate against the scan. */
  def q16ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val ap = part(s, d).agg(avg("p_retailprice").as("ap"))
    part(s, d).crossJoin(broadcast(ap))
      .filter(col("p_retailprice") > col("ap"))
      .select("p_partkey", "p_name", "p_retailprice")
  }

  /** Post-aggregation filter (HAVING). */
  def q17Having(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_partkey")
      .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("cnt") > 35)

  /** Hierarchical subtotals via ROLLUP (expand-based grouping sets). */
  def q18Rollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("cnt"))

  /** Codegen'd string kernel: LIKE / substring / regexp / case mapping. */
  def q19StringFuncs(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").contains("g"))
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 4).as("prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("slug"))

  /** Monthly truncation mart. */
  def q20DateTrunc(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round(sum("o_totalprice"), 2).as("monthly_rev"), count(lit(1)).as("num_orders"))

  /** q98: the planned-skew salted join, ORACLED — lineitem (the skewed
    * fact) salted across 8 sub-keys against the replicated orders side,
    * then priority revenue. The salt must be invisible in the answer;
    * hash-matching the plain-join DuckDB oracle proves it row-for-row —
    * upgrading [[SkewJoin]] from spec-only to oracle-verified.
    */
  def q98SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val large = lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
      col("l_extendedprice"), col("l_discount"))
    val small = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedJoin(large, small, "o_orderkey", salt = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
  }

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * quantile_cont). The approximate twin is q44.
    */
  def q29Percentile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))

  /** Full CUBE grouping-sets lattice. */
  def q43Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d).cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))

  /** q139: explicit GROUPING SETS — the general form q18's ROLLUP and
    * q43's CUBE are shorthands for, here selecting exactly the grain
    * combinations a mart needs ((status, priority), (status), ()) and
    * SKIPPING the (priority)-only grain a CUBE would also pay for. One
    * Expand + one aggregation, same as rollup/cube — Spark plans all
    * three through the identical Expand machinery, so the scale story
    * is q43's: output grows with the SELECTED grains only.
    */
  def q139GroupingSets(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderstatus), ())
    """)
  }

  /** HLL-sketch approximate distinct — the 100 TB path where exact
    * distinct (q09) shuffles too much. Sketch values are implementation-
    * specific (Spark HLL++ vs DuckDB HLL never hash-match), so the
    * tolerance check rides INSIDE the query (r14, closing the r13
    * verdict's item 3): each group emits the exact distinct count
    * (cross-engine hash-matched against DuckDB) plus a boolean asserting
    * the sketch landed within 3×rsd of it — the oracle states that
    * boolean as literal TRUE, so a sketch drifting out of its documented
    * bound breaks the hash gate loudly. rsd = 0.02, bound = 0.06 (HLL
    * error ≈ Gaussian with σ = rsd; deterministic per dataset — no
    * randomness in the sketch — so the gate is stable, not flaky).
    */
  def q44ApproxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey", 0.02).as("__approx"),
        countDistinct("l_partkey").as("n_parts_exact"))
      .select(col("l_returnflag"), col("n_parts_exact"),
        (abs(col("__approx") - col("n_parts_exact")) <=
          col("n_parts_exact") * 0.06).as("within_3rsd"))

  /** The PRODUCTION q44: sketch only. The oracled [[q44ApproxDistinct]]
    * is a GATE INSTRUMENT — it runs the exact distinct beside the sketch
    * to state the tolerance, which is precisely the shuffle the sketch
    * exists to avoid; deploy and bench THIS form (`q44prod`).
    */
  def q44Prod(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey", 0.02).as("n_parts_approx"))

  /** Approximate quantiles via percentile_approx (Greenwald-Khanna
    * QuantileSummaries: deterministic rank error ≤ n/accuracy) — bounded
    * mergeable state vs q29's exact sort-based percentile; sketch
    * outputs are accuracy-parameter-specific → rows-only check + an
    * error-bound spec against the exact values.
    */
  def q63ApproxQuantile(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      // BOTH percentiles from ONE sketch: the multi-percentage form
      // builds a single summary per group, where two scalar calls build
      // and map-side-merge two of them. r14 (the r13 verdict's item 3):
      // the oracle gate moved from rows-only to checked tolerance — the
      // exact percentiles hash-match DuckDB's quantile_cont (the q29
      // pattern, 4-dp rounded), and the GK outputs are asserted within a
      // 1% relative band of them in-query, stated as literal TRUE on the
      // oracle side. GK's guarantee is rank error ≤ n/accuracy = 1e-4·n
      // (~2 rows per group at sf0.01); on this dense price distribution
      // that is far inside 1% of value, and the sketch is deterministic,
      // so the gate is stable.
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("qs"),
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ex"))
      .select(col("l_returnflag"),
        round(col("ex").getItem(0), 4).as("median_exact"),
        round(col("ex").getItem(1), 4).as("p90_exact"),
        (abs(col("qs").getItem(0) - col("ex").getItem(0)) <=
          col("ex").getItem(0) * 0.01).as("median_ok"),
        (abs(col("qs").getItem(1) - col("ex").getItem(1)) <=
          col("ex").getItem(1) * 0.01).as("p90_ok"))

  /** The PRODUCTION q63: one GK sketch per group, nothing exact. The
    * oracled [[q63ApproxQuantile]] is a GATE INSTRUMENT — it buffers
    * every group value for the exact percentile it compares against,
    * which is the unbounded state the sketch exists to avoid; deploy and
    * bench THIS form (`q63prod`).
    */
  def q63Prod(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("median_approx"),
        col("qs").getItem(1).as("p90_approx"))

  /** Pivot (wide-format mart): status columns from row values. */
  def q47Pivot(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum("l_quantity"), 2))

  /** Deterministic arg-max/arg-min (r17): bare max_by/min_by leave ties
    * engine-arbitrary — invisible until the sf1.0 derived gate minted
    * 10-way exact acctbal ties and Spark and DuckDB picked different
    * customers. The struct-extremum form pins the tie-break to the
    * SMALLEST custkey on both extremes, on both engines (the k-means
    * seed discipline: every argmax in an oracled query carries an
    * explicit total order).
    */
  def q48Argmax(s: SparkSession, d: String): DataFrame =
    customer(s, d).groupBy("c_mktsegment")
      .agg(
        (-max(struct(col("c_acctbal").as("a"), (-col("c_custkey")).as("k")))
          .getField("k")).as("richest_cust"),
        min(struct(col("c_acctbal").as("a"), col("c_custkey").as("k")))
          .getField("k").as("poorest_cust"),
        round(max("c_acctbal"), 2).as("max_bal"))

  /** Statistical aggregates: correlation + sample covariance. */
  def q49Corr(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).groupBy("l_returnflag")
      .agg(round(corr("l_quantity", "l_extendedprice"), 4).as("qty_price_corr"),
        round(covar_samp("l_quantity", "l_discount"), 4).as("qty_disc_covar"))

  /** Window-function suite: sliding-frame moving sum, dense_rank,
    * ntile quartiles — one shuffle on the partition key serves all three.
    */
  def q55WindowSuite(s: SparkSession, d: String): DataFrame = {
    val seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val frame = seq.rowsBetween(-2, Window.currentRow)
    val byPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      round(sum("o_totalprice").over(frame), 2).as("moving_sum3"),
      dense_rank().over(byPrice).cast("long").as("price_rank"),
      ntile(4).over(byPrice).cast("long").as("price_quartile"))
  }

  /** Trailing 7-day revenue per customer: a RANGE frame over event-time
    * (value-based, so all same-day peers join the frame — a ROWS frame
    * cannot express this). Money sums go through integer cents: a
    * windowed double sum's floating-point association differs between
    * engines (incremental vs segment-tree), so rounding the double would
    * flake on half-boundary values, while integer sums are exact
    * everywhere.
    */
  def q73TrailingWindow(s: SparkSession, d: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy(col("day_n")).rangeBetween(-6, 0)
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), day.cast("long").as("day_n"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(col("o_custkey"), col("o_orderkey"), col("day_n"),
        sum("cents").over(w).as("trailing_7d_cents"))
  }

  /** INTERSECT/EXCEPT set operators: customers active in BOTH the first
    * two months (repeat) vs only the first (lapsed). Set semantics are
    * distinct-based on both engines; each set op plans as an aggregate-
    * style shuffle on the full row — no join needed.
    */
  def q75SetOps(s: SparkSession, d: String): DataFrame = {
    // the month tag is a DERIVED column, so filtering on it alone reaches
    // the scan as a residual over ALL rows; the redundant raw-date range
    // is the predicate parquet can actually push down and row-group skip —
    // each of the set-op tree's scans then reads 2 months, not the table
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-03-01"))
      .withColumn("m", date_format(col("o_orderdate").cast("date"), "yyyy-MM"))
    def month(m: String) = o.filter(col("m") === m).select("o_custkey")
    val repeat = month("1995-01").intersect(month("1995-02"))
      .withColumn("cohort", lit("repeat"))
    val lapsed = month("1995-01").except(month("1995-02"))
      .withColumn("cohort", lit("lapsed"))
    repeat.unionByName(lapsed)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_set_ops" -> q75SetOps _,
    "q73_trailing_window" -> q73TrailingWindow _,
    "q55_window_suite" -> q55WindowSuite _,
    "q47_pivot" -> q47Pivot _,
    "q48_argmax" -> q48Argmax _,
    "q49_corr" -> q49Corr _,
    "q98_salted_join" -> q98SaltedJoin _,
    "q29_percentile" -> q29Percentile _,
    "q63_approx_quantile" -> q63ApproxQuantile _,
    "q43_cube" -> q43Cube _,
    "q139_grouping_sets" -> q139GroupingSets _,
    "q44_approx_distinct" -> q44ApproxDistinct _,
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_filter_project" -> q02FilterProject _,
    "q03_top_unshipped" -> q03TopUnshipped _,
    "q04_order_priority" -> q04OrderPriority _,
    "q05_regional_revenue" -> q05RegionalRevenue _,
    "q06_revenue_delta" -> q06RevenueDelta _,
    "q07_window_rank" -> q07WindowRank _,
    "q08_running_total" -> q08RunningTotal _,
    "q09_distinct_agg" -> q09DistinctAgg _,
    "q10_topk_orders" -> q10TopkOrders _,
    "q11_conditional_agg" -> q11ConditionalAgg _,
    "q12_union_all" -> q12UnionAll _,
    "q13_outer_join_count" -> q13OuterJoinCount _,
    "q14_anti_join" -> q14AntiJoin _,
    "q15_semi_join" -> q15SemiJoin _,
    "q16_scalar_subquery" -> q16ScalarSubquery _,
    "q17_having" -> q17Having _,
    "q18_rollup" -> q18Rollup _,
    "q19_string_funcs" -> q19StringFuncs _,
    "q20_date_trunc" -> q20DateTrunc _,
  )

  val oracles: Map[String, String] = Map(
    "q75_set_ops" ->
      """WITH m AS (
        |  SELECT o_custkey, strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m
        |  FROM orders)
        |SELECT o_custkey, 'repeat' AS cohort FROM (
        |  SELECT o_custkey FROM m WHERE m = '1995-01'
        |  INTERSECT
        |  SELECT o_custkey FROM m WHERE m = '1995-02') r
        |UNION ALL
        |SELECT o_custkey, 'lapsed' AS cohort FROM (
        |  SELECT o_custkey FROM m WHERE m = '1995-01'
        |  EXCEPT
        |  SELECT o_custkey FROM m WHERE m = '1995-02') l""".stripMargin,
    "q73_trailing_window" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey,
        |   CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_n,
        |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day_n,
        | CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY day_n
        |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_7d_cents
        |FROM t""".stripMargin,
    "q55_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3,
        | dense_rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
        | ntile(4) OVER (PARTITION BY o_custkey
        |   ORDER BY o_totalprice DESC, o_orderkey) AS price_quartile
        |FROM orders""".stripMargin,
    "q47_pivot" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END),2) AS F,
        | round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END),2) AS O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q48_argmax" ->
      """SELECT c_mktsegment,
        | CAST(-((max(struct_pack(a := c_acctbal, k := -c_custkey))).k) AS BIGINT)
        |   AS richest_cust,
        | (min(struct_pack(a := c_acctbal, k := c_custkey))).k AS poorest_cust,
        | round(max(c_acctbal),2) AS max_bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q49_corr" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        | round(covar_samp(l_quantity, l_discount), 4) AS qty_disc_covar
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q44_approx_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts_exact,
        | TRUE AS within_3rsd
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q63_approx_quantile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS median_exact,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
        | TRUE AS median_ok,
        | TRUE AS p90_ok
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q98_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q29_percentile" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q139_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                                    (o_orderstatus), ())""".stripMargin,
    "q43_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS revenue
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem WHERE l_returnflag='R' AND l_quantity<5""".stripMargin,
    "q03_top_unshipped" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON o_orderkey=l_orderkey
        |WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
        | AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q04_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1995-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |             WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_regional_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM region JOIN nation ON r_regionkey=n_regionkey
        | JOIN customer ON c_nationkey=n_nationkey
        | JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON o_orderkey=l_orderkey
        | JOIN supplier ON l_suppkey=s_suppkey AND s_nationkey=c_nationkey
        |WHERE r_name='ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q06_revenue_delta" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q07_window_rank" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal, rk FROM (
        | SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
        |  row_number() OVER (PARTITION BY c_mktsegment
        |                     ORDER BY c_acctbal DESC, c_custkey) AS rk
        | FROM customer) t WHERE rk <= 5""".stripMargin,
    "q08_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
        |FROM orders""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts,
        | count(DISTINCT l_suppkey) AS distinct_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q10_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q11_conditional_agg" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_quantity>25 THEN l_extendedprice ELSE 0 END),2) AS rev_bulk,
        | round(sum(CASE WHEN l_quantity<=25 THEN l_extendedprice ELSE 0 END),2) AS rev_small,
        | CAST(sum(CASE WHEN l_quantity>25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q12_union_all" ->
      """SELECT c_custkey AS id, c_name AS name, 'customer' AS kind
        |FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, 'supplier' AS kind
        |FROM supplier WHERE s_acctbal > 9000""".stripMargin,
    "q13_outer_join_count" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS num_orders,
        | round(coalesce(sum(o_totalprice),0),2) AS total_spend
        |FROM customer LEFT OUTER JOIN orders ON c_custkey=o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,
    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey=c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q15_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey=c_custkey AND o_totalprice > 400000)""".stripMargin,
    "q16_scalar_subquery" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)""".stripMargin,
    "q17_having" ->
      """SELECT l_partkey, count(*) AS cnt, round(sum(l_quantity),2) AS total_qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) > 35""".stripMargin,
    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q19_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname, substr(p_name,1,4) AS prefix,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | replace(p_name, ' ', '_') AS slug
        |FROM part WHERE p_name LIKE '%g%'""".stripMargin,
    "q20_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        | round(sum(o_totalprice),2) AS monthly_rev, count(*) AS num_orders
        |FROM orders GROUP BY 1""".stripMargin,
  )
}
