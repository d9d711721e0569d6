package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General analytics queries over the full star schema (lineitem, orders,
  * customer, supplier, nation, region, part) — TPC-H-shaped workloads
  * proving the engine is a general Spark analytics library, not only the
  * reference's three marts.
  *
  * Determinism: derived money terms like `extendedprice * (1 - discount)`
  * are not 2-decimal, so sums are accumulated at fixed 1e-6 precision
  * (`round(x*1e6)` as long — exact under 2^63 at any tested SF, identical
  * in both engines regardless of summation order), then scaled back.
  *
  * Scale notes: q3/q5 are the canonical multi-way star joins — the small
  * dimensions (region/nation/customer-filter side) broadcast, the
  * fact-fact join (orders⋈lineitem) shuffles on the key both sides are
  * already bucketable on; aggregation is partial+final hash agg.
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.ParquetStats.read(spark, s"$dir/$name.parquet")

  /** Fixed-point (1e-6) deterministic sum of an arbitrary double term. */
  private def sumFixed(c: Column): Column = sum(round(c * 1000000).cast("long")) / 1000000.0
  private val sumFixedSql = (x: String) =>
    s"sum(CAST(round(($x) * 1000000) AS BIGINT)) / 1000000.0"

  /** TPC-H Q1 shape: pricing summary by returnflag/linestatus. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
      .withColumn("ship_date", col("l_shipdate").cast("timestamp_ntz").cast("date"))
      .filter(col("ship_date") <= lit("1998-09-02").cast("date"))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumFixed(col("l_quantity")).as("sum_qty"),
        sumFixed(col("l_extendedprice")).as("sum_base_price"),
        sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        count(lit(1)).as("count_order"))
  }

  def pricingSummaryOracle: String =
    s"""SELECT l_returnflag, l_linestatus,
         ${sumFixedSql("l_quantity")} AS sum_qty,
         ${sumFixedSql("l_extendedprice")} AS sum_base_price,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         ${sumFixedSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         count(*) AS count_order
       FROM lineitem
       WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
       GROUP BY 1, 2"""

  /** TPC-H Q3 shape: revenue of unshipped orders for one market segment. */
  def segmentRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-01-01").cast("date")
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders")
      .withColumn("o_date", col("o_orderdate").cast("timestamp_ntz").cast("date"))
      .filter(col("o_date") < cutoff)
    val l = t(spark, dir, "lineitem")
      .withColumn("ship_date", col("l_shipdate").cast("timestamp_ntz").cast("date"))
      .filter(col("ship_date") > cutoff)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_date"), col("o_orderpriority"))
      .agg(sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  def segmentRevenueOracle: String =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
         AND CAST(l_shipdate AS DATE) > DATE '1997-01-01'
       GROUP BY 1, 2, 3"""

  /** TPC-H Q5 shape: revenue by nation across the full star
    * (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier). */
  def nationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
  }

  def nationRevenueOracle: String =
    s"""SELECT r_name, n_name,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         count(DISTINCT o_orderkey) AS n_orders,
         count(DISTINCT s_suppkey) AS n_suppliers
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY 1, 2"""

  /** Multi-dimensional rollup via CUBE over the completed-order fact:
    * grouping-sets coverage (the reference never uses them; Spark `cube`
    * ≡ SQL GROUP BY CUBE, with `grouping_id()` disambiguating the
    * all-rows/subtotal rows from genuine NULL keys). */
  def revenueCube(spark: SparkSession, dir: String): DataFrame = {
    // SQL formulation: the Dataset cube() output carries dataset-id
    // metadata that trips Spark's ambiguous-self-join detector when the
    // result is re-sorted by name downstream; GROUP BY CUBE through a view
    // resolves with fresh attributes and is the same plan. The view name
    // is per-call unique and dropped immediately after analysis (spark.sql
    // analyzes eagerly), so concurrent callers in one session never
    // collide and no session state outlives the call.
    val view = s"graft_cube_input_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    graft.silver.Silver.orders(spark, dir).filter(col("is_completed"))
      .createOrReplaceTempView(view)
    try spark.sql(s"""
      SELECT order_year, order_quarter, grouping_id() AS gid,
        count(DISTINCT order_key) AS n_orders,
        sum(CAST(round(order_amount * 1000000) AS BIGINT)) / CAST(1000000 AS DOUBLE) AS revenue
      FROM $view
      GROUP BY CUBE(order_year, order_quarter)""")
    finally spark.catalog.dropTempView(view)
  }

  def revenueCubeOracle(prelude: String): String =
    s"""$prelude
    SELECT order_year, order_quarter,
      CAST(GROUPING(order_year, order_quarter) AS BIGINT) AS gid,
      count(DISTINCT order_key) AS n_orders,
      ${sumFixedSql("order_amount")} AS revenue
    FROM silver_orders WHERE is_completed
    GROUP BY CUBE(order_year, order_quarter)"""

  /** Native dynamic-pivot operator: monthly successful-payment revenue by
    * standardized method, via `RelationalGroupedDataset.pivot` with pinned
    * value columns (the reference builds the same mart shape by hand with
    * five `sum(case …)` branches — `gold_revenue_analysis.sql:64-80`; this
    * is the dedicated operator form, one hash aggregate with the pivot
    * columns as grouping values). Pinning the pivot values keeps the plan
    * single-pass — Spark otherwise runs a distinct-scan job first — and
    * makes the output schema declaration-stable at any data scale. */
  def paymentMethodPivot(spark: SparkSession, dir: String): DataFrame = {
    val methods = graft.silver.Silver.MethodSynonyms.map(_._1) :+ "other"
    graft.silver.Silver.payments(spark, dir)
      .filter(col("is_successful_payment"))
      .join(graft.silver.Silver.orders(spark, dir)
        .select("order_key", "order_year_month"), Seq("order_key"))
      .groupBy("order_year_month")
      .pivot("payment_method", methods)
      .agg(sum(round(col("payment_amount") * 100).cast("long")) / 100.0)
      .na.fill(0.0, methods)
  }

  def paymentMethodPivotOracle(prelude: String): String = {
    val methods = graft.silver.Silver.MethodSynonyms.map(_._1) :+ "other"
    val branches = methods.map(m =>
      s"""coalesce(sum(CAST(round(CASE WHEN payment_method = '$m'
            THEN payment_amount ELSE NULL END * 100) AS BIGINT)) / 100.0, 0.0)
          AS $m""").mkString(",\n      ")
    s"""$prelude
    SELECT o.order_year_month,
      $branches
    FROM silver_payments p
    JOIN silver_orders o ON p.order_key = o.order_key
    WHERE p.is_successful_payment
    GROUP BY 1"""
  }

  /** Distributed exact percentiles by nearest rank: p50/p90/p99 of order
    * amount per year. Interpolated percentiles (`percentile`,
    * `quantile_cont`) differ across engines by summation-formula ulps AND
    * Spark's exact `percentile` buffers whole groups in memory — so this
    * uses the nearest-rank definition instead: the value at row
    * ⌈p·n⌉ of the group's sort order, computed with pure integer rank
    * arithmetic (`⌈p·n⌉` as `(p·n + denom-1) div denom`), bit-identical
    * in both engines. The rank itself is
    * [[graft.ops.RangeRank.rank]]'s distributed sort — a
    * `PARTITION BY order_year` window would put each year (corpus/years
    * rows) through ONE task; the range-staged rank is bit-identical and
    * partition-parallel, so the oracle's window form stays verbatim. */
  def orderPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.RangeRank.rank(
      graft.silver.Silver.orders(spark, dir)
        .select(col("order_year"), col("order_id"), col("order_amount")),
      Seq("order_year"), Seq(col("order_amount"), col("order_id")),
      "rn", Some("n"))
    ranked.groupBy("order_year")
      .agg(
        max(col("n")).as("n_orders"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("order_amount"))).as("p50"),
        max(when(col("rn") === expr("(n * 9 + 9) div 10"), col("order_amount"))).as("p90"),
        max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("order_amount"))).as("p99"))
  }

  def orderPercentilesOracle(prelude: String): String =
    s"""$prelude,
    ranked AS (
      SELECT order_year, order_amount,
        row_number() OVER (PARTITION BY order_year
          ORDER BY order_amount, order_id) AS rn,
        count(*) OVER (PARTITION BY order_year) AS n
      FROM silver_orders)
    SELECT order_year, max(n) AS n_orders,
      max(CASE WHEN rn = (n + 1) // 2 THEN order_amount END) AS p50,
      max(CASE WHEN rn = (n * 9 + 9) // 10 THEN order_amount END) AS p90,
      max(CASE WHEN rn = (n * 99 + 99) // 100 THEN order_amount END) AS p99
    FROM ranked GROUP BY 1"""

  /** The ranking-function family — rank, dense_rank, percent_rank,
    * cume_dist, ntile — over monthly payment-method revenue. The
    * reference's 13 windows are all analytic sums/lags (SURVEY §2.6);
    * this covers the ordinal class a full engine needs. Determinism:
    * revenue aggregates in exact cents and the window order carries a
    * payment_method tie-break, so every ordinal is identical in both
    * engines; percent_rank/cume_dist are small-integer divisions, exact
    * in IEEE doubles; Spark and DuckDB share the same ntile bucket rule
    * (earlier buckets take the remainder). Scale: input is the
    * months×methods aggregate, so the window partitions are dimension-
    * bounded; the only data-sized work is the one grouped aggregation. */
  def methodRevenueRanks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = graft.silver.Silver.payments(spark, dir)
      .filter(col("is_successful_payment"))
      .join(graft.silver.Silver.orders(spark, dir)
        .select("order_key", "order_year_month"), Seq("order_key"))
      .groupBy("order_year_month", "payment_method")
      .agg((sum(round(col("payment_amount") * 100).cast("long")) / 100.0)
        .as("revenue"))
    val w = Window.partitionBy("order_year_month")
      .orderBy(col("revenue").desc, col("payment_method"))
    monthly
      .withColumn("rnk", rank().over(w))
      .withColumn("dense_rnk", dense_rank().over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("quartile", ntile(4).over(w))
  }

  def methodRevenueRanksOracle(prelude: String): String =
    s"""$prelude,
    monthly AS (
      SELECT o.order_year_month, p.payment_method,
        sum(CAST(round(p.payment_amount * 100) AS BIGINT)) / 100.0 AS revenue
      FROM silver_payments p
      JOIN silver_orders o ON p.order_key = o.order_key
      WHERE p.is_successful_payment
      GROUP BY 1, 2)
    SELECT order_year_month, payment_method, revenue,
      rank() OVER w AS rnk,
      dense_rank() OVER w AS dense_rnk,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume,
      ntile(4) OVER w AS quartile
    FROM monthly
    WINDOW w AS (PARTITION BY order_year_month
      ORDER BY revenue DESC, payment_method)"""

  /** Rolling 28-day revenue via a RANGE window frame — the frame class
    * the gold marts don't exercise (their 7-row MAs are ROWS frames,
    * which count physical rows; a RANGE frame bounds by VALUE distance,
    * the correct semantics over a date axis with gaps: a day preceded by
    * a 3-week quiet spell must not reach back into it). Ordering key =
    * days-since-epoch int, frame = [-27, 0] days. Scale: daily
    * cardinality input (the pre-aggregated mart shape), one window over
    * a dates-sized partition. */
  def rollingRevenue28d(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = graft.silver.Silver.orders(spark, dir)
      .filter(col("is_completed"))
      .groupBy("order_date")
      .agg(sum(round(col("order_amount") * 100).cast("long")).as("day_cents"),
        count(lit(1)).as("n_orders"))
      .withColumn("day_n", datediff(col("order_date"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("day_n")).rangeBetween(-27, 0)
    daily
      .withColumn("revenue", col("day_cents") / 100.0)
      .withColumn("rolling_28d_revenue", sum(col("day_cents")).over(w) / 100.0)
      .withColumn("rolling_28d_orders", sum(col("n_orders")).over(w))
      .select("order_date", "n_orders", "revenue",
        "rolling_28d_revenue", "rolling_28d_orders")
  }

  def rollingRevenue28dOracle(prelude: String): String =
    s"""$prelude,
    daily AS (
      SELECT order_date,
        sum(CAST(round(order_amount * 100) AS BIGINT)) AS day_cents,
        count(*) AS n_orders
      FROM silver_orders WHERE is_completed
      GROUP BY 1)
    SELECT order_date, n_orders,
      day_cents / 100.0 AS revenue,
      sum(day_cents) OVER (ORDER BY order_date
        RANGE BETWEEN INTERVAL 27 DAY PRECEDING AND CURRENT ROW) / 100.0
        AS rolling_28d_revenue,
      sum(n_orders) OVER (ORDER BY order_date
        RANGE BETWEEN INTERVAL 27 DAY PRECEDING AND CURRENT ROW)
        AS rolling_28d_orders
    FROM daily"""

  /** TPC-H Q7 shape: bilateral trade flow — revenue shipped between two
    * chosen nations (supplier side → customer side, both directions) by
    * ship year. Two aliases of the same nation dimension broadcast to
    * opposite sides of the fact join. */
  def nationTradeFlow(spark: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = t(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = t(spark, dir, "nation")
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nkey"))
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .withColumn("l_year",
        year(col("l_shipdate").cast("timestamp_ntz").cast("date")))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sumFixed(rev).as("revenue"), count(lit(1)).as("n_items"))
  }

  def nationTradeFlowOracle(nationA: String = "NATION_1",
      nationB: String = "NATION_2"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(extract(year FROM l_shipdate) AS INTEGER) AS l_year,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c_nationkey = n2.n_nationkey
       WHERE (n1.n_name = '$nationA' AND n2.n_name = '$nationB')
          OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA')
       GROUP BY 1, 2, 3"""

  /** TPC-H Q9 shape: profit by supplier nation and order year for one
    * part type. The testdata has no partsupp table, so supply cost is
    * proxied as 10% of retail price per unit — the operator shape
    * (two-fact join + two dimensions + derived money expression) is the
    * point. */
  def partTypeProfit(spark: SparkSession, dir: String,
      partType: String = "ECONOMY"): DataFrame = {
    val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * lit(0.1) * col("l_quantity")
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("o_year",
        year(col("o_orderdate").cast("timestamp_ntz").cast("date")))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sumFixed(profit).as("profit"), count(lit(1)).as("n_items"))
  }

  def partTypeProfitOracle(partType: String = "ECONOMY"): String =
    s"""SELECT n_name AS nation,
         CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
         ${sumFixedSql("l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity")} AS profit,
         count(*) AS n_items
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN orders ON l_orderkey = o_orderkey
       WHERE p_type = '$partType'
       GROUP BY 1, 2"""

  /** TPC-H Q13 shape: customer distribution by order count — LEFT OUTER
    * join so never-ordered customers land in the zero bucket, then a
    * second aggregation over the first (agg-of-agg). Both aggs are hash
    * aggs; the outer join shuffles once on custkey. */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCustomer = t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCustomer.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  def customerOrderDistributionOracle: String =
    """SELECT c_count, count(*) AS custdist
       FROM (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey)
       GROUP BY 1"""

  /** TPC-H Q14 shape: promo part revenue share by ship month. */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val l = t(spark, dir, "lineitem")
      .withColumn("ship_month",
        date_format(col("l_shipdate").cast("timestamp_ntz"), "yyyy-MM"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(
        sumFixed(when(col("p_type").startsWith("PROMO"), rev).otherwise(0)).as("promo_revenue"),
        sumFixed(rev).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_share",
        round(col("promo_revenue") * 100 / col("total_revenue")) / 100.0)
  }

  def promoShareOracle: String =
    s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         ${sumFixedSql("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS promo_revenue,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS total_revenue,
         count(*) AS n_items,
         round((sum(CAST(round((CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 1000000) AS BIGINT)) / 1000000.0)
           * 100 / (sum(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) / 1000000.0)) / 100.0 AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY 1"""
}
