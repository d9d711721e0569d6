package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query *shapes* (Q2, Q4, Q6, Q8, Q10–Q12, Q15–Q22),
  * completing the 22-query suite together with [[Analytics]] (Q1, Q3, Q5,
  * Q7, Q9, Q13, Q14). These are original formulations of the public
  * benchmark's operator shapes over the driver testdata — which lacks
  * partsupp, ship modes, commit/receipt dates, phones and containers — so
  * each query keeps the canonical plan shape (correlated scalar subquery,
  * EXISTS / NOT EXISTS, IN-subquery, HAVING over agg-of-agg, disjunctive
  * join predicates) while proxying the missing columns, exactly like
  * [[Analytics.partTypeProfit]] proxies supply cost. Deviations are noted
  * per query.
  *
  * Determinism: money sums use the fixed-point 1e-6 discipline
  * ([[Analytics]] header); quantities are integral doubles whose sums are
  * IEEE-exact, so averages of them are order-independent; scalar
  * thresholds (avg/max subqueries) are computed from exact sums in both
  * engines before a single comparison happens.
  *
  * Scale notes: every correlated form below is expressed as a join —
  * semi/anti for EXISTS/NOT EXISTS, a broadcast one-row cross join for
  * scalar subqueries, an equi-join on the grouping key for per-group
  * averages — so nothing degenerates to a per-row re-scan; the one-row
  * broadcasts are the Spark plan a correlated scalar should compile to.
  */
object TpchSuite {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.ParquetStats.read(spark, s"$dir/$name.parquet")

  private def sumFixed(c: Column): Column = sum(round(c * 1000000).cast("long")) / 1000000.0
  private val sumFixedSql = (x: String) =>
    s"sum(CAST(round(($x) * 1000000) AS BIGINT)) / 1000000.0"
  /** Exact-cents sum for natively-2-decimal money columns. */
  private def sumCents(c: Column): Column = sum(round(c * 100).cast("long")) / 100.0
  private val sumCentsSql = (x: String) =>
    s"sum(CAST(round(($x) * 100) AS BIGINT)) / 100.0"

  private def asDate(c: Column): Column = c.cast("timestamp_ntz").cast("date")

  // ---- Q2: minimum-cost supplier (correlated min subquery → join) ----

  /** TPC-H Q2 shape. partsupp is proxied by observed lineitem unit prices:
    * a supplier's cost for a part is min(l_extendedprice/l_quantity) over
    * its shipments. The correlated `ps_supplycost = (SELECT min…)` becomes
    * a per-part min join — ties emit every minimal supplier, as in the
    * benchmark. */
  def minCostSupplier(spark: SparkSession, dir: String,
      region: String = "EUROPE", partType: String = "ECONOMY"): DataFrame = {
    val sup = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "n_name")
    val offers = t(spark, dir, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey", "s_name", "n_name")
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val best = offers.groupBy("l_partkey").agg(min("unit_cost").as("best_cost"))
    offers.join(best, Seq("l_partkey"))
      .filter(col("unit_cost") === col("best_cost"))
      .join(t(spark, dir, "part").filter(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
  }

  def minCostSupplierOracle(region: String = "EUROPE",
      partType: String = "ECONOMY"): String =
    s"""WITH sup AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '$region'),
    offers AS (
      SELECT l_partkey, l_suppkey, s_name, n_name,
        min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem JOIN sup ON l_suppkey = s_suppkey
      GROUP BY 1, 2, 3, 4),
    best AS (
      SELECT l_partkey, min(unit_cost) AS best_cost FROM offers GROUP BY 1)
    SELECT p_partkey, p_name, s_name, n_name, unit_cost
    FROM offers JOIN best USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    WHERE unit_cost = best_cost AND p_type = '$partType'"""

  // ---- Q4: order-priority checking (EXISTS → left semi) ----

  /** TPC-H Q4 shape. No commit/receipt dates exist, so "late line item"
    * is proxied as shipped more than 30 days after the order date; the
    * EXISTS compiles to a left-semi join with a non-equi conjunct. */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("o_date", asDate(col("o_orderdate")))
      .filter(col("o_date") >= lit("1997-01-01").cast("date") &&
        col("o_date") < lit("1997-07-01").cast("date"))
    val l = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("lk"), asDate(col("l_shipdate")).as("ship_date"))
    o.join(l, col("lk") === col("o_orderkey") &&
        col("ship_date") > date_add(col("o_date"), 30), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  def orderPriorityCheckOracle: String =
    """SELECT o_orderpriority, count(*) AS n_orders
       FROM orders
       WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
         AND EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey
             AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)
       GROUP BY 1"""

  // ---- Q6: forecasting revenue change (pure filter-agg) ----

  /** TPC-H Q6 shape, grouped by ship year instead of pinned to one so the
    * row set exercises every year; the revenue term is price×discount. */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .withColumn("ship_year", year(asDate(col("l_shipdate"))))
      .groupBy("ship_year")
      .agg(sumFixed(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  def forecastRevenueOracle: String =
    s"""SELECT CAST(extract(year FROM l_shipdate) AS INTEGER) AS ship_year,
         ${sumFixedSql("l_extendedprice * l_discount")} AS revenue,
         count(*) AS n_items
       FROM lineitem
       WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
       GROUP BY 1"""

  // ---- Q8: national market share (conditional share of a join) ----

  /** TPC-H Q8 shape: the chosen nation's share of revenue for one part
    * type sold into one region's market, by order year. */
  def marketShare(spark: SparkSession, dir: String, nation: String = "NATION_1",
      region: String = "AMERICA", partType: String = "STANDARD"): DataFrame = {
    val custNation = t(spark, dir, "nation")
      .join(t(spark, dir, "region").filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nkey"))
    val suppNation = t(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_type") === partType),
        col("l_partkey") === col("p_partkey"))
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("c_nkey"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nkey"))
      .withColumn("o_year", year(asDate(col("o_orderdate"))))
      .groupBy("o_year")
      .agg(
        sumFixed(when(col("supp_nation") === nation, rev).otherwise(0)).as("nation_revenue"),
        sumFixed(rev).as("total_revenue"))
      .withColumn("mkt_share",
        round(col("nation_revenue") * 100 / col("total_revenue")) / 100.0)
  }

  def marketShareOracle(nation: String = "NATION_1", region: String = "AMERICA",
      partType: String = "STANDARD"): String = {
    val natRev =
      sumFixedSql(s"CASE WHEN n2.n_name = '$nation' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")
    val totRev = sumFixedSql("l_extendedprice * (1 - l_discount)")
    s"""SELECT CAST(extract(year FROM o_orderdate) AS INTEGER) AS o_year,
         $natRev AS nation_revenue,
         $totRev AS total_revenue,
         round(($natRev) * 100 / ($totRev)) / 100.0 AS mkt_share
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN region ON n1.n_regionkey = r_regionkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
       WHERE r_name = '$region' AND p_type = '$partType'
       GROUP BY 1"""
  }

  // ---- Q10: returned-item reporting ----

  /** TPC-H Q10 shape: revenue lost to returns per customer for one
    * quarter (full set; the benchmark's top-20 is presentation only). */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("o_date", asDate(col("o_orderdate")))
      .filter(col("o_date") >= lit("1997-01-01").cast("date") &&
        col("o_date") < lit("1997-04-01").cast("date"))
    t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def returnedItemsOracle: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         count(*) AS n_items
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
       GROUP BY 1, 2, 3, 4"""

  // ---- Q11: important parts (HAVING vs scalar subquery) ----

  /** TPC-H Q11 shape. Part value is proxied as shipped extended price from
    * one region's suppliers; the HAVING threshold is relative — more than
    * twice the average per-part value — so it scales with data volume
    * (the benchmark's fixed fraction is SF-bound). The scalar subquery is
    * a one-row broadcast cross join, never a per-row rescan. */
  def importantParts(spark: SparkSession, dir: String,
      region: String = "ASIA"): DataFrame = {
    val sup = t(spark, dir, "supplier")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(spark, dir, "region").filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey").as("sk"))
    val perPart = t(spark, dir, "lineitem")
      .join(sup, col("l_suppkey") === col("sk"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sumFixed(col("l_extendedprice")).as("value"))
    val thresh = perPart.agg(
      (sum(round(col("value") * 1000000).cast("long")) / 1000000.0 /
        (count(lit(1)) * 2)).as("threshold"))
    perPart.crossJoin(broadcast(thresh))
      .filter(col("value") > col("threshold"))
      .select("p_partkey", "value")
  }

  def importantPartsOracle(region: String = "ASIA"): String =
    s"""WITH per_part AS (
      SELECT l_partkey AS p_partkey, ${sumFixedSql("l_extendedprice")} AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = '$region'
      GROUP BY 1)
    SELECT p_partkey, value FROM per_part
    WHERE value > (
      SELECT sum(CAST(round(value * 1000000) AS BIGINT)) / 1000000.0 / (count(*) * 2)
      FROM per_part)"""

  // ---- Q12: shipping delay classes (CASE aggregation) ----

  /** TPC-H Q12 shape. No ship modes or receipt dates exist, so lines are
    * bucketed by order→ship delay; the double CASE aggregation over
    * priorities is the preserved operator. */
  def shipDelayClasses(spark: SparkSession, dir: String): DataFrame = {
    val dd = datediff(asDate(col("l_shipdate")), asDate(col("o_orderdate")))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_bucket",
        when(dd <= 90, "0-90").when(dd <= 365, "91-365").otherwise("365+"))
      .groupBy("delay_bucket")
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_priority_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_priority_count"))
  }

  def shipDelayClassesOracle: String =
    """SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN '0-90'
              WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 365 THEN '91-365'
              ELSE '365+' END AS delay_bucket,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_priority_count,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS low_priority_count
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1"""

  // ---- Q15: top supplier (view + scalar max) ----

  /** TPC-H Q15 shape: quarterly revenue per supplier, emitting the
    * supplier(s) at the maximum — the `revenue` view becomes a reused
    * DataFrame, the scalar max a one-row broadcast. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = t(spark, dir, "lineitem")
      .withColumn("ship_date", asDate(col("l_shipdate")))
      .filter(col("ship_date") >= lit("1997-01-01").cast("date") &&
        col("ship_date") < lit("1997-04-01").cast("date"))
      .groupBy("l_suppkey")
      .agg(sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
    val best = revenue.agg(max("total_revenue").as("max_revenue"))
    revenue.crossJoin(broadcast(best))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(t(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
  }

  def topSupplierOracle: String =
    s"""WITH revenue AS (
      SELECT l_suppkey,
        ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"""

  // ---- Q16: supplier counts (NOT IN → left anti) ----

  /** TPC-H Q16 shape. The part–supplier relation comes from observed
    * shipments; the excluded-supplier NOT IN (complaints in the benchmark,
    * proxied as low account balance) compiles to a left-anti join. */
  def supplierCounts(spark: SparkSession, dir: String,
      excludeBelow: Double = 2500.0): DataFrame = {
    val excluded = t(spark, dir, "supplier")
      .filter(col("s_acctbal") < excludeBelow)
      .select(col("s_suppkey").as("bad_sk"))
    val sizes = Seq(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
      .join(excluded, col("l_suppkey") === col("bad_sk"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def supplierCountsOracle(excludeBelow: Double = 2500.0): String =
    s"""SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#1'
         AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
         AND l_suppkey NOT IN (
           SELECT s_suppkey FROM supplier WHERE s_acctbal < $excludeBelow)
       GROUP BY 1, 2, 3"""

  // ---- Q17: small-quantity revenue (correlated avg → per-key join) ----

  /** TPC-H Q17 shape: revenue from order lines far below the part's
    * average quantity. The correlated `avg(l_quantity)` subquery becomes
    * an aggregate joined back on the part key; quantities are integral
    * doubles, so the average is bit-deterministic. The benchmark's 0.2
    * factor is widened to 0.5 to keep the filtered set populated at tiny
    * scale factors. */
  def smallQtyRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#3", factor: Double = 0.5): DataFrame = {
    val avgQty = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part").filter(col("p_brand") === brand),
        col("l_partkey") === col("p_partkey"))
      .join(avgQty, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(factor) * col("avg_qty"))
      .groupBy("p_brand")
      .agg((sumFixed(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  def smallQtyRevenueOracle(brand: String = "Brand#3",
      factor: Double = 0.5): String =
    s"""SELECT p_brand,
         (${sumFixedSql("l_extendedprice")}) / 7.0 AS avg_yearly,
         count(*) AS n_items
       FROM lineitem
       JOIN part ON l_partkey = p_partkey
       JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
             FROM lineitem GROUP BY 1) ON pk = l_partkey
       WHERE p_brand = '$brand' AND l_quantity < $factor * avg_qty
       GROUP BY 1"""

  // ---- Q18: large-volume orders (HAVING → semi join on agg) ----

  /** TPC-H Q18 shape: orders whose total quantity clears a threshold,
    * joined back to their customers — the IN-subquery-over-HAVING becomes
    * an aggregate then an equi-join. */
  def largeOrders(spark: SparkSession, dir: String,
      minQty: Double = 300.0): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("lk"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    t(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("lk"))
      .join(t(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .withColumn("o_date", asDate(col("o_orderdate")))
      .select("c_name", "c_custkey", "o_orderkey", "o_date", "o_totalprice", "sum_qty")
  }

  def largeOrdersOracle(minQty: Double = 300.0): String =
    s"""SELECT c_name, c_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS o_date, o_totalprice, sum_qty
       FROM orders
       JOIN (SELECT l_orderkey AS lk, sum(l_quantity) AS sum_qty
             FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > $minQty)
         ON o_orderkey = lk
       JOIN customer ON o_custkey = c_custkey"""

  // ---- Q19: discounted revenue (disjunction of conjuncts) ----

  /** TPC-H Q19 shape: an OR of three brand/size/quantity conjunct groups
    * as the join predicate (no container column exists; size stands in).
    * Catalyst must evaluate the disjunction post-join without degrading
    * to a nested loop — the equi half (partkey) stays the join key. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val g1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val g2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val g3 = col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(g1 || g2 || g3)
      .groupBy("p_brand")
      .agg(sumFixed(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def disjunctiveRevenueOracle: String =
    s"""SELECT p_brand,
         ${sumFixedSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         count(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
       GROUP BY 1"""

  // ---- Q20: potential promotion suppliers (nested IN → joins) ----

  /** TPC-H Q20 shape: suppliers who shipped a meaningful volume of a
    * named part family in one year (partsupp availability proxied by
    * shipped quantity). The nested IN-subqueries become an aggregate over
    * (supplier, part), a threshold filter, and a distinct semi-style
    * reduction to suppliers. */
  def promotionSuppliers(spark: SparkSession, dir: String,
      namePrefix: String = "large", year0: Int = 1997,
      minQty: Double = 50.0): DataFrame = {
    val shipped = t(spark, dir, "lineitem")
      .filter(year(asDate(col("l_shipdate"))) === year0)
      .join(t(spark, dir, "part").filter(col("p_name").startsWith(namePrefix)),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > minQty)
      .select(col("l_suppkey").as("sk")).distinct()
    t(spark, dir, "supplier")
      .join(shipped, col("s_suppkey") === col("sk"), "left_semi")
      .join(t(spark, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
  }

  def promotionSuppliersOracle(namePrefix: String = "large", year0: Int = 1997,
      minQty: Double = 50.0): String =
    s"""SELECT s_suppkey, s_name, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
       WHERE s_suppkey IN (
         SELECT l_suppkey FROM lineitem
         JOIN part ON l_partkey = p_partkey
         WHERE p_name LIKE '$namePrefix%'
           AND extract(year FROM l_shipdate) = $year0
         GROUP BY l_suppkey, l_partkey
         HAVING sum(l_quantity) > $minQty)"""

  // ---- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ----

  /** TPC-H Q21 shape. With no receipt/commit dates, "the supplier who
    * failed" is the one whose line was returned (`l_returnflag = 'R'`) on
    * a finalized order: count, per supplier, the multi-supplier 'F' orders
    * where ONLY that supplier's lines were returned — EXISTS another
    * supplier's line, NOT EXISTS another supplier's returned line; both
    * compile to semi/anti joins on the order key. */
  def blameSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val l1 = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val others = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"),
        col("l_returnflag").as("rf2"))
    l1.join(t(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("ok") === col("o_orderkey"), "left_semi")
      .join(others, col("ok2") === col("ok") && col("sk2") =!= col("sk"), "left_semi")
      .join(others.filter(col("rf2") === "R"),
        col("ok2") === col("ok") && col("sk2") =!= col("sk"), "left_anti")
      .join(t(spark, dir, "supplier"), col("sk") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  def blameSuppliersOracle: String =
    """SELECT s_name, count(*) AS numwait
       FROM lineitem l1
       JOIN supplier ON l1.l_suppkey = s_suppkey
       WHERE l1.l_returnflag = 'R'
         AND EXISTS (SELECT 1 FROM orders
           WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
         AND EXISTS (SELECT 1 FROM lineitem l2
           WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM lineitem l3
           WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
             AND l3.l_returnflag = 'R')
       GROUP BY 1"""

  // ---- Q22: idle high-balance customers (anti join + scalar avg) ----

  /** TPC-H Q22 shape. Every testdata customer has ordered at least once,
    * so "never ordered" becomes "no order since 1999-01-01"; the phone
    * country code becomes the nation key. Account-balance sums/averages
    * use exact cents, so the scalar threshold is bit-identical in both
    * engines before any row is compared against it. */
  def idleCustomers(spark: SparkSession, dir: String,
      since: String = "1999-01-01"): DataFrame = {
    val recent = t(spark, dir, "orders")
      .filter(asDate(col("o_orderdate")) >= lit(since).cast("date"))
      .select(col("o_custkey").as("rk"))
    val threshold = t(spark, dir, "customer").filter(col("c_acctbal") > 0)
      .agg((sum(round(col("c_acctbal") * 100).cast("long")) / 100.0 /
        count(lit(1))).as("avg_bal"))
    t(spark, dir, "customer")
      .crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("rk"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sumCents(col("c_acctbal")).as("total_acctbal"))
  }

  def idleCustomersOracle(since: String = "1999-01-01"): String =
    s"""SELECT c_nationkey, count(*) AS n_customers,
         ${sumCentsSql("c_acctbal")} AS total_acctbal
       FROM customer
       WHERE c_acctbal > (
           SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 / count(*)
           FROM customer WHERE c_acctbal > 0)
         AND NOT EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey
             AND CAST(o_orderdate AS DATE) >= DATE '$since')
       GROUP BY 1"""
}
