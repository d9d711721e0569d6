package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join executed as a bucket-expansion equi-join.
  *
  * The query: attribute each order to the promotional window containing
  * its date (`o_orderdate BETWEEN lo AND hi`) and aggregate revenue per
  * promo. Spark has no native interval-join operator for batch — a raw
  * range predicate against a dimension plans as BroadcastNestedLoopJoin
  * (every probe row tests EVERY interval). That is tolerable for 5
  * promos and catastrophic for 50 000 intervals at 100 TB, and if the
  * dimension outgrows the broadcast threshold it degrades further to a
  * cartesian product.
  *
  * The scale-safe rewrite used here (the same one behind Databricks'
  * range-join optimization and Flink's interval join): quantize the value
  * domain into fixed-width buckets — a calendar week of days — then
  *
  *  - each interval explodes to the buckets it overlaps: cost bounded by
  *    interval length / bucket width, independent of fact-table size;
  *  - each probe row computes exactly ONE bucket (`floor(days/7)` — a
  *    codegen'd scalar, no explosion on the 100 TB side);
  *  - the join becomes a hash EQUI-join on the bucket id with the
  *    original BETWEEN as a residual filter (bucket overlap is a
  *    superset of interval containment).
  *
  * PlanSpec pins the physical plan to BroadcastHashJoin with zero
  * BroadcastNestedLoopJoin/CartesianProduct nodes. With a large interval
  * table the same shape runs as a shuffled hash join on the bucket id —
  * the rewrite, not the broadcast, is what removes the O(rows ×
  * intervals) term.
  */
object RangeJoin {

  /** Promotional windows — deliberately irregular: a 3-day flash, a
    * two-month window, and a year-crossing one, so the row exercises
    * multi-bucket expansion, single-bucket intervals, and year-boundary
    * bucketing. */
  val Promos: Seq[(String, String, String)] = Seq(
    ("winter_launch", "1993-01-05", "1993-02-17"),
    ("spring_flash", "1994-04-01", "1994-04-03"),
    ("summer_mega", "1995-06-15", "1995-08-20"),
    ("back_to_school", "1996-08-25", "1996-09-10"),
    ("holiday_surge", "1997-11-20", "1998-01-05"))

  private val epoch = lit("1970-01-01").cast("date")

  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val promos = Promos.toDF("promo", "lo_s", "hi_s")
      .select(col("promo"), col("lo_s").cast("date").as("lo"),
        col("hi_s").cast("date").as("hi"))
    // interval side: one row per (promo, overlapped week bucket)
    val buckets = promos.withColumn("wk",
      explode(sequence(floor(datediff(col("lo"), epoch) / 7),
        floor(datediff(col("hi"), epoch) / 7))))
    // probe side: one bucket per row, no explosion
    val orders = graft.sources.ParquetStats.read(spark, s"$dir/orders.parquet")
      .withColumn("o_date", col("o_orderdate").cast("timestamp_ntz").cast("date"))
      .withColumn("wk", floor(datediff(col("o_date"), epoch) / 7))
    orders.join(broadcast(buckets), Seq("wk"))
      .filter(col("o_date") >= col("lo") && col("o_date") <= col("hi"))
      .groupBy("promo")
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("revenue"))
  }

  /** The oracle states the range join declaratively — DuckDB's optimizer
    * handles a 5-row BETWEEN join fine; the Spark side is where the
    * bucket rewrite matters. */
  def promoRevenueOracle: String = {
    val rows = Promos.map { case (p, lo, hi) =>
      s"('$p', DATE '$lo', DATE '$hi')"
    }.mkString(",\n      ")
    s"""WITH promos(promo, lo, hi) AS (VALUES
      $rows)
    SELECT promo, count(*) AS n_orders, sum(o_totalprice) AS revenue
    FROM orders o JOIN promos p
      ON CAST(o.o_orderdate AS DATE) BETWEEN p.lo AND p.hi
    GROUP BY promo"""
  }
}
