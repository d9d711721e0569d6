package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.silver.Silver

/** Column profiling — the DISCOVERY side of data quality: the declared
  * constraints ([[Checks]] — dbt's unique/not_null/relationships) verify
  * what the schema author already believes; profiling measures what the
  * data actually supports, which is how candidate keys, near-keys, and
  * null-heavy columns are found BEFORE anyone declares tests on them.
  *
  * One row per profiled column of silver_orders: row count, nulls,
  * distinct count, and the two derived judgments every profiler ships —
  * `is_candidate_key` (distinct = rows, nulls = 0) and the distinct
  * ratio (`uniqueness`, a rational of two counts).
  *
  * Scale shape: ONE pass computes every per-column aggregate (counts
  * and null counts fuse into a single map-side-combined aggregate);
  * distinct counts are per-column `count(DISTINCT ...)` expanded by
  * Spark's single `expand` + one aggregate — no per-column job, no
  * per-column scan. At a profiler's usual 100-column width the expand
  * multiplies rows ×columns before partial aggregation, which is the
  * standard cost of exact multi-column distincts; approximate profiling
  * swaps in the KMV sketch ([[graft.ops.Sketch]]) column-by-column. */
object Profile {

  /** Profiled columns: name → whether the profiler should expect
    * key-ness (not an assertion — the row REPORTS what holds). */
  val ProfiledColumns: Seq[String] =
    Seq("order_id", "order_key", "customer_id", "order_status",
      "order_amount", "order_date")

  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val df = Silver.orders(spark, dir)
    val aggs = ProfiledColumns.flatMap { c =>
      Seq(sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"distinct_$c"))
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(ProfiledColumns.map { c =>
        struct(lit(c).as("column_name"), col("n_rows"),
          col(s"nulls_$c").as("n_nulls"),
          col(s"distinct_$c").as("n_distinct"))
      }: _*)).as("r"))
      .select(col("r.column_name").as("column_name"),
        col("r.n_rows").as("n_rows"), col("r.n_nulls").as("n_nulls"),
        col("r.n_distinct").as("n_distinct"))
      .withColumn("uniqueness",
        col("n_distinct") * lit(1.0) / col("n_rows"))
      .withColumn("is_candidate_key",
        (col("n_distinct") === col("n_rows") && col("n_nulls") === 0)
          .cast("int"))
  }

  def profileColumnsOracle(prelude: String): String = {
    val branches = ProfiledColumns.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_nulls,
        count(DISTINCT $c) AS n_distinct
      FROM silver_orders"""
    }.mkString("\n      UNION ALL\n      ")
    s"""$prelude,
    p AS (
      $branches)
    SELECT column_name, n_rows, n_nulls, n_distinct,
      n_distinct * 1.0 / n_rows AS uniqueness,
      CAST(CASE WHEN n_distinct = n_rows AND n_nulls = 0
           THEN 1 ELSE 0 END AS INTEGER) AS is_candidate_key
    FROM p"""
  }
}
