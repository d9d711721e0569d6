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

  /** Functional-dependency candidates checked by [[profileFds]] —
    * deliberately a mix of FDs that hold (the surrogate key is 1:1 with
    * its natural key; derived date parts and status flags are
    * functions of their source) and one that must NOT (a customer has
    * many statuses across orders), so both judgment paths are
    * exercised. */
  val FdCandidates: Seq[(String, String)] = Seq(
    "customer_key" -> "customer_id",
    "order_date" -> "order_year",
    "order_status" -> "is_completed",
    "customer_id" -> "order_status")

  /** FD discovery: `X → Y` holds iff no X value maps to two Y values —
    * measured per candidate as the number of violating X groups
    * (`count distinct Y > 1`). The aggregate is one (X, Y) distinct +
    * one X-keyed count per candidate — each a map-side-combined
    * aggregate over the already-distinct pairs; candidates evaluate
    * independently and union. Profilers run this over the full column
    * lattice with pruning; the engine shows the per-candidate
    * primitive. */
  def profileFds(spark: SparkSession, dir: String): DataFrame = {
    val df = Silver.orders(spark, dir)
    FdCandidates.map { case (x, y) =>
      df.select(col(x).as("lhs"), col(y).as("rhs")).distinct()
        .groupBy("lhs").agg(count(lit(1)).as("n_rhs"))
        .agg(count(lit(1)).as("n_lhs_groups"),
          sum((col("n_rhs") > 1).cast("long")).as("n_violating_groups"))
        .select(lit(x).as("lhs_column"), lit(y).as("rhs_column"),
          col("n_lhs_groups"), col("n_violating_groups"),
          (col("n_violating_groups") === 0).cast("int").as("fd_holds"))
    }.reduce(_.unionByName(_))
  }

  def profileFdsOracle(prelude: String): String = {
    val branches = FdCandidates.map { case (x, y) =>
      s"""SELECT '$x' AS lhs_column, '$y' AS rhs_column,
        count(*) AS n_lhs_groups,
        CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_violating_groups
      FROM (
        SELECT $x AS lhs, count(DISTINCT $y) AS n_rhs
        FROM silver_orders GROUP BY 1)"""
    }.mkString("\n      UNION ALL\n      ")
    s"""$prelude,
    f AS (
      $branches)
    SELECT lhs_column, rhs_column, n_lhs_groups, n_violating_groups,
      CAST(CASE WHEN n_violating_groups = 0 THEN 1 ELSE 0 END AS INTEGER)
        AS fd_holds
    FROM f"""
  }

  /** Benford first-digit expectations `log10(1 + 1/d)`, d = 1..9 —
    * CONSTANTS, written once here and spliced into both engines as the
    * same literals (the only transcendentals the repo allows are ones
    * that never get computed). */
  val BenfordFracs: Seq[String] = Seq(
    "0.301029995664", "0.176091259056", "0.124938736608",
    "0.096910013008", "0.079181246048", "0.066946789631",
    "0.057991946978", "0.051152522447", "0.045757490561")

  /** Benford first-digit audit over order amounts — the forensic
    * profiling screen (Nigrini's practice): naturally-occurring
    * multi-scale amounts lean on small leading digits; fabricated or
    * truncated data does not. The first significant digit is read off
    * the integer CENTS string (scaling by 100 never changes the leading
    * digit), the observed histogram is one map-side-combined aggregate,
    * and each digit's χ² term `(obs − N·p)² / (N·p)` uses the shared
    * literal expectations — rational arithmetic beyond them. The row
    * reports the ingredients; the consumer sums terms against χ²₈.
    * (This synthetic corpus' amounts are uniform-ish, so the statistic
    * is LARGE — the screen firing on non-Benford data is the correct
    * reading, not a defect.) */
  def profileBenford(spark: SparkSession, dir: String): DataFrame = {
    val df = Silver.orders(spark, dir)
      .select(round(col("order_amount") * 100).cast("long").as("cents"))
      .filter(col("cents") > 0)
      .withColumn("digit",
        substring(col("cents").cast("string"), 1, 1).cast("int"))
    val hist = df.groupBy("digit").agg(count(lit(1)).as("n_observed"))
    val n = df.agg(count(lit(1)).as("n_total"))
    val expected = (1 to 9).map { d =>
      struct(lit(d).as("digit"),
        lit(BenfordFracs(d - 1).toDouble).as("expected_frac"))
    }
    val exp = n.select(explode(array(expected: _*)).as("e"), col("n_total"))
      .select(col("e.digit").as("digit"),
        col("e.expected_frac").as("expected_frac"), col("n_total"))
    exp.join(hist, Seq("digit"), "left")
      .withColumn("n_observed", coalesce(col("n_observed"), lit(0L)))
      .withColumn("expected_n",
        col("n_total").cast("double") * col("expected_frac"))
      .withColumn("chi2_term",
        (col("n_observed").cast("double") - col("expected_n"))
          * (col("n_observed").cast("double") - col("expected_n"))
          / col("expected_n"))
      .select("digit", "n_observed", "expected_frac", "chi2_term")
  }

  def profileBenfordOracle(prelude: String): String = {
    val digits = (1 to 9).map(d =>
      s"SELECT $d AS digit, CAST(${BenfordFracs(d - 1)} AS DOUBLE) " +
        "AS expected_frac")
      .mkString("\n      UNION ALL ")
    s"""$prelude,
    c AS (
      SELECT CAST(substr(CAST(CAST(round(order_amount * 100) AS BIGINT)
        AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM silver_orders WHERE CAST(round(order_amount * 100) AS BIGINT) > 0),
    hist AS (SELECT digit, count(*) AS n_observed FROM c GROUP BY 1),
    n AS (SELECT count(*) AS n_total FROM c),
    e AS (
      $digits)
    SELECT e.digit, coalesce(h.n_observed, 0) AS n_observed,
      e.expected_frac,
      (CAST(coalesce(h.n_observed, 0) AS DOUBLE)
        - CAST(n.n_total AS DOUBLE) * e.expected_frac)
      * (CAST(coalesce(h.n_observed, 0) AS DOUBLE)
        - CAST(n.n_total AS DOUBLE) * e.expected_frac)
      / (CAST(n.n_total AS DOUBLE) * e.expected_frac) AS chi2_term
    FROM e CROSS JOIN n LEFT JOIN hist h ON h.digit = e.digit"""
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
