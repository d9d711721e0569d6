package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional LAYOUT technique
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleaving the bits of two
  * dimensions into one sort key makes file-sized runs of rows cover a
  * small RECTANGLE in (dim1, dim2) space instead of a thin full-width
  * stripe, so parquet min/max stats prune scans for predicates on EITHER
  * dimension. A time-sorted events table answers time filters well and
  * user filters not at all (every file spans all users); the z-ordered
  * layout trades a little time-locality for bounded user-locality in
  * every file.
  *
  * The driver row makes that trade measurable and oracle-checked: both
  * layouts are simulated by assigning rows to [[ZGroups]] equal file
  * groups in layout order and reporting each group's bounding box over
  * the two (16-bit bucketed) dimensions — exactly the min/max stats the
  * scan planner would read. The spec pins the pruning claim: the
  * z-layout's mean user-span is a fraction of the linear layout's
  * full-width stripes.
  *
  * Everything is integer arithmetic (bit spreading is a 16-term
  * shift-free polynomial both engines evaluate identically); bounds come
  * from one min/max aggregate broadcast back, as in
  * [[Sketch.histQuantiles]]. */
object Zorder {

  /** Simulated file-group count per layout. */
  val ZGroups = 16

  /** Bits per dimension: two 16-bit bucketed dims → a 32-bit z-value. */
  val DimBits = 16

  /** `((x div 2^i) mod 2) * 4^i` summed over i — the classic bit spread
    * placing dimension bits at even positions; the second dimension
    * doubles it to odd positions. */
  private def spreadExpr(col: String): String =
    (0 until DimBits)
      .map(i => s"((($col) div ${1L << i}) % 2) * ${1L << (2 * i)}")
      .mkString("(", " + ", ")")

  private def bucketExpr(c: String, minC: String, spanC: String): String =
    s"((($c) - $minC) * ${1 << DimBits}) div $spanC"

  /** Per-(layout, group) bounding boxes over (user, time): the min/max
    * stats a scan would prune with. `user_span`/`ts_span` are the box
    * widths in 16-bit bucket units — a full-width dimension spans
    * ~65535. */
  def layoutStats(spark: SparkSession, dir: String): DataFrame = {
    val e = Events.events(spark, dir)
      .select(col("user_id").cast("long").as("u"),
        expr("unix_micros(cast(ts as timestamp)) div 1000")
          .as("t"))               // ms: (span * 2^16) must fit a long —
                                  // us deltas overflow past ~4.5-year spans
    val bounds = e.agg(
      min(col("u")).as("minu"), (max(col("u")) - min(col("u")) + 1).as("spanu"),
      min(col("t")).as("mint"), (max(col("t")) - min(col("t")) + 1).as("spant"))
    val b = e.crossJoin(broadcast(bounds))
      .withColumn("u16", expr(bucketExpr("u", "minu", "spanu")))
      .withColumn("t16", expr(bucketExpr("t", "mint", "spant")))
      .withColumn("z",
        expr(s"${spreadExpr("u16")} + 2 * ${spreadExpr("t16")}"))
    val perLayout = Seq(
      ("zorder", expr(s"z div ${(1L << (2 * DimBits)) / ZGroups}")),
      ("linear", expr(s"t16 div ${(1 << DimBits) / ZGroups}")))
    perLayout.map { case (name, grp) =>
      b.withColumn("layout", lit(name))
        .withColumn("group_id", grp.cast("long"))
        .groupBy("layout", "group_id")
        .agg(count(lit(1)).as("n_events"),
          (max(col("u16")) - min(col("u16"))).as("user_span"),
          (max(col("t16")) - min(col("t16"))).as("ts_span"))
    }.reduce(_.unionByName(_))
  }

  def layoutStatsOracle: String = {
    def spread(c: String) = (0 until DimBits)
      .map(i => s"((($c) // ${1L << i}) % 2) * ${1L << (2 * i)}")
      .mkString("(", " + ", ")")
    s"""WITH e AS (
      SELECT CAST(user_id AS BIGINT) AS u, epoch_us(ts) // 1000 AS t FROM events),
    bounds AS (
      SELECT min(u) AS minu, max(u) - min(u) + 1 AS spanu,
        min(t) AS mint, max(t) - min(t) + 1 AS spant
      FROM e),
    b AS (
      SELECT ((u - minu) * ${1 << DimBits}) // spanu AS u16,
        ((t - mint) * ${1 << DimBits}) // spant AS t16
      FROM e CROSS JOIN bounds),
    z AS (
      SELECT u16, t16,
        ${spread("u16")} + 2 * ${spread("t16")} AS z
      FROM b)
    SELECT 'zorder' AS layout,
      z // ${(1L << (2 * DimBits)) / ZGroups} AS group_id,
      count(*) AS n_events,
      max(u16) - min(u16) AS user_span,
      max(t16) - min(t16) AS ts_span
    FROM z GROUP BY 2
    UNION ALL
    SELECT 'linear', t16 // ${(1 << DimBits) / ZGroups}, count(*),
      max(u16) - min(u16), max(t16) - min(t16)
    FROM z GROUP BY 2"""
  }
}
