package graft.quality

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Footer-statistics dq resolution ([[FooterStats]], the fast path wired
  * into [[DataQuality.summary]]): answers must be BIT-IDENTICAL to the
  * scan path's, eligibility must collapse on anything the footers don't
  * exactly describe (filters, derived columns, out-of-range data, edited
  * test macros), and the proofs must hold on raw parquet statistics. */
class FooterStatsSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$Sf0001/documents.parquet")

  test("summary: footer path and forced-scan path emit identical rows, " +
      "and the footer really answered the silver not_nulls") {
    def rowsAndAnswered() = {
      val (df, answered) = DataQuality.summaryWithFooterAnswers(spark, Sf0001)
      (df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap, answered)
    }
    val (withFooter, answered) = rowsAndAnswered()
    assert(answered.nonEmpty, "footer resolution must fire on sf0.001")
    // the pinned silver stages are parquet → their not_nulls are
    // metadata-answerable; so are the bronze keys (bare renames of the
    // raw scan) and the row-floor / not-empty custom tests
    Seq("silver_customers.email.not_null",
        "silver_orders.order_amount.not_null",
        "silver_payments.payment_key.not_null",
        "bronze_customers.customer_id.not_null",
        "silver_payments.at_least_n_rows",
        "silver_payments.payment_method.not_empty_string")
      .foreach(n => assert(answered.contains(n), s"$n missing from $answered"))
    // within_range must NOT be footer-answered on this data: the raw
    // fan-out keeps negative payment amounts, so min < 0 breaks the
    // containment proof and the count needs the scan
    assert(!answered.contains("silver_payments.payment_amount.within_range"))
    assert(withFooter.contains("silver_payments.payment_amount.within_range"))
    spark.conf.set("spark.graft.dq.footer", "false")
    try {
      val (scanOnly, answeredOff) = rowsAndAnswered()
      assert(answeredOff.isEmpty)
      assert(withFooter == scanOnly,
        "footer answers must be value-identical to the scan path")
    } finally spark.conf.unset("spark.graft.dq.footer")
  }

  test("origin: maps rename chains to footer columns, rejects filters " +
      "and derived columns") {
    // bronze customer_id ← raw id ← c_custkey: two bare-alias hops
    val bronze = graft.bronze.Bronze.customers(spark, Sf0001)
    val o = FooterStats.origin(bronze)
    assert(o.isDefined)
    val (root, byName) = o.get
    assert(root.endsWith("customer.parquet"))
    assert(byName("customer_id") == "c_custkey")
    // email is a CASE expression — present in the frame, absent from the
    // mapping (derived values have no footer)
    assert(!byName.contains("email"))
    // a Filter anywhere breaks eligibility: footer rows ≠ frame rows
    assert(FooterStats.origin(bronze.filter(col("customer_id") > 10)).isEmpty)
    // an aggregate too
    assert(FooterStats.origin(bronze.groupBy("customer_id").count()).isEmpty)
  }

  test("read: null counts exact, numeric range and string-min proofs " +
      "hold on freshly written parquet") {
    import spark.implicits._
    val dir = graft.model.Scratch.dir("graft_footer_probe")
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "abc"), (2L, null, "zz"), (null, 7.5, "m"), (4L, 0.5, "abc"))
      .toDF("k", "x", "s").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/t")
    val stats = FooterStats.read(spark, s"$dir/t", Set("k", "x", "s"))
    assert(stats.rowCount == 4L)
    assert(stats.cols("k").nullCount.contains(1L))
    assert(stats.cols("x").nullCount.contains(1L))
    assert(stats.cols("s").nullCount.contains(0L))
    val (lo, hi) = stats.cols("x").numRange.get
    assert(lo == BigDecimal(0.5) && hi == BigDecimal(7.5))
    assert(stats.cols("s").strMinFirstByte.contains('a'.toInt))
    assert(stats.cols("s").numRange.isEmpty, "strings carry no num range")
    // an empty string kills the string-min proof (its min is empty) —
    // the check falls back to the scan rather than claim zero
    Seq(("", 1L), ("ok", 2L)).toDF("s", "k")
      .write.mode("overwrite").parquet(s"$dir/t2")
    val s2 = FooterStats.read(spark, s"$dir/t2", Set("s"))
    assert(s2.cols("s").strMinFirstByte.isEmpty)
    // an all-null column: no range, allNull flagged
    Seq[(java.lang.Double, Long)]((null, 1L), (null, 2L)).toDF("x", "k")
      .write.mode("overwrite").parquet(s"$dir/t3")
    val s3 = FooterStats.read(spark, s"$dir/t3", Set("x"))
    assert(s3.cols("x").allNull && s3.cols("x").numRange.isEmpty)
    assert(s3.cols("x").nullCount.contains(2L))
  }

  test("read: schema evolution stays exact — files missing the column " +
      "contribute their whole row count as nulls") {
    import spark.implicits._
    val dir = graft.model.Scratch.dir("graft_footer_evo")
    // old file written before `email` existed; new file has it with 1 null
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "other")
      .coalesce(1).write.parquet(s"$dir/t")
    Seq[(java.lang.Long, String)]((4L, "x@y.z"), (5L, null))
      .toDF("k", "email").coalesce(1).write.mode("append").parquet(s"$dir/t")
    val stats = FooterStats.read(spark, s"$dir/t", Set("email", "k"))
    assert(stats.rowCount == 5L)
    // the scan reads NULL for the 3 old-file rows: 3 + 1 explicit null
    assert(stats.cols("email").nullCount.contains(4L),
      "missing-column files must count every row as a null")
    assert(!stats.cols("email").allNull)
    assert(stats.cols("k").nullCount.contains(0L))
    // a column absent from EVERY file is all-null with a full null count
    val gone = FooterStats.read(spark, s"$dir/t", Set("nope"))
    assert(gone.cols("nope").nullCount.contains(5L) && gone.cols("nope").allNull)
  }

  test("read: distributed footer tasks fold to the exact driver-path " +
      "result (many-file tables read footers on executors)") {
    import spark.implicits._
    val dir = graft.model.Scratch.dir("graft_footer_dist")
    // enough files that the distributed path forms several tasks
    Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "abc"), (2L, null, "zz"), (null, 7.5, "m"), (4L, 0.5, "abc"),
      (5L, -1.5, "q"), (null, null, "abc"))
      .toDF("k", "x", "s").repartition(6).write.mode("overwrite")
      .parquet(s"$dir/t")
    val driverSide = FooterStats.read(spark, s"$dir/t", Set("k", "x", "s"))
    spark.conf.set(FooterStats.DistributedKey, "force")
    try {
      val distributed = FooterStats.read(spark, s"$dir/t", Set("k", "x", "s"))
      assert(distributed == driverSide,
        "both footer-read paths must fold identical statistics")
    } finally spark.conf.unset(FooterStats.DistributedKey)
    assert(driverSide.rowCount == 6L)
    assert(driverSide.cols("k").nullCount.contains(2L))
    val (lo, hi) = driverSide.cols("x").numRange.get
    assert(lo == BigDecimal(-1.5) && hi == BigDecimal(7.5))
  }

  test("read: distributed LISTING over a nested partitioned layout folds " +
      "bit-equal to the driver walk (100k-file tables must not serialize " +
      "listStatus round-trips on the driver)") {
    import spark.implicits._
    val dir = graft.model.Scratch.dir("graft_footer_list")
    // two partition levels → a real directory tree for the BFS frontier
    (1 to 200).map(i => (i.toLong, i % 5, i % 4, if (i % 7 == 0) null else s"v$i"))
      .toDF("k", "pa", "pb", "s")
      .write.partitionBy("pa", "pb").mode("overwrite").parquet(s"$dir/t")
    val driverSide = FooterStats.read(spark, s"$dir/t", Set("k", "s"))
    spark.conf.set(FooterStats.DistributedKey, "force")
    try {
      val distributed = FooterStats.read(spark, s"$dir/t", Set("k", "s"))
      assert(distributed == driverSide,
        "distributed listing + reads must fold the driver walk's result")
    } finally spark.conf.unset(FooterStats.DistributedKey)
    assert(driverSide.rowCount == 200L)
    assert(driverSide.cols("s").nullCount.contains(200L / 7))
  }

  test("footerKindOf: recognizes the three shipped macro shapes by their " +
      "RENDERED SQL and refuses anything edited") {
    val range = DataQuality.footerKindOf(
      """select * from {{ ref('t') }} where amt is not null
        |  and (amt < 0 or amt > 100)""".stripMargin)
    assert(range.contains(DataQuality.RangeKind("amt", BigDecimal(0),
      BigDecimal(100))))
    val ne = DataQuality.footerKindOf(
      "select * from x where m is not null and trim(m) = ''")
    assert(ne.contains(DataQuality.NotEmptyKind("m")))
    val floor = DataQuality.footerKindOf(
      "select c as n_rows from (select count(*) as c from x) where c < 5")
    assert(floor.contains(DataQuality.RowFloorKind(5L)))
    // a user-edited macro (different predicate) silently loses the fast
    // path — the scan evaluates whatever the new SQL says
    assert(DataQuality.footerKindOf(
      "select * from x where m is not null and trim(m) = '' or 1=1").isEmpty)
    assert(DataQuality.footerKindOf(
      "select * from x where amt < 0 or amt > 100").isEmpty)
  }
}
