package graft.quality

import graft.SparkSpec

/** The build-once silver trio behind the three dq rows ([[SilverStage]]):
  * one staged build per corpus fingerprint serves dq_summary, dq_statuses,
  * AND dq_failures; the kill switch's per-call-pin path emits identical
  * rows; and the footer fast path still answers from the staged files. */
class SilverStageSpec extends SparkSpec {

  private def summaryRows() =
    DataQuality.summary(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def statusRows() =
    DataQuality.statuses(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet

  private def failureRows() =
    Checks.acceptedValuesFailures(
      SilverStage.payments(spark, Sf0001), "payment_method",
      Seq("credit_card", "bank_transfer", "paypal", "cash", "other"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("one trio build serves all three dq rows; kill switch emits " +
      "identical rows through the per-call pins") {
    spark.conf.set(SilverStage.RootKey, java.nio.file.Files
      .createTempDirectory("graft_dq_silver_t").toString)
    try {
      val b0 = SilverStage.builds.get
      val (summaryOn, statusesOn, failuresOn) =
        (summaryRows(), statusRows(), failureRows())
      assert(SilverStage.builds.get == b0 + 1,
        "exactly ONE cold trio build across dq_summary + dq_statuses + " +
          "dq_failures — the sharing is the point")
      assert(failuresOn.nonEmpty, "the faithful digital_wallet quirk " +
        "must surface through the staged payments")
      spark.conf.set(SilverStage.ConfKey, "false")
      try {
        assert(summaryRows() == summaryOn,
          "staged and per-call-pin summaries must be value-identical")
        assert(statusRows() == statusesOn)
        assert(failureRows() == failuresOn)
      } finally spark.conf.unset(SilverStage.ConfKey)
      assert(SilverStage.builds.get == b0 + 1,
        "the kill-switch path must not build a trio")
    } finally spark.conf.unset(SilverStage.RootKey)
  }

  test("gold staging A/B: staged gold emits rows identical to the lazy " +
      "derivation, and the key separates the two cache shapes") {
    spark.conf.set(SilverStage.RootKey, java.nio.file.Files
      .createTempDirectory("graft_dq_silver_g").toString)
    spark.conf.set(SilverStage.GoldKey, "true")
    try {
      val rootOn = SilverStage.trioRoot(spark, Sf0001)
      val withGold = summaryRows()
      SilverStage.GoldNames.foreach(n =>
        assert(SilverStage.tables(spark, Sf0001).contains(n),
          s"goldstage on must serve $n from the stage"))
      spark.conf.unset(SilverStage.GoldKey) // back to the lazy default
      assert(SilverStage.trioRoot(spark, Sf0001) != rootOn,
        "gold-staged and silver-only trios must not share a cache key")
      assert(summaryRows() == withGold,
        "lazy gold over the staged silvers must be value-identical " +
          "to the staged gold")
    } finally {
      spark.conf.unset(SilverStage.GoldKey)
      spark.conf.unset(SilverStage.RootKey)
    }
  }

  test("trio cache key folds the silver recipe's plan identity — a " +
      "recipe change misses the cache instead of serving stale rows") {
    import org.apache.spark.sql.functions.col
    val sc = graft.silver.Silver.customersFrom(
      graft.bronze.Bronze.customers(spark, Sf0001))
    val so = graft.silver.Silver.ordersFrom(
      graft.bronze.Bronze.orders(spark, Sf0001), sc)
    val sp = graft.silver.Silver.paymentsFrom(
      graft.bronze.Bronze.payments(spark, Sf0001), so)
    val real = graft.model.PlanIdentity.planHash(Seq(sc, so, sp))
    assert(SilverStage.trioRoot(spark, Sf0001).contains(s"r$real"),
      "the trio root must embed the hash of the ACTUAL composed silver " +
        "plans — that derivation is what makes any recipe edit move the key")
    assert(graft.model.PlanIdentity.planHash(Seq(sc, so, sp)) == real,
      "plan identity must be deterministic across computations")
    // the 'deliberate one-line silver change with no version bump': one
    // added expression must move the hash, so the key misses and the
    // trio rebuilds — never serves rows built by the old recipe
    val edited = sp.filter(col("payment_amount") > -1)
    assert(graft.model.PlanIdentity.planHash(Seq(sc, so, edited)) != real,
      "a one-expression recipe change must change the cache key")
  }

  test("footer fast path answers from the staged trio's files " +
      "(the stage keeps footer eligibility, not just values)") {
    spark.conf.set(SilverStage.RootKey, java.nio.file.Files
      .createTempDirectory("graft_dq_silver_f").toString)
    try {
      val (_, answered) = DataQuality.summaryWithFooterAnswers(spark, Sf0001)
      Seq("silver_customers.email.not_null",
          "silver_orders.order_amount.not_null",
          "silver_payments.payment_key.not_null",
          "silver_payments.at_least_n_rows")
        .foreach(n => assert(answered.contains(n),
          s"$n must stay footer-answered through the staged trio"))
    } finally spark.conf.unset(SilverStage.RootKey)
  }

  test("malformed bucket-count conf fails loud, naming the key " +
      "(never a bare NumberFormatException, never a silent default)") {
    spark.conf.set(SilverStage.BucketsKey, "thirty two")
    try {
      val e = intercept[IllegalArgumentException] {
        SilverStage.buckets(spark, Sf0001)
      }
      assert(e.getMessage.contains(SilverStage.BucketsKey))
      assert(e.getMessage.contains("thirty two"))
    } finally spark.conf.unset(SilverStage.BucketsKey)
  }

  test("bucket count derives from input scale: pow2 of bytes/target, " +
      "clamped; explicit conf pins it; 0 disables") {
    // at the test SFs the raw inputs are far under one target-bucket of
    // bytes — the derived layout is a single near-free bucket (the
    // fixed 32 taxed small corpora with file/task overhead)
    assert(SilverStage.buckets(spark, Sf0001) == 1)
    // the derivation itself: ceil+pow2+clamp over synthetic byte counts
    // is pinned indirectly through derivedBuckets' two real tables; the
    // conf override is the fleet lever and must win verbatim
    spark.conf.set(SilverStage.BucketsKey, "64")
    try assert(SilverStage.buckets(spark, Sf0001) == 64)
    finally spark.conf.unset(SilverStage.BucketsKey)
    spark.conf.set(SilverStage.BucketsKey, "0")
    try assert(SilverStage.buckets(spark, Sf0001) == 0)
    finally spark.conf.unset(SilverStage.BucketsKey)
  }

  test("a cache root containing a quote character still serves the " +
      "bucketed trio (DDL location escaping)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dq_quote_d'oh").toString
    spark.conf.set(SilverStage.RootKey, root)
    try {
      assert(root.contains("'"))
      val rows = summaryRows()
      assert(rows.nonEmpty, "dq summary must evaluate through the " +
        "quoted-root bucketed trio")
    } finally spark.conf.unset(SilverStage.RootKey)
  }
}
