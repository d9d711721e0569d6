package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.Registry

/** End-to-end dbt-run equivalent over sf0.001 testdata. */
class RegistrySpec extends SparkSpec {

  test("topoOrder respects the silver chain and gold fan-in") {
    val order = Registry.topoOrder.map(_.name)
    def before(a: String, b: String) = order.indexOf(a) < order.indexOf(b)
    assert(order.size == 9)
    assert(before("bronze_customers", "silver_customers"))
    assert(before("silver_customers", "silver_orders"))
    assert(before("silver_orders", "silver_payments"))
    assert(before("silver_payments", "gold_customer_summary"))
    assert(before("silver_orders", "gold_order_metrics"))
  }

  test("run materializes all nine models; silver/gold written as parquet") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val out = Registry.run(spark, Sf0001, wh)
    assert(out.size == 9)
    out.foreach { case (name, df) => assert(df.count() > 0, name) }
    // table materialization barrier: silver/gold exist on disk
    assert(new java.io.File(s"$wh/silver/silver_orders").exists())
    assert(new java.io.File(s"$wh/gold/gold_revenue_analysis").exists())
    // views registered: ref()-style SQL access works
    assert(spark.sql("select count(*) from gold_customer_summary").head().getLong(0) > 0)
    // FK integrity across the materialized layers
    assert(graft.quality.Checks.relationships(
      out("silver_orders"), "customer_key", out("silver_customers"), "customer_key").isEmpty)
    assert(graft.quality.Checks.relationships(
      out("silver_payments"), "order_key", out("silver_orders"), "order_key").isEmpty)
  }

  test("generate_database_name: custom uppercased, else target default") {
    assert(Registry.databaseName(Some("silver"), "analytics") == "SILVER")
    assert(Registry.databaseName(None, "analytics") == "analytics")
  }

  test("catalog sink: layers land in bronze/silver/gold SQL databases") {
    val out = Registry.run(spark, Sf0001, new graft.pipeline.CatalogSink())
    assert(out.size == 9)
    // the reference's generate_database_name routing, resolvable by SQL
    assert(spark.table("silver.silver_orders").count() ==
      out("silver_orders").count())
    assert(spark.sql("select count(*) from gold.gold_revenue_analysis")
      .head().getLong(0) > 0)
    assert(spark.catalog.databaseExists("bronze") == false,
      "bronze models are views, not tables")
  }

  test("catalog sink merge upserts by key (staged rewrite on parquet)") {
    import spark.implicits._
    val sink = new graft.pipeline.CatalogSink()
    sink.overwrite(spark, "silver", "merge_probe",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val merged = sink.merge(spark, "silver", "merge_probe",
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id")
    assert(merged.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(spark.table("silver.merge_probe").count() == 3)
  }

  test("co-bucketed silver tables join with no shuffle exchange") {
    val sink = new graft.pipeline.CatalogSink()
    val out = Registry.run(spark, Sf0001, sink)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the Exchange (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("silver.silver_orders")
        .join(spark.table("silver.silver_payments"), Seq("order_key"))
        .select("order_key", "payment_key", "order_amount", "payment_amount")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed-by-order_key tables must join without a shuffle:\n$plan")
      assert(joined.count() == out("silver_payments").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("gold marts are partitioned by order_year on disk") {
    val wh = Files.createTempDirectory("graft_wh_p").toString
    Registry.run(spark, Sf0001, wh)
    val dirs = new java.io.File(s"$wh/gold/gold_order_metrics").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("order_year=")),
      s"expected order_year= partition dirs, got ${dirs.toSeq}")
  }

  test("parquet sink merge matches the pure-transform semantics") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_wh_m").toString
    val sink = new graft.pipeline.ParquetSink(wh)
    sink.overwrite(spark, "silver", "m1", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val merged = sink.merge(spark, "silver", "m1",
      Seq((2L, "B"), (3L, "c")).toDF("id", "v"), "id")
    assert(merged.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("source freshness reports error for the stale pinned orders feed") {
    // raw_orders _loaded_at is pinned 5 days before Clock.now (120h > 48h).
    assert(Registry.sourceFreshness(spark, Sf0001)("raw_orders") == "error")
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
