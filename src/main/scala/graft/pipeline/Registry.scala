package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.adapter.RawSources
import graft.bronze.Bronze
import graft.silver.Silver
import graft.gold.Gold

/** dbt-run equivalent: the model DAG with per-layer materialization
  * (SURVEY.md §3.1).
  *
  * `ref()` becomes a lookup of the already-materialized upstream DataFrame;
  * `materialized='view'` (bronze, `dbt_project.yml:19`) becomes a lazy temp
  * view; `materialized='table'` (silver/gold, `dbt_project.yml:24,30`)
  * becomes an overwrite parquet write followed by a fresh read — the same
  * physical barrier dbt's table materialization creates, which is what makes
  * the gold layer's precomputation an *architecture-level* optimization at
  * 100 TB (downstream readers scan the compact mart, not the raw data).
  *
  * Like dbt's `threads`, independent models could materialize concurrently;
  * kept sequential here because Spark already parallelizes within each
  * write and the silver chain is strictly linear anyway (SURVEY.md §3.1).
  */
object Registry {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization

  final case class Model(
    name: String,
    layer: String,
    materialization: Materialization,
    deps: Seq[String],
    build: (SparkSession, String, Map[String, DataFrame]) => DataFrame)

  /** All nine models; listed in any order — [[topoOrder]] sorts by deps. */
  val models: Seq[Model] = Seq(
    Model("bronze_customers", "bronze", View, Seq.empty,
      (s, dir, _) => Bronze.customers(s, dir)),
    Model("bronze_orders", "bronze", View, Seq.empty,
      (s, dir, _) => Bronze.orders(s, dir)),
    Model("bronze_payments", "bronze", View, Seq.empty,
      (s, dir, _) => Bronze.payments(s, dir)),
    Model("silver_customers", "silver", Table, Seq("bronze_customers"),
      (_, _, up) => Silver.customersFrom(up("bronze_customers"))),
    Model("silver_orders", "silver", Table, Seq("bronze_orders", "silver_customers"),
      (_, _, up) => Silver.ordersFrom(up("bronze_orders"), up("silver_customers"))),
    Model("silver_payments", "silver", Table, Seq("bronze_payments", "silver_orders"),
      (_, _, up) => Silver.paymentsFrom(up("bronze_payments"), up("silver_orders"))),
    Model("gold_customer_summary", "gold", Table,
      Seq("silver_customers", "silver_orders", "silver_payments"),
      (_, _, up) => Gold.customerSummaryFrom(
        up("silver_customers"), up("silver_orders"), up("silver_payments"))),
    Model("gold_order_metrics", "gold", Table, Seq("silver_orders"),
      (_, _, up) => Gold.orderMetricsFrom(up("silver_orders"))),
    Model("gold_revenue_analysis", "gold", Table,
      Seq("silver_orders", "silver_payments"),
      (_, _, up) => Gold.revenueAnalysisFrom(
        up("silver_orders"), up("silver_payments"))))

  /** Kahn topological order; deterministic (stable by declaration order). */
  def topoOrder: Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    val resolved = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String, path: Set[String]): Unit = {
      require(!path.contains(n), s"cycle at $n")
      if (!resolved.contains(n)) {
        byName(n).deps.foreach(visit(_, path + n))
        resolved += n
      }
    }
    models.foreach(m => visit(m.name, Set.empty))
    resolved.toSeq.map(byName)
  }

  /** Materialize the whole DAG from `sourceDir` testdata into
    * `warehouseDir`. Returns each model's post-materialization DataFrame
    * (for Table models: a reader over the written parquet). */
  def run(spark: SparkSession, sourceDir: String, warehouseDir: String): Map[String, DataFrame] = {
    topoOrder.foldLeft(Map.empty[String, DataFrame]) { (acc, m) =>
      val df = m.build(spark, sourceDir, acc)
      val materialized = m.materialization match {
        case View =>
          df.createOrReplaceTempView(m.name)
          df
        case Table =>
          val path = s"$warehouseDir/${m.layer}/${m.name}"
          df.write.mode("overwrite").parquet(path)
          val back = spark.read.parquet(path)
          back.createOrReplaceTempView(m.name)
          back
      }
      acc + (m.name -> materialized)
    }
  }

  /** `dbt source freshness` over the raw sources (SURVEY.md §3.3). */
  def sourceFreshness(spark: SparkSession, sourceDir: String): Map[String, String] = Map(
    "raw_orders" -> graft.quality.Checks.freshness(
      RawSources.rawOrders(spark, sourceDir), "_loaded_at", graft.model.Clock.now))
}
