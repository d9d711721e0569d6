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
  * becomes a [[TableSink]] overwrite followed by a fresh read — the same
  * physical barrier dbt's table materialization creates, which is what makes
  * the gold layer's precomputation an *architecture-level* optimization at
  * 100 TB (downstream readers scan the compact mart, not the raw data).
  *
  * Like dbt's `threads`, independent models materialize concurrently:
  * [[run]] schedules the DAG in dependency waves and submits each wave's
  * models to a fixed-size pool (the gold fan-out runs 3-wide). Spark
  * sessions support concurrent actions, so each model's write is its own
  * job and the scheduler interleaves their stages.
  */
object Registry {

  /** The reference's `generate_database_name` macro
    * (/root/reference/macros/generate_database_name.sql:1-9): a custom
    * database name is trimmed then uppercased (the macro pipes through
    * `trim | upper`), otherwise the target default applies. Catalog
    * resolution in Spark is case-insensitive, so
    * `spark.table("silver.silver_orders")` resolves against the
    * uppercase-created database. */
  def databaseName(custom: Option[String], targetDefault: String): String =
    custom.map(_.trim.toUpperCase(java.util.Locale.ROOT)).getOrElse(targetDefault)

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization

  final case class Model(
    name: String,
    layer: String,
    materialization: Materialization,
    deps: Seq[String],
    build: (SparkSession, String, Map[String, DataFrame]) => DataFrame,
    layout: TableLayout = TableLayout.none)

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
    // silver fact tables co-bucketed on order_key: the gold
    // payments⋈orders joins (J3/J5) then run shuffle-free under a
    // bucketing-aware sink (the bucketing IS the shuffle, paid at write)
    Model("silver_orders", "silver", Table, Seq("bronze_orders", "silver_customers"),
      (_, _, up) => Silver.ordersFrom(up("bronze_orders"), up("silver_customers")),
      TableLayout(bucketBy = Some((8, Seq("order_key"))), sortBy = Seq("order_key"))),
    Model("silver_payments", "silver", Table, Seq("bronze_payments", "silver_orders"),
      (_, _, up) => Silver.paymentsFrom(up("bronze_payments"), up("silver_orders")),
      TableLayout(bucketBy = Some((8, Seq("order_key"))), sortBy = Seq("order_key"))),
    Model("gold_customer_summary", "gold", Table,
      Seq("silver_customers", "silver_orders", "silver_payments"),
      (_, _, up) => Gold.customerSummaryFrom(
        up("silver_customers"), up("silver_orders"), up("silver_payments"))),
    // date-partitioned marts: downstream year-scoped reads prune whole
    // partition directories instead of scanning the table
    Model("gold_order_metrics", "gold", Table, Seq("silver_orders"),
      (_, _, up) => Gold.orderMetricsFrom(up("silver_orders")),
      TableLayout(partitionBy = Seq("order_year"))),
    Model("gold_revenue_analysis", "gold", Table,
      Seq("silver_orders", "silver_payments"),
      (_, _, up) => Gold.revenueAnalysisFrom(
        up("silver_orders"), up("silver_payments")),
      TableLayout(partitionBy = Seq("order_year"))))

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
    * `warehouseDir` as path-routed parquet ([[ParquetSink]]). */
  def run(spark: SparkSession, sourceDir: String, warehouseDir: String): Map[String, DataFrame] =
    run(spark, sourceDir, new ParquetSink(warehouseDir))

  /** Materialize the whole DAG through `sink`, dependency-wave parallel
    * (dbt `threads`). Returns each model's post-materialization DataFrame
    * (for Table models: a reader over the stored table). */
  def run(spark: SparkSession, sourceDir: String, sink: TableSink,
      threads: Int = 4): Map[String, DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val ordered = topoOrder
    // wave = longest dependency path length; every dep lands in an earlier
    // wave, so models within a wave are independent of each other
    val wave = scala.collection.mutable.Map.empty[String, Int]
    ordered.foreach(m => wave(m.name) = (m.deps.map(wave) :+ -1).max + 1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, threads))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val acc = scala.collection.mutable.Map.empty[String, DataFrame]
      ordered.groupBy(m => wave(m.name)).toSeq.sortBy(_._1).foreach { case (_, ms) =>
        val upstream = acc.toMap
        val batch = Future.sequence(ms.map(m => Future {
          m.name -> materialize(spark, m, sourceDir, sink, upstream)
        }))
        Await.result(batch, Duration.Inf).foreach { case (n, df) => acc(n) = df }
      }
      acc.toMap
    } finally pool.shutdown()
  }

  private def materialize(spark: SparkSession, m: Model, sourceDir: String,
      sink: TableSink, upstream: Map[String, DataFrame]): DataFrame = {
    val df = m.build(spark, sourceDir, upstream)
    val materialized = m.materialization match {
      case View => df
      case Table => sink.overwrite(spark, m.layer, m.name, df, m.layout)
    }
    materialized.createOrReplaceTempView(m.name)
    materialized
  }

  /** `dbt source freshness` over the raw sources (SURVEY.md §3.3). */
  def sourceFreshness(spark: SparkSession, sourceDir: String): Map[String, String] = Map(
    "raw_orders" -> graft.quality.Checks.freshness(
      RawSources.rawOrders(spark, sourceDir), "_loaded_at", graft.model.Clock.now))
}
