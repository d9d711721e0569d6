package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.bronze.Bronze
import graft.silver.Silver
import graft.gold.Gold
import graft.model.{Fin, Finalize}
import graft.oracle.OracleSql

/** Registry of driver-checked queries: each entry pairs a Spark DataFrame
  * builder with its DuckDB oracle SQL and a single column spec
  * ([[graft.model.Finalize]]) applied to both, so names, types, and row
  * order line up for the driver's hash compare.
  */
object Queries {
  import Fin.{P, Money, I, L}

  final case class Spec(
    name: String,
    cols: Seq[(String, Fin)],
    keys: Seq[String],
    build: (SparkSession, String) => DataFrame,
    oracleInner: String)

  private val auditT = Seq("_loaded_at" -> P)

  val specs: Seq[Spec] = Seq(
    Spec("bronze_customers",
      Seq("customer_id" -> P, "first_name" -> P, "last_name" -> P,
        "email" -> P, "created_at" -> P) ++ auditT :+ ("_source_model" -> P),
      Seq("customer_id"), Bronze.customers, OracleSql.bronzeCustomers),

    Spec("bronze_orders",
      Seq("order_id" -> P, "customer_id" -> P, "order_date" -> P,
        "order_status" -> P, "order_amount" -> P) ++ auditT :+ ("_source_model" -> P),
      Seq("order_id"), Bronze.orders, OracleSql.bronzeOrders),

    Spec("bronze_payments",
      Seq("payment_id" -> P, "order_id" -> P, "payment_method" -> P,
        "payment_amount" -> P, "payment_date" -> P) ++ auditT :+ ("_source_model" -> P),
      Seq("payment_id"), Bronze.payments, OracleSql.bronzePayments),

    Spec("silver_customers",
      Seq("customer_key" -> P, "customer_id" -> P, "first_name" -> P,
        "last_name" -> P, "full_name" -> P, "email" -> P, "created_at" -> P,
        "_loaded_at" -> P, "_updated_at" -> P, "_has_data_quality_issues" -> I),
      Seq("customer_id"), Silver.customers, OracleSql.silverCustomers),

    Spec("silver_orders",
      Seq("order_key" -> P, "customer_key" -> P, "order_id" -> P,
        "customer_id" -> P, "order_date" -> P, "order_status" -> P,
        "is_completed" -> P, "is_cancelled" -> P, "is_pending" -> P,
        "order_amount" -> P, "order_year" -> I, "order_month" -> I,
        "order_day" -> I, "order_quarter" -> I, "order_day_name" -> P,
        "order_year_month" -> P, "order_year_quarter" -> P,
        "_loaded_at" -> P, "_updated_at" -> P, "_has_data_quality_issues" -> I),
      Seq("order_id"), Silver.orders, OracleSql.silverOrders),

    Spec("silver_payments",
      Seq("payment_key" -> P, "order_key" -> P, "payment_id" -> P,
        "order_id" -> P, "payment_method" -> P, "payment_amount" -> P,
        "payment_date" -> P, "is_successful_payment" -> P,
        "is_failed_payment" -> P, "payment_size_category" -> P,
        "_loaded_at" -> P, "_updated_at" -> P, "_has_data_quality_issues" -> I),
      Seq("payment_id"), Silver.payments, OracleSql.silverPayments),

    Spec("gold_customer_summary",
      Seq("customer_key" -> P, "customer_id" -> P, "full_name" -> P,
        "first_name" -> P, "last_name" -> P, "email" -> P,
        "customer_since" -> P,
        "total_orders" -> L, "completed_orders" -> L,
        "cancelled_orders" -> L, "pending_orders" -> L,
        "lifetime_value" -> Money, "avg_order_value" -> Money,
        "max_order_value" -> P, "min_order_value" -> P,
        "total_payments" -> L, "unique_payment_methods" -> L,
        "total_paid_amount" -> Money, "preferred_payment_method" -> P,
        "first_order_date" -> P, "last_order_date" -> P,
        "customer_lifetime_days" -> I, "active_months" -> L,
        "days_since_last_order" -> I, "customer_segment" -> P,
        "customer_status" -> P, "recency_score" -> I,
        "frequency_score" -> I, "monetary_score" -> I, "_updated_at" -> P),
      Seq("customer_id"), Gold.customerSummary, OracleSql.customerSummary),

    Spec("user_erasure_summary",
      Seq("customer_key" -> P, "customer_id" -> P, "full_name" -> P,
        "first_name" -> P, "last_name" -> P, "email" -> P,
        "customer_since" -> P,
        "total_orders" -> L, "completed_orders" -> L,
        "cancelled_orders" -> L, "pending_orders" -> L,
        "lifetime_value" -> Money, "avg_order_value" -> Money,
        "max_order_value" -> P, "min_order_value" -> P,
        "total_payments" -> L, "unique_payment_methods" -> L,
        "total_paid_amount" -> Money, "preferred_payment_method" -> P,
        "first_order_date" -> P, "last_order_date" -> P,
        "customer_lifetime_days" -> I, "active_months" -> L,
        "days_since_last_order" -> I, "customer_segment" -> P,
        "customer_status" -> P, "recency_score" -> I,
        "frequency_score" -> I, "monetary_score" -> I, "_updated_at" -> P),
      Seq("customer_id"),
      pipeline.Erasure.customerSummaryErased,
      OracleSql.customerSummaryErased(pipeline.Erasure.ErasureMod)),

    Spec("gold_order_metrics",
      Seq("order_date" -> P, "order_year" -> I, "order_month" -> I,
        "order_day" -> I, "order_quarter" -> I, "order_year_month" -> P,
        "order_year_quarter" -> P, "order_day_name" -> P,
        "total_orders" -> L, "completed_orders" -> L, "cancelled_orders" -> L,
        "pending_orders" -> L, "unique_customers" -> L,
        "total_revenue" -> Money, "avg_order_value" -> Money,
        "max_order_value" -> P, "min_order_value" -> P,
        "potential_revenue" -> Money, "lost_revenue" -> Money,
        "completion_rate" -> Money, "cancellation_rate" -> Money,
        "orders_per_customer" -> Money,
        "cumulative_revenue" -> Money, "cumulative_orders" -> L,
        "revenue_7day_ma" -> Money, "orders_7day_ma" -> Money,
        "prior_day_revenue" -> Money, "week_ago_revenue" -> Money,
        "revenue_growth_vs_prior_day_pct" -> Money,
        "revenue_growth_vs_week_ago_pct" -> Money, "_updated_at" -> P),
      Seq("order_date"), Gold.orderMetrics, OracleSql.orderMetrics),

    Spec("gold_revenue_analysis",
      Seq("order_year_month" -> P, "order_year" -> I, "order_month" -> I,
        "order_quarter" -> I, "order_year_quarter" -> P,
        "total_orders" -> L, "unique_customers" -> L,
        "total_revenue" -> Money, "avg_order_value" -> Money,
        "max_order_value" -> P, "min_order_value" -> P,
        "orders_per_customer" -> Money,
        "prev_month_revenue" -> Money, "year_ago_revenue" -> Money,
        "prev_month_orders" -> L,
        "revenue_growth_mom_pct" -> Money, "orders_growth_mom_pct" -> Money,
        "revenue_growth_yoy_pct" -> Money,
        "ytd_revenue" -> Money, "ytd_orders" -> L,
        "credit_card_revenue" -> Money, "bank_transfer_revenue" -> Money,
        "paypal_revenue" -> Money, "cash_revenue" -> Money,
        "other_revenue" -> Money, "_updated_at" -> P),
      Seq("order_year_month"), Gold.revenueAnalysis, OracleSql.revenueAnalysis),

    Spec("dq_summary",
      Seq("check_name" -> P, "violations" -> L),
      Seq("check_name"),
      graft.quality.DataQuality.summary, graft.quality.DataQuality.oracle),

    Spec("dq_failures",
      Seq("value_field" -> P, "n_records" -> L),
      Seq("value_field"),
      (s, d) => graft.quality.Checks.acceptedValuesFailures(
        Silver.payments(s, d), "payment_method",
        Seq("credit_card", "bank_transfer", "paypal", "cash", "other")),
      s"""${OracleSql.prelude}
         SELECT payment_method AS value_field, count(*) AS n_records
         FROM silver_payments
         WHERE payment_method IS NOT NULL
           AND payment_method NOT IN
             ('credit_card', 'bank_transfer', 'paypal', 'cash', 'other')
         GROUP BY 1"""),

    Spec("profile_columns",
      Seq("column_name" -> P, "n_rows" -> L, "n_nulls" -> L,
        "n_distinct" -> L, "uniqueness" -> P, "is_candidate_key" -> I),
      Seq("column_name"),
      graft.quality.Profile.profileColumns,
      graft.quality.Profile.profileColumnsOracle(OracleSql.prelude)),

    Spec("source_freshness",
      Seq("source" -> P, "max_loaded_at" -> P, "hours_stale" -> L,
        "status" -> P),
      Seq("source"),
      (s, d) => graft.quality.Checks.freshnessSummary(s, d),
      graft.quality.Checks.freshnessSummaryOracle(OracleSql.prelude)),

    // ---- incremental / snapshot materializations (batch replays) ----

    Spec("incremental_merge",
      Seq("order_id" -> P, "customer_id" -> P, "order_date" -> P,
        "order_status" -> P, "order_amount" -> P) ++ auditT :+ ("_source_model" -> P),
      Seq("order_id"),
      pipeline.IncrementalQueries.incrementalMerge,
      pipeline.IncrementalQueries.incrementalMergeOracle),

    Spec("incremental_append",
      Seq("order_id" -> P, "customer_id" -> P, "order_date" -> P,
        "order_status" -> P, "order_amount" -> P) ++ auditT :+ ("_source_model" -> P),
      Seq("order_id"),
      pipeline.IncrementalQueries.incrementalAppend,
      pipeline.IncrementalQueries.incrementalAppendOracle),

    Spec("incremental_agg_merge",
      Seq("event_type" -> P, "n_events" -> L, "n_old_phase" -> L,
        "n_new_phase" -> L, "value_sum" -> P, "avg_value" -> P,
        "value_min_cents" -> L, "value_max_cents" -> L,
        "kmv_users_est" -> P, "exact_users" -> L),
      Seq("event_type"),
      pipeline.IncrementalQueries.incrementalAggMerge,
      pipeline.IncrementalQueries.incrementalAggMergeOracle),

    Spec("scd2_temporal_join",
      Seq("order_id" -> P, "customer_id" -> P, "event_ts" -> P,
        "email" -> P, "version_from" -> P, "matched" -> P),
      Seq("order_id"),
      pipeline.IncrementalQueries.scd2TemporalJoin,
      pipeline.IncrementalQueries.scd2TemporalJoinOracle),

    Spec("scd2_snapshot",
      Seq("customer_id" -> P, "email" -> P, "_valid_from" -> P,
        "_valid_to" -> P, "_is_current" -> P),
      Seq("customer_id", "_valid_from"),
      pipeline.IncrementalQueries.scd2Snapshot,
      pipeline.IncrementalQueries.scd2SnapshotOracle),

    // ---- general star-schema analytics (TPC-H-shaped) ----

    Spec("tpch_q1_pricing",
      Seq("l_returnflag" -> P, "l_linestatus" -> P, "sum_qty" -> P,
        "sum_base_price" -> P, "sum_disc_price" -> P, "sum_charge" -> P,
        "count_order" -> L),
      Seq("l_returnflag", "l_linestatus"),
      ops.Analytics.pricingSummary, ops.Analytics.pricingSummaryOracle),

    Spec("tpch_q3_segment_revenue",
      Seq("l_orderkey" -> P, "o_date" -> P, "o_orderpriority" -> P,
        "revenue" -> P),
      Seq("l_orderkey"),
      ops.Analytics.segmentRevenue, ops.Analytics.segmentRevenueOracle),

    Spec("tpch_q5_nation_revenue",
      Seq("r_name" -> P, "n_name" -> P, "revenue" -> P, "n_orders" -> L,
        "n_suppliers" -> L),
      Seq("r_name", "n_name"),
      ops.Analytics.nationRevenue, ops.Analytics.nationRevenueOracle),

    Spec("tpch_q7_trade_flow",
      Seq("supp_nation" -> P, "cust_nation" -> P, "l_year" -> I,
        "revenue" -> P, "n_items" -> L),
      Seq("supp_nation", "cust_nation", "l_year"),
      (s, d) => ops.Analytics.nationTradeFlow(s, d),
      ops.Analytics.nationTradeFlowOracle()),

    Spec("tpch_q9_profit",
      Seq("nation" -> P, "o_year" -> I, "profit" -> P, "n_items" -> L),
      Seq("nation", "o_year"),
      (s, d) => ops.Analytics.partTypeProfit(s, d),
      ops.Analytics.partTypeProfitOracle()),

    Spec("revenue_cube",
      Seq("order_year" -> I, "order_quarter" -> I, "gid" -> L,
        "n_orders" -> L, "revenue" -> P),
      Seq("gid", "order_year", "order_quarter"),
      ops.Analytics.revenueCube,
      ops.Analytics.revenueCubeOracle(OracleSql.prelude)),

    Spec("revenue_rolling_28d",
      Seq("order_date" -> P, "n_orders" -> L, "revenue" -> P,
        "rolling_28d_revenue" -> P, "rolling_28d_orders" -> L),
      Seq("order_date"),
      ops.Analytics.rollingRevenue28d,
      ops.Analytics.rollingRevenue28dOracle(OracleSql.prelude)),

    Spec("method_revenue_ranks",
      Seq("order_year_month" -> P, "payment_method" -> P, "revenue" -> P,
        "rnk" -> I, "dense_rnk" -> I, "pct_rank" -> P, "cume" -> P,
        "quartile" -> I),
      Seq("order_year_month", "payment_method"),
      ops.Analytics.methodRevenueRanks,
      ops.Analytics.methodRevenueRanksOracle(OracleSql.prelude)),

    Spec("payments_pivot",
      Seq("order_year_month" -> P, "credit_card" -> P, "bank_transfer" -> P,
        "paypal" -> P, "cash" -> P, "digital_wallet" -> P, "other" -> P),
      Seq("order_year_month"),
      ops.Analytics.paymentMethodPivot,
      ops.Analytics.paymentMethodPivotOracle(OracleSql.prelude)),

    Spec("order_percentiles",
      Seq("order_year" -> I, "n_orders" -> L, "p50" -> P, "p90" -> P,
        "p99" -> P),
      Seq("order_year"),
      ops.Analytics.orderPercentiles,
      ops.Analytics.orderPercentilesOracle(OracleSql.prelude)),

    Spec("tpch_q13_custdist",
      Seq("c_count" -> L, "custdist" -> L),
      Seq("c_count"),
      ops.Analytics.customerOrderDistribution,
      ops.Analytics.customerOrderDistributionOracle),

    Spec("tpch_q14_promo_share",
      Seq("ship_month" -> P, "promo_revenue" -> P, "total_revenue" -> P,
        "n_items" -> L, "promo_share" -> P),
      Seq("ship_month"),
      ops.Analytics.promoShare, ops.Analytics.promoShareOracle),

    // ---- TPC-H suite completion (Q2..Q22 shapes, ops.TpchSuite) ----

    Spec("tpch_q2_min_cost_supplier",
      Seq("p_partkey" -> P, "p_name" -> P, "s_name" -> P, "n_name" -> P,
        "unit_cost" -> P),
      Seq("p_partkey", "s_name"),
      (s, d) => ops.TpchSuite.minCostSupplier(s, d),
      ops.TpchSuite.minCostSupplierOracle()),

    Spec("tpch_q4_priority",
      Seq("o_orderpriority" -> P, "n_orders" -> L),
      Seq("o_orderpriority"),
      ops.TpchSuite.orderPriorityCheck, ops.TpchSuite.orderPriorityCheckOracle),

    Spec("tpch_q6_forecast",
      Seq("ship_year" -> I, "revenue" -> P, "n_items" -> L),
      Seq("ship_year"),
      ops.TpchSuite.forecastRevenue, ops.TpchSuite.forecastRevenueOracle),

    Spec("tpch_q8_market_share",
      Seq("o_year" -> I, "nation_revenue" -> P, "total_revenue" -> P,
        "mkt_share" -> P),
      Seq("o_year"),
      (s, d) => ops.TpchSuite.marketShare(s, d), ops.TpchSuite.marketShareOracle()),

    Spec("tpch_q10_returns",
      Seq("c_custkey" -> P, "c_name" -> P, "c_acctbal" -> P, "n_name" -> P,
        "revenue" -> P, "n_items" -> L),
      Seq("c_custkey"),
      ops.TpchSuite.returnedItems, ops.TpchSuite.returnedItemsOracle),

    Spec("tpch_q11_important_parts",
      Seq("p_partkey" -> P, "value" -> P),
      Seq("p_partkey"),
      (s, d) => ops.TpchSuite.importantParts(s, d),
      ops.TpchSuite.importantPartsOracle()),

    Spec("tpch_q12_ship_delay",
      Seq("delay_bucket" -> P, "high_priority_count" -> L,
        "low_priority_count" -> L),
      Seq("delay_bucket"),
      ops.TpchSuite.shipDelayClasses, ops.TpchSuite.shipDelayClassesOracle),

    Spec("tpch_q15_top_supplier",
      Seq("s_suppkey" -> P, "s_name" -> P, "total_revenue" -> P),
      Seq("s_suppkey"),
      ops.TpchSuite.topSupplier, ops.TpchSuite.topSupplierOracle),

    Spec("tpch_q16_supplier_cnt",
      Seq("p_brand" -> P, "p_type" -> P, "p_size" -> I, "supplier_cnt" -> L),
      Seq("p_brand", "p_type", "p_size"),
      (s, d) => ops.TpchSuite.supplierCounts(s, d),
      ops.TpchSuite.supplierCountsOracle()),

    Spec("tpch_q17_small_qty",
      Seq("p_brand" -> P, "avg_yearly" -> P, "n_items" -> L),
      Seq("p_brand"),
      (s, d) => ops.TpchSuite.smallQtyRevenue(s, d),
      ops.TpchSuite.smallQtyRevenueOracle()),

    Spec("tpch_q18_large_orders",
      Seq("c_name" -> P, "c_custkey" -> P, "o_orderkey" -> P, "o_date" -> P,
        "o_totalprice" -> P, "sum_qty" -> P),
      Seq("o_orderkey"),
      (s, d) => ops.TpchSuite.largeOrders(s, d),
      ops.TpchSuite.largeOrdersOracle()),

    Spec("tpch_q19_disjunctive",
      Seq("p_brand" -> P, "revenue" -> P, "n_items" -> L),
      Seq("p_brand"),
      ops.TpchSuite.disjunctiveRevenue, ops.TpchSuite.disjunctiveRevenueOracle),

    Spec("tpch_q20_promo_suppliers",
      Seq("s_suppkey" -> P, "s_name" -> P, "n_name" -> P),
      Seq("s_suppkey"),
      (s, d) => ops.TpchSuite.promotionSuppliers(s, d),
      ops.TpchSuite.promotionSuppliersOracle()),

    Spec("tpch_q21_blame_suppliers",
      Seq("s_name" -> P, "numwait" -> L),
      Seq("s_name"),
      ops.TpchSuite.blameSuppliers, ops.TpchSuite.blameSuppliersOracle),

    Spec("tpch_q22_idle_customers",
      Seq("c_nationkey" -> I, "n_customers" -> L, "total_acctbal" -> P),
      Seq("c_nationkey"),
      (s, d) => ops.TpchSuite.idleCustomers(s, d),
      ops.TpchSuite.idleCustomersOracle()),

    // ---- training-data pipeline ops (documents / embeddings / events) ----

    Spec("text_stats",
      Seq("doc_id" -> P, "lang" -> P, "source" -> P, "char_count" -> L,
        "word_count" -> L, "stopword_count" -> L, "avg_word_len" -> P,
        "stopword_ratio" -> P, "token_est" -> L, "quality_score" -> P,
        "fingerprint" -> P),
      Seq("doc_id"), ops.TextOps.textStats, ops.TextOps.textStatsOracle),

    Spec("lang_id",
      Seq("doc_id" -> P, "labeled_lang" -> P, "predicted_lang" -> P,
        "best_score" -> L),
      Seq("doc_id"), ops.TextOps.langId, ops.TextOps.langIdOracle),

    Spec("dedup_exact",
      Seq("text_hash" -> P, "keeper_doc_id" -> P, "dup_count" -> L),
      Seq("text_hash"), ops.Dedup.exact, ops.Dedup.exactOracle),

    Spec("dedup_ngram_jaccard",
      Seq("doc_a" -> P, "doc_b" -> P, "n_common" -> L, "jaccard" -> P),
      Seq("doc_a", "doc_b"),
      (s, d) => ops.Dedup.ngramJaccard(s, d), ops.Dedup.ngramJaccardOracle()),

    Spec("dedup_minhash_lsh",
      Seq("doc_a" -> P, "doc_b" -> P, "shared_bands" -> L),
      Seq("doc_a", "doc_b"), ops.Dedup.minhashLsh, ops.Dedup.minhashLshOracle),

    Spec("dedup_clusters",
      Seq("doc_id" -> P, "cluster_id" -> P, "cluster_size" -> L),
      Seq("doc_id"), ops.Dedup.dedupClusters, ops.Dedup.dedupClustersOracle),

    Spec("dedup_pagerank",
      Seq("doc_id" -> P, "degree" -> L, "pagerank" -> P),
      Seq("doc_id"),
      (s, d) => ops.Dedup.dedupPagerank(s, d),
      ops.Dedup.dedupPagerankOracle()),

    Spec("dedup_simhash",
      Seq("doc_a" -> P, "doc_b" -> P, "hamming" -> I),
      Seq("doc_a", "doc_b"),
      (s, d) => ops.Dedup.simhash(s, d), ops.Dedup.simhashOracle()),

    Spec("chunks_dedup",
      Seq("chunk_md5" -> P, "keeper_doc_id" -> P, "keeper_chunk_idx" -> L,
        "dup_count" -> L),
      Seq("chunk_md5"),
      ops.Dedup.chunkDedup, ops.Dedup.chunkDedupOracle),

    Spec("split_leakage",
      Seq("split_a" -> P, "split_b" -> P, "n_pairs" -> L, "is_leak" -> I),
      Seq("split_a", "split_b"),
      ops.Dedup.splitLeakage, ops.Dedup.splitLeakageOracle),

    Spec("dedup_winnow",
      Seq("doc_a" -> P, "doc_b" -> P, "shared_fps" -> L),
      Seq("doc_a", "doc_b"),
      ops.Dedup.winnowNearDup, ops.Dedup.winnowNearDupOracle),

    Spec("dedup_incremental",
      Seq("doc_a" -> P, "doc_b" -> P, "shared_fps" -> L),
      Seq("doc_a", "doc_b"),
      ops.IncrementalDedup.replay, ops.Dedup.winnowNearDupOracle),

    Spec("dedup_incremental_delta",
      Seq("doc_a" -> P, "doc_b" -> P, "shared_fps" -> L),
      Seq("doc_a", "doc_b"),
      ops.IncrementalDedup.replayDelta,
      ops.IncrementalDedup.replayDeltaOracle),

    Spec("dedup_store_delete",
      Seq("doc_a" -> P, "doc_b" -> P, "shared_fps" -> L),
      Seq("doc_a", "doc_b"),
      ops.IncrementalDedup.replayDelete,
      ops.IncrementalDedup.replayDeleteOracle),

    Spec("ann_lsh_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annLshTopK(s, d), ops.Similarity.annLshTopKOracle()),

    Spec("ann_lsh_multiprobe",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annLshMultiProbeTopK(s, d),
      ops.Similarity.annLshMultiProbeTopKOracle()),

    Spec("ann_ivf_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annIvfTopK(s, d), ops.Similarity.annIvfTopKOracle()),

    Spec("ann_delete_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annIvfTopKDeleted(s, d),
      ops.Similarity.annIvfTopKDeletedOracle()),

    Spec("ann_ivf_multiprobe",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annIvfMultiProbeTopK(s, d),
      ops.Similarity.annIvfMultiProbeTopKOracle()),

    Spec("ann_filtered_topk",
      Seq("query_id" -> P, "label" -> I, "neighbor_id" -> P, "rank" -> I,
        "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annIvfTopKFiltered(s, d),
      ops.Similarity.annIvfTopKFilteredOracle()),

    Spec("ann_mmr_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "mmr_rank" -> I,
        "relevance" -> P, "mmr_score" -> P),
      Seq("query_id", "mmr_rank"),
      (s, d) => ops.Similarity.annMmrTopK(s, d),
      ops.Similarity.annMmrTopKOracle()),

    Spec("ann_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annTopK(s, d), ops.Similarity.annTopKOracle()),

    Spec("ann_int8_topk",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annInt8TopK(s, d),
      ops.Similarity.annInt8TopKOracle()),

    Spec("ann_pq_adc",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "adc_cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annPqAdc(s, d),
      ops.Similarity.annPqAdcOracle()),

    Spec("ann_ivf_rerank",
      Seq("query_id" -> P, "neighbor_id" -> P, "rank" -> I, "cosine" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annIvfAdcRerank(s, d),
      ops.Similarity.annIvfAdcRerankOracle()),

    Spec("ann_negatives",
      Seq("query_id" -> P, "kind" -> P, "rank" -> I, "neighbor_id" -> P),
      Seq("query_id", "kind", "rank"),
      (s, d) => ops.Similarity.annNegatives(s, d),
      ops.Similarity.annNegativesOracle),

    Spec("ann_negatives_indexed",
      Seq("query_id" -> P, "kind" -> P, "rank" -> I, "neighbor_id" -> P),
      Seq("query_id", "kind", "rank"),
      (s, d) => ops.Similarity.annNegativesIndexed(s, d),
      ops.Similarity.annNegativesIndexedOracle),

    Spec("ann_recall_report",
      Seq("variant" -> P, "hits" -> L, "exact_pairs" -> L, "recall" -> P),
      Seq("variant"),
      (s, d) => ops.Similarity.annRecallReport(s, d),
      ops.Similarity.annRecallReportOracle),

    Spec("ann_rrf_fusion",
      Seq("query_id" -> P, "rank" -> I, "neighbor_id" -> P, "rrf" -> P),
      Seq("query_id", "rank"),
      (s, d) => ops.Similarity.annRrfFusion(s, d),
      ops.Similarity.annRrfFusionOracle()),

    Spec("emb_dedup_exact",
      Seq("keeper_id" -> P, "dup_count" -> L),
      Seq("keeper_id"),
      (s, d) => ops.Similarity.exactVecDedup(s, d),
      ops.Similarity.exactVecDedupOracle),

    Spec("emb_near_dup",
      Seq("doc_a" -> P, "doc_b" -> P, "cosine" -> P),
      Seq("doc_a", "doc_b"),
      (s, d) => ops.Similarity.cosineNearDup(s, d), ops.Similarity.cosineNearDupOracle()),

    Spec("semdedup",
      Seq("vec_id" -> P, "centroid_id" -> P, "keeper_id" -> P,
        "cosine" -> P),
      Seq("vec_id"),
      (s, d) => ops.Similarity.semDedup(s, d), ops.Similarity.semDedupOracle()),

    Spec("corpus_shard_manifest",
      Seq("shard" -> I, "n_docs" -> L, "n_tokens" -> L, "n_chars" -> L,
        "first_key" -> P, "last_key" -> P, "member_digest" -> L),
      Seq("shard"),
      (s, d) => ops.Corpus.shardManifest(s, d), ops.Corpus.shardManifestOracle()),

    Spec("corpus_clean",
      Seq("doc_id" -> P, "labeled_lang" -> P, "predicted_lang" -> P,
        "dup_count" -> L, "token_est" -> L, "quality_score" -> P),
      Seq("doc_id"),
      (s, d) => ops.Corpus.corpusClean(s, d), ops.Corpus.corpusCleanOracle()),

    Spec("events_sessions",
      Seq("user_id" -> P, "session_seq" -> L, "n_events" -> L,
        "start_ts" -> P, "end_ts" -> P, "duration_secs" -> P,
        "total_value" -> P, "n_purchases" -> L, "n_errors" -> L,
        "n_event_types" -> L),
      Seq("user_id", "session_seq"), ops.Events.sessionize, ops.Events.sessionizeOracle),

    Spec("events_windowed",
      Seq("window_start" -> P, "event_type" -> P, "n_events" -> L,
        "n_users" -> L, "total_value" -> P),
      Seq("window_start", "event_type"), ops.Events.windowed, ops.Events.windowedOracle),

    Spec("events_session_window",
      Seq("user_id" -> P, "session_start" -> P, "session_end" -> P,
        "n_events" -> L, "total_value" -> P),
      Seq("user_id", "session_start"),
      ops.Events.sessionWindows, ops.Events.sessionWindowsOracle),

    Spec("events_attribution",
      Seq("purchase_id" -> P, "click_id" -> P, "user_id" -> P,
        "purchase_ts" -> P, "click_ts" -> P, "value" -> P),
      Seq("purchase_id", "click_id"),
      ops.Events.attribution, ops.Events.attributionOracle),

    Spec("events_attribution_last_k",
      Seq("purchase_id" -> P, "click_id" -> P, "user_id" -> P,
        "purchase_ts" -> P, "click_ts" -> P, "value" -> P, "recency" -> I),
      Seq("purchase_id", "recency"),
      (s, d) => ops.Events.attributionLastK(s, d),
      ops.Events.attributionLastKOracle()),

    Spec("events_asof",
      Seq("purchase_id" -> P, "user_id" -> P, "purchase_ts" -> P,
        "click_id" -> P, "click_ts" -> P, "value" -> P),
      Seq("purchase_id"),
      ops.Events.asofAttribution, ops.Events.asofAttributionOracle),

    Spec("vocab_top_terms",
      Seq("rank" -> I, "token" -> P, "term_freq" -> L, "doc_freq" -> L),
      Seq("rank"),
      (s, d) => ops.TextOps.vocabulary(s, d), ops.TextOps.vocabularyOracle()),

    Spec("docs_tfidf_topk",
      Seq("doc_id" -> P, "rank" -> I, "token" -> P, "tf" -> L, "df" -> L,
        "score" -> P),
      Seq("doc_id", "rank"),
      ops.TextOps.tfidfTopK, ops.TextOps.tfidfTopKOracle),

    Spec("docs_bigram_lm",
      Seq("w1" -> P, "next_rank" -> I, "w2" -> P, "bigram_count" -> L,
        "w1_count" -> L, "cond_prob" -> P),
      Seq("w1", "next_rank"),
      ops.TextOps.bigramLm, ops.TextOps.bigramLmOracle),

    Spec("docs_lm_surprisal",
      Seq("doc_id" -> P, "n_bigrams" -> L, "n_rare" -> L,
        "rare_frac" -> P, "min_cond_prob" -> P),
      Seq("doc_id"),
      ops.TextOps.lmSurprisal, ops.TextOps.lmSurprisalOracle),

    Spec("dedup_containment",
      Seq("doc_a" -> P, "doc_b" -> P, "n_common" -> L,
        "containment_a" -> P, "containment_b" -> P),
      Seq("doc_a", "doc_b"),
      ops.Dedup.containment, ops.Dedup.containmentOracle),

    Spec("dedup_span_profile",
      Seq("doc_id" -> P, "n_spans" -> L, "n_shared_spans" -> L,
        "shared_frac" -> P),
      Seq("doc_id"),
      ops.Dedup.spanProfile, ops.Dedup.spanProfileOracle),

    Spec("dedup_cut_spans",
      Seq("doc_id" -> P, "span_start" -> I, "span_end" -> I,
        "n_words" -> I),
      Seq("doc_id", "span_start"),
      ops.Dedup.cutSpans, ops.Dedup.cutSpansOracle),

    Spec("docs_trim_spans",
      Seq("doc_id" -> P, "n_words_before" -> L, "n_words_after" -> L,
        "trimmed_text" -> P),
      Seq("doc_id"),
      ops.Dedup.trimSpans, ops.Dedup.trimSpansOracle),

    Spec("sketch_kmv_distinct",
      Seq("event_type" -> P, "n_kept" -> L, "kth_min" -> L,
        "est_distinct" -> P, "exact_distinct" -> L, "est_ratio" -> P),
      Seq("event_type"),
      ops.Sketch.kmvDistinct, ops.Sketch.kmvDistinctOracle),

    Spec("sketch_cms_heavy",
      Seq("rank" -> I, "token" -> P, "exact_count" -> L,
        "cms_estimate" -> L, "over_ratio" -> P),
      Seq("rank"),
      ops.Sketch.cmsHeavyHitters, ops.Sketch.cmsHeavyHittersOracle),

    Spec("layout_zorder_stats",
      Seq("layout" -> P, "group_id" -> P, "n_events" -> L,
        "user_span" -> L, "ts_span" -> L),
      Seq("layout", "group_id"),
      ops.Zorder.layoutStats, ops.Zorder.layoutStatsOracle),

    Spec("sketch_hist_quantiles",
      Seq("p" -> I, "n" -> L, "est_cents" -> L, "exact_cents" -> L,
        "err_cents" -> L),
      Seq("p"),
      ops.Sketch.histQuantiles, ops.Sketch.histQuantilesOracle),

    Spec("sketch_kmv_intersect",
      Seq("type_a" -> P, "type_b" -> P, "n_kept" -> L, "n_both" -> L,
        "jaccard_est" -> P, "union_est" -> P, "est_intersect" -> P,
        "exact_intersect" -> L),
      Seq("type_a", "type_b"),
      ops.Sketch.kmvIntersect, ops.Sketch.kmvIntersectOracle),

    Spec("sketch_kmv_merge",
      Seq("event_type" -> P, "n_shards" -> L, "merged_n_kept" -> L,
        "merged_kth_min" -> L, "merged_est" -> P,
        "global_kth_min" -> L, "sketch_agrees" -> I),
      Seq("event_type"),
      ops.Sketch.kmvMergeShards, ops.Sketch.kmvMergeShardsOracle),

    Spec("docs_redact",
      Seq("doc_id" -> P, "n_emails" -> L, "n_numbers" -> L,
        "redacted_len" -> L, "redacted_md5" -> P),
      Seq("doc_id"),
      ops.TextOps.redact, ops.TextOps.redactOracle),

    Spec("emb_quantize_int8",
      Seq("vec_id" -> P, "scale" -> P, "l2_err" -> P),
      Seq("vec_id"),
      (s, d) => ops.Similarity.quantizeInt8(s, d),
      ops.Similarity.quantizeInt8Oracle),

    Spec("docs_sample_stratified",
      Seq("doc_id" -> P, "lang" -> P, "sample_key" -> L),
      Seq("doc_id"),
      (s, d) => ops.TextOps.stratifiedSample(s, d),
      ops.TextOps.stratifiedSampleOracle()),

    Spec("corpus_diff",
      Seq("doc_id" -> P, "status" -> P, "fp_old" -> P, "fp_new" -> P),
      Seq("doc_id"),
      (s, d) => ops.TextOps.corpusDiff(s, d),
      ops.TextOps.corpusDiffOracle),

    Spec("vocab_collocations",
      Seq("rank" -> I, "w1" -> P, "w2" -> P, "pair_count" -> L,
        "c1" -> L, "c2" -> L, "lift" -> P),
      Seq("rank"),
      (s, d) => ops.TextOps.collocations(s, d),
      ops.TextOps.collocationsOracle()),

    Spec("corpus_drift_chi2",
      Seq("decade" -> I, "n1" -> L, "n2" -> L, "chi2_term" -> P),
      Seq("decade"),
      (s, d) => ops.TextOps.corpusDriftChi2(s, d),
      ops.TextOps.corpusDriftChi2Oracle),

    Spec("docs_sample_weighted",
      Seq("doc_id" -> P, "n_tokens" -> L, "sample_key" -> L,
        "total_tokens" -> L),
      Seq("doc_id"),
      (s, d) => ops.TextOps.weightedSample(s, d),
      ops.TextOps.weightedSampleOracle()),

    Spec("docs_split",
      Seq("split" -> P, "n_docs" -> L, "n_chars_total" -> L, "n_langs" -> L),
      Seq("split"),
      ops.TextOps.hashSplit, ops.TextOps.hashSplitOracle),

    Spec("docs_fingerprint",
      Seq("doc_id" -> P, "n_grams" -> L, "n_fingerprints" -> L,
        "fp_digest" -> P),
      Seq("doc_id"),
      ops.TextOps.winnow, ops.TextOps.winnowOracle),

    Spec("docs_chunks",
      Seq("doc_id" -> P, "chunk_idx" -> L, "chunk_len" -> L,
        "chunk_md5" -> P),
      Seq("doc_id", "chunk_idx"),
      (s, d) => ops.TextOps.chunk(s, d), ops.TextOps.chunkOracle()),

    Spec("docs_repetition",
      Seq("doc_id" -> P, "n_words" -> L, "dup_word_frac" -> P,
        "top_bigram_frac" -> P, "dup_trigram_frac" -> P),
      Seq("doc_id"),
      ops.TextOps.repetition, ops.TextOps.repetitionOracle),

    Spec("docs_pack",
      Seq("lang" -> P, "seq_id" -> L, "n_docs" -> L, "n_tokens" -> L),
      Seq("lang", "seq_id"),
      (s, d) => ops.TextOps.pack(s, d), ops.TextOps.packOracle()),

    Spec("events_funnel",
      Seq("funnel" -> P, "n_view" -> L, "n_view_click" -> L,
        "n_view_click_purchase" -> L, "conv_click" -> P,
        "conv_purchase" -> P),
      Seq("funnel"),
      ops.Events.funnel, ops.Events.funnelOracle),

    Spec("events_retention",
      Seq("cohort_week" -> P, "activity_week" -> P, "week_offset" -> I,
        "active_users" -> L, "cohort_size" -> L, "retention" -> P),
      Seq("cohort_week", "activity_week"),
      ops.Events.retention, ops.Events.retentionOracle),

    Spec("corpus_mixture",
      Seq("doc_id" -> P, "lang" -> P, "n_lang" -> L, "target_docs" -> L,
        "n_copies" -> L),
      Seq("doc_id"),
      (s, d) => ops.TextOps.mixture(s, d), ops.TextOps.mixtureOracle),

    Spec("docs_length_histogram",
      Seq("bucket_digits" -> I, "n_docs" -> L, "total_words" -> L,
        "min_words" -> L, "max_words" -> L),
      Seq("bucket_digits"),
      ops.TextOps.lengthHistogram, ops.TextOps.lengthHistogramOracle),

    Spec("token_counts",
      Seq("doc_id" -> P, "lang" -> P, "ws_tokens" -> L, "re_tokens" -> L,
        "est_tokens" -> L),
      Seq("doc_id"),
      ops.TextOps.tokenCounts, ops.TextOps.tokenCountsOracle),

    Spec("bpe_merges",
      Seq("rank" -> I, "pair_a" -> P, "pair_b" -> P, "merged" -> P,
        "score" -> L),
      Seq("rank"),
      (s, d) => ops.Bpe.merges(s, d), ops.Bpe.mergesOracle()),

    Spec("bpe_segment",
      Seq("word" -> P, "freq" -> L, "segmented" -> P, "n_subwords" -> I),
      Seq("word"),
      (s, d) => ops.Bpe.segment(s, d), ops.Bpe.segmentOracle()),

    Spec("bpe_subword_freq",
      Seq("subword" -> P, "occurrences" -> L),
      Seq("subword"),
      (s, d) => ops.Bpe.subwordFreq(s, d), ops.Bpe.subwordFreqOracle()),

    Spec("search_bm25",
      Seq("query_id" -> I, "rank" -> I, "doc_id" -> P, "score_q" -> L,
        "n_terms_matched" -> L),
      Seq("query_id", "rank"),
      (s, d) => ops.Search.bm25TopK(s, d), ops.Search.bm25TopKOracle()),

    Spec("decontam_overlap",
      Seq("doc_id" -> P, "bench_id" -> P, "n_shared" -> L,
        "bench_frac" -> P),
      Seq("doc_id", "bench_id"),
      (s, d) => ops.Decontam.overlap(s, d), ops.Decontam.overlapOracle()),

    Spec("decontam_bloom",
      Seq("doc_id" -> P, "n_grams" -> L, "n_bloom_hits" -> L,
        "n_exact_hits" -> L, "n_false_pos" -> L),
      Seq("doc_id"),
      (s, d) => ops.Decontam.bloomScreen(s, d),
      ops.Decontam.bloomScreenOracle()),

    Spec("range_join_promos",
      Seq("promo" -> P, "n_orders" -> L, "revenue" -> Money),
      Seq("promo"),
      ops.RangeJoin.promoRevenue, ops.RangeJoin.promoRevenueOracle),

    Spec("skew_salted_count",
      Seq("user_id" -> P, "n_events" -> L),
      Seq("user_id"),
      (s, d) => ops.SkewJoin.saltedCount(
        ops.Events.events(s, d), "user_id", "event_id", salts = 8)
        .withColumnRenamed("count", "n_events"),
      "SELECT user_id, count(*) AS n_events FROM events GROUP BY 1"),

    Spec("streaming_sessions",
      Seq("user_id" -> L, "n_events" -> L, "start_ts_micros" -> L,
        "end_ts_micros" -> L, "closed_by_timeout" -> P),
      Seq("user_id", "start_ts_micros"),
      (s, d) => streaming.StreamingOps.sessionsParity(s, d),
      streaming.StreamingOps.sessionsParityOracle),

    Spec("streaming_windowed_parity",
      Seq("window_start" -> P, "event_type" -> P, "n_events" -> L,
        "total_value" -> P),
      Seq("window_start", "event_type"),
      streaming.StreamingOps.windowedParity,
      streaming.StreamingOps.windowedParityOracle),

    Spec("streaming_windowed_append",
      Seq("window_start" -> P, "event_type" -> P, "n_events" -> L,
        "total_value" -> P),
      Seq("window_start", "event_type"),
      streaming.StreamingOps.windowedParityAppend,
      streaming.StreamingOps.windowedParityAppendOracle),

    Spec("streaming_dedup",
      Seq("event_id" -> P, "ts" -> P, "user_id" -> P, "event_type" -> P,
        "value" -> P, "props" -> P),
      Seq("event_id"),
      streaming.StreamingOps.dedupParity,
      streaming.StreamingOps.dedupParityOracle),

    Spec("streaming_attribution",
      Seq("purchase_id" -> P, "click_id" -> P, "user_id" -> P,
        "purchase_ts" -> P, "click_ts" -> P, "value" -> P),
      Seq("purchase_id", "click_id"),
      streaming.StreamingOps.attributionParity,
      streaming.StreamingOps.attributionParityOracle),

    Spec("streaming_attribution_outer",
      Seq("purchase_id" -> P, "click_id" -> P, "user_id" -> P,
        "purchase_ts" -> P, "click_ts" -> P, "value" -> P),
      Seq("purchase_id", "click_id"),
      streaming.StreamingOps.attributionOuterParity,
      streaming.StreamingOps.attributionOuterParityOracle),

    Spec("events_pattern_journeys",
      Seq("pattern" -> P, "n_sessions" -> L, "n_total" -> L,
        "share" -> P),
      Seq("pattern"),
      ops.Events.patternJourneys, ops.Events.patternJourneysOracle),

    Spec("events_top_paths",
      Seq("path_rank" -> I, "path" -> P, "n_sessions" -> L),
      Seq("path_rank"),
      ops.Events.topPaths, ops.Events.topPathsOracle),

    Spec("events_outliers",
      Seq("event_id" -> P, "event_type" -> P, "value" -> P, "n" -> L,
        "side" -> P),
      Seq("event_id"),
      ops.Events.outliers, ops.Events.outliersOracle),

    Spec("events_json",
      Seq("event_type" -> P, "n_events" -> L, "n_users" -> L, "k_sum" -> L,
        "k_min" -> L, "k_max" -> L, "value_sum" -> P),
      Seq("event_type"), ops.Events.jsonStats, ops.Events.jsonStatsOracle),

    Spec("set_ops_audit",
      Seq("segment" -> P, "customer_key" -> P),
      Seq("segment", "customer_key"),
      ops.SetOps.customerSetAudit,
      ops.SetOps.customerSetAuditOracle(OracleSql.prelude)),

    Spec("props_map_stats",
      Seq("event_type" -> P, "prop_key" -> P, "n" -> L, "value_sum" -> L,
        "value_min" -> L, "value_max" -> L),
      Seq("event_type", "prop_key"),
      ops.SetOps.propsMapStats, ops.SetOps.propsMapStatsOracle),

    Spec("model_logreg",
      Seq("n_docs" -> L, "n_correct" -> L, "w_bias" -> P, "w_len" -> P,
        "w_stop" -> P),
      Seq("n_docs"),
      (s, d) => ops.Learn.logregQuality(s, d),
      ops.Learn.logregQualityOracle()),

    Spec("multimodal_audio",
      Seq("doc_id" -> P, "media_type" -> P, "n_bytes" -> I,
        "sample_rate" -> I, "n_samples" -> I, "peak_abs" -> I,
        "zero_crossings" -> I, "energy" -> L),
      Seq("doc_id"), ops.Multimodal.audioFeatures,
      ops.Multimodal.audioFeaturesOracle),

    Spec("multimodal_features",
      Seq("doc_id" -> P, "media_type" -> P, "n_bytes" -> I,
        "width" -> I, "height" -> I, "pixel_checksum" -> L),
      Seq("doc_id"), ops.Multimodal.features, ops.Multimodal.featuresOracle),

    Spec("multimodal_frames",
      Seq("doc_id" -> P, "media_type" -> P, "n_frames" -> I,
        "n_sampled" -> I, "container_bytes" -> I, "frames_checksum" -> L),
      Seq("doc_id"), ops.Multimodal.frameFeatures,
      ops.Multimodal.frameFeaturesOracle),

    Spec("multimodal_resize",
      Seq("doc_id" -> P, "media_type" -> P, "src_w" -> I, "src_h" -> I,
        "out_w" -> I, "out_h" -> I, "resized_checksum" -> L,
        "luma_sum" -> L),
      Seq("doc_id"), ops.Multimodal.resizeFeatures,
      ops.Multimodal.resizeFeaturesOracle))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { s =>
      s.name -> ((spark: SparkSession, dir: String) =>
        Finalize.spark(s.build(spark, dir), s.cols, s.keys))
    }.toMap

  def oracleSql: Map[String, String] =
    specs.map(s => s.name -> Finalize.sql(s.oracleInner, s.cols, s.keys)).toMap
}
