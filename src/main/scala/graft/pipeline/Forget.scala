package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bronze.Bronze
import graft.ops.{IncrementalDedup, IvfIndex, Similarity, TextOps}

/** One-request takedown orchestration — the right-to-be-forgotten flow a
  * data platform actually runs: ONE `forget(customerIds)` call drives
  * every surface that can hold the user's data, as a [[Registry]] DAG
  * run, so no surface can be forgotten by a caller juggling three entry
  * points:
  *
  *  - the WAREHOUSE ([[Erasure.customerSummaryErasedFrom]]: erase at
  *    bronze, the medallion's join topology propagates),
  *  - the DEDUP FINGERPRINT STORE ([[IncrementalDedup.delete]]:
  *    tombstone the customer's documents, then an immediate
  *    [[IncrementalDedup.compact]] folds them physical — the GDPR
  *    posture; readers honored the tombstones from the instant of the
  *    delete either way),
  *  - the ANN INDEX ([[IvfIndex.deleteVectors]]: tombstone the
  *    customer's vectors; serving anti-joins the ledger immediately,
  *    the physical fold is the index's own
  *    [[IvfIndex.compactIndex]] cadence, pinned ≡ fresh-build by
  *    AnnDeleteSpec).
  *
  * The id derivation is ONE node ([[idsModel]]) the three surface nodes
  * depend on, so all surfaces provably act on the SAME id set. The
  * customer→document ownership mapping here is the deterministic
  * `customer_id = doc_id mod |customers|` (the testdata carries no
  * ownership column; SQL-expressible so the DuckDB oracle can replay
  * it — a deployment swaps [[ownership]] for its real mapping table and
  * nothing else changes). Documents map to their identically-numbered
  * vector where one exists; the pinned ANN query ids
  * ([[Similarity.AnnQueryIds]]) are excluded exactly as
  * [[Similarity.annIvfTopKDeleted]] documents — queries are the
  * caller's input, not index content.
  *
  * Scale: the takedown list broadcasts everywhere (it is orders of
  * magnitude below the corpus); the warehouse rebuild is the normal
  * build with one anti-join pushed at the bronze scan; store and index
  * writes are tombstone-sized.
  */
object Forget {

  /** Deterministic customer→doc ownership: `customer_id = doc_id mod
    * |bronze customers|` (one count action on the tiny dimension). */
  def ownership(spark: SparkSession, dir: String): DataFrame = {
    val nCust = Bronze.customers(spark, dir).count()
    TextOps.documents(spark, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(nCust)).as("customer_id"))
  }

  /** The single derivation node: (customer_id, doc_id, vec_id?) for the
    * requested customers — vec_id is the doc's identically-numbered
    * vector when one exists and it is not a pinned query id, else NULL.
    * The query exclusion is [[Similarity.AnnQueryIds]] — the ID LIST,
    * never a `% 250` guard: the list only coincides with the modulus at
    * ≤ 5000 vectors, and a modulus guard would silently RETAIN an
    * erased user's vectors beyond that (the one failure mode a takedown
    * must not have). */
  def idsFor(spark: SparkSession, dir: String,
      customerIds: DataFrame): DataFrame = {
    val vecs = Similarity.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), lit(true).as("has_vec"))
    ownership(spark, dir)
      .join(broadcast(customerIds.select("customer_id")), Seq("customer_id"))
      .join(vecs, Seq("doc_id"), "left")
      .withColumn("vec_id",
        when(coalesce(col("has_vec"), lit(false)) &&
          !col("doc_id").isin(Similarity.AnnQueryIds: _*), col("doc_id")))
      .select("customer_id", "doc_id", "vec_id")
  }

  private def receipt(spark: SparkSession, surface: String,
      applied: Long): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(surface, applied)),
      org.apache.spark.sql.types.StructType.fromDDL(
        "surface STRING, ids_applied BIGINT"))

  /** The takedown DAG for one request: id derivation, then the three
    * surface nodes in one dependency wave. */
  def models(customerIds: DataFrame, storeRoot: String,
      ledger: String): Seq[Registry.Model] = Seq(
    Registry.Model("forget_ids", "forget", Registry.Table, Seq.empty,
      (s, dir, _) => idsFor(s, dir, customerIds)),
    Registry.Model("forget_store", "forget", Registry.Table,
      Seq("forget_ids"), (s, _, up) => {
        val docIds = up("forget_ids").select("doc_id").distinct()
        IncrementalDedup.delete(s, storeRoot, docIds)
        IncrementalDedup.compact(s, storeRoot)
        receipt(s, "dedup_store", docIds.count())
      }),
    Registry.Model("forget_index", "forget", Registry.Table,
      Seq("forget_ids"), (s, _, up) => {
        val vecIds = up("forget_ids").filter(col("vec_id").isNotNull)
          .select("vec_id").distinct()
        IvfIndex.deleteVectors(s, ledger, vecIds)
        receipt(s, "ann_index", vecIds.count())
      }),
    Registry.Model("forget_warehouse", "forget", Registry.Table,
      Seq("forget_ids"), (s, dir, _) =>
        Erasure.customerSummaryErasedFrom(s, dir, customerIds)))

  /** Run the whole takedown as one Registry DAG run. */
  def forget(spark: SparkSession, dir: String, customerIds: DataFrame,
      storeRoot: String, ledger: String,
      sink: TableSink): Map[String, DataFrame] =
    Registry.run(spark, dir, sink, all = models(customerIds, storeRoot, ledger),
      registerViews = false)

  // ---- driver row: the full takedown replayed on scratch state ----

  /** Erasure set of the receipt row: every [[Erasure.ErasureMod]]th
    * customer — the same set `user_erasure_summary` pins. */
  private def erasedCustomers(spark: SparkSession, dir: String): DataFrame =
    Bronze.customers(spark, dir).select("customer_id")
      .filter(pmod(col("customer_id"), lit(Erasure.ErasureMod.toLong)) === 0)

  /** Driver row: ingest the corpus into a fresh store
    * ([[IncrementalDedup.ReplayMod]] crawl shards), run ONE [[forget]]
    * over scratch store/ledger/warehouse, then report one row per
    * surface — ids deleted and a post-state metric the oracle recomputes
    * from never-ingested first principles: surviving warehouse summary
    * rows, surviving near-dup pairs, and the served ANN top-k neighbor
    * checksum. Hash-equality against the oracle IS the proof that one
    * call left every surface as if the customers' data had never been
    * loaded. */
  def takedownReceipt(spark: SparkSession, dir: String): DataFrame = {
    val store = graft.model.Scratch.dir("graft_forget_store")
    val ledger = graft.model.Scratch.dir("graft_forget_led")
    val docs = TextOps.documents(spark, dir)
    (0 until IncrementalDedup.ReplayMod).foreach { b =>
      IncrementalDedup.ingest(spark, store, b, docs.filter(
        pmod(col("doc_id"), lit(IncrementalDedup.ReplayMod.toLong)) === b))
    }
    val erased = erasedCustomers(spark, dir)
    val out = forget(spark, dir, erased, store, ledger,
      new ParquetSink(graft.model.Scratch.dir("graft_forget_wh")))
    val ids = out("forget_ids")
    def one(surface: String, idsDeleted: DataFrame, metric: DataFrame) =
      idsDeleted.crossJoin(metric)
        .select(lit(surface).as("surface"), col("ids_deleted"),
          col("result_metric"))
    one("warehouse",
      erased.agg(count(lit(1)).as("ids_deleted")),
      out("forget_warehouse").agg(count(lit(1)).as("result_metric")))
      .unionByName(one("dedup_store",
        ids.select("doc_id").distinct().agg(count(lit(1)).as("ids_deleted")),
        IncrementalDedup.nearDupPairs(spark, store)
          .agg(count(lit(1)).as("result_metric"))))
      .unionByName(one("ann_index",
        ids.filter(col("vec_id").isNotNull).select("vec_id").distinct()
          .agg(count(lit(1)).as("ids_deleted")),
        Similarity.annIvfTopK(spark, dir, ledger = Some(ledger))
          .agg(sum(col("neighbor_id")).cast("bigint").as("result_metric"))))
  }

  /** Driver row: STEADY-STATE takedown — the per-request operation a
    * production fleet actually repeats, priced without the store build.
    * [[IncrementalDedup.steadyStore]] is built once per corpus
    * fingerprint and cached (`takedown_receipt` keeps measuring the full
    * fresh-store lifecycle; this row measures the marginal request):
    * one tombstone append for the erased customers' documents plus a
    * receipt over the member index — takedown-sized write, index-sized
    * pruned scans, seconds at any corpus scale. The ids are the same
    * ownership derivation as the full receipt ([[idsFor]]), so the two
    * rows price the same request at the two cadences. */
  def takedownSteady(spark: SparkSession, dir: String): DataFrame = {
    val store = IncrementalDedup.steadyStore(spark, dir)
    val docIds = idsFor(spark, dir, erasedCustomers(spark, dir))
      .select("doc_id").distinct()
    IncrementalDedup.steadyTakedown(spark, store, docIds)
  }

  /** DuckDB twin of [[takedownSteady]]: the requested ids by the same
    * `mod |customers|` ownership arithmetic, and the survivor metrics
    * recomputed from never-ingested first principles over `documents` —
    * members are distinct (text, doc) pairs of surviving docs, texts are
    * the distinct surviving text values (md5(text) equality ≡ text
    * equality, as everywhere in the dedup oracles). */
  def takedownSteadyOracle: String = {
    val mod = Erasure.ErasureMod
    val nCust = "(SELECT count(*) FROM customer)"
    val deleted = s"(doc_id % $nCust) % $mod = 0"
    s"""SELECT 'docs_tombstoned' AS metric,
      (SELECT count(*) FROM (
        SELECT DISTINCT doc_id FROM documents WHERE $deleted) t) AS value
    UNION ALL
    SELECT 'surviving_members',
      (SELECT count(*) FROM (
        SELECT DISTINCT text, doc_id FROM documents WHERE NOT ($deleted)) t)
    UNION ALL
    SELECT 'surviving_texts',
      (SELECT count(DISTINCT text) FROM documents WHERE NOT ($deleted))"""
  }

  /** DuckDB twin: each surface's post-state recomputed from
    * never-ingested first principles (erased summary over filtered
    * bronze; winnow pairs over surviving docs only; IVF top-k with the
    * deleted candidates excluded), with the ids derived by the same
    * `mod |customers|` ownership arithmetic. `customer.c_custkey` IS
    * the bronze `customer_id` (RawSources maps it 1:1). */
  def takedownReceiptOracle: String = {
    val mod = Erasure.ErasureMod
    val nCust = "(SELECT count(*) FROM customer)"
    val docDeleted = s"(doc_id % $nCust) % $mod = 0"
    val vecDeleted =
      s"((vec_id % $nCust) % $mod = 0 AND " +
        s"vec_id NOT IN (${Similarity.annQueryIdsSql}))"
    s"""SELECT 'warehouse' AS surface,
      (SELECT count(*) FROM customer WHERE c_custkey % $mod = 0)
        AS ids_deleted,
      (SELECT count(*) FROM (
        ${graft.oracle.OracleSql.customerSummaryErased(mod)}) t)
        AS result_metric
    UNION ALL
    SELECT 'dedup_store',
      (SELECT count(*) FROM documents WHERE $docDeleted),
      (SELECT count(*) FROM (
        ${IncrementalDedup.deleteOracleFor(s"NOT ($docDeleted)")}) t)
    UNION ALL
    SELECT 'ann_index',
      (SELECT count(*) FROM embeddings WHERE $vecDeleted),
      (SELECT CAST(sum(neighbor_id) AS BIGINT) FROM (
        ${Similarity.annIvfTopKDeletedOracle(deletedPredSql = vecDeleted)}) t)"""
  }
}
