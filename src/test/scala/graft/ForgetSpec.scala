package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.bronze.Bronze
import graft.ops.{IncrementalDedup, IvfIndex, Similarity, TextOps}
import graft.pipeline.{Erasure, Forget, ParquetSink}

/** One-request takedown: a single [[Forget.forget]] Registry DAG run
  * must leave ALL THREE surfaces (warehouse, dedup fingerprint store,
  * ANN index) exactly as if the erased customers' data had never been
  * ingested — each pinned against an independently-derived twin. */
class ForgetSpec extends SparkSpec {

  test("one forget() call leaves warehouse, store, and index ≡ never-ingested") {
    val store = Files.createTempDirectory("graft_spec_fstore").toString
    val ledger = Files.createTempDirectory("graft_spec_fled").toString
    val docs = TextOps.documents(spark, Sf0001)
    (0 until IncrementalDedup.ReplayMod).foreach { b =>
      IncrementalDedup.ingest(spark, store, b, docs.filter(
        pmod(col("doc_id"), lit(IncrementalDedup.ReplayMod.toLong)) === b))
    }
    val erased = Bronze.customers(spark, Sf0001).select("customer_id")
      .filter(pmod(col("customer_id"), lit(Erasure.ErasureMod.toLong)) === 0)
    val out = Forget.forget(spark, Sf0001, erased, store, ledger,
      new ParquetSink(Files.createTempDirectory("graft_spec_fwh").toString))
    assert(out.keySet == Set("forget_ids", "forget_store", "forget_index",
      "forget_warehouse"))

    def canon(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted

    // surface 1: warehouse — the DAG node must equal the MODULUS-path
    // never-loaded rebuild (an independent filter-pushdown plan)
    assert(canon(out("forget_warehouse")).sameElements(
      canon(Erasure.customerSummaryErased(spark, Sf0001))),
      "forget warehouse output diverges from the never-loaded build")

    // first-principles deletion sets from the ownership arithmetic
    val nCust = Bronze.customers(spark, Sf0001).count()
    val deletedDocPred =
      pmod(pmod(col("doc_id"), lit(nCust)), lit(Erasure.ErasureMod.toLong)) === 0
    val deletedDocs = docs.filter(deletedDocPred).select("doc_id")

    // surface 2: dedup store — pairs over the post-forget store must
    // equal a FRESH store that only ever ingested the surviving docs
    val store2 = Files.createTempDirectory("graft_spec_fstore2").toString
    val survivors = docs.join(deletedDocs, Seq("doc_id"), "left_anti")
    (0 until IncrementalDedup.ReplayMod).foreach { b =>
      IncrementalDedup.ingest(spark, store2, b, survivors.filter(
        pmod(col("doc_id"), lit(IncrementalDedup.ReplayMod.toLong)) === b))
    }
    assert(canon(IncrementalDedup.nearDupPairs(spark, store))
      .sameElements(canon(IncrementalDedup.nearDupPairs(spark, store2))),
      "post-forget store pairs diverge from the never-ingested store")

    // surface 3: ANN index — serving over the forget ledger must equal
    // serving over a second ledger built from the first-principles
    // predicate, and no deleted vector may surface
    val deletedVecs = Similarity.embeddings(spark, Sf0001)
      .filter(pmod(pmod(col("vec_id"), lit(nCust)),
          lit(Erasure.ErasureMod.toLong)) === 0 &&
        pmod(col("vec_id"), lit(250L)) =!= 0)
      .select("vec_id")
    val ledger2 = Files.createTempDirectory("graft_spec_fled2").toString
    IvfIndex.deleteVectors(spark, ledger2, deletedVecs)
    val served = Similarity.annIvfTopK(spark, Sf0001, ledger = Some(ledger))
    assert(canon(served).sameElements(canon(
      Similarity.annIvfTopK(spark, Sf0001, ledger = Some(ledger2)))),
      "forget-derived ANN deletions diverge from the first-principles set")
    val deletedSet = deletedVecs.collect().map(_.getLong(0)).toSet
    assert(deletedSet.nonEmpty)
    served.select("neighbor_id").collect().map(_.getLong(0)).foreach(id =>
      assert(!deletedSet.contains(id), s"deleted vector $id was served"))
  }

  test("steady-state takedown: build-once store, exact receipt, idempotent " +
      "through the tombstone fold") {
    spark.conf.set(IncrementalDedup.SteadyRootKey,
      Files.createTempDirectory("graft_spec_steady").toString)
    try {
      val docs = TextOps.documents(spark, Sf0001)
      val nCust = Bronze.customers(spark, Sf0001).count()
      val deletedPred = pmod(pmod(col("doc_id"), lit(nCust)),
        lit(Erasure.ErasureMod.toLong)) === 0
      val truth = Map(
        "docs_tombstoned" ->
          docs.filter(deletedPred).select("doc_id").distinct().count(),
        "surviving_members" -> docs.filter(!deletedPred)
          .select("text", "doc_id").distinct().count(),
        "surviving_texts" -> docs.filter(!deletedPred)
          .select("text").distinct().count())
      def receipt(): Map[String, Long] =
        Forget.takedownSteady(spark, Sf0001).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap

      val builds0 = IncrementalDedup.steadyBuilds.get
      val first = receipt()
      assert(IncrementalDedup.steadyBuilds.get == builds0 + 1,
        "first takedown pays exactly one store build")
      assert(first == truth,
        "receipt must equal the never-ingested first-principles counts")

      // repeat past the CompactEvery tombstone auto-fold: the 4th delete
      // folds the tombstones physical; receipts must not move, and no
      // invocation may rebuild (or re-ingest into) the store
      (1 to IncrementalDedup.CompactEvery).foreach { i =>
        assert(receipt() == truth, s"receipt drifted on invocation ${i + 1}")
      }
      assert(IncrementalDedup.steadyBuilds.get == builds0 + 1,
        "later takedowns must reuse the cached store, never rebuild")
    } finally spark.conf.unset(IncrementalDedup.SteadyRootKey)
  }
}
