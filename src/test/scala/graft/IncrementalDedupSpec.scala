package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, IncrementalDedup, TextOps}

/** The incremental fingerprint store: per-shard ingest cost bounds (only
  * unseen texts are fingerprinted), detection over the index alone (no
  * raw-corpus re-read), and bit-equality with the from-scratch operator. */
class IncrementalDedupSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("inc_dedup_spec").toString

  test("two-batch replay bit-equals the full-corpus near-dup operator") {
    val full = Dedup.winnowNearDup(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    val replayed = IncrementalDedup.replay(spark, Sf0001)
      .collect().map(_.toSeq).toSet
    assert(replayed == full,
      "batching the corpus through the store must not change a single pair")
  }

  test("re-ingesting overlapping shards fingerprints only unseen texts") {
    val root = freshRoot()
    val docs = TextOps.documents(spark, Sf0001)
    val half = docs.filter(pmod(col("doc_id"), lit(2L)) === 0)
    val distinctIn = half.select(md5(col("text"))).distinct().count()
    assert(IncrementalDedup.ingest(spark, root, 0, half) == distinctIn,
      "a cold store fingerprints every distinct text of the first shard")
    // second shard = the WHOLE corpus (an at-least-once recrawl): only
    // texts absent from shard 1 may pay the winnow pass
    val unseenTexts = docs.join(half.select(md5(col("text")).as("h")).distinct(),
        md5(col("text")) === col("h"), "left_anti")
      .select(md5(col("text"))).distinct().count()
    assert(IncrementalDedup.ingest(spark, root, 1, docs) == unseenTexts,
      "already-indexed texts must not be re-fingerprinted on re-delivery")
    // the recrawl delivered every doc_id, so detection over the store
    // equals the full-corpus operator
    val full = Dedup.winnowNearDup(spark, Sf0001).collect().map(_.toSeq).toSet
    assert(IncrementalDedup.nearDupPairs(spark, root)
      .collect().map(_.toSeq).toSet == full)
  }

  test("detection reads only the index, never the raw corpus") {
    val root = freshRoot()
    val docs = TextOps.documents(spark, Sf0001)
    IncrementalDedup.ingest(spark, root, 0, docs)
    val pairs = IncrementalDedup.nearDupPairs(spark, root)
    assert(pairs.count() > 0, "sf0.001 contains near-dup pairs")
    val leaves = pairs.queryExecution.executedPlan.collectLeaves()
      .mkString("\n")
    assert(!leaves.contains("documents.parquet"),
      s"detection must be index-only — old shards' text is never " +
        s"re-read:\n$leaves")
    assert(leaves.contains(root),
      s"detection must scan the store at $root:\n$leaves")
  }
}
