package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the composition the individual
  * operators exist for, as one driver-checked query:
  *
  *   documents → exact-dedup keepers ([[Dedup.exact]], min-id per distinct
  *   text, duplicate count kept) → near-duplicate removal (keep-first: any
  *   keeper appearing as the higher id of an n-gram-Jaccard pair is
  *   dropped — [[Dedup.ngramJaccard]] already emits pairs over distinct-
  *   text representatives) → per-document quality + token stats
  *   ([[TextOps.textStats]]) and language ID ([[TextOps.langId]]) →
  *   quality floor.
  *
  * Scale shape: one hash-agg for exact dedup, the bounded inverted-index
  * join for near-dups, then narrow per-row transforms joined by doc_id —
  * every stage is the already-audited scale-safe formulation; the
  * composition adds only doc_id equi-joins (AQE broadcasts the small
  * near-dup loser side).
  */
object Corpus {

  val QualityFloor = 0.5

  def corpusClean(spark: SparkSession, dir: String,
      qualityFloor: Double = QualityFloor): DataFrame = {
    val keepers = Dedup.exact(spark, dir)
      .select(col("keeper_doc_id").as("doc_id"), col("dup_count"))
    val nearDupLosers = Dedup.ngramJaccard(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val stats = TextOps.textStats(spark, dir)
      .select("doc_id", "token_est", "quality_score")
    val lid = TextOps.langId(spark, dir)
      .select("doc_id", "labeled_lang", "predicted_lang")
    keepers
      .join(nearDupLosers, Seq("doc_id"), "left_anti")
      .join(stats, Seq("doc_id"))
      .join(lid, Seq("doc_id"))
      .filter(col("quality_score") >= qualityFloor)
      .select("doc_id", "labeled_lang", "predicted_lang", "dup_count",
        "token_est", "quality_score")
  }

  def corpusCleanOracle(qualityFloor: Double = QualityFloor): String =
    s"""WITH keepers AS (
      SELECT min(doc_id) AS doc_id, count(*) AS dup_count
      FROM documents GROUP BY text),
    nd AS (
      SELECT DISTINCT doc_b AS doc_id FROM (${Dedup.ngramJaccardOracle()}) j),
    stats AS (
      SELECT doc_id, token_est, quality_score FROM (${TextOps.textStatsOracle}) s),
    lid AS (
      SELECT doc_id, labeled_lang, predicted_lang FROM (${TextOps.langIdOracle}) l)
    SELECT k.doc_id, lid.labeled_lang, lid.predicted_lang, k.dup_count,
      stats.token_est, stats.quality_score
    FROM keepers k
    LEFT JOIN nd ON nd.doc_id = k.doc_id
    JOIN stats ON stats.doc_id = k.doc_id
    JOIN lid ON lid.doc_id = k.doc_id
    WHERE nd.doc_id IS NULL AND stats.quality_score >= $qualityFloor"""
}
