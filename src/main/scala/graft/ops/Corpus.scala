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

  /** Shard fan-out of the training-export manifest. Small and fixed here
    * so the oracle can inline it; a deployment sizes it from corpus bytes
    * (shards ≈ bytes / target-shard-size) — the manifest query below is
    * shard-count-agnostic: one hash-agg either way. */
  val NumShards = 8

  /** Deterministic training-export shard manifest — the release artifact a
    * trainer consumes: every document is assigned a shard by content-stable
    * hash (`u16(doc_id) % shards`, the same md5-derived integer used by the
    * split/sample family, so membership survives resharding and re-runs),
    * and each shard row carries its audit stats plus a MEMBERSHIP DIGEST —
    * `bit_xor` of a 60-bit md5 of every member id. XOR is commutative and
    * associative, so the digest is order-independent, map-side combinable,
    * and overflow-free — an order-sensitive digest (hash chain) would force
    * a per-shard total-order sort through one task per shard; within-shard
    * read order is instead DERIVED deterministically by the consumer
    * (sort by `sort_key` = md5 hex of the id — the "global shuffle" of
    * training data, decorrelated from crawl order), and the manifest pins
    * that order's endpoints (`first_key`/`last_key`) for cheap audit.
    *
    * Scale: one map pass (hash, token count) into one hash-agg keyed by
    * shard — every aggregate (count/sum/min/max/xor) has a partial; no
    * window, no sort, no collect. At 100 TB this is the same single
    * shuffle it is at sf0.01. */
  def shardManifest(spark: SparkSession, dir: String,
      numShards: Int = NumShards): DataFrame =
    TextOps.documents(spark, dir)
      .withColumn("shard",
        (expr(TextOps.md5U16Expr("doc_id")) % numShards).cast("int"))
      .withColumn("sort_key", md5(col("doc_id").cast("string")))
      .withColumn("member_h", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"))
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        min(col("sort_key")).as("first_key"),
        max(col("sort_key")).as("last_key"),
        expr("bit_xor(member_h)").as("member_digest"))

  /** Oracle for [[shardManifest]] — the 60-bit md5 prefix is rebuilt with
    * nibble arithmetic (DuckDB has no base-conv builtin); both engines
    * fold the same 15 hex chars, so the XOR digests match bit-for-bit. */
  def shardManifestOracle(numShards: Int = NumShards): String = {
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)::BIGINT"
    val u60 = (1 to 15).map(i => s"${nib(i)} * ${1L << (4 * (15 - i))}").mkString(" + ")
    s"""WITH d AS (
      SELECT ${TextOps.md5U16SqlDuck("doc_id")} % $numShards AS shard,
        md5(CAST(doc_id AS VARCHAR)) AS h,
        len(string_split(text, ' ')) AS ws_tokens, n_chars
      FROM documents)
    SELECT shard, count(*) AS n_docs,
      CAST(sum(ws_tokens) AS BIGINT) AS n_tokens,
      CAST(sum(n_chars) AS BIGINT) AS n_chars,
      min(h) AS first_key, max(h) AS last_key,
      bit_xor($u60) AS member_digest
    FROM d GROUP BY 1"""
  }
}
