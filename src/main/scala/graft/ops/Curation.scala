package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators — the SELECTION layer of a training-data
  * pipeline, sitting between the raw signals ([[TextOps]], [[Dedup]]) and
  * the packed shards ([[Corpus]]): published rule-based quality gates
  * (Gopher), distribution-matched importance selection (DSIR),
  * perplexity-tercile bucketing (CCNet), duplicate-cluster representative
  * election, and the deterministic epoch shuffle that fixes training
  * order.
  *
  * Cross-engine float discipline (same contract as the rest of the repo):
  * no `log`/`exp` anywhere — thresholds compare by integer
  * cross-multiplication, DSIR's log-ratio is replaced by its algebraic
  * twin `(r-1)/(r+1)` (= tanh(ln r / 2), rational ops only, correctly
  * rounded identically in both engines) quantized to 2^-24 micro-units so
  * per-document sums are BIGINT — order- and partitioning-invariant on
  * any core count.
  */
object Curation {

  private def documents(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ParquetStats.read(spark, s"$dir/documents.parquet")

  // ---------------------------------------------------------------- Gopher

  /** Function-word inventory for Gopher's "contains at least 2 of ..."
    * stopword rule (Rae et al. 2021, arXiv:2112.11446, A1.1). The
    * paper's own English list ("the, be, to, of, and, that, have,
    * with") is vacuous on this synthetic vocabulary (0/500 docs hit 2),
    * so the rule carries the repo's corpus-fitting function-word
    * inventory ([[TextOps.StopwordsEn]]) — same semantics, a
    * discriminating gate. */
  val GopherStopwords: Seq[String] = TextOps.StopwordsEn
  val GopherMinWords = 50
  val GopherMaxWords = 100000
  val GopherMinMeanWordLen = 3
  val GopherMaxMeanWordLen = 10
  val GopherMinStopHits = 2
  /** Max share of word occurrences taken by the single most frequent
    * word, as a rational bound (1/[[GopherTopWordDenom]]). */
  val GopherTopWordDenom = 5

  /** Gopher rule-based quality gate (Rae et al. 2021, A1.1), the rules
    * whose signals exist in a space-joined corpus: word-count bounds,
    * mean-word-length bounds, minimum distinct-stopword hits, and a
    * top-word repetition cap (the word-level form of the paper's
    * most-common-n-gram caps — the char-fraction variants live in
    * [[TextOps.repetition]]). Line- and symbol-based rules (bullet
    * ratios, ellipses, '#' density) are vacuous here — the corpus has no
    * lines or punctuation — and are deliberately not emitted rather than
    * emitted always-true.
    *
    * Every threshold compares by integer cross-multiplication
    * (`nonspace >= 3 * word_count`, `top * 5 <= words`), so the verdict
    * column is bit-exact on both engines with no float thresholds at
    * all. Shape: the text is scanned ONCE — every signal derives from
    * the same exploded (doc_id, word, count) table (word_count = Σcnt,
    * nonspace = Σ cnt·len(word), stop_hits = distinct stopwords present,
    * top = max cnt), so the row is one explode, one map-side-combined
    * (doc, word) count, and one doc-keyed aggregate — no self-join, no
    * second pass over the corpus. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stopSet = GopherStopwords
    val counts = documents(spark, dir)
      .select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    counts.groupBy("doc_id").agg(
        sum(col("cnt")).as("word_count"),
        sum(col("cnt") * length(col("w"))).as("nonspace_count"),
        countDistinct(when(col("w").isin(stopSet: _*), col("w")))
          .cast("int").as("stop_hits"),
        max(col("cnt")).as("top_word_count"))
      .withColumn("mean_word_len",
        col("nonspace_count") * lit(1.0) / col("word_count"))
      .withColumn("pass_word_count",
        (col("word_count") >= GopherMinWords &&
          col("word_count") <= GopherMaxWords).cast("int"))
      .withColumn("pass_word_len",
        (col("nonspace_count") >= col("word_count") * GopherMinMeanWordLen &&
          col("nonspace_count") <= col("word_count") * GopherMaxMeanWordLen)
          .cast("int"))
      .withColumn("pass_stopwords",
        (col("stop_hits") >= GopherMinStopHits).cast("int"))
      .withColumn("pass_repetition",
        (col("top_word_count") * GopherTopWordDenom <= col("word_count"))
          .cast("int"))
      .withColumn("passes_all",
        (col("pass_word_count") * col("pass_word_len") *
          col("pass_stopwords") * col("pass_repetition")).cast("int"))
      .select("doc_id", "word_count", "mean_word_len", "stop_hits",
        "top_word_count", "pass_word_count", "pass_word_len",
        "pass_stopwords", "pass_repetition", "passes_all")
  }

  def gopherRulesOracle: String = {
    val stopList = GopherStopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS word_count,
        CAST(length(replace(text, ' ', '')) AS BIGINT) AS nonspace_count,
        CAST(len(list_filter($stopList,
          s -> list_contains(string_split(text, ' '), s))) AS INTEGER)
          AS stop_hits
      FROM documents),
    top AS (
      SELECT doc_id, max(cnt) AS top_word_count FROM (
        SELECT doc_id, w, count(*) AS cnt
        FROM (SELECT doc_id, unnest(words) AS w FROM d) GROUP BY 1, 2)
      GROUP BY 1)
    SELECT d.doc_id, word_count,
      nonspace_count * 1.0 / word_count AS mean_word_len,
      stop_hits, top_word_count,
      CAST(word_count >= $GopherMinWords AND word_count <= $GopherMaxWords
        AS INTEGER) AS pass_word_count,
      CAST(nonspace_count >= word_count * $GopherMinMeanWordLen
        AND nonspace_count <= word_count * $GopherMaxMeanWordLen
        AS INTEGER) AS pass_word_len,
      CAST(stop_hits >= $GopherMinStopHits AS INTEGER) AS pass_stopwords,
      CAST(top_word_count * $GopherTopWordDenom <= word_count
        AS INTEGER) AS pass_repetition,
      CAST(word_count >= $GopherMinWords AND word_count <= $GopherMaxWords
        AS INTEGER)
      * CAST(nonspace_count >= word_count * $GopherMinMeanWordLen
        AND nonspace_count <= word_count * $GopherMaxMeanWordLen
        AS INTEGER)
      * CAST(stop_hits >= $GopherMinStopHits AS INTEGER)
      * CAST(top_word_count * $GopherTopWordDenom <= word_count
        AS INTEGER) AS passes_all
    FROM d JOIN top USING (doc_id)"""
  }

  // ------------------------------------------------------------------ DSIR

  /** Hashed-feature bucket count for DSIR (the paper uses 10k; fixed and
    * SMALL is the point — the weight table is B rows regardless of corpus
    * size, so it broadcasts at any scale). */
  val DsirBuckets = 1024
  /** Weight quantization grid: 2^24 micro-units per bucket weight. */
  val DsirQuant = 16777216.0
  /** The "target distribution" sample: English documents. A deployment
    * points this at its high-quality seed corpus. */
  val DsirTargetLang = "en"
  /** Keep the top 1/[[DsirSelectDenom]] of documents by importance. */
  val DsirSelectDenom = 4

  /** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score every document by how target-like its
    * hashed unigram+bigram distribution is, keep the top quarter. The
    * paper's per-gram log importance ratio `log(p_target/p_raw)` is
    * carried here as its bounded algebraic twin `(r-1)/(r+1)` — exactly
    * `tanh(ln r / 2)`, same sign, same zero, same ordering per gram —
    * built from +,-,×,÷ only, so both engines compute the identical
    * double (IEEE ops are correctly rounded; `ln` is not pinned and the
    * repo's contract is log-free cross-engine exactness). Each bucket
    * weight is then floor-quantized to 2^-24 micro-units and summed as
    * BIGINT per document: the score is integer-exact, immune to sum
    * order, partition layout, and core count, and the final ranking
    * ORDER BY is on a BIGINT — no float comparison anywhere in the
    * selection.
    *
    * Add-one smoothing over [[DsirBuckets]] buckets:
    * `r_b = (ct_b+1)(Nr+B) / ((cr_b+1)(Nt+B))` with ct/Nt counted on the
    * target sample (lang = '[[DsirTargetLang]]') and cr/Nr on the whole
    * corpus.
    *
    * Scale shape — the gram stream is touched ONCE, and only for
    * DISTINCT texts: documents fold to text representatives first (the
    * same exact-dup staging every near-dup operator here uses, carrying
    * each text's document and target-language multiplicities), the
    * representative's explode+hash collapses immediately into a per-text
    * BUCKET HISTOGRAM (≤ min(grams, B) = ≤ 1024 rows per text, far
    * smaller than the text), and everything downstream — the ≤ B-row
    * global bucket table (occurrence counts recovered as cnt ×
    * multiplicity, so the statistics are identical to scoring every copy)
    * and the per-text score — derives from the histogram, never from the
    * grams again. Scores fan back to documents through one md5(text)-
    * keyed equi-join. On a duplicate-heavy corpus the gram pass is
    * distinct-text-sized (the 10× exact-replica probe measured 37 s →
    * 2.9 s, and 1× itself halved to 2.2 s); the checkpoints pin the
    * single pass — without them every
    * eager broadcast below re-derives the explode+hash subtree. The
    * global rank is [[RangeRank]]'s distributed sort over doc-level rows
    * (range-partitioned, partition-parallel, NO single-task window): the
    * ranks are bit-identical to `row_number() OVER (ORDER BY score_q
    * DESC, doc_id)`, the per-doc scores never leave the executors, and
    * the only driver-adjacent object is the ≤-partitions-row offset
    * table RangeRank broadcasts. */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = dsirScored(spark, dir)
    RangeRank.rank(scored, Seq.empty,
        Seq(col("score_q").desc, col("doc_id")),
        "dsir_rank", Some("n_docs"))
      .withColumn("selected",
        (col("dsir_rank") * DsirSelectDenom <= col("n_docs")).cast("int"))
      .withColumn("score", col("score_q") / lit(DsirQuant))
      .select("doc_id", "n_grams", "score_q", "score", "dsir_rank",
        "selected")
  }

  /** The pre-checkpoint per-doc score frame of [[dsirSelect]] — split out
    * so PlanSpec can pin the staged shape (the eager checkpoints hide
    * the subtree from the final plan). */
  /** The uncheckpointed per-distinct-text bucket histogram of
    * [[dsirScored]] — split out so PlanSpec can pin the gram stage's
    * shape (explode collapses into a th-keyed aggregate, never a
    * gram-keyed shuffle); [[dsirScored]] checkpoints it. */
  private[graft] def dsirHist(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("th"), col("lang"),
        col("text"))
      .groupBy("th").agg(
        max(col("text")).as("text"),
        count(lit(1)).as("n_docs_t"),
        sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L))
          .as("n_tgt_t"))
      // spread: AQE coalesces the distinct-text aggregate to 1–2
      // partitions (few MB), serializing the CPU-bound gram explode +
      // md5 hashing below it (measured: the hist pin ran as a 2-task job
      // at 1.25 s of the row's 2.2 s, r16 probe)
      .transform(TextOps.spread)
      .withColumn("words", split(col("text"), " "))
      .transform(d => TextOps.explodeComputed(d, expr(
        """concat(words, IF(size(words) < 2, array(),
             transform(sequence(1, size(words) - 1),
               i -> concat(element_at(words, i), ' ',
                           element_at(words, i + 1)))))"""), "gram"))
      .select(col("th"), col("n_docs_t"), col("n_tgt_t"), col("gram"))
      .withColumn("bucket",
        (expr(TextOps.md5U16Expr("gram")) % DsirBuckets).cast("int"))
      .groupBy("th", "n_docs_t", "n_tgt_t", "bucket")
      .agg(count(lit(1)).as("cnt"))

  private[graft] def dsirScored(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("th"))
    val hist = graft.model.Stage.pin(dsirHist(spark, dir))
    // pinned: ≤ DsirBuckets rows, but its subtree (a scan of the hist
    // pin + aggregate) is otherwise re-run per broadcast it feeds
    // (totals, weights) — three scans of the hist pin become one
    val bucketCounts = graft.model.Stage.pin(
      hist.groupBy("bucket").agg(
        sum(col("cnt") * col("n_tgt_t")).as("ct"),
        sum(col("cnt") * col("n_docs_t")).as("cr")))
    val totals = bucketCounts.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val weights = bucketCounts.crossJoin(broadcast(totals))
      .withColumn("r",
        ((col("ct") + 1L).cast("double") *
          (col("nr") + DsirBuckets.toLong).cast("double")) /
        ((col("cr") + 1L).cast("double") *
          (col("nt") + DsirBuckets.toLong).cast("double")))
      .withColumn("w", (col("r") - 1.0) / (col("r") + 1.0))
      .withColumn("wq", floor(col("w") * DsirQuant).cast("bigint"))
      .select("bucket", "wq")
    val scoredText = hist.join(broadcast(weights), Seq("bucket"))
      .groupBy("th")
      .agg(sum(col("cnt")).as("n_grams"),
        sum(col("cnt") * col("wq")).as("score_q"))
    docs.select("doc_id", "th")
      .join(scoredText, Seq("th"))
      .select("doc_id", "n_grams", "score_q")
  }

  def dsirSelectOracle: String =
    s"""WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents),
    occ AS (
      SELECT doc_id, lang,
        ${TextOps.md5U16SqlDuck("gram")} % $DsirBuckets AS bucket
      FROM (
        SELECT doc_id, lang, unnest(list_concat(words,
          list_transform(range(1, len(words)),
            i -> words[i] || ' ' || words[i + 1]))) AS gram
        FROM d)),
    bc AS (
      SELECT bucket,
        sum(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END) AS ct,
        count(*) AS cr
      FROM occ GROUP BY 1),
    tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM bc),
    wt AS (
      SELECT bucket,
        CAST(floor(((r - 1.0) / (r + 1.0)) * $DsirQuant) AS BIGINT) AS wq
      FROM (
        SELECT bucket,
          (CAST(ct + 1 AS DOUBLE) * CAST(nr + $DsirBuckets AS DOUBLE)) /
          (CAST(cr + 1 AS DOUBLE) * CAST(nt + $DsirBuckets AS DOUBLE)) AS r
        FROM bc, tot)),
    scored AS (
      SELECT doc_id, count(*) AS n_grams, sum(wq) AS score_q
      FROM occ JOIN wt USING (bucket) GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM scored),
    ranked AS (
      SELECT doc_id, n_grams, score_q,
        row_number() OVER (ORDER BY score_q DESC, doc_id) AS dsir_rank,
        n_docs
      FROM scored, n)
    SELECT doc_id, n_grams, CAST(score_q AS BIGINT) AS score_q,
      CAST(score_q AS BIGINT) / $DsirQuant AS score,
      dsir_rank,
      CAST(dsir_rank * $DsirSelectDenom <= n_docs AS INTEGER) AS selected
    FROM ranked"""

  // ------------------------------------------- cluster representatives

  /** Duplicate-cluster representative election: within each near-dup
    * cluster ([[Dedup.dedupClusters]] — connected components of the
    * MinHash-LSH pair graph), keep the HIGHEST-quality member
    * ([[TextOps.textStats]] composite score, doc_id tie-break) instead
    * of the smallest id — what production dedup actually ships
    * (keep-best, drop the rest). One row per cluster with the elected
    * keeper and the drop count; the keep set for the corpus is keepers +
    * all unclustered docs.
    *
    * Shape: the cluster table is pair-graph-sized (duplicates only, not
    * the corpus); the quality join is doc-keyed; the election is one
    * window per cluster — cluster-parallel, no global ordering. The
    * quality doubles are exact rationals of integer counts (see
    * textStats), so the DESC ordering agrees bit-for-bit cross-engine. */
  /** Near-dup clusters joined with member quality and ranked by the
    * keep-best rule (quality desc, doc_id tie-break) — the ONE place the
    * election policy lives: [[bestOfCluster]] keeps rn = 1,
    * [[curationFunnel]] drops rn > 1, so the two can never diverge. */
  private[ops] def clusterRanked(spark: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.dedupClusters(spark, dir)
    val quality = TextOps.textStats(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("quality_score").desc, col("doc_id"))
    clusters.join(quality, Seq("doc_id"))
      .withColumn("rn", row_number().over(w))
  }

  def bestOfCluster(spark: SparkSession, dir: String): DataFrame =
    clusterRanked(spark, dir)
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("cluster_size"),
        col("doc_id").as("keeper_doc_id"),
        col("quality_score").as("keeper_quality"),
        (col("cluster_size") - 1L).as("n_dropped"))

  def bestOfClusterOracle: String =
    s"""WITH clusters AS (
      SELECT * FROM (${Dedup.dedupClustersOracle})),
    q AS (
      SELECT doc_id, quality_score FROM (${TextOps.textStatsOracle})),
    ranked AS (
      SELECT c.cluster_id, c.cluster_size, c.doc_id, q.quality_score,
        row_number() OVER (PARTITION BY c.cluster_id
          ORDER BY q.quality_score DESC, c.doc_id) AS rn
      FROM clusters c JOIN q USING (doc_id))
    SELECT cluster_id, cluster_size, doc_id AS keeper_doc_id,
      quality_score AS keeper_quality,
      cluster_size - 1 AS n_dropped
    FROM ranked WHERE rn = 1"""

  // ------------------------------------------------- CCNet ppl buckets

  /** CCNet-style head/middle/tail bucketing (Wenzek et al. 2019,
    * arXiv:1911.00359): per LANGUAGE, rank documents by LM score and cut
    * into terciles — CCNet trains a KenLM per language and buckets by
    * perplexity; here the LM score is [[TextOps.lmSurprisal]]'s log-free
    * `rare_frac` (rare-bigram fraction under the corpus bigram LM, the
    * same tail ordering), ascending — head = most fluent. Tercile edges
    * are integer rank arithmetic (`rn*3 <= n`), no float thresholds.
    * Documents with < 2 words have no bigram score and no row (the
    * surprisal table's documented domain).
    *
    * Shape: doc-keyed join for the language label, then [[RangeRank]]'s
    * grouped distributed rank over (lang, rare_frac, doc_id) — a window
    * `PARTITION BY lang` would put each language in ONE task (half the
    * corpus for a 50%-English crawl); the range sort instead spreads a
    * dominant language across many contiguous partitions and stitches
    * ranks with broadcast offsets, so per-language ranking really is
    * distributed at 100 TB. */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val s = TextOps.lmSurprisal(spark, dir)
      .select(col("doc_id"), col("rare_frac"))
    val langs = documents(spark, dir).select(col("doc_id"), col("lang"))
    val j = RangeRank.rank(s.join(langs, Seq("doc_id")), Seq("lang"),
      Seq(col("rare_frac"), col("doc_id")), "ppl_rank", Some("lang_n"))
    j.withColumn("ppl_bucket",
        when(col("ppl_rank") * 3 <= col("lang_n"), "head")
          .when(col("ppl_rank") * 3 <= col("lang_n") * 2, "middle")
          .otherwise("tail"))
      .select("doc_id", "lang", "rare_frac", "ppl_rank", "lang_n",
        "ppl_bucket")
  }

  def pplBucketsOracle: String =
    s"""WITH s AS (
      SELECT doc_id, rare_frac FROM (${TextOps.lmSurprisalOracle})),
    j AS (
      SELECT s.doc_id, d.lang, s.rare_frac,
        row_number() OVER (PARTITION BY d.lang
          ORDER BY s.rare_frac, s.doc_id) AS ppl_rank,
        count(*) OVER (PARTITION BY d.lang) AS lang_n
      FROM s JOIN documents d USING (doc_id))
    SELECT doc_id, lang, rare_frac, ppl_rank, lang_n,
      CASE WHEN ppl_rank * 3 <= lang_n THEN 'head'
           WHEN ppl_rank * 3 <= lang_n * 2 THEN 'middle'
           ELSE 'tail' END AS ppl_bucket
    FROM j"""

  // ------------------------------------------------------ epoch shuffle

  /** Shard count for the deterministic epoch shuffle. */
  val ShuffleShards = 16

  /** Deterministic epoch shuffle: the reproducible global permutation a
    * training run needs — every document gets a content-stable position
    * `(shard_id, seq)` derived ONLY from `md5("epoch<e>:" || doc_id)`, so
    * re-running the pipeline, resharding the corpus, or changing core
    * counts never changes training order, and epoch e+1 is a fresh
    * independent permutation (new hash prefix) with zero state carried.
    * The hash IS the sort key: within a shard, documents stream in
    * order_key order.
    *
    * Shape: the key is a map-side expression; shard assignment is the
    * 16-bit nibble slice mod [[ShuffleShards]] (uniform across shards);
    * the per-shard sequence is [[RangeRank]]'s distributed rank — a
    * `PARTITION BY shard_id` window would make each shard ONE task
    * (|corpus|/16 rows through a single sort at 100 TB, the same weak
    * class the round-10 selection fixes removed); the range-staged rank
    * is bit-identical and partition-parallel, and a reader of shard s
    * still touches only its rows. */
  def shuffleShards(spark: SparkSession, dir: String,
      epoch: Int = 0): DataFrame = {
    val keyed = documents(spark, dir)
      .withColumn("order_key",
        md5(concat(lit(s"epoch$epoch:"), col("doc_id").cast("string"))))
      .withColumn("shard_id",
        (expr(TextOps.md5U16Expr(s"concat('epoch$epoch:', cast(doc_id as string))"))
          % ShuffleShards).cast("int"))
    RangeRank.rank(keyed, Seq("shard_id"),
        Seq(col("order_key"), col("doc_id")), "seq")
      .withColumn("seq", col("seq").cast("bigint"))
      .select("doc_id", "shard_id", "seq", "order_key")
  }

  def shuffleShardsOracle(epoch: Int = 0): String = {
    val keyExpr = s"'epoch$epoch:' || CAST(doc_id AS VARCHAR)"
    s"""WITH keyed AS (
      SELECT doc_id, md5($keyExpr) AS order_key,
        ${TextOps.md5U16SqlDuck(keyExpr)} % $ShuffleShards AS shard_id
      FROM documents)
    SELECT doc_id, CAST(shard_id AS INTEGER) AS shard_id,
      CAST(row_number() OVER (PARTITION BY shard_id
        ORDER BY order_key, doc_id) AS BIGINT) AS seq,
      order_key
    FROM keyed"""
  }

  // --------------------------------- per-source quality normalization

  /** Per-source quality quantile normalization: rank every document's
    * composite quality score ([[TextOps.textStats]]) WITHIN its source
    * and gate at the per-source median — the fix for the classic
    * curation failure where one global threshold wipes out an entire
    * source whose score distribution sits lower (different register,
    * different language mix) while rubber-stamping another. `pct` is the
    * explicit (rank−1)/(n−1) percent_rank — two integer-derived IEEE ops,
    * bit-stable cross-engine (ties broken by doc_id so the rank itself
    * is deterministic); the keep decision is pure integer arithmetic
    * (`q_rank * 2 <= src_n`), keeping the top half of every source.
    *
    * Shape: one doc-keyed join (quality ⋈ source label), then
    * [[RangeRank]]'s grouped distributed rank over (source,
    * quality_score DESC, doc_id) — a `PARTITION BY source` window is one
    * task per source (a dominant crawl source = most of the corpus in
    * one task); the range sort spreads each source across contiguous
    * partitions and stitches exact ranks with broadcast offsets. The
    * full rank (not just a median threshold) is kept because `pct` is an
    * output column; when only the gate is needed, the broadcast offset
    * table already contains each source's total, so a threshold gate
    * falls out of the same machinery. */
  def qualityBySource(spark: SparkSession, dir: String): DataFrame = {
    val q = TextOps.textStats(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val src = documents(spark, dir).select(col("doc_id"), col("source"))
    RangeRank.rank(q.join(src, Seq("doc_id")), Seq("source"),
        Seq(col("quality_score").desc, col("doc_id")),
        "q_rank", Some("src_n"))
      .withColumn("pct",
        when(col("src_n") === 1L, 0.0).otherwise(
          (col("q_rank") - 1L).cast("double") /
            (col("src_n") - 1L).cast("double")))
      .withColumn("kept", (col("q_rank") * 2 <= col("src_n")).cast("int"))
      .select("doc_id", "source", "quality_score", "q_rank", "src_n",
        "pct", "kept")
  }

  def qualityBySourceOracle: String =
    s"""WITH q AS (
      SELECT doc_id, quality_score FROM (${TextOps.textStatsOracle})),
    ranked AS (
      SELECT q.doc_id, d.source, q.quality_score,
        row_number() OVER (PARTITION BY d.source
          ORDER BY q.quality_score DESC, q.doc_id) AS q_rank,
        count(*) OVER (PARTITION BY d.source) AS src_n
      FROM q JOIN documents d USING (doc_id))
    SELECT doc_id, source, quality_score,
      CAST(q_rank AS INTEGER) AS q_rank, src_n,
      CASE WHEN src_n = 1 THEN 0.0
        ELSE CAST(q_rank - 1 AS DOUBLE) / CAST(src_n - 1 AS DOUBLE) END
        AS pct,
      CAST(q_rank * 2 <= src_n AS INTEGER) AS kept
    FROM ranked"""

  // ------------------------------------------ benchmark integrity report

  /** Eval-suite integrity report: [[Decontam.overlap]] aggregated per
    * BENCHMARK document — how many training docs leak each eval item,
    * and how badly (max shared grams / max covered fraction). This is
    * the table an eval release publishes: a bench item with a high
    * `worst_frac` is compromised and its scores are memorization, not
    * generalization. Aggregating the pair table is one bench-keyed
    * aggregate over an already-bounded frame (benchmark side is fixed
    * and tiny by construction). */
  def decontamReport(spark: SparkSession, dir: String): DataFrame =
    Decontam.overlap(spark, dir)
      .groupBy("bench_id")
      .agg(count(lit(1)).as("n_flagged"),
        max(col("n_shared")).as("max_shared"),
        max(col("bench_frac")).as("worst_frac"))

  def decontamReportOracle: String =
    s"""SELECT bench_id, count(*) AS n_flagged,
      max(n_shared) AS max_shared, max(bench_frac) AS worst_frac
    FROM (${Decontam.overlapOracle()}) GROUP BY 1"""

  // -------------------------------------- cross-source duplication matrix

  /** Cross-source near-duplication matrix: how much each pair of corpus
    * SOURCES overlaps, measured on the banded-MinHash candidate graph
    * ([[Dedup.minhashLsh]]) with both endpoints labelled by their
    * document's `source` and the pair normalized to an unordered
    * (source_a ≤ source_b) cell. This is the acquisition-dashboard view
    * of dedup: a hot off-diagonal cell means two feeds ship the same
    * content (pay for one), a hot diagonal means a feed re-crawls itself.
    *
    * Shape: the pair graph is banding-bounded (never all-pairs); the two
    * source lookups are doc-keyed joins of a (doc_id, source) projection;
    * the matrix aggregate is ≤ sources² rows. Pairs are representative-
    * level (near-dup staging folds exact twins first), so a cell counts
    * distinct-content overlaps, not copy multiplicity — the exact-copy
    * mass is [[Dedup.exact]]'s `dup_count` by source. */
  def crossSource(spark: SparkSession, dir: String): DataFrame = {
    val src = documents(spark, dir).select(col("doc_id"), col("source"))
    Dedup.minhashLsh(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("shared_bands")).as("max_shared_bands"))
  }

  def crossSourceOracle: String =
    s"""WITH pairs AS (
      SELECT doc_a, doc_b, shared_bands FROM (${Dedup.minhashLshOracle})),
    labelled AS (
      SELECT least(da.source, db.source) AS source_a,
        greatest(da.source, db.source) AS source_b, p.shared_bands
      FROM pairs p
      JOIN documents da ON da.doc_id = p.doc_a
      JOIN documents db ON db.doc_id = p.doc_b)
    SELECT source_a, source_b, count(*) AS n_pairs,
      max(shared_bands) AS max_shared_bands
    FROM labelled GROUP BY 1, 2"""

  // ------------------------------------------------------ curation funnel

  /** The composed curation pipeline as one auditable funnel: raw corpus →
    * exact dedup (keep min doc_id per distinct text) → near-dup cluster
    * keeper election (the [[bestOfCluster]] rule: drop every cluster
    * member except the highest-quality one) → Gopher quality gate
    * ([[gopherRules]] passes_all) → decontamination (drop the held-out
    * benchmark docs themselves and every training doc
    * [[Decontam.overlap]] flags against them). One row per stage with
    * in/out/dropped counts — the release-note table a data curation run
    * publishes, and the proof the individual operators compose.
    *
    * Shape: every constituent keeps its own documented scale shape; the
    * funnel adds doc-keyed left joins of three SMALL drop sets (cluster
    * non-keepers, contaminated ids — both duplicate-volume-sized — and
    * the fixed benchmark prefix) against the per-doc flags frame, then
    * ONE 1-row aggregate unpivoted by `stack`. Nothing here is
    * corpus-pairwise; the counts shuffle 4 longs. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = documents(spark, dir).select(col("doc_id"))
    // the SAME staging rule as every near-dup operator (Dedup.distinctDocs)
    // and the SAME election as bestOfCluster (clusterRanked) — shared
    // builders, so the funnel counts can't drift from the operators
    val reps = Dedup.distinctDocs(spark, dir)
      .select(col("doc_id"), lit(1).as("is_rep"))
    val clusterDrops = clusterRanked(spark, dir)
      .filter(col("rn") > 1)
      .select(col("doc_id"), lit(1).as("is_cluster_drop"))
    val gopher = gopherRules(spark, dir).select("doc_id", "passes_all")
    val contam = Decontam.overlap(spark, dir)
      .select("doc_id").distinct()
      .withColumn("is_contam", lit(1))
    val flags = docs
      .join(reps, Seq("doc_id"), "left")
      .join(clusterDrops, Seq("doc_id"), "left")
      .join(gopher, Seq("doc_id"))
      .join(contam, Seq("doc_id"), "left")
      .select(
        coalesce(col("is_rep"), lit(0)).as("s1"),
        when(col("is_cluster_drop").isNull, 1).otherwise(0).as("s2"),
        col("passes_all").as("s3"),
        when(col("doc_id") >= Decontam.BenchmarkDocs &&
          col("is_contam").isNull, 1).otherwise(0).as("s4"))
    flags.agg(
        count(lit(1)).as("n0"),
        sum(col("s1")).as("n1"),
        sum(col("s1") * col("s2")).as("n2"),
        sum(col("s1") * col("s2") * col("s3")).as("n3"),
        sum(col("s1") * col("s2") * col("s3") * col("s4")).as("n4"))
      .selectExpr("""stack(4,
        1, 'exact_dedup', n0, n1,
        2, 'near_dup_keepers', n1, n2,
        3, 'quality_gate', n2, n3,
        4, 'decontam', n3, n4) AS (stage, stage_name, n_in, n_out)""")
      .withColumn("stage", col("stage").cast("int"))
      .withColumn("n_in", col("n_in").cast("bigint"))
      .withColumn("n_out", col("n_out").cast("bigint"))
      .withColumn("n_dropped", col("n_in") - col("n_out"))
  }

  def curationFunnelOracle: String =
    s"""WITH reps AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
    clusters AS (
      SELECT * FROM (${Dedup.dedupClustersOracle})),
    q AS (
      SELECT doc_id, quality_score FROM (${TextOps.textStatsOracle})),
    cluster_drops AS (
      SELECT doc_id FROM (
        SELECT c.doc_id, row_number() OVER (PARTITION BY c.cluster_id
          ORDER BY q.quality_score DESC, c.doc_id) AS rn
        FROM clusters c JOIN q USING (doc_id))
      WHERE rn > 1),
    gopher AS (
      SELECT doc_id, passes_all FROM (${gopherRulesOracle})),
    contam AS (
      SELECT DISTINCT doc_id FROM (${Decontam.overlapOracle()})),
    flags AS (
      SELECT
        CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s1,
        CASE WHEN cd.doc_id IS NULL THEN 1 ELSE 0 END AS s2,
        g.passes_all AS s3,
        CASE WHEN d.doc_id >= ${Decontam.BenchmarkDocs}
          AND ct.doc_id IS NULL THEN 1 ELSE 0 END AS s4
      FROM documents d
      LEFT JOIN reps r ON r.doc_id = d.doc_id
      LEFT JOIN cluster_drops cd ON cd.doc_id = d.doc_id
      JOIN gopher g ON g.doc_id = d.doc_id
      LEFT JOIN contam ct ON ct.doc_id = d.doc_id),
    n AS (
      SELECT CAST(count(*) AS BIGINT) AS n0,
        CAST(sum(s1) AS BIGINT) AS n1,
        CAST(sum(s1 * s2) AS BIGINT) AS n2,
        CAST(sum(s1 * s2 * s3) AS BIGINT) AS n3,
        CAST(sum(s1 * s2 * s3 * s4) AS BIGINT) AS n4
      FROM flags)
    SELECT 1 AS stage, 'exact_dedup' AS stage_name, n0 AS n_in, n1 AS n_out,
      n0 - n1 AS n_dropped FROM n
    UNION ALL SELECT 2, 'near_dup_keepers', n1, n2, n1 - n2 FROM n
    UNION ALL SELECT 3, 'quality_gate', n2, n3, n2 - n3 FROM n
    UNION ALL SELECT 4, 'decontam', n3, n4, n3 - n4 FROM n"""
}
