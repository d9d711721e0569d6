package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: find training documents that contain
  * passages of a held-out evaluation set — the decontamination sweep every
  * LLM training pipeline runs before a corpus ships (the GPT-3 appendix-C
  * style n-gram overlap check, run here at 5-word grams).
  *
  * Shape: both sides reduce to distinct md5'd word-5-gram shingles, the
  * benchmark side (tiny — eval suites are thousands of docs, the corpus is
  * billions) is the build side of an equi-join on the shingle hash, and
  * hits aggregate per (corpus doc, benchmark doc). At 100 TB: the corpus
  * explode is map-side over the scan, the only wide op is the shuffle of
  * 16-byte hashes, and the benchmark side broadcasts — no pairwise work
  * outside genuine shingle collisions. A document-frequency cutoff
  * ([[Dedup.MaxShingleDocFrequency]] discipline) drops boilerplate
  * shingles so no single gram fans out across the whole corpus.
  *
  * The synthetic "benchmark" is the first [[BenchmarkDocs]] documents —
  * a deterministic, SQL-expressible stand-in for a real eval-suite table
  * (swap the `bench` DataFrame for one read from the eval store in
  * production).
  */
object Decontam {

  /** Gram order: 5 consecutive words (real pipelines use 8–13; the test
    * corpus' documents are ~50 words, so 5 keeps enough grams per doc for
    * the overlap statistics to be meaningful). */
  val GramWords = 5

  /** Shingles appearing in more than this many corpus docs are dropped —
    * boilerplate carries no contamination signal and fans out linearly in
    * corpus size inside the join. Unreached at test SFs (results
    * unchanged); load-bearing at 100 TB. */
  val MaxGramDocFrequency = 1000

  /** Minimum shared distinct grams to report a contaminated pair: one
    * 5-gram collision happens by chance on a small vocabulary; ≥5 distinct
    * shared grams means a ≥9-word shared passage (or several shorter
    * ones) — a real leak. */
  val MinSharedGrams = 5

  /** Held-out "benchmark" membership: the first N doc ids. */
  val BenchmarkDocs = 25

  private val gramExpr =
    s"""case when size(words) < $GramWords then array()
       else transform(sequence(1, size(words) - ${GramWords - 1}),
         i -> md5(concat_ws(' ',
           ${(0 until GramWords).map(o => s"element_at(words, i + $o)").mkString(", ")})))
       end"""

  private val gramSqlDuck =
    s"""CASE WHEN len(words) < $GramWords THEN []
       ELSE list_transform(range(1, len(words) - ${GramWords - 2}),
         i -> md5(${(0 until GramWords).map(o => s"words[i + $o]").mkString(" || ' ' || ")}))
       END"""

  private def shingles(spark: SparkSession, dir: String): DataFrame =
    TextOps.spread(TextOps.documents(spark, dir))
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(gramExpr)).as("sh"))
      .distinct()

  /** Contaminated (corpus doc, benchmark doc) pairs with shared-gram count
    * and the fraction of the benchmark doc's grams found in the corpus
    * doc (1.0 = the benchmark doc is fully contained). */
  def overlap(spark: SparkSession, dir: String,
      minShared: Int = MinSharedGrams): DataFrame = {
    val sh = shingles(spark, dir)
    val corpus = sh.filter(col("doc_id") >= BenchmarkDocs)
    // df cutoff measured on the corpus side only: the benchmark must never
    // vote its own grams out of the index
    val hot = corpus.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxGramDocFrequency).select("sh")
    val corpusKept = corpus.join(hot, Seq("sh"), "left_anti")
    val bench = sh.filter(col("doc_id") < BenchmarkDocs)
      .withColumnRenamed("doc_id", "bench_id")
    val benchSizes = bench.groupBy("bench_id").agg(count(lit(1)).as("bench_grams"))
    corpusKept.join(broadcast(bench), Seq("sh"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(broadcast(benchSizes), Seq("bench_id"))
      .select(col("doc_id"), col("bench_id"),
        col("n_shared").cast("bigint").as("n_shared"),
        (col("n_shared") * 1.0 / col("bench_grams")).as("bench_frac"))
  }

  /** Bloom geometry for [[bloomScreen]]: m = 65536 bits (8 KiB), k = 3
    * probes. Probe j of a gram is nibbles [4j, 4j+4) of its md5 (the
    * gram key IS already a hex digest) — the [[Sketch.cmsBucketExpr]]
    * discipline of slicing independent indices from one digest. Sizing:
    * the benchmark sets ~3.5k bits here (≈5% load → per-gram FP
    * ≈ 0.05³ ≈ 10⁻⁴); m grows with the eval suite at the usual
    * ~10–20 bits/gram, and 10⁶ grams is still a ~2 MB broadcast. The
    * first cut used m = 4096 — 57% load, 18% per-gram FP, and the
    * screen flagged most of the corpus; a Bloom pre-screen is only as
    * useful as its sizing. */
  val BloomBits = 65536
  val BloomK = 3

  private def bloomBitExpr(shCol: String, j: Int, duck: Boolean): String = {
    def nib(i: Int) =
      if (duck) s"(strpos('0123456789abcdef', substr($shCol, $i, 1)) - 1)"
      else s"(instr('0123456789abcdef', substring($shCol, $i, 1)) - 1)"
    s"(${nib(4 * j + 1)} * 4096 + ${nib(4 * j + 2)} * 256 + " +
      s"${nib(4 * j + 3)} * 16 + ${nib(4 * j + 4)})"
  }

  /** Bloom-filter pre-screen — the decontamination shape that actually
    * runs first at 100 TB: the benchmark's gram set becomes an m-bit
    * Bloom bitset BROADCAST to every task, and the corpus pass is
    * map-only (k O(1) array probes per gram, no join, no shuffle of
    * grams); only flagged docs proceed to the exact [[overlap]] join.
    * A Bloom filter can only err toward FALSE POSITIVES (all k probe
    * bits set by other grams) — never misses real contamination — so
    * the row reports bloom hits NEXT TO exact hits per flagged doc and
    * `n_false_pos = bloom − exact ≥ 0` is oracle-checked, the same
    * estimate-beside-truth contract as [[Sketch.cmsHeavyHitters]].
    *
    * Driver-side bound: the bitset is built by collecting the
    * benchmark side's distinct bit positions — eval suites are
    * thousands of documents (here [[BenchmarkDocs]]), and m/8 bytes is
    * 512 B at this geometry; a production 1M-gram suite at 10 bits/gram
    * is ~1.25 MB — the classic broadcast-variable size, same order as
    * the k-means centroid localization documented at
    * `ops/Similarity.scala`. */
  def bloomScreen(spark: SparkSession, dir: String,
      minShared: Int = MinSharedGrams): DataFrame = {
    val sh = shingles(spark, dir)
    val bench = sh.filter(col("doc_id") < BenchmarkDocs)
    val setBits = bench
      .select(explode(array((0 until BloomK).map(j =>
        expr(bloomBitExpr("sh", j, duck = false))): _*)).as("bit"))
      .distinct().collect().map(_.getInt(0)).toSet
    val bloom = typedLit((0 until BloomBits).map(setBits.contains))
    val benchSh = bench.select("sh").distinct()
      .withColumn("exact", lit(1L))
    val hitCol = (0 until BloomK)
      .map(j => element_at(bloom,
        expr(bloomBitExpr("sh", j, duck = false)) + 1))
      .reduce(_ && _)
    sh.filter(col("doc_id") >= BenchmarkDocs)
      .join(broadcast(benchSh), Seq("sh"), "left")
      .withColumn("bloom_hit", hitCol.cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(col("bloom_hit")).as("n_bloom_hits"),
        sum(coalesce(col("exact"), lit(0L))).as("n_exact_hits"))
      .filter(col("n_bloom_hits") >= minShared)
      .withColumn("n_false_pos", col("n_bloom_hits") - col("n_exact_hits"))
  }

  def bloomScreenOracle(minShared: Int = MinSharedGrams): String = {
    val bitList = (0 until BloomK)
      .map(j => bloomBitExpr("sh", j, duck = true)).mkString("[", ", ", "]")
    val probes = (0 until BloomK)
      .map(j => s"${bloomBitExpr("c.sh", j, duck = true)} IN " +
        "(SELECT bit FROM bench_bits)")
      .mkString(" AND ")
    s"""WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest($gramSqlDuck) AS sh FROM d),
    bench_bits AS (
      SELECT DISTINCT unnest($bitList) AS bit FROM sh
      WHERE doc_id < $BenchmarkDocs),
    bench_sh AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id < $BenchmarkDocs),
    g AS (
      SELECT c.doc_id,
        CASE WHEN $probes THEN 1 ELSE 0 END AS bloom_hit,
        CASE WHEN c.sh IN (SELECT sh FROM bench_sh) THEN 1 ELSE 0 END
          AS exact_hit
      FROM sh c WHERE c.doc_id >= $BenchmarkDocs)
    SELECT doc_id, count(*) AS n_grams,
      CAST(sum(bloom_hit) AS BIGINT) AS n_bloom_hits,
      CAST(sum(exact_hit) AS BIGINT) AS n_exact_hits,
      CAST(sum(bloom_hit) - sum(exact_hit) AS BIGINT) AS n_false_pos
    FROM g GROUP BY 1
    HAVING sum(bloom_hit) >= $minShared"""
  }

  def overlapOracle(minShared: Int = MinSharedGrams): String =
    s"""WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest($gramSqlDuck) AS sh FROM d),
    corpus AS (
      SELECT doc_id, sh FROM sh
      WHERE doc_id >= $BenchmarkDocs
        AND sh NOT IN (
          SELECT sh FROM sh WHERE doc_id >= $BenchmarkDocs
          GROUP BY sh HAVING count(*) > $MaxGramDocFrequency)),
    bench AS (
      SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id < $BenchmarkDocs),
    bench_sizes AS (
      SELECT bench_id, count(*) AS bench_grams FROM bench GROUP BY 1),
    hits AS (
      SELECT c.doc_id, b.bench_id, count(*) AS n_shared
      FROM corpus c JOIN bench b USING (sh)
      GROUP BY 1, 2)
    SELECT h.doc_id, h.bench_id, CAST(h.n_shared AS BIGINT) AS n_shared,
      h.n_shared * 1.0 / s.bench_grams AS bench_frac
    FROM hits h JOIN bench_sizes s USING (bench_id)
    WHERE h.n_shared >= $minShared"""
}
