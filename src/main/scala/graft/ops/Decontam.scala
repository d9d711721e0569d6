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

  /** Distinct (doc, gram) pairs of one SIDE of the decontam check.
    * The side's doc_id filter is applied at the SCAN (below the explode),
    * and only the corpus side pays [[TextOps.spread]]'s parallelizing
    * repartition: the benchmark side is a handful of documents whose
    * derivations run as 1-task jobs several times per query (geometry
    * count, bit collect, the build side of the joins) — repartitioning
    * it made each of those a 33-task job of empty partitions (measured
    * +1.7 s on decontam_bloom, r16 probe). Per-doc gram dedup is
    * array_distinct INSIDE the row — doc_id is unique per row, so this
    * equals a global `.distinct()` on (doc_id, sh) without its
    * corpus-wide shuffle (guide §2.4: remove shuffles outright).
    * explodeComputed: the inferred size-filter would double-evaluate
    * the md5 gram transform at the scan. */
  private def sideShingles(spark: SparkSession, dir: String,
      bench: Boolean): DataFrame = {
    val docs = TextOps.documents(spark, dir)
    val side =
      if (bench) docs.filter(col("doc_id") < BenchmarkDocs)
      else TextOps.spread(docs.filter(col("doc_id") >= BenchmarkDocs))
    TextOps.explodeComputed(
      side.withColumn("words", split(col("text"), " ")),
      array_distinct(expr(gramExpr)), "sh")
      .select("doc_id", "sh")
  }

  /** Contaminated (corpus doc, benchmark doc) pairs with shared-gram count
    * and the fraction of the benchmark doc's grams found in the corpus
    * doc (1.0 = the benchmark doc is fully contained).
    *
    * Scale shape (guide §3.2): only grams present in the (tiny, fixed)
    * benchmark side can ever reach the output, so the corpus gram stream
    * is SEMI-JOINED against the broadcast benchmark gram set BEFORE any
    * shuffle — the corpus-side pass is map-only (scan → explode →
    * broadcast hash probe), and everything wide downstream (the df
    * cutoff, the pair aggregate) runs over the matching grams only.
    * The df cutoff is exact under the pre-filter: for a gram in the
    * benchmark set, EVERY corpus occurrence row survives the semi-join
    * (the filter is on the gram alone), so its document frequency over
    * the matched rows equals its global corpus df; grams outside the set
    * cannot reach the output, so their cutoff verdict is irrelevant. */
  def overlap(spark: SparkSession, dir: String,
      minShared: Int = MinSharedGrams): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bench = sideShingles(spark, dir, bench = true)
      .withColumnRenamed("doc_id", "bench_id")
    val benchSh = bench.select("sh").distinct()
    val matched = sideShingles(spark, dir, bench = false)
      .join(broadcast(benchSh), Seq("sh"), "left_semi")
    // df cutoff measured on the corpus side only: the benchmark must never
    // vote its own grams out of the index. Counted with ONE window over
    // the (already benchmark-bounded) matched rows instead of a second
    // evaluation of the corpus gram subtree plus an anti-join.
    val corpusKept = matched
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .filter(col("df") <= MaxGramDocFrequency)
      .drop("df")
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

  /** Bloom geometry for [[bloomScreen]]: m = [[bloomBits]](n) bits for an
    * n-gram benchmark, k = 3 probes. Probe j of a gram is
    * `(hi_j · 2¹⁶ + nibbles [4j, 4j+4)) mod m` of its md5 (the gram key
    * IS already a hex digest) — the [[Sketch.cmsBucketExpr]] discipline
    * of slicing independent indices from one digest, with hi_j three
    * further nibbles (12 bits) from the digest tail so the pre-modulus
    * value carries 28 bits. At the m = 65536 floor the modulus reduces
    * the probe EXACTLY to the original 16-bit nibble slice, so every
    * result at the test SFs is bit-identical to the fixed-m engine.
    * Sizing history: the first cut used m = 4096 — 57% load, 18%
    * per-gram FP, and the screen flagged most of the corpus; the 65536
    * resize gave ~5% load (per-gram FP ≈ 0.05³ ≈ 10⁻⁴). A Bloom
    * pre-screen is only as useful as its sizing — which is why m is now
    * DERIVED from the suite instead of hardcoded. */
  val BloomBitsFloor = 65536
  val BloomK = 3

  /** Bits per benchmark gram the geometry targets: with k = 3 probes the
    * set-bit load stays ≤ k/32 < 10%, keeping the per-gram FP under
    * (0.1)³ = 10⁻³ at any suite size. */
  val BloomTargetBitsPerGram = 32L

  /** Plan-size ceiling: 2²⁶ bits (8 MiB as a boolean literal) covers a
    * 2M-gram eval suite at 32 bits/gram; a larger suite should move the
    * bitset from a plan literal to a rebroadcast table, not grow the
    * literal further. */
  val BloomBitsCap = 1 << 26

  /** m for an n-gram benchmark: n · [[BloomTargetBitsPerGram]], floored
    * at [[BloomBitsFloor]] (the proven test-SF geometry — below the knee
    * nothing changes bit-for-bit) and capped at [[BloomBitsCap]]. The
    * oracle computes the same arithmetic in SQL, so the two sides always
    * agree on the geometry without a config channel. */
  def bloomBits(benchGrams: Long): Int =
    // cap test BEFORE multiplying — n · bitsPerGram overflows Long for
    // pathological n, and an overflowed negative would fall to the floor
    if (benchGrams >= BloomBitsCap / BloomTargetBitsPerGram) BloomBitsCap
    else math.max(BloomBitsFloor.toLong,
      BloomTargetBitsPerGram * benchGrams).toInt

  private def bloomBitExpr(shCol: String, j: Int, duck: Boolean,
      mExpr: String): String = {
    def nib(i: Int) =
      if (duck) s"(strpos('0123456789abcdef', substr($shCol, $i, 1)) - 1)"
      else s"(instr('0123456789abcdef', substring($shCol, $i, 1)) - 1)"
    val hi = s"(${nib(13 + 3 * j)} * 256 + ${nib(14 + 3 * j)} * 16 + " +
      s"${nib(15 + 3 * j)})"
    val lo = s"${nib(4 * j + 1)} * 4096 + ${nib(4 * j + 2)} * 256 + " +
      s"${nib(4 * j + 3)} * 16 + ${nib(4 * j + 4)}"
    s"(($hi * 65536 + $lo) % $mExpr)"
  }

  /** Derived geometry of a benchmark side: (m, set bit positions).
    * Factored out so the load spec audits the exact bitset the screen
    * broadcasts. Two bounded driver actions on the (tiny) benchmark
    * side: the distinct-gram count that sizes m, then the ≤ k·n bit
    * positions. */
  private[graft] def bloomGeometryOf(bench: DataFrame): (Int, Set[Int]) = {
    val m = bloomBits(bench.select("sh").distinct().count())
    val setBits = bench
      .select(explode(array((0 until BloomK).map(j =>
        expr(bloomBitExpr("sh", j, duck = false, m.toString))): _*)).as("bit"))
      .distinct().collect().map(_.getInt(0)).toSet
    (m, setBits)
  }

  /** Fraction of the m bits set for `dir`'s benchmark — the quantity the
    * sizing exists to bound (≤ k/[[BloomTargetBitsPerGram]] < 10% above
    * the floor; lower still below it). */
  def bloomLoadFactor(spark: SparkSession, dir: String): Double = {
    val (m, setBits) = bloomGeometryOf(
      sideShingles(spark, dir, bench = true))
    setBits.size.toDouble / m
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
    * 512 B at the floor geometry; a production 1M-gram suite lands at
    * m = 32M bits = 4 MB — the classic broadcast-variable size, same
    * order as the k-means centroid localization documented at
    * `ops/Similarity.scala` (and [[BloomBitsCap]] bounds the plan
    * literal). m itself is [[bloomBits]] of the suite's distinct gram
    * count — derived, not configured, and replayed by the oracle. */
  def bloomScreen(spark: SparkSession, dir: String,
      minShared: Int = MinSharedGrams): DataFrame = {
    val bench = sideShingles(spark, dir, bench = true)
    val (m, setBits) = bloomGeometryOf(bench)
    val bloom = typedLit((0 until m).map(setBits.contains))
    val benchSh = bench.select("sh").distinct()
      .withColumn("exact", lit(1L))
    val hitCol = (0 until BloomK)
      .map(j => element_at(bloom,
        expr(bloomBitExpr("sh", j, duck = false, m.toString)) + 1))
      .reduce(_ && _)
    sideShingles(spark, dir, bench = false)
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
    // the oracle re-derives m with the same arithmetic as [[bloomBits]]
    // (target bits/gram, floor, cap) from the same distinct-gram count,
    // so geometry can never drift between the engines
    val mSql = "(SELECT least(" + BloomBitsCap + ", greatest(" +
      BloomBitsFloor + ", " + BloomTargetBitsPerGram +
      " * (SELECT count(*) FROM bench_sh))) )"
    val bitList = (0 until BloomK)
      .map(j => bloomBitExpr("sh", j, duck = true, mSql))
      .mkString("[", ", ", "]")
    val probes = (0 until BloomK)
      .map(j => s"${bloomBitExpr("c.sh", j, duck = true, mSql)} IN " +
        "(SELECT bit FROM bench_bits)")
      .mkString(" AND ")
    s"""WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest($gramSqlDuck) AS sh FROM d),
    bench_sh AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id < $BenchmarkDocs),
    bench_bits AS (
      SELECT DISTINCT unnest($bitList) AS bit FROM sh
      WHERE doc_id < $BenchmarkDocs),
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
