package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distinct-count sketching via KMV (k-minimum values), the classic
  * bottom-k estimator (Bar-Yossef et al., "Counting distinct elements in a
  * data stream"): hash every element to a uniform fraction of the hash
  * space, keep the k smallest DISTINCT hashes per group, and estimate
  * |D| ≈ (k-1) / fraction(h_k). Reference analogue: the engine's
  * approximate `count(distinct …)` family — re-expressed here as a
  * deterministic sketch both engines can compute bit-identically, unlike
  * HLL whose register layout is implementation-private.
  *
  * Determinism is the design driver (the same reason the split/sample
  * family uses hash thresholds, TextOps.md5U16Expr): the hash is the first
  * 24 bits of md5, extracted nibble-by-nibble with integer arithmetic
  * because DuckDB has no hex→int conversion; every downstream step is
  * integer or IEEE-correctly-rounded division, so Spark and the oracle
  * agree exactly — the estimate itself is oracle-checkable, not just
  * "close".
  *
  * Scale shape: the only corpus-sized work is the distinct on
  * (group, hash) — one shuffle with map-side partial dedup. After it the
  * relation is bounded by the HASH SPACE (≤ 2²⁴ rows per group however
  * large the corpus), so the per-group k-smallest window never sees
  * unbounded input — the property that makes bottom-k mergeable across
  * shards: min-k of a union = min-k of per-shard min-k's. The exact
  * countDistinct branch exists only to report the sketch's accuracy in the
  * same row; a production pipeline emits the estimate alone and skips that
  * second aggregate entirely.
  */
object Sketch {

  /** Sketch size: estimates use the k-th smallest distinct hash. 64 gives
    * ~1/√(k-2) ≈ 13% relative standard error — the textbook trade; the
    * driver row pins the REALIZED error exactly, because the hash
    * sequence is deterministic. */
  val K = 64

  /** Hash-space size: 24 bits = 6 md5 nibbles. Wide enough that the test
    * corpora sit far from saturation (collisions fold into the estimate
    * identically in both engines either way). */
  val HashSpace: Long = 1L << 24

  /** First 24 md5 bits of `idCol` as an integer in [0, 2²⁴) — Spark SQL
    * dialect. Extends TextOps.md5U16Expr's nibble arithmetic to 6
    * nibbles. */
  private[graft] def md5U24Expr(idCol: String): String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substring(md5(cast($idCol as string)), $i, 1)) - 1)"
    (1 to 6).map(i => s"${nib(i)} * ${1L << (4 * (6 - i))}").mkString("(", " + ", ")")
  }

  /** DuckDB twin of [[md5U24Expr]]. */
  private[graft] def md5U24SqlDuck(idCol: String): String = {
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr(md5(CAST($idCol AS VARCHAR)), $i, 1)) - 1)"
    (1 to 6).map(i => s"${nib(i)} * ${1L << (4 * (6 - i))}").mkString("(", " + ", ")")
  }

  /** Per-event-type distinct-user estimate: the KMV estimate next to the
    * exact count and their ratio. `n_kept` < [[K]] means the sketch held
    * every distinct hash and the "estimate" is exact-by-construction
    * (modulo hash collisions, identical in both engines). */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val e = Events.events(spark, dir)
      .select(col("event_type"),
        col("user_id"),
        expr(md5U24Expr("user_id")).cast("long").as("h"))
    val hashes = e.select("event_type", "h").distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    val sketch = hashes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("n_kept") < K, col("n_kept").cast("double"))
          .otherwise((lit(K - 1) * lit(HashSpace.toDouble)) / col("kth_min")))
    val exact = e.select("event_type", "user_id").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("exact_distinct"))
    // est_ratio is est/exact (1.0 = perfect) — deliberately NOT named a
    // "relative error", which would read as |est-exact|/exact
    sketch.join(exact, Seq("event_type"))
      .withColumn("est_ratio", col("est_distinct") / col("exact_distinct"))
      .select("event_type", "n_kept", "kth_min", "est_distinct",
        "exact_distinct", "est_ratio")
  }

  /** Shards for the merge demonstration row. */
  val MergeShards = 8

  /** The property that makes KMV a 100-TB sketch, exercised end-to-end:
    * bottom-k of a union equals bottom-k of the per-shard bottom-k's. The
    * corpus is split into [[MergeShards]] deterministic shards
    * (`user_id % 8` — a stand-in for physical table shards), each shard
    * builds its own K-minimum sketch, the shard sketches are UNIONED and
    * re-bottom-k'd, and the row reports the merged estimate next to the
    * direct whole-corpus sketch with `sketch_agrees` pinning their
    * bit-equality. At warehouse scale the per-shard pass is the map-side
    * partial (each shard's sketch is ≤ K rows per group — the only thing
    * that ever crosses the wire) and the merge is the reduce; no global
    * distinct over raw ids is ever needed. The same fold works
    * incrementally: yesterday's sketch ∪ today's shard = today's sketch.
    *
    * A same-`h` hash can reach two shards only via a cross-user md5
    * collision, so the merge re-distincts on (group, h) exactly like the
    * union semantics require; both engines fold collisions identically. */
  def kmvMergeShards(spark: SparkSession, dir: String): DataFrame = {
    val e = Events.events(spark, dir)
      .select(col("event_type"),
        pmod(col("user_id"), lit(MergeShards)).as("shard"),
        expr(md5U24Expr("user_id")).cast("long").as("h"))
    val perShard = e.select("event_type", "shard", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type", "shard").orderBy("h")))
      .filter(col("rn") <= K)
    val nShards = perShard.groupBy("event_type")
      .agg(countDistinct(col("shard")).as("n_shards"))
    val merged = perShard.select("event_type", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= K)
      .groupBy("event_type")
      .agg(count(lit(1)).as("merged_n_kept"),
        max(col("h")).as("merged_kth_min"))
      .withColumn("merged_est",
        when(col("merged_n_kept") < K, col("merged_n_kept").cast("double"))
          .otherwise(
            (lit(K - 1) * lit(HashSpace.toDouble)) / col("merged_kth_min")))
    val global = e.select("event_type", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= K)
      .groupBy("event_type")
      .agg(max(col("h")).as("global_kth_min"))
    merged.join(global, Seq("event_type")).join(nShards, Seq("event_type"))
      .withColumn("sketch_agrees",
        (col("merged_kth_min") === col("global_kth_min")).cast("int"))
      .select("event_type", "n_shards", "merged_n_kept", "merged_kth_min",
        "merged_est", "global_kth_min", "sketch_agrees")
  }

  def kmvMergeShardsOracle: String =
    s"""WITH e AS (
      SELECT event_type, user_id % $MergeShards AS shard,
        ${md5U24SqlDuck("user_id")} AS h
      FROM events),
    per_shard AS (
      SELECT event_type, shard, h FROM (
        SELECT event_type, shard, h,
          row_number() OVER (PARTITION BY event_type, shard ORDER BY h)
            AS rn
        FROM (SELECT DISTINCT event_type, shard, h FROM e))
      WHERE rn <= $K),
    n_sh AS (
      SELECT event_type, count(DISTINCT shard) AS n_shards
      FROM per_shard GROUP BY 1),
    merged AS (
      SELECT event_type, count(*) AS merged_n_kept,
        max(h) AS merged_kth_min
      FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM (SELECT DISTINCT event_type, h FROM per_shard))
      WHERE rn <= $K GROUP BY 1),
    m_est AS (
      SELECT event_type, merged_n_kept, merged_kth_min,
        CASE WHEN merged_n_kept < $K THEN CAST(merged_n_kept AS DOUBLE)
          ELSE (${K - 1} * ${HashSpace.toDouble}) / merged_kth_min END
          AS merged_est
      FROM merged),
    gsk AS (
      SELECT event_type, max(h) AS global_kth_min
      FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM (SELECT DISTINCT event_type, h FROM e))
      WHERE rn <= $K GROUP BY 1)
    SELECT m.event_type, n_sh.n_shards, m.merged_n_kept, m.merged_kth_min,
      m.merged_est, gsk.global_kth_min,
      CAST(m.merged_kth_min = gsk.global_kth_min AS INTEGER)
        AS sketch_agrees
    FROM m_est m JOIN gsk USING (event_type)
    JOIN n_sh USING (event_type)"""

  /** Set-intersection estimation from KMV sketches — the join-size
    * estimator (Beyer et al., "On synopses for distinct-value estimation
    * under multiset operations"): for audiences A and B, the bottom-K of
    * A ∪ B is a uniform sample of the union, so the fraction of it
    * lying in BOTH per-set sketches estimates Jaccard, and
    * `|A ∩ B| ≈ J · |A ∪ B|` with the union size from the same merged
    * sketch. This is what a planner consults before choosing a join
    * strategy, and what audience-overlap analytics ships — here per pair
    * of event types over distinct users, estimate NEXT TO the exact
    * overlap as always.
    *
    * Scale shape: the per-type sketches are the [[kmvMergeShards]]
    * artifacts (≤ K rows per type — nothing corpus-sized is ever
    * re-read to answer a NEW pair); every pair computation is sketch ×
    * sketch. The exact branch (one distinct + one user-keyed self-join)
    * exists only for the audit row. Membership joins are equi-joins on
    * the pair key — no nested loop. */
  def kmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val e = Events.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr(md5U24Expr("user_id")).cast("long").as("h"))
    val sk = e.select("event_type", "h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= K)
      .select("event_type", "h")
    val types = sk.select("event_type").distinct()
    val tp = types.select(col("event_type").as("type_a"))
      .crossJoin(types.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
    val ca = tp.join(sk.withColumnRenamed("event_type", "type_a"),
        Seq("type_a"))
      .select(col("type_a"), col("type_b"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val cb = tp.join(sk.withColumnRenamed("event_type", "type_b"),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val uh = ca.union(cb)
      .groupBy("type_a", "type_b", "h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("type_a", "type_b").orderBy("h")))
      .filter(col("rn") <= K)
    val est = uh.groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"),
        sum(col("in_a") * col("in_b")).as("n_both"))
      .withColumn("union_est",
        when(col("n_kept") < K, col("n_kept").cast("double"))
          .otherwise(
            (lit(K - 1) * lit(HashSpace.toDouble)) / col("kth_min")))
      .withColumn("jaccard_est",
        col("n_both") * lit(1.0) / col("n_kept"))
      .withColumn("est_intersect",
        col("jaccard_est") * col("union_est"))
    val du = e.select("event_type", "user_id").distinct()
    val exact = du.select(col("event_type").as("type_a"),
        col("user_id"))
      .join(du.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("exact_intersect"))
    est.join(exact, Seq("type_a", "type_b"), "left")
      .withColumn("exact_intersect",
        coalesce(col("exact_intersect"), lit(0L)))
      .select("type_a", "type_b", "n_kept", "n_both", "jaccard_est",
        "union_est", "est_intersect", "exact_intersect")
  }

  def kmvIntersectOracle: String =
    s"""WITH e AS (
      SELECT event_type, user_id, ${md5U24SqlDuck("user_id")} AS h
      FROM events),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM (SELECT DISTINCT event_type, h FROM e))
      WHERE rn <= $K),
    tp AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM sk) a,
           (SELECT DISTINCT event_type FROM sk) b
      WHERE a.event_type < b.event_type),
    contrib AS (
      SELECT tp.type_a, tp.type_b, s.h, 1 AS in_a, 0 AS in_b
      FROM tp JOIN sk s ON s.event_type = tp.type_a
      UNION ALL
      SELECT tp.type_a, tp.type_b, s.h, 0, 1
      FROM tp JOIN sk s ON s.event_type = tp.type_b),
    uh AS (
      SELECT type_a, type_b, h, in_a, in_b FROM (
        SELECT type_a, type_b, h, max(in_a) AS in_a, max(in_b) AS in_b,
          row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
        FROM contrib GROUP BY 1, 2, 3)
      WHERE rn <= $K),
    est AS (
      SELECT type_a, type_b, count(*) AS n_kept, max(h) AS kth_min,
        CAST(sum(in_a * in_b) AS BIGINT) AS n_both
      FROM uh GROUP BY 1, 2),
    est2 AS (
      SELECT type_a, type_b, n_kept, n_both,
        n_both * 1.0 / n_kept AS jaccard_est,
        CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
          ELSE (${K - 1} * ${HashSpace.toDouble}) / kth_min END
          AS union_est
      FROM est),
    du AS (SELECT DISTINCT event_type, user_id FROM e),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        count(*) AS exact_intersect
      FROM du a JOIN du b ON a.user_id = b.user_id
        AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT e2.type_a, e2.type_b, e2.n_kept, e2.n_both, e2.jaccard_est,
      e2.union_est, e2.jaccard_est * e2.union_est AS est_intersect,
      coalesce(x.exact_intersect, 0) AS exact_intersect
    FROM est2 e2 LEFT JOIN exact x
      ON x.type_a = e2.type_a AND x.type_b = e2.type_b"""

  /** Count-min sketch geometry: [[CmsDepth]] hash rows × [[CmsWidth]]
    * counter buckets = 1024 cells TOTAL, whatever the corpus size — that
    * bound is the whole point. Row r's 8-bit bucket is nibbles
    * [2r, 2r+2) of ONE md5 of the token — the production CMS layout
    * (one hash evaluation per update, the d row indices sliced from its
    * bit ranges); the first cut hashed `"r~token"` separately per row,
    * i.e. [[CmsDepth]] md5s per token occurrence, and the 100× probe
    * priced that at 154 s — the single-digest slicing is ~d× cheaper on
    * the only corpus-sized pass the sketch has. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Spark-SQL expression for row r's bucket from a hex-digest column. */
  private[graft] def cmsBucketExpr(hCol: String, r: Int): String = {
    def nib(i: Int) =
      s"(instr('0123456789abcdef', substring($hCol, $i, 1)) - 1)"
    s"(${nib(2 * r + 1)} * 16 + ${nib(2 * r + 2)})"
  }

  private def cmsBucketSqlDuck(hCol: String, r: Int): String = {
    def nib(i: Int) =
      s"(strpos('0123456789abcdef', substr($hCol, $i, 1)) - 1)"
    s"(${nib(2 * r + 1)} * 16 + ${nib(2 * r + 2)})"
  }

  /** Heavy hitters reported by the accuracy row. */
  val CmsTopK = 20

  /** Token heavy-hitters through a count-min sketch (Cormode &
    * Muthukrishnan, "An improved data stream summary: the count-min
    * sketch"): every token increments one counter per hash row; a term's
    * estimate is the MIN over its [[CmsDepth]] counters, which
    * overestimates (collisions only ever add) and never underestimates —
    * `over_ratio >= 1` by construction, pinned in the spec. Like
    * [[kmvDistinct]], the row reports the estimate NEXT TO the exact
    * count so the realized accuracy is itself oracle-checked; a
    * production pipeline keeps only the counter table.
    *
    * Scale shape: the corpus-sized work is one map-side-combined
    * aggregation into [[CmsDepth]]×[[CmsWidth]] counter cells — the
    * sketch state is O(1) in corpus size, and two shard counter tables
    * MERGE by cell-wise addition (spec-pinned), which is what replaces a
    * full vocabulary shuffle at 100 TB. Estimation joins the top terms
    * against the counter table as a broadcast (1024 rows). */
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("h", md5(col("token")))
    def rowBuckets = array((0 until CmsDepth).map { r =>
      struct(lit(r).as("r"), expr(cmsBucketExpr("h", r)).as("bucket"))
    }: _*)
    val counters = toks.select(explode(rowBuckets).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("exact_count"))
    val top = exact
      .orderBy(col("exact_count").desc, col("token")).limit(CmsTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("exact_count").desc, col("token"))))
    top
      .withColumn("h", md5(col("token")))
      .select(col("rank"), col("token"), col("exact_count"),
        explode(rowBuckets).as("rb"))
      .select(col("rank"), col("token"), col("exact_count"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy("rank", "token", "exact_count")
      .agg(min(col("cnt")).as("cms_estimate"))
      .withColumn("over_ratio",
        col("cms_estimate") * lit(1.0) / col("exact_count"))
      .select("rank", "token", "exact_count", "cms_estimate", "over_ratio")
  }

  def cmsHeavyHittersOracle: String = {
    def bList = (0 until CmsDepth)
      .map(r => cmsBucketSqlDuck("h", r)).mkString("[", ", ", "]")
    val rList = (0 until CmsDepth).mkString("[", ", ", "]")
    s"""WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    t AS (SELECT token, md5(token) AS h FROM toks
      WHERE length(token) > 0),
    hashed AS (
      SELECT unnest($rList) AS r, unnest($bList) AS bucket FROM t),
    counters AS (
      SELECT r, bucket, count(*) AS cnt FROM hashed GROUP BY 1, 2),
    exact AS (
      SELECT token, count(*) AS exact_count FROM t GROUP BY 1),
    top AS (
      SELECT token, exact_count, rank, md5(token) AS h FROM (
        SELECT token, exact_count, row_number() OVER (
          ORDER BY exact_count DESC, token) AS rank
        FROM exact) WHERE rank <= $CmsTopK),
    th AS (
      SELECT rank, token, exact_count, unnest($rList) AS r,
        unnest($bList) AS bucket
      FROM top)
    SELECT CAST(rank AS INTEGER) AS rank, token, exact_count,
      min(cnt) AS cms_estimate,
      min(cnt) * 1.0 / exact_count AS over_ratio
    FROM th JOIN counters USING (r, bucket)
    GROUP BY rank, token, exact_count"""
  }

  /** Histogram-quantile geometry: [[HistBuckets]] equi-width counter
    * buckets over the observed [min, max] cent range. */
  val HistBuckets = 256

  /** Approximate quantiles from a bounded equi-width histogram — the
    * mergeable-counter companion to [[cmsHeavyHitters]] for the ORDER
    * domain: every value increments one of [[HistBuckets]] counters
    * (map-side combined; the sketch state is O(1) in corpus size and two
    * shard histograms merge by cell-wise addition), and quantile p is
    * answered from the cumulative counts as the containing bucket's
    * UPPER cent bound — an overestimate by at most one bucket width,
    * never an underestimate, pinned in the spec. Estimates are reported
    * NEXT TO the exact nearest-rank percentile so the realized error is
    * itself oracle-checked; the exact branch (a global-order
    * rank — [[Analytics.orderPercentiles]]'s shape) exists only for
    * that audit, exactly like the CMS row's vocabulary aggregate.
    *
    * Bounds come from one min/max aggregate broadcast back (production
    * would fix the domain a priori or take bounds from footer stats);
    * all bucket arithmetic is integer, both engines. */
  def histQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val cents = Events.events(spark, dir)
      .select(round(col("value") * 100).cast("long").as("c"))
    val bounds = cents.agg(min(col("c")).as("minc"), max(col("c")).as("maxc"))
    val b = cents.crossJoin(broadcast(bounds))
      .withColumn("span", col("maxc") - col("minc") + 1)
      .withColumn("bucket",
        expr(s"((c - minc) * $HistBuckets) div span"))
      .groupBy("bucket", "minc", "span")
      .agg(count(lit(1)).as("cnt"))
    val wcum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.withColumn("cum", sum(col("cnt")).over(wcum))
      .withColumn("n", sum(col("cnt")).over(
        Window.partitionBy(lit(1))))
      .withColumn("upper",
        expr(s"minc + ((bucket + 1) * span + ${HistBuckets - 1}) div $HistBuckets - 1"))
    val est = cum.agg(
      max(col("n")).as("n"),
      min(when(col("cum") >= expr("(n * 50 + 99) div 100"), col("upper"))).as("e50"),
      min(when(col("cum") >= expr("(n * 90 + 99) div 100"), col("upper"))).as("e90"),
      min(when(col("cum") >= expr("(n * 99 + 99) div 100"), col("upper"))).as("e99"))
    // the exact side's global rank is RangeRank's distributed sort (an
    // unpartitioned row_number window is one task for every event at
    // scale); ties on c get arbitrary rank order either way, but the
    // VALUE extracted at rank k is deterministic — all ties carry the
    // same c, which is the column being read
    val exact = RangeRank.rank(cents, Seq.empty, Seq(col("c")), "rn")
      .crossJoin(broadcast(est))
      .agg(
        max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("c"))).as("x50"),
        max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("c"))).as("x90"),
        max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("c"))).as("x99"),
        max(col("n")).as("n"),
        max(col("e50")).as("e50"), max(col("e90")).as("e90"),
        max(col("e99")).as("e99"))
    exact.select(explode(array(
      struct(lit(50).as("p"), col("n"), col("e50").as("est_cents"),
        col("x50").as("exact_cents")),
      struct(lit(90).as("p"), col("n"), col("e90").as("est_cents"),
        col("x90").as("exact_cents")),
      struct(lit(99).as("p"), col("n"), col("e99").as("est_cents"),
        col("x99").as("exact_cents")))).as("r"))
      .select(col("r.p").as("p"), col("r.n").as("n"),
        col("r.est_cents").as("est_cents"),
        col("r.exact_cents").as("exact_cents"))
      .withColumn("err_cents", col("est_cents") - col("exact_cents"))
  }

  def histQuantilesOracle: String =
    s"""WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
    bounds AS (SELECT min(c) AS minc, max(c) AS maxc FROM c),
    b AS (
      SELECT ((c - minc) * $HistBuckets) // (maxc - minc + 1) AS bucket,
        minc, maxc - minc + 1 AS span
      FROM c CROSS JOIN bounds),
    h AS (
      SELECT bucket, minc, span, count(*) AS cnt
      FROM b GROUP BY 1, 2, 3),
    cum AS (
      SELECT bucket, minc, span, cnt,
        sum(cnt) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER () AS n,
        minc + ((bucket + 1) * span + ${HistBuckets - 1}) // $HistBuckets - 1
          AS upper
      FROM h),
    est AS (
      SELECT max(n) AS n,
        min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN upper END) AS e50,
        min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN upper END) AS e90,
        min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN upper END) AS e99
      FROM cum),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c) AS rn FROM c),
    exact AS (
      SELECT max(CASE WHEN rn = (n * 50 + 99) // 100 THEN c END) AS x50,
        max(CASE WHEN rn = (n * 90 + 99) // 100 THEN c END) AS x90,
        max(CASE WHEN rn = (n * 99 + 99) // 100 THEN c END) AS x99,
        max(n) AS n, max(e50) AS e50, max(e90) AS e90, max(e99) AS e99
      FROM ranked CROSS JOIN est)
    SELECT p, n, est_cents, exact_cents, est_cents - exact_cents AS err_cents
    FROM (
      SELECT 50 AS p, n, e50 AS est_cents, x50 AS exact_cents FROM exact
      UNION ALL
      SELECT 90, n, e90, x90 FROM exact
      UNION ALL
      SELECT 99, n, e99, x99 FROM exact)"""

  def kmvDistinctOracle: String =
    s"""WITH e AS (
      SELECT event_type, user_id, ${md5U24SqlDuck("user_id")} AS h
      FROM events),
    hashes AS (SELECT DISTINCT event_type, h FROM e),
    ranked AS (
      SELECT event_type, h,
        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hashes),
    sketch AS (
      SELECT event_type, count(*) AS n_kept, max(h) AS kth_min
      FROM ranked WHERE rn <= $K GROUP BY 1),
    est AS (
      SELECT event_type, n_kept, kth_min,
        CASE WHEN n_kept < $K THEN CAST(n_kept AS DOUBLE)
             ELSE (${K - 1} * ${HashSpace.toDouble}) / kth_min END
          AS est_distinct
      FROM sketch),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM e GROUP BY 1)
    SELECT est.event_type, est.n_kept, est.kth_min, est.est_distinct,
      exact.exact_distinct,
      est.est_distinct / exact.exact_distinct AS est_ratio
    FROM est JOIN exact USING (event_type)"""
}
