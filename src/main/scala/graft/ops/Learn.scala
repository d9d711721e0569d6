package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine model training: the corpus-quality classifiers a
  * training-data pipeline fits ON the corpus it is curating (fastText-style
  * quality filters, Gopher/CCNet-style heuristic gates are all trained over
  * the same tables they then filter).
  *
  * The demonstrator is a logistic-style classifier fit by full-batch
  * gradient descent, DISTILLING the engine's heuristic quality gate
  * ([[TextOps.textStats]]'s composite `quality_score`, thresholded) into
  * a smooth trainable model — the fastText-quality-filter workflow,
  * where a rule-labeled corpus teaches a classifier that then
  * generalizes past the rule. (The corpus's `lang` column would be the
  * other natural label, but the synthetic text carries no cross-language
  * signal at all — a classifier on it can only learn the base rate, and
  * a demo that cannot outperform majority-class is a demo of nothing.)
  * Two deliberate determinism choices, both the repo-wide discipline:
  *   - the link is the ALGEBRAIC sigmoid `σ̂(z) = 1/2 + z / (2(1+|z|))`
  *     (Elliott, "A better activation function for artificial neural
  *     networks", 1993) — monotone, bounded to (0,1), σ̂(0)=1/2 like the
  *     logistic, but built from +,·,/,|·| only, which are IEEE
  *     correctly-rounded in BOTH engines; `exp` is not ulp-stable
  *     cross-engine (the same reason [[TextOps.mixture]] fixes T=2 to
  *     stay on `sqrt`);
  *   - fixed iteration count and learning rate, so the DuckDB oracle
  *     unrolls the identical descent as chained CTEs (the
  *     [[Similarity]] k-means oracle's pattern).
  *
  * Scale shape: each iteration is ONE map-side-combined aggregate over
  * the corpus producing d+1 gradient sums; the weight vector (d+1
  * doubles) lives on the driver between iterations — the documented
  * bounded-driver-state pattern of `deterministicKmeans` (MLlib's
  * LBFGS/OWLQN hold their coefficient vector the same way). Nothing
  * shuffles the corpus; iterations scan it [[LogRegIters]] times, so the
  * features are localCheckpoint'ed once and each pass reads the
  * materialized projection, not the raw table.
  */
object Learn {

  val LogRegIters = 32
  val LogRegLr = 2.0

  /** Gate threshold distilled by [[logregQuality]]: `quality_score >`
    * this labels a document "high quality". */
  val QualityGate = 0.55

  /** Feature projection: bounded, integer-derived doubles from the raw
    * text (the same arithmetic as [[TextOps.textStats]]) plus the
    * rule label y = quality gate. The model sees only x1/x2 — the
    * gate's third ingredient (the word-length band) stays hidden, so the
    * fit is a genuine distillation, not an identity. x0 is the bias. */
  private def featurized(spark: SparkSession, dir: String): DataFrame =
    TextOps.documents(spark, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("word_count", size(col("words")).cast("double"))
      .withColumn("stop_count",
        expr(s"size(filter(words, w -> w in ${TextOps.inList(TextOps.StopwordsEn)}))")
          .cast("double"))
      .withColumn("nonspace",
        length(regexp_replace(col("text"), " ", "")).cast("double"))
      .withColumn("x1", least(col("word_count") / 100.0, lit(1.0)))
      .withColumn("x2", col("stop_count") / col("word_count"))
      .withColumn("awl", col("nonspace") / col("word_count"))
      .withColumn("qs",
        col("x1") * 0.4 + least(col("x2") * 4.0, lit(1.0)) * 0.3 +
          when(col("awl") >= 3 && col("awl") <= 8, 0.3).otherwise(0.0))
      .withColumn("y", (col("qs") > QualityGate).cast("int").cast("double"))
      .select(col("doc_id"), col("x1"), col("x2"), col("y"))

  private def sigmoidHat(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Per-row gradient contributions are quantized to multiples of 2^-24
    * (floor — no tie semantics) before summing: every term is then
    * exactly representable, the partial sums stay integer-exact (terms
    * are bounded by 1, so even 10^8 rows keep the scaled sum < 2^51 ≪
    * 2^53), and the summation is ORDER- AND PARTITIONING-INVARIANT —
    * the same gradient bits on any core count, SF, or engine. Without
    * this, Spark's task-completion-order float sums (which change with
    * SPARK_GRAFT_CPUS and corpus partitioning) amplified across 32
    * chained iterations at lr=2.0 made the oracle compare
    * config-sensitive. The 2^-24 truncation perturbs each term by
    * ≤ 6e-8 — irrelevant to the descent, and the oracle replays the
    * identical quantization. */
  private val GradQuant = 16777216.0 // 2^24
  private def quant(c: Column): Column =
    floor(c * lit(GradQuant)) / lit(GradQuant)

  /** Fit and report: one wide row with the final weights, the corpus
    * size, and the training accuracy. Accuracy is INTEGER-exact despite
    * the float model: σ̂ is strictly monotone with σ̂(0)=1/2, so
    * `p > 1/2 ⇔ z > 0` — the decision boundary needs no sigmoid at
    * all. */
  def logregQuality(spark: SparkSession, dir: String,
      iters: Int = LogRegIters, lr: Double = LogRegLr): DataFrame = {
    val feats = graft.model.Stage.pin(featurized(spark, dir))
    var w = Array(0.0, 0.0, 0.0) // bias, x1, x2
    (1 to iters).foreach { _ =>
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      val err = sigmoidHat(z) - col("y")
      // one aggregate row per iteration: d+1 gradient sums + n; each
      // term quantized ([[quant]]) so the sums are partitioning-invariant
      val g = feats.agg(
        sum(quant(err)).as("g0"),
        sum(quant(err * col("x1"))).as("g1"),
        sum(quant(err * col("x2"))).as("g2"),
        count(lit(1)).cast("double").as("n")).head()
      val n = g.getDouble(3)
      w = Array(
        w(0) - lr * g.getDouble(0) / n,
        w(1) - lr * g.getDouble(1) / n,
        w(2) - lr * g.getDouble(2) / n)
    }
    val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
    feats.agg(
      count(lit(1)).as("n_docs"),
      sum(((z > 0).cast("int") === col("y").cast("int")).cast("long"))
        .as("n_correct"),
      first(lit(w(0))).as("w_bias"),
      first(lit(w(1))).as("w_len"),
      first(lit(w(2))).as("w_stop"))
      .select("n_docs", "n_correct", "w_bias", "w_len", "w_stop")
  }

  /** Oracle twin: the identical descent unrolled — iteration i's weights
    * are a 1-row CTE computed from iteration i−1's via the same
    * gradient sums over the same feature CTE. */
  def logregQualityOracle(iters: Int = LogRegIters,
      lr: Double = LogRegLr): String = {
    val stop = TextOps.StopwordsEn.map(s => s"'$s'").mkString("[", ", ", "]")
    def zExpr(w: String) =
      s"($w.w0 + $w.w1 * f.x1 + $w.w2 * f.x2)"
    def pExpr(w: String) = {
      val z = zExpr(w)
      s"(0.5 + $z / (2.0 * (1.0 + abs($z))))"
    }
    // ONE MATERIALIZED CTE per iteration: DuckDB inlines plain CTEs per
    // REFERENCE, and each round reads its predecessor's three weight
    // columns several times — across 32 chained rounds that expansion is
    // exponential (first seen as an fd-exhaustion error at 32 rounds,
    // still ~3×/round at 14+ after a single-back-reference rewrite).
    // AS MATERIALIZED pins each round to one evaluation: 0.28 s at 32
    // rounds, bit-identical weights to the Spark descent.
    // the same 2^-24 floor-quantization as the Spark side ([[quant]]):
    // each summed term is exactly representable, so DuckDB's sum order
    // (parallel or sequential) cannot change the gradient bits either
    def qq(term: String) = s"floor(($term) * 16777216.0) / 16777216.0"
    val rounds = (1 to iters).map { i =>
      val p = pExpr("p")
      s"""w$i AS MATERIALIZED (
      SELECT p.w0 - $lr * sum(${qq(s"$p - f.y")})
          / CAST(count(*) AS DOUBLE) AS w0,
        p.w1 - $lr * sum(${qq(s"($p - f.y) * f.x1")})
          / CAST(count(*) AS DOUBLE) AS w1,
        p.w2 - $lr * sum(${qq(s"($p - f.y) * f.x2")})
          / CAST(count(*) AS DOUBLE) AS w2
      FROM feats f CROSS JOIN w${i - 1} p
      GROUP BY p.w0, p.w1, p.w2)"""
    }.mkString(",\n    ")
    s"""WITH raw AS (
      SELECT doc_id,
        least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
          AS x1,
        CAST(len(list_filter(string_split(text, ' '),
          w -> list_contains($stop, w))) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS x2,
        CAST(length(replace(text, ' ', '')) AS DOUBLE)
          / CAST(len(string_split(text, ' ')) AS DOUBLE) AS awl
      FROM documents),
    feats AS MATERIALIZED (
      SELECT doc_id, x1, x2,
        CAST(CASE WHEN x1 * 0.4 + least(x2 * 4.0, 1.0) * 0.3 +
          (CASE WHEN awl >= 3 AND awl <= 8 THEN 0.3 ELSE 0.0 END)
          > $QualityGate THEN 1 ELSE 0 END AS DOUBLE) AS y
      FROM raw),
    w0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
      CAST(0 AS DOUBLE) AS w2),
    $rounds
    SELECT count(*) AS n_docs,
      sum(CASE WHEN (${zExpr(s"w$iters")} > 0) = (f.y = 1)
          THEN 1 ELSE 0 END) AS n_correct,
      any_value(w$iters.w0) AS w_bias,
      any_value(w$iters.w1) AS w_len,
      any_value(w$iters.w2) AS w_stop
    FROM feats f CROSS JOIN w$iters"""
  }
}
