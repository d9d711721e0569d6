package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword search over `documents`: BM25-shaped relevance ranking for a
  * pinned set of term queries — the lexical half of a retrieval stack (the
  * vector half is [[Similarity]]'s ANN family).
  *
  * Scoring is BM25 (Robertson/Spärck Jones probabilistic relevance:
  * per-term `idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`) with ONE
  * documented variant: the idf keeps the Robertson–Spärck Jones odds ratio
  * `(N−df+0.5)/(df+0.5)` WITHOUT the log. Rationale: `ln` is a
  * transcendental whose last-ulp rounding differs between libm
  * implementations, so a logged score cannot be hash-compared across
  * engines; the rational form is a finite composition of IEEE-exact
  * +,−,×,÷ and reproduces bit-identically in DuckDB. (Per-term ranking is
  * unchanged — log is monotone; only the relative weighting of multi-term
  * sums shifts, and which variant of BM25 weighting to use is a free
  * parameter of the family.)
  *
  * Per-(query,doc) scores then sum over matched terms as 1e-6-quantized
  * BIGINTs — the same integer-grid discipline as the k-means oracle — so
  * float summation ORDER (nondeterministic in a distributed SUM) cannot
  * produce divergent totals either.
  *
  * Scale shape: tf is the word-count aggregate (one shuffle of (term,
  * doc) keys with map-side partial counts), the query table broadcasts,
  * df and avgdl are tiny broadcast aggregates, and the final top-k per
  * query is a rank-window over ≤|queries|·N scored rows that compiles to
  * WindowGroupLimit (per-group heap, no global sort). Nothing in the plan
  * grows faster than the corpus itself.
  */
object Search {

  val K1 = 1.2
  val B = 0.75
  val TopK = 10

  /** Pinned query set: (query_id, terms). Mixed common/rare terms from the
    * synthetic vocabulary; "dup" is the one genuinely selective term. */
  val QuerySet: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("vector", "stream"),
    3 -> Seq("dup", "merge"),
    4 -> Seq("customer", "order", "the"))

  private def queryTerms(spark: SparkSession): DataFrame = {
    import spark.implicits._
    QuerySet.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("query_id", "term")
  }

  /** Top-[[TopK]] documents per query by quantized BM25 score.
    * `score_q` = Σ_terms floor(term_score·1e6) — exact cross-engine. */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread: the token explode + map-side partial tf aggregation run in
    // the scan stage — a one-row-group file would serialize them
    val docs = TextOps.spread(TextOps.documents(spark, dir))
      .withColumn("words", split(col("text"), " "))
    val docLen = docs.select(col("doc_id"), size(col("words")).as("dl"))
    // one corpus-wide row: N and average doc length (exact: integer sum /
    // integer count, identical division in both engines)
    val corpus = docLen.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = docs.select(col("doc_id"), explode(col("words")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val matched = tf.join(broadcast(queryTerms(spark)), Seq("term"))
    val df_ = matched.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(broadcast(df_), Seq("term"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      // written in the exact operand order the oracle uses: every
      // intermediate double is the correctly-rounded result of the same
      // two operands, so the quantized BIGINT cannot differ
      .withColumn("idf",
        (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
      .withColumn("avgdl", col("sum_dl") * 1.0 / col("n_docs"))
      .withColumn("term_score",
        col("idf") * ((col("tf") * (K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * (col("dl") / col("avgdl"))))))
      .withColumn("term_score_q",
        floor(col("term_score") * 1e6).cast("bigint"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_q").desc, col("doc_id"))
    scored.groupBy("query_id", "doc_id")
      .agg(sum(col("term_score_q")).as("score_q"),
        count(lit(1)).as("n_terms_matched"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score_q").cast("bigint").as("score_q"),
        col("n_terms_matched").cast("bigint").as("n_terms_matched"))
  }

  private def querySql: String =
    QuerySet.flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")

  def bm25TopKOracle(k: Int = TopK): String =
    s"""WITH q(query_id, term) AS (VALUES $querySql),
    d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    doc_len AS (
      SELECT doc_id, len(words) AS dl FROM d),
    corpus AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM doc_len),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(words) AS term FROM d)
      GROUP BY 1, 2),
    matched AS (
      SELECT t.doc_id, t.term, t.tf, q.query_id
      FROM tf t JOIN q ON t.term = q.term),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM matched GROUP BY 1),
    scored AS (
      -- float literals in e-notation: DuckDB parses bare `2.2` as
      -- DECIMAL(2,1) whose exact arithmetic diverges from Spark's binary
      -- doubles; `2.2e0` is a DOUBLE with the identical rounded value
      SELECT m.query_id, m.doc_id,
        CAST(floor(
          ((c.n_docs - f.df + 0.5e0) / (f.df + 0.5e0))
          * ((m.tf * ${K1 + 1}e0) /
             (m.tf + ${K1}e0 * (${1 - B}e0 + ${B}e0 * (l.dl / (c.sum_dl * 1.0e0 / c.n_docs)))))
          * 1e6) AS BIGINT) AS term_score_q
      FROM matched m
      JOIN df f USING (term)
      JOIN doc_len l USING (doc_id)
      CROSS JOIN corpus c),
    agg AS (
      SELECT query_id, doc_id, sum(term_score_q) AS score_q,
        count(*) AS n_terms_matched
      FROM scored GROUP BY 1, 2),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY score_q DESC, doc_id) AS rank
      FROM agg)
    SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
      CAST(score_q AS BIGINT) AS score_q,
      CAST(n_terms_matched AS BIGINT) AS n_terms_matched
    FROM ranked WHERE rank <= $k"""
}
