package graft.quality

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt singular (data) tests — `tests/<name>.sql` files, each an
  * arbitrary SELECT of VIOLATING rows; the test passes when the result
  * is empty (`/root/reference/tests/` declares two by name; both files
  * are empty — 0 bytes, intent only, SURVEY §2.12 — so the checked-in
  * `tests/` SQL here are the engine's reconstructions of that intent,
  * now in the loadable form a user's own singular tests arrive in).
  *
  * `{{ ref('m') }}` resolves against the lazily-chained model registry
  * (no materialization: a view chain is free until the test's own
  * action pulls on it) and `{{ source('s', 't') }}` against the
  * adapter — the same resolution [[graft.pipeline.SqlModels]] gives
  * model files. [[counts]] returns one `(check_name, violations)` row
  * per test, the `dbt test` report shape; SingularTestsSpec pins the
  * loaded counts equal to the hand-folded singular branches inside
  * [[DataQuality.summary]]. */
object SingularTests {

  private val RefRe = raw"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}".r
  private val SourceRe =
    raw"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}".r

  /** (test name, raw SQL) per non-empty `tests/` SQL file. Empty files
    * (the reference's own state) load as intent-only and are skipped,
    * with dbt's behavior for an empty model file: nothing to run. */
  def load(root: File): Seq[(String, String)] =
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".sql"))
      .sortBy(_.getName)
      .map(f => f.getName.stripSuffix(".sql") ->
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      .filter(_._2.trim.nonEmpty)
      .toSeq

  /** Violating rows of one test over the lazily-built model chain.
    * `provided` overrides chain nodes with caller-supplied frames — the
    * [[DataQuality.summary]] fusion hands its PINNED silver/gold tables
    * here so a custom/singular test branch scans the one materialized
    * evaluation instead of re-deriving the whole upstream chain (and
    * downstream chain nodes build FROM the provided upstreams too). */
  def violations(spark: SparkSession, dir: String, name: String,
      rawSql: String,
      provided: Map[String, DataFrame] = Map.empty): DataFrame = {
    val acc = scala.collection.mutable.Map.empty[String, DataFrame]
    graft.pipeline.Registry.topoOrder.foreach(m =>
      acc(m.name) = provided.getOrElse(m.name, m.build(spark, dir, acc.toMap)))
    RefRe.findAllMatchIn(rawSql).map(_.group(1)).toSeq.distinct.foreach { r =>
      require(acc.contains(r), s"$name: unknown ref('$r')")
      acc(r).createOrReplaceTempView(r)
    }
    SourceRe.findAllMatchIn(rawSql).map(m => (m.group(1), m.group(2)))
      .toSeq.distinct.foreach { case (sch, t) =>
        graft.pipeline.SqlModels.sources(sch -> t)(spark, dir)
          .createOrReplaceTempView(graft.pipeline.SqlModels.sourceViewName(sch, t))
      }
    var sql = RefRe.replaceAllIn(rawSql, m => m.group(1))
    sql = SourceRe.replaceAllIn(sql,
      m => graft.pipeline.SqlModels.sourceViewName(m.group(1), m.group(2)))
    spark.sql(sql)
  }

  /** Resolve ref/source call sites to BARE relation names — the form the
    * DuckDB oracle prelude declares its CTEs under (`silver_payments`,
    * `raw_customers`). Used for the oracle twin of any rendered test
    * SQL; the Spark side goes through [[violations]] instead. */
  def resolveBareNames(sql: String): String = {
    val s = RefRe.replaceAllIn(sql, m => m.group(1))
    SourceRe.replaceAllIn(s, m => m.group(2))
  }

  /** The `dbt test` report: one `(check_name, violations)` row per
    * loaded test. */
  def counts(spark: SparkSession, dir: String, root: File): DataFrame =
    load(root).map { case (name, rawSql) =>
      violations(spark, dir, name, rawSql)
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"tests.$name").as("check_name"), col("violations"))
    }.reduce(_ unionByName _)
}
