package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Corpus, TextOps}
import graft.pipeline.Registry.{Model, Table}

/** The training-corpus release pipeline as a Registry DAG — the same
  * machinery that materializes the medallion models (table sinks,
  * layouts, node selection, wave parallelism, `--full-refresh`) driving
  * the corpus operators, so a data team runs corpus releases exactly
  * like `dbt run`:
  *
  * ```
  * corpus_clean ──┬──> corpus_chunks
  *                └──> corpus_pack
  * ```
  *
  *  - `corpus_clean`: the audited cleaning composition
  *    ([[graft.ops.Corpus.corpusClean]]) materialized PARTITIONED BY
  *    predicted_lang — per-language reads (the most common corpus filter)
  *    prune whole directories.
  *  - `corpus_chunks`: overlapping chunks of the surviving documents
  *    ([[graft.ops.TextOps.chunkDocs]] joined to the clean keepers).
  *  - `corpus_pack`: the packing manifest ([[packFrom]]) per
  *    predicted-language stratum, fed by the clean table's token counts —
  *    no re-read of the raw corpus.
  *
  * Run with `Registry.run(spark, dir, sink, all = CorpusPipeline.models)`;
  * selectors compose (`+corpus_pack` builds clean then pack, layer acts
  * as the `corpus` tag).
  */
object CorpusPipeline {

  /** [[graft.ops.TextOps.pack]] over an arbitrary (stratum, doc_id,
    * token count) frame — the DAG variant packs the CLEAN corpus using
    * token estimates already materialized in `corpus_clean`. The running
    * total is [[graft.ops.RangeRank.cumSum]] (range-staged, broadcast
    * offsets), not a per-stratum window — one stratum is NOT one task. */
  def packFrom(docs: DataFrame, stratumCol: String, tokCol: String,
      seqLen: Int = TextOps.PackSeqLen): DataFrame = {
    graft.ops.RangeRank.cumSum(docs, Seq(stratumCol),
        Seq(col("doc_id")), tokCol, "cum")
      .withColumn("seq_id", expr(s"(cum - $tokCol) div $seqLen"))
      .groupBy(stratumCol, "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("n_tokens"))
      .select(col(stratumCol), col("seq_id"), col("n_docs"),
        col("n_tokens").cast("bigint").as("n_tokens"))
  }

  val models: Seq[Model] = Seq(
    Model("corpus_clean", "corpus", Table, Seq.empty,
      (s, dir, _) => Corpus.corpusClean(s, dir),
      TableLayout(partitionBy = Seq("predicted_lang")),
      declaredSchema = Some(Seq(
        "doc_id" -> "bigint", "labeled_lang" -> "string",
        "predicted_lang" -> "string", "dup_count" -> "bigint",
        "token_est" -> "bigint", "quality_score" -> "double"))),
    Model("corpus_chunks", "corpus", Table, Seq("corpus_clean"),
      (s, dir, up) => TextOps.chunkDocs(
        TextOps.documents(s, dir)
          .join(up("corpus_clean").select("doc_id"), Seq("doc_id"))),
      declaredSchema = Some(Seq(
        "doc_id" -> "bigint", "chunk_idx" -> "bigint",
        "chunk_len" -> "bigint", "chunk_md5" -> "string"))),
    Model("corpus_pack", "corpus", Table, Seq("corpus_clean"),
      (_, _, up) => packFrom(
        up("corpus_clean").select("predicted_lang", "doc_id", "token_est"),
        "predicted_lang", "token_est"),
      declaredSchema = Some(Seq(
        "predicted_lang" -> "string", "seq_id" -> "bigint",
        "n_docs" -> "bigint", "n_tokens" -> "bigint"))))

  /** Convenience: materialize the corpus release into `warehouseDir`. */
  def run(spark: SparkSession, sourceDir: String, warehouseDir: String,
      select: Option[String] = None): Map[String, DataFrame] =
    Registry.run(spark, sourceDir, new ParquetSink(warehouseDir),
      all = models, select = select)
}
