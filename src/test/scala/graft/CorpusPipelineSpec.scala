package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline

/** The corpus-release DAG through the Registry machinery: materialization,
  * language partitioning, selector composition, and consistency between
  * the stages. */
class CorpusPipelineSpec extends SparkSpec {

  test("corpus release materializes clean/chunks/pack consistently") {
    val wh = Files.createTempDirectory("graft_corpus_wh").toString
    val out = CorpusPipeline.run(spark, Sf0001, wh)
    assert(out.keySet == Set("corpus_clean", "corpus_chunks", "corpus_pack"))
    // clean table partitioned by predicted_lang on disk (prunable reads)
    val cleanDir = new java.io.File(s"$wh/corpus/corpus_clean")
    assert(cleanDir.exists())
    assert(cleanDir.listFiles().exists(_.getName.startsWith("predicted_lang=")))
    // stage consistency: every chunk belongs to a surviving doc, and the
    // pack manifest conserves the clean table's token mass per stratum
    val clean = out("corpus_clean")
    val nClean = clean.count()
    assert(nClean > 0 && nClean ==
      graft.ops.Corpus.corpusClean(spark, Sf0001).count())
    assert(out("corpus_chunks")
      .join(clean.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty)
    val tokByLang = clean.groupBy("predicted_lang")
      .agg(sum("token_est").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val packByLang = out("corpus_pack").groupBy("predicted_lang")
      .agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packByLang == tokByLang, "packing must move every token exactly once")
  }

  test("graph selectors drive the corpus DAG like dbt run --select") {
    val wh = Files.createTempDirectory("graft_corpus_sel").toString
    // +corpus_pack builds its ancestor closure (clean) but not chunks
    val out = CorpusPipeline.run(spark, Sf0001, wh, select = Some("+corpus_pack"))
    assert(new java.io.File(s"$wh/corpus/corpus_pack").exists())
    assert(new java.io.File(s"$wh/corpus/corpus_clean").exists())
    assert(!new java.io.File(s"$wh/corpus/corpus_chunks").exists())
    assert(out("corpus_pack").count() > 0)
  }
}
