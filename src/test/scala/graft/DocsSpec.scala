package graft

import java.nio.file.Files
import graft.pipeline.{Docs, Registry}

/** `dbt docs generate` artifacts: manifest node graph, planning-only
  * catalog, lineage DOT — all derived from the Registry DAG + loaded
  * schema YAML, no job execution. */
class DocsSpec extends SparkSpec {

  test("manifest carries every node with deps, materialization and YAML tests") {
    val json = Docs.manifestJson()
    Registry.models.foreach(m => assert(json.contains(s""""${m.name}": {"""), m.name))
    // dependency edges land verbatim
    assert(json.contains(""""depends_on": ["bronze_orders", "silver_customers"]"""))
    // materialization strings
    assert(json.contains(""""materialized": "view""""))
    assert(json.contains(""""materialized": "table""""))
    // layer behaves as a tag (dbt_project.yml +tags)
    assert(json.contains(""""tags": ["silver"]"""))
    // YAML-declared tests attach to their model node
    assert(json.contains("silver_orders.order_key.unique"))
    assert(json.contains("silver_customers.email.not_null"))
    // relationships attach to the CHILD
    val so = json.split(""""silver_orders": \{""")(1).split("}")(0)
    assert(so.contains("relationships"))
  }

  test("catalog reads column types off the analyzed plan — no execution") {
    val json = Docs.catalogJson(spark, Sf0001)
    assert(json.contains(""""cumulative_revenue": "double""""))
    assert(json.contains(""""order_date": "date""""))
    assert(json.contains(""""customer_key": "string""""))
    // every declared contract matches what the catalog reports
    Registry.declaredSchemas.foreach { case (model, declared) =>
      val node = json.split(s""""$model": \\{""")(1).split("\\}\\s*\\}")(0)
      declared.foreach { case (c, t) =>
        assert(node.contains(s""""$c": "$t""""), s"$model.$c")
      }
    }
  }

  test("write lands manifest.json + catalog.json + lineage.dot") {
    val out = Files.createTempDirectory("graft_docs").toString
    Docs.write(spark, Sf0001, out)
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "manifest.json")), "UTF-8").contains("\"nodes\""))
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "catalog.json")), "UTF-8").contains("gold_order_metrics"))
    val dot = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "lineage.dot")), "UTF-8")
    assert(dot == Registry.lineageDot())
    assert(dot.contains("\"silver_orders\" -> \"gold_order_metrics\""))
  }

  test("materialized extension models catalog from their parquet footers") {
    import graft.pipeline.{CorpusPipeline, ParquetSink}
    val wh = Files.createTempDirectory("graft_docs_wh").toString
    val sink = new ParquetSink(wh)
    // materialize ONE extension model only: the other (corpus_chunks)
    // stays unbuilt, proving absent relations are skipped, not executed
    Registry.run(spark, Sf0001, sink,
      all = Registry.models ++ CorpusPipeline.models,
      select = Some("corpus_clean"), registerViews = false)
    val all = Registry.models ++ CorpusPipeline.models
    val json = Docs.catalogJson(spark, Sf0001,
      all = Registry.models, fromSink = all, sink = Some(sink))
    // the materialized extension relation is cataloged, column types from
    // the written footers (corpus_clean's declared contract)
    val node = json.split("\"corpus_clean\": \\{")(1).split("\\}\\s*\\}")(0)
    CorpusPipeline.models.find(_.name == "corpus_clean").get
      .declaredSchema.get.foreach { case (c, t) =>
        assert(node.contains(s""""$c": "$t""""), s"corpus_clean.$c") }
    // unmaterialized extension models are absent — never built, never read
    assert(!json.contains("\"corpus_pack\""))
    // the core plan-only catalog is untouched by the sink path
    assert(json.contains("\"gold_order_metrics\""))
  }
}
