package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.pipeline.Registry.{Incremental, Model, Snapshot, Table, View}

/** `dbt docs generate`-style artifacts: a `manifest.json` of the node
  * graph (per model: layer, materialization, dependencies, tags, tests)
  * and a `catalog.json` of each relation's column types — the engine's
  * mirror of dbt's two docs artifacts, which downstream tooling (lineage
  * browsers, CI impact analysis, column-level diff) consumes.
  *
  * The reference project declares no docs config (dbt ships the command
  * with zero project setup), so the artifact content is derived entirely
  * from what the engine already holds: the [[Registry.Model]] DAG, the
  * loaded schema YAML ([[graft.quality.DataQuality.inventory]]) and the
  * analyzed plan's output schema. Nothing executes: the catalog reads
  * each model's schema off the ANALYZED plan (planning only — dbt's
  * catalog instead queries `information_schema`, which the path-routed
  * parquet sink does not have), so `docs` is safe to generate before any
  * table is materialized.
  *
  * Everything is hand-rolled JSON like [[Registry.writeManifest]] — the
  * offline sandbox has no JSON library on the compile classpath, and the
  * artifact shape is flat enough that a serializer would be ceremony.
  */
object Docs {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }

  private def arr(xs: Seq[String]): String =
    xs.map(x => s""""${esc(x)}"""").mkString("[", ", ", "]")

  private def matName(m: Model): String = m.materialization match {
    case View => "view"
    case Table => "table"
    case _: Incremental => "incremental"
    case _: Snapshot => "snapshot"
  }

  /** Check names declared against `table` in the loaded schema YAML:
    * the per-column generics, the relationships it is the CHILD of, and
    * its custom (macro-defined) tests — dbt's manifest attaches test
    * nodes to the model they select from. */
  private[pipeline] def testsOf(table: String): Seq[String] = {
    import graft.quality.DataQuality._
    val generic = inventory.filter(_.table == table).flatMap { tc =>
      tc.uniques.map(c => s"$table.$c.unique") ++
        tc.notNulls.map(c => s"$table.$c.not_null") ++
        tc.accepted.keys.toSeq.sorted.map(c => s"$table.$c.accepted_values")
    }
    val rels = relationshipChecks.collect {
      case (name, child, _, _, _) if child == table => name }
    val custom = graft.quality.DataQuality.customTestSql.map(_._1)
      .filter(_.startsWith(s"$table."))
    generic ++ rels ++ custom
  }

  /** The node graph as JSON: one entry per model with layer, path,
    * materialization, physical relation name, tags, `depends_on` edges
    * and the YAML-declared tests that select from it. Topologically
    * ordered (parents before children), like dbt's manifest node map. */
  def manifestJson(all: Seq[Model] = Registry.models): String = {
    val nodes = Registry.topoOrderOf(all).map { m =>
      s"""    "${esc(m.name)}": {
         |      "layer": "${esc(m.layer)}",
         |      "path": "${esc(m.path)}",
         |      "materialized": "${matName(m)}",
         |      "relation": "${esc(m.layer)}.${esc(m.tableName)}",
         |      "tags": ${arr(m.effectiveTags)},
         |      "depends_on": ${arr(m.deps)},
         |      "tests": ${arr(testsOf(m.name))}
         |    }""".stripMargin
    }
    s"""{
       |  "nodes": {
       |${nodes.mkString(",\n")}
       |  }
       |}
       |""".stripMargin
  }

  /** Column name→type per model, read off the ANALYZED plan of the
    * build chained over `sourceDir` — dbt's catalog.json, without
    * needing the warehouse to exist yet. Planning-only FOR PLAN-ONLY
    * BUILDS, which all nine core models are; an extension model whose
    * build executes jobs at DataFrame-construction time (the ANN index
    * builders train k-means; a staged cumSum pins its range stage)
    * would pay that work here too — callers wanting cheap docs pass
    * only plan-only models (Run's `--docs` catalogs the core DAG and
    * manifests everything). Declared-contract models are additionally
    * cross-checked by [[Registry.assertDeclaredSchema]] at materialize
    * time, so the catalog and the contract cannot drift apart
    * silently. */
  def catalogJson(spark: SparkSession, sourceDir: String,
      all: Seq[Model] = Registry.models,
      fromSink: Seq[Model] = Seq.empty,
      sink: Option[TableSink] = None): String = {
    val acc = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.DataFrame]
    val ordered = Registry.topoOrderOf(all)
    ordered.foreach(m => acc(m.name) = m.build(spark, sourceDir, acc.toMap))
    val planSchemas = ordered.map(m => m -> acc(m.name).schema)
    // POST-MATERIALIZATION entries: a model whose build is not plan-only
    // (index builders train k-means at DataFrame-construction time) is
    // never built here — but once a run has materialized it, its schema
    // sits in the written parquet footers, and the sink's read is a
    // metadata-only schema resolution. Relations the sink does not hold
    // are skipped (docs still never pay a job); plan-built entries win on
    // a name collision.
    val planNames = ordered.map(_.name).toSet
    val sinkSchemas = sink.toSeq.flatMap { sk =>
      fromSink.filterNot(m => planNames.contains(m.name))
        .filter(m => sk.exists(spark, m.layer, m.tableName))
        .map(m => m -> sk.read(spark, m.layer, m.tableName).schema)
    }
    val nodes = (planSchemas ++ sinkSchemas).map { case (m, schema) =>
      val cols = schema.map(f =>
        s"""        "${esc(f.name)}": "${esc(f.dataType.simpleString)}"""")
      s"""    "${esc(m.name)}": {
         |      "columns": {
         |${cols.mkString(",\n")}
         |      }
         |    }""".stripMargin
    }
    s"""{
       |  "nodes": {
       |${nodes.mkString(",\n")}
       |  }
       |}
       |""".stripMargin
  }

  /** Write the full docs bundle — `manifest.json`, `catalog.json`,
    * `lineage.dot` ([[Registry.lineageDot]], renderable with
    * `dot -Tsvg`) — under `outDir` (dbt: `target/`). `catalogModels`
    * defaults to the manifest set; pass a plan-only subset when `all`
    * carries extension models whose builds execute jobs (see
    * [[catalogJson]]). With a `sink`, models in `all` outside the
    * plan-only set are additionally cataloged from their MATERIALIZED
    * relation's parquet footers — so a `--docs` after a
    * `--corpus`/`--ann-index` run covers the extension relations too,
    * still without executing anything. */
  def write(spark: SparkSession, sourceDir: String, outDir: String,
      all: Seq[Model] = Registry.models,
      catalogModels: Option[Seq[Model]] = None,
      sink: Option[TableSink] = None): Unit = {
    val p = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(p)
    def put(name: String, content: String): Unit =
      java.nio.file.Files.write(p.resolve(name), content.getBytes("UTF-8"))
    put("manifest.json", manifestJson(all))
    put("catalog.json", catalogJson(spark, sourceDir,
      catalogModels.getOrElse(all), fromSink = all, sink = sink))
    put("lineage.dot", Registry.lineageDot(all))
  }
}
