package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage sink for table materializations — the pluggable boundary where
  * dbt's `materialized='table'` / `incremental` land on a storage format.
  *
  * The engine's north star is DataFrame ops over a lakehouse table format
  * (Delta/Iceberg); this build environment's offline classpath carries
  * neither connector jar, so the ACID path is expressed as the
  * [[CatalogSink]] with a pluggable `format` — on a cluster with the
  * Delta/Iceberg runtime present, `CatalogSink("delta")` /
  * `CatalogSink("iceberg")` get atomic overwrites and a real `MERGE INTO`
  * with no engine changes; the parquet default degrades to a staged
  * rewrite (documented, non-atomic).
  */
/** Physical layout for a materialized table — the two levers that matter
  * at 100 TB: `partitionBy` date-ish columns so downstream readers prune
  * whole directories, and `bucketBy` join keys so equi-joins between
  * co-bucketed tables run with NO shuffle exchange (the bucketing is the
  * shuffle, paid once at write). `sortBy` within buckets additionally
  * removes the sort from sort-merge joins. */
final case class TableLayout(
  partitionBy: Seq[String] = Seq.empty,
  bucketBy: Option[(Int, Seq[String])] = None,
  sortBy: Seq[String] = Seq.empty)

object TableLayout {
  val none: TableLayout = TableLayout()
}

trait TableSink {

  /** Overwrite `layer`.`name` with `df`; returns a reader over the stored
    * table (the materialization barrier downstream models build on). */
  def overwrite(spark: SparkSession, layer: String, name: String, df: DataFrame,
    layout: TableLayout = TableLayout.none): DataFrame

  /** Upsert `incoming` into `layer`.`name` by `key` (dbt incremental with
    * `unique_key`); returns a reader over the merged table. `layout` is
    * the model's declared physical layout, honored when the merge has to
    * rewrite (MERGE-capable formats keep the table's own layout).
    * `onSchemaChange` is dbt's drift policy, applied by EVERY sink before
    * rows land: Ignore projects incoming to the target's schema,
    * AppendNewColumns widens the target first, FailOnChange rejects. */
  def merge(spark: SparkSession, layer: String, name: String,
    incoming: DataFrame, key: String,
    layout: TableLayout = TableLayout.none,
    onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore,
    predicates: Seq[String] = Seq.empty): DataFrame

  /** Insert `fresh` rows into `layer`.`name` without touching existing
    * data (dbt incremental with no `unique_key`) — at scale this writes
    * only the new files, never a rewrite. `layout` must match the
    * table's declared layout so appended files land in the right
    * partition directories (catalog sinks take it from table metadata).
    * Returns a reader over the appended table. */
  def append(spark: SparkSession, layer: String, name: String,
    fresh: DataFrame, layout: TableLayout = TableLayout.none): DataFrame

  /** dbt `incremental_strategy='delete+insert'`: target rows matching any
    * incoming key TUPLE are deleted, then the whole batch is inserted —
    * composite keys and many-rows-per-key batches are legal
    * ([[Incremental.deleteInsert]]). On DML-capable formats this is a
    * `DELETE` + `INSERT` pair, no rewrite. */
  def deleteInsert(spark: SparkSession, layer: String, name: String,
    incoming: DataFrame, keys: Seq[String],
    layout: TableLayout = TableLayout.none,
    onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore): DataFrame

  /** dbt `incremental_strategy='insert_overwrite'`: replace exactly the
    * partitions `incoming` carries (dynamic partition overwrite — only
    * those partitions' files are written; every other partition is
    * untouched on disk). `incoming` must already be policy-aligned to the
    * table's schema, and the table must be partitioned by `partitionBy`. */
  def overwritePartitions(spark: SparkSession, layer: String, name: String,
    incoming: DataFrame, partitionBy: Seq[String],
    layout: TableLayout = TableLayout.none): DataFrame

  /** Drop whole partitions by value — the missing half of a windowed
    * refresh: dynamic partition overwrite only REPLACES partitions the
    * batch carries, so a window period whose recompute yields zero rows
    * would silently survive on disk. Callers enumerate the stale period
    * values (bounded by the refresh window, never table-sized) and drop
    * them explicitly. On Delta/Iceberg this is a metadata-only
    * `DELETE WHERE`/partition drop. */
  def dropPartitions(spark: SparkSession, layer: String, name: String,
    partCol: String, values: Seq[Any]): Unit

  /** Whether `layer`.`name` is already materialized — the first-run test
    * dbt's incremental/snapshot materializations branch on. */
  def exists(spark: SparkSession, layer: String, name: String): Boolean

  /** Read the current contents of `layer`.`name`. */
  def read(spark: SparkSession, layer: String, name: String): DataFrame
}

/** The `MERGE INTO` statement [[CatalogSink]] issues on merge-capable
  * formats — factored out so the generated SQL is unit-testable on this
  * offline classpath (no Delta/Iceberg jar can execute it here; a typo
  * must still be caught by MergeSqlSpec rather than ship silently). */
object MergeSql {
  /** dbt `incremental` + `unique_key` upsert: matched target rows are
    * replaced column-for-column, unmatched source rows inserted.
    * `predicates` (dbt `incremental_predicates`) land in the ON clause —
    * the target alias is `t`, so a `DBT_INTERNAL_DEST.` prefix rewrites
    * to `t.` — letting a MERGE-capable format skip files outside the
    * bounded slice. */
  def upsertByKey(target: String, source: String, key: String,
      predicates: Seq[String] = Seq.empty): String = {
    val bound = predicates.map(p => " AND (" +
      raw"(?i)\bDBT_INTERNAL_DEST\.".r.replaceAllIn(p, "t.") + ")").mkString
    s"""MERGE INTO $target t USING $source s ON t.$key = s.$key$bound
       |WHEN MATCHED THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin
  }

  /** `delete+insert` step 1: delete target rows whose key tuple appears
    * in the batch (dbt's generated DELETE for the strategy). */
  def deleteByKeys(target: String, source: String, keys: Seq[String]): String =
    s"""DELETE FROM $target WHERE EXISTS (SELECT 1 FROM $source s
       |WHERE ${keys.map(k => s"$target.$k = s.$k").mkString(" AND ")})""".stripMargin

  /** `delete+insert` step 2: insert the whole batch. */
  def insertAll(target: String, source: String): String =
    s"INSERT INTO $target SELECT * FROM $source"
}

/** Path-routed parquet sink: `warehouseDir/layer/name`. The original
  * round-1 layout; merge is the read–stage–overwrite fallback (a full
  * rewrite — at 100 TB use [[CatalogSink]] on a MERGE-capable format). */
final class ParquetSink(warehouseDir: String) extends TableSink {

  private def path(layer: String, name: String) = s"$warehouseDir/$layer/$name"

  override def overwrite(spark: SparkSession, layer: String, name: String,
      df: DataFrame, layout: TableLayout = TableLayout.none): DataFrame = {
    // path-routed parquet has no catalog, so bucket metadata cannot be
    // recorded — partitioning applies, bucketing needs [[CatalogSink]].
    // Surface the degradation: a caller that declared co-bucketing would
    // otherwise silently get shuffled joins downstream.
    if (layout.bucketBy.nonEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ParquetSink cannot record bucket metadata for $layer.$name " +
          s"(bucketBy=${layout.bucketBy.get}); downstream joins will shuffle. " +
          "Use CatalogSink for bucketed layouts.")
    // Stage, then swap via filesystem rename: `df` may lazily READ the
    // table being replaced (incremental merge, SCD2 advance — dbt's
    // `{{ this }}` self-reference), and parquet cannot overwrite a path
    // its own plan is scanning. One data write + one metadata rename,
    // never a second rewrite.
    val target = new org.apache.hadoop.fs.Path(path(layer, name))
    val staging = new org.apache.hadoop.fs.Path(path(layer, s"_staging_$name"))
    val backup = new org.apache.hadoop.fs.Path(path(layer, s"_backup_$name"))
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // NO implicit REBALANCE here (measured and reverted in r16): the
    // sink is a LAYOUT-PRESERVING primitive — zOrderCompact's clustered
    // ranges and callers' deliberate repartitioning must survive the
    // write verbatim; an AQE rebalance redistributes rows and destroys
    // exactly the file-range clustering such callers arranged. Output
    // file sizing is the caller's call (guide §6), made where the
    // intended layout is known.
    val w = df.write.mode("overwrite")
    val wp = if (layout.partitionBy.nonEmpty) w.partitionBy(layout.partitionBy: _*) else w
    wp.parquet(staging.toString)
    // Swap via backup: rename target aside, rename staging in, then drop
    // the backup. A crash between the renames leaves the old data intact
    // under `_backup_` (recoverable by hand) instead of the
    // delete-then-rename shape where a failed second step lost the table;
    // the reader-visible missing-path window is one rename, not
    // delete+rename.
    if (fs.exists(backup)) fs.delete(backup, true)
    val hadTarget = fs.exists(target)
    if (hadTarget) require(fs.rename(target, backup),
      s"rename $target -> $backup failed")
    require(fs.rename(staging, target), s"rename $staging -> $target failed")
    if (hadTarget) fs.delete(backup, true)
    read(spark, layer, name)
  }

  override def merge(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, key: String,
      layout: TableLayout = TableLayout.none,
      onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore,
      predicates: Seq[String] = Seq.empty): DataFrame =
    // safe against the self-read because overwrite stages + renames; the
    // rewrite preserves the model's declared partitioning
    overwrite(spark, layer, name,
      Incremental.merge(read(spark, layer, name), incoming, key,
        onSchemaChange, predicates),
      layout)

  override def append(spark: SparkSession, layer: String, name: String,
      fresh: DataFrame, layout: TableLayout = TableLayout.none): DataFrame = {
    // appended files must follow the table's partition-directory scheme —
    // a flat append into a partitioned table makes it unreadable
    val w = fresh.write.mode("append")
    val wp = if (layout.partitionBy.nonEmpty) w.partitionBy(layout.partitionBy: _*) else w
    wp.parquet(path(layer, name))
    read(spark, layer, name)
  }

  override def deleteInsert(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, keys: Seq[String],
      layout: TableLayout = TableLayout.none,
      onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore): DataFrame =
    // no DML on plain parquet → read–transform–staged-overwrite, like merge
    overwrite(spark, layer, name,
      Incremental.deleteInsert(read(spark, layer, name), incoming, keys,
        onSchemaChange),
      layout)

  override def overwritePartitions(spark: SparkSession, layer: String,
      name: String, incoming: DataFrame, partitionBy: Seq[String],
      layout: TableLayout = TableLayout.none): DataFrame = {
    // Stage the batch first: `incoming` may lazily read the very
    // partitions being replaced ({{ this }} self-reference), and dynamic
    // overwrite commits by swapping those directories under the scan.
    // The staging write is sized by the BATCH, not the table.
    val staging = new org.apache.hadoop.fs.Path(path(layer, s"_staging_io_$name"))
    val fs = staging.getFileSystem(spark.sessionState.newHadoopConf())
    incoming.write.mode("overwrite").parquet(staging.toString)
    // Dynamic mode is the whole point: only partitions present in the
    // batch are replaced; static mode would truncate the table.
    spark.read.parquet(staging.toString)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(path(layer, name))
    fs.delete(staging, true)
    read(spark, layer, name)
  }

  override def dropPartitions(spark: SparkSession, layer: String,
      name: String, partCol: String, values: Seq[Any]): Unit = {
    // Hive-style partition directories: <table>/<col>=<value>, with the
    // value HIVE-ESCAPED exactly as the partitioned write produced it (a
    // ':' or ' ' in a string period is %-encoded on disk — an unescaped
    // lookup would miss the directory and silently keep the stale
    // partition this method exists to remove). One metadata delete per
    // stale period — window-bounded, never a rewrite — and the removal
    // is VERIFIED: fs.delete returns false instead of throwing on a
    // miss, so success is the directory being gone, not the call
    // returning. The directory must also exist BEFORE the delete: the
    // values were just read from the target table, so a computed path
    // that is absent means String.valueOf(v) diverged from Spark's
    // on-disk partition-value rendering (e.g. a timestamp's trailing
    // '.0') — without this gate the delete silently misses, the
    // post-check still passes, and the stale partition survives: the
    // exact failure this method exists to prevent.
    val conf = spark.sessionState.newHadoopConf()
    values.foreach { v =>
      val dir = new org.apache.hadoop.fs.Path(path(layer, name) + "/" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(partCol, String.valueOf(v)))
      val fs = dir.getFileSystem(conf)
      require(fs.exists(dir),
        s"dropPartitions: $dir not found — the stale value '$v' was read " +
          "from the table, so its directory must exist; the rendered " +
          "path diverges from the partitioned write's layout")
      fs.delete(dir, true)
      require(!fs.exists(dir),
        s"dropPartitions: $dir still exists after delete")
    }
  }

  override def exists(spark: SparkSession, layer: String, name: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(layer, name))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  override def read(spark: SparkSession, layer: String, name: String): DataFrame =
    spark.read.parquet(path(layer, name))
}

/** Catalog-backed sink: routes each layer to its SQL database (the
  * reference's `generate_database_name` macro routes bronze/silver/gold
  * models to the BRONZE/SILVER/GOLD databases —
  * /root/reference/macros/generate_database_name.sql:1-9,
  * /root/reference/dbt_project.yml:20-30), so
  * `spark.table("silver.silver_orders")` resolves exactly as a reference
  * user expects.
  *
  * `format` picks the table provider. With `delta`/`iceberg` on the
  * classpath, [[merge]] issues a genuine `MERGE INTO` (ACID, no rewrite);
  * for formats without MERGE support it stages the merged result into a
  * temp table and swaps via overwrite — correct, but a full rewrite, which
  * is precisely what the lakehouse formats exist to avoid at scale.
  */
class CatalogSink(format: String = "parquet",
    targetDatabase: String = "default",
    mergeCapableOverride: Option[Boolean] = None,
    project: ProjectYaml.Project = ProjectYaml.default) extends TableSink {

  private val MergeCapableFormats = Set("delta", "iceberg")

  /** Whether [[merge]] takes the `MERGE INTO` path. `mergeCapableOverride`
    * exists for tests: the offline classpath has no merge-capable format
    * jar, so a spec declares parquet merge-capable and intercepts
    * [[executeMerge]] to drive the branch end-to-end. */
  private def mergeCapable: Boolean =
    mergeCapableOverride.getOrElse(MergeCapableFormats.contains(format))

  /** Execution seam for the generated MERGE statement — overridden in
    * tests to capture/emulate the SQL on formats that cannot run it. */
  protected def executeMerge(spark: SparkSession, statement: String): Unit =
    spark.sql(statement)

  /** The layer's database: the project file's per-layer `+database`
    * when declared (dbt's routing input — it was parsed but unread, so a
    * project declaring `silver: +database: curated` silently landed in
    * 'silver'), else the layer directory name, both through the
    * generate_database_name macro. */
  private def database(layer: String): String =
    Registry.databaseName(
      Some(project.layer(layer).database.getOrElse(layer)), targetDatabase)

  private def ident(layer: String, name: String): String =
    s"${database(layer)}.$name"

  override def overwrite(spark: SparkSession, layer: String, name: String,
      df: DataFrame, layout: TableLayout = TableLayout.none): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${database(layer)}")
    dropStaleManagedLocation(spark, layer, name)
    // A plan that reads the table it replaces (incremental merge fallback,
    // SCD2 advance — dbt's `{{ this }}`) cannot saveAsTable(Overwrite)
    // directly; stage it through a temp table first. Lakehouse formats
    // version instead, so at scale this branch is the parquet fallback
    // only. Detection walks the analyzed plan's relations — no job runs.
    val selfRead = readsTarget(spark, df, layer, name)
    val staging = ident(layer, s"_graft_staging_$name")
    val writeDf =
      if (!selfRead) df
      else {
        dropStaleManagedLocation(spark, layer, s"_graft_staging_$name")
        df.write.mode("overwrite").format(format).saveAsTable(staging)
        spark.table(staging)
      }
    var w = writeDf.write.mode("overwrite").format(format)
    if (layout.partitionBy.nonEmpty) w = w.partitionBy(layout.partitionBy: _*)
    layout.bucketBy.foreach { case (n, cols) =>
      w = w.bucketBy(n, cols.head, cols.tail: _*)
      if (layout.sortBy.nonEmpty) w = w.sortBy(layout.sortBy.head, layout.sortBy.tail: _*)
    }
    w.saveAsTable(ident(layer, name))
    if (selfRead) spark.sql(s"DROP TABLE $staging")
    read(spark, layer, name)
  }

  /** Whether `df`'s analyzed plan scans `layer`.`name` — the
    * self-overwrite hazard test. */
  private def readsTarget(spark: SparkSession, df: DataFrame,
      layer: String, name: String): Boolean = {
    val want = ident(layer, name).toLowerCase(java.util.Locale.ROOT)
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.catalogTable.map(t => t.identifier.database.getOrElse("") + "." +
          t.identifier.table)
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        Some(h.tableMeta.identifier.database.getOrElse("") + "." +
          h.tableMeta.identifier.table)
    }.flatten.exists(_.toLowerCase(java.util.Locale.ROOT) == want)
  }

  /** Policy-align `incoming` before a generated DML statement (`MERGE`,
    * `DELETE`+`INSERT`) — the statement requires source/target schema
    * agreement, so the drift policy applies FIRST: Ignore projects
    * incoming down to the target's columns (a drifted source would
    * otherwise fail the statement instead of dropping new columns per the
    * policy); AppendNewColumns widens the target via ALTER TABLE ADD
    * COLUMNS — the lakehouse-native schema evolution, metadata-only, no
    * rewrite — then projects; FailOnChange rejects inside align.
    * SyncAllColumns never reaches here (its column DROP is a rewrite on
    * this classpath — callers route it to the staged-overwrite fallback;
    * a lakehouse deployment would ALTER TABLE DROP COLUMNS and keep the
    * DML path). */
  private def alignForDml(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame,
      onSchemaChange: Incremental.OnSchemaChange): DataFrame = onSchemaChange match {
    case Incremental.AppendNewColumns =>
      // case-insensitive: Spark's default resolution treats `Extra`
      // and `extra` as the same column, so a case-variant must count
      // as existing rather than trigger a failing ALTER
      val existing = read(spark, layer, name).columns
        .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
      val added = incoming.schema.fields.filterNot(f =>
        existing.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
      if (added.nonEmpty) {
        val ddl = added.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
        spark.sql(s"ALTER TABLE ${ident(layer, name)} ADD COLUMNS ($ddl)")
      }
      Incremental.align(read(spark, layer, name), incoming, Incremental.Ignore)
    case p => Incremental.align(read(spark, layer, name), incoming, p)
  }

  override def merge(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, key: String,
      layout: TableLayout = TableLayout.none,
      onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore,
      predicates: Seq[String] = Seq.empty): DataFrame = {
    val target = ident(layer, name)
    if (mergeCapable && onSchemaChange != Incremental.SyncAllColumns) {
      val aligned = alignForDml(spark, layer, name, incoming, onSchemaChange)
      val src = s"_graft_merge_src_$name"
      aligned.createOrReplaceTempView(src)
      executeMerge(spark, MergeSql.upsertByKey(target, src, key, predicates))
      spark.catalog.dropTempView(src)
    } else {
      // overwrite detects the self-read and stages through a temp table;
      // the rewrite re-applies the model's declared layout
      overwrite(spark, layer, name,
        Incremental.merge(read(spark, layer, name), incoming, key,
          onSchemaChange, predicates),
        layout)
    }
    read(spark, layer, name)
  }

  override def deleteInsert(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, keys: Seq[String],
      layout: TableLayout = TableLayout.none,
      onSchemaChange: Incremental.OnSchemaChange = Incremental.Ignore): DataFrame = {
    val target = ident(layer, name)
    if (mergeCapable && onSchemaChange != Incremental.SyncAllColumns) {
      val aligned = alignForDml(spark, layer, name, incoming, onSchemaChange)
      val src = s"_graft_di_src_$name"
      aligned.createOrReplaceTempView(src)
      // dbt's generated pair for the strategy; on ACID formats each
      // statement is transactional, and neither rewrites the table
      executeMerge(spark, MergeSql.deleteByKeys(target, src, keys))
      executeMerge(spark, MergeSql.insertAll(target, src))
      spark.catalog.dropTempView(src)
    } else {
      overwrite(spark, layer, name,
        Incremental.deleteInsert(read(spark, layer, name), incoming, keys,
          onSchemaChange),
        layout)
    }
    read(spark, layer, name)
  }

  override def overwritePartitions(spark: SparkSession, layer: String,
      name: String, incoming: DataFrame, partitionBy: Seq[String],
      layout: TableLayout = TableLayout.none): DataFrame = {
    // insertInto is positional — order the batch by the table's schema.
    // Self-reading batches stage through a temp table first (dynamic
    // overwrite swaps the scanned partition directories at commit).
    val tableCols = read(spark, layer, name).columns
    val ordered = incoming.select(tableCols.map(org.apache.spark.sql.functions.col): _*)
    val selfRead = readsTarget(spark, ordered, layer, name)
    val staging = ident(layer, s"_graft_staging_io_$name")
    val writeDf =
      if (!selfRead) ordered
      else {
        dropStaleManagedLocation(spark, layer, s"_graft_staging_io_$name")
        ordered.write.mode("overwrite").format(format).saveAsTable(staging)
        spark.table(staging)
      }
    // Dynamic mode must come from the SESSION conf here:
    // DataFrameWriter.insertInto drops writer options on the catalog
    // path (unlike path-based writes, where ParquetSink's option works),
    // so an `.option("partitionOverwriteMode", "dynamic")` silently
    // degrades to STATIC overwrite — replacing the WHOLE table with the
    // batch. Caught by the catalog-sink microbatch spec; conf is
    // save-and-restored so a shared session keeps its setting.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try writeDf.write.mode("overwrite").insertInto(ident(layer, name))
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    if (selfRead) spark.sql(s"DROP TABLE $staging")
    read(spark, layer, name)
  }

  override def append(spark: SparkSession, layer: String, name: String,
      fresh: DataFrame, layout: TableLayout = TableLayout.none): DataFrame = {
    // saveAsTable(Append) VALIDATES the writer's declared layout against
    // the existing table's (empty spec vs partitioned table is an
    // AnalysisException), so the model's layout must be restated here
    var w = fresh.write.mode("append").format(format)
    if (layout.partitionBy.nonEmpty) w = w.partitionBy(layout.partitionBy: _*)
    layout.bucketBy.foreach { case (n, cols) =>
      w = w.bucketBy(n, cols.head, cols.tail: _*)
      if (layout.sortBy.nonEmpty) w = w.sortBy(layout.sortBy.head, layout.sortBy.tail: _*)
    }
    w.saveAsTable(ident(layer, name))
    read(spark, layer, name)
  }

  override def dropPartitions(spark: SparkSession, layer: String,
      name: String, partCol: String, values: Seq[Any]): Unit =
    // Two DDL dialects: Hive-catalog tables (the parquet default) take
    // `ALTER TABLE … DROP PARTITION`; Delta/Iceberg do NOT support that
    // statement — their idiom is `DELETE FROM … WHERE partCol = v`,
    // which both formats execute as a transactional, partition-aligned
    // metadata delete (no row rewrite when the predicate covers whole
    // partitions). Routed on the same seam as MERGE capability.
    values.foreach { v =>
      val lit = s"'${String.valueOf(v).replace("'", "''")}'"
      if (mergeCapable)
        spark.sql(s"DELETE FROM ${ident(layer, name)} WHERE $partCol = $lit")
      else
        spark.sql(s"ALTER TABLE ${ident(layer, name)} DROP IF EXISTS " +
          s"PARTITION ($partCol=$lit)")
    }

  override def exists(spark: SparkSession, layer: String, name: String): Boolean =
    spark.catalog.databaseExists(database(layer)) &&
      spark.catalog.tableExists(ident(layer, name))

  override def read(spark: SparkSession, layer: String, name: String): DataFrame =
    spark.table(ident(layer, name))

  /** A managed table's files survive the JVM while the in-memory catalog
    * does not, so a later process re-creating the table would hit
    * LOCATION_ALREADY_EXISTS. If the catalog does NOT know the table but
    * its default managed location exists on disk, it is an orphan from a
    * previous run — remove it before writing. (A catalog-known table is
    * left alone: saveAsTable(Overwrite) replaces it transactionally.) */
  private def dropStaleManagedLocation(spark: SparkSession, layer: String,
      name: String): Unit = {
    val known = spark.catalog.databaseExists(database(layer)) &&
      spark.catalog.tableExists(ident(layer, name))
    if (!known) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(
        s"$warehouse/${database(layer).toLowerCase(java.util.Locale.ROOT)}.db/" +
          name.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }
}
