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
    * `unique_key`); returns a reader over the merged table. */
  def merge(spark: SparkSession, layer: String, name: String,
    incoming: DataFrame, key: String): DataFrame

  /** Read the current contents of `layer`.`name`. */
  def read(spark: SparkSession, layer: String, name: String): DataFrame
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
    val w = df.write.mode("overwrite")
    val wp = if (layout.partitionBy.nonEmpty) w.partitionBy(layout.partitionBy: _*) else w
    wp.parquet(path(layer, name))
    read(spark, layer, name)
  }

  override def merge(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, key: String): DataFrame = {
    // Parquet cannot atomically overwrite a table being read, so the merge
    // result is staged, then swapped in via a second overwrite write.
    val staging = path(layer, s"_staging_$name")
    Incremental.merge(read(spark, layer, name), incoming, key)
      .write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).write.mode("overwrite").parquet(path(layer, name))
    // drop the staging copy: underscore-prefixed paths are invisible to
    // recursive listings, but leaving one full table per merge on disk is
    // unbounded growth
    val p = new org.apache.hadoop.fs.Path(staging)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    read(spark, layer, name)
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
final class CatalogSink(format: String = "parquet",
    targetDatabase: String = "default") extends TableSink {

  private val MergeCapableFormats = Set("delta", "iceberg")

  private def database(layer: String): String =
    Registry.databaseName(Some(layer), targetDatabase)

  private def ident(layer: String, name: String): String =
    s"${database(layer)}.$name"

  override def overwrite(spark: SparkSession, layer: String, name: String,
      df: DataFrame, layout: TableLayout = TableLayout.none): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${database(layer)}")
    dropStaleManagedLocation(spark, layer, name)
    var w = df.write.mode("overwrite").format(format)
    if (layout.partitionBy.nonEmpty) w = w.partitionBy(layout.partitionBy: _*)
    layout.bucketBy.foreach { case (n, cols) =>
      w = w.bucketBy(n, cols.head, cols.tail: _*)
      if (layout.sortBy.nonEmpty) w = w.sortBy(layout.sortBy.head, layout.sortBy.tail: _*)
    }
    w.saveAsTable(ident(layer, name))
    read(spark, layer, name)
  }

  override def merge(spark: SparkSession, layer: String, name: String,
      incoming: DataFrame, key: String): DataFrame = {
    val target = ident(layer, name)
    if (MergeCapableFormats.contains(format)) {
      val src = s"_graft_merge_src_$name"
      incoming.createOrReplaceTempView(src)
      spark.sql(
        s"""MERGE INTO $target t USING $src s ON t.$key = s.$key
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""")
      spark.catalog.dropTempView(src)
    } else {
      dropStaleManagedLocation(spark, layer, s"_graft_staging_$name")
      val staging = s"${database(layer)}._graft_staging_$name"
      Incremental.merge(read(spark, layer, name), incoming, key)
        .write.mode("overwrite").format(format).saveAsTable(staging)
      spark.table(staging).write.mode("overwrite").format(format)
        .saveAsTable(target)
      spark.sql(s"DROP TABLE $staging")
    }
    read(spark, layer, name)
  }

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
