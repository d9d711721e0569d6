package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Warehouse maintenance: the background jobs a parquet lakehouse needs
  * that dbt itself leaves to the platform (Delta's OPTIMIZE, Iceberg's
  * rewrite_data_files). The engine's incremental appends and streaming
  * micro-batch upserts each write small files; left alone, a month of
  * 5-minute micro-batches turns a table scan into ~8 600 file opens per
  * partition — at 100 TB the file-listing and task-scheduling overhead
  * dominates the read.
  */
object Maintenance {

  /** Number of data files currently backing `layer`.`name` in a
    * path-routed parquet warehouse (metadata-only). */
  def fileCount(spark: SparkSession, warehouseDir: String, layer: String,
      name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/$layer/$name")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(st: org.apache.hadoop.fs.FileStatus): Long = {
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) 0L
      else if (st.isDirectory) fs.listStatus(st.getPath).map(walk).sum
      else if (n.endsWith(".parquet")) 1L else 0L
    }
    if (fs.exists(p)) walk(fs.getFileStatus(p)) else 0L
  }

  /** Total bytes of data files (metadata-only, same walk). */
  def tableBytes(spark: SparkSession, warehouseDir: String, layer: String,
      name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$warehouseDir/$layer/$name")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(st: org.apache.hadoop.fs.FileStatus): Long = {
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) 0L
      else if (st.isDirectory) fs.listStatus(st.getPath).map(walk).sum
      else if (n.endsWith(".parquet")) st.getLen else 0L
    }
    if (fs.exists(p)) walk(fs.getFileStatus(p)) else 0L
  }

  /** Compact `layer`.`name` to ~`targetFileBytes` files: rewrite through
    * the sink's atomic overwrite (staged rename — readers never see a
    * partial table) with the row set unchanged.
    *
    * Un-partitioned tables repartition to ceil(bytes/target) (sized from
    * file metadata, no job); partitioned tables repartition on their
    * partition columns so each directory collapses to one file — the
    * layout-preserving compaction an append-heavy partitioned table
    * needs, since appends add a file per batch per partition.
    *
    * At 100 TB this runs per-partition as a scheduled job over recently
    * appended partitions, not table-wide; the same call shape applies —
    * point it at a narrower layer/name (or run it on a lakehouse format
    * where OPTIMIZE does it natively). */
  def compact(spark: SparkSession, sink: ParquetSink, warehouseDir: String,
      layer: String, name: String,
      layout: TableLayout = TableLayout.none,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val df = sink.read(spark, layer, name)
    val compacted =
      if (layout.partitionBy.nonEmpty)
        df.repartition(layout.partitionBy.map(col): _*)
      else {
        val bytes = tableBytes(spark, warehouseDir, layer, name)
        val parts = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
        df.repartition(parts.toInt)
      }
    sink.overwrite(spark, layer, name, compacted, layout)
    ()
  }
}
