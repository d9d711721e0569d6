package graft.sources

import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata lookups.
  *
  * Parquet footers carry exact per-row-group row counts, so a table's
  * cardinality is available from a metadata read — the same cost class as
  * planning the scan (file listing + footer fetch), NOT a Spark job. At
  * 100 TB, "count the table" as an action is a full job over every split;
  * the footer read is what a catalog with fresh statistics would answer
  * from memory. Operators that need N to size a parameter (e.g. the
  * banded-LSH plane count in [[graft.ops.Similarity.cosineNearDup]]) use
  * this, with `count()` only as an explicit last resort.
  */
object ParquetStats {

  /** Total row count of the parquet file or directory at `path`, summed
    * from file footers. None if the path is missing, contains no parquet
    * files, or any footer is unreadable (callers fall back to count()). */
  def rowCount(spark: SparkSession, path: String): Option[Long] = {
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet") &&
              !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
            .map(_.getPath)
        else Seq(p)
      if (files.isEmpty) None
      else Some(files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
