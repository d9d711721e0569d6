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
    * from file footers. Directories are walked recursively (skipping
    * `_`/`.`-prefixed metadata names), so partitioned layouts
    * (`year=2001/part-*.parquet`) are sized from footers too instead of
    * silently falling back to a full count() job. None if the path is
    * missing, contains no parquet files, or any footer is unreadable
    * (callers fall back to count()). */
  def rowCount(spark: SparkSession, path: String): Option[Long] = {
    try {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.Path] = {
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
        else if (n.endsWith(".parquet")) Seq(st.getPath)
        else Seq.empty
      }
      val files =
        if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq.flatMap(walk)
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
