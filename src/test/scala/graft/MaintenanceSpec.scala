package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Maintenance, ParquetSink, TableLayout}

/** Compaction: small files collapse, rows are untouched, partition
  * layouts survive, and the rewrite goes through the sink's atomic
  * staged-rename overwrite. */
class MaintenanceSpec extends SparkSpec {

  test("compact collapses an append-fragmented table; rows unchanged") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val sink = new ParquetSink(wh)
    sink.overwrite(spark, "silver", "frag",
      (1L to 100L).toDF("id").repartition(8))
    (1 to 3).foreach(i => sink.append(spark, "silver", "frag",
      Seq(100L + i).toDF("id").repartition(2)))
    val before = Maintenance.fileCount(spark, wh, "silver", "frag")
    assert(before >= 10, s"setup must fragment the table (saw $before files)")
    Maintenance.compact(spark, sink, wh, "silver", "frag")
    assert(Maintenance.fileCount(spark, wh, "silver", "frag") == 1L,
      "a tiny table compacts to a single file")
    assert(sink.read(spark, "silver", "frag").as[Long].collect().sorted.toSeq ==
      (1L to 103L))
  }

  test("partitioned compact: one file per partition directory, layout intact") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_compact_p").toString
    val sink = new ParquetSink(wh)
    val layout = TableLayout(partitionBy = Seq("y"))
    val df = Seq.tabulate(40)(i => (i.toLong, 2000 + i % 2)).toDF("id", "y")
    sink.overwrite(spark, "gold", "fragp", df.repartition(6), layout)
    sink.append(spark, "gold", "fragp",
      Seq((100L, 2000), (101L, 2001)).toDF("id", "y").repartition(2), layout)
    assert(Maintenance.fileCount(spark, wh, "gold", "fragp") > 2)
    Maintenance.compact(spark, sink, wh, "gold", "fragp", layout)
    assert(Maintenance.fileCount(spark, wh, "gold", "fragp") == 2L,
      "one file per order-year-style partition directory")
    val root = new java.io.File(s"$wh/gold/fragp")
    assert(root.listFiles().count(_.getName.startsWith("y=")) == 2,
      "partition directories survive the rewrite")
    assert(sink.read(spark, "gold", "fragp").count() == 42)
  }
}
