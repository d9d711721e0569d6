package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

// temporary profiling harness — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"SCRATCH $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val pairs = time("minhashLsh count") {
      val p = Dedup.minhashLsh(spark, dir); p.count(); p
    }
    time("cc over fresh pairs") {
      Dedup.connectedComponents(spark, pairs.select("doc_a", "doc_b")).count()
    }
    println(s"SCRATCH rounds ${Dedup.lastCcRounds.get}")
    time("full dedupClusters") { Dedup.dedupClusters(spark, dir).count() }
    spark.stop()
  }
}
