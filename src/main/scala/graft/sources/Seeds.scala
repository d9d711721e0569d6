package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** dbt `seeds/` equivalent: version-controlled CSV files loaded as tables.
  *
  * The reference declares the capability but ships no seeds
  * (`/root/reference/seeds/.gitkeep` only — SURVEY.md §2.1), so this is the
  * completed form: header CSVs with either schema inference or an explicit
  * schema, exposed as a temp view like a ref()-able model.
  *
  * Scale note: seeds are by definition small, dimension-like inputs — the
  * natural broadcast side of any join, which Catalyst picks up from size
  * statistics automatically.
  */
object Seeds {

  def load(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
    val reader = schema match {
      case Some(s) => base.schema(s)
      case None => base.option("inferSchema", "true")
    }
    reader.csv(path)
  }

  /** Load and register as a ref()-able temp view, dbt-style (view named by
    * file basename sans extension unless given). */
  def seed(spark: SparkSession, path: String, name: Option[String] = None): DataFrame = {
    val df = load(spark, path)
    val viewName = name.getOrElse(
      new java.io.File(path).getName.replaceAll("\\.csv$", ""))
    df.createOrReplaceTempView(viewName)
    df
  }
}
