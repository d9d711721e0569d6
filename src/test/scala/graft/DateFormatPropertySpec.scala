package graft

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the Snowflake↔Spark scalar-function gaps
  * (SURVEY.md §7.4.3: C11–C14 and the week-year trap C12). Uses plain
  * scalacheck Gens (sampled) — the scalatestplus bridge is not on the
  * offline classpath. */
class DateFormatPropertySpec extends SparkSpec {
  import spark.implicits._

  private val dates: Gen[LocalDate] =
    Gen.choose(0L, 365L * 60).map(LocalDate.parse("1970-01-15").plusDays(_))

  test("yyyy-MM never drifts into week-year around Jan 1 (C12)") {
    // Batch-evaluate one DataFrame pass over a sampled set + the worst-case
    // year-boundary days, comparing against java.time formatting.
    val sample = (Gen.listOfN(300, dates).sample.get ++
      (1990 to 2030).flatMap(y => Seq(
        LocalDate.of(y, 1, 1), LocalDate.of(y, 12, 31), LocalDate.of(y, 12, 28)))).distinct
    val df = sample.map(d => Date.valueOf(d)).toDF("d")
      .select(col("d"), date_format(col("d"), "yyyy-MM").as("ym"),
        concat(year(col("d")), lit("-"), quarter(col("d"))).as("yq"),
        date_format(col("d"), "EEE").as("dn"))
    df.collect().foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getString(1) == f"${d.getYear}%04d-${d.getMonthValue}%02d", s"ym for $d")
      assert(r.getString(2) == s"${d.getYear}-${(d.getMonthValue + 2) / 3}", s"yq for $d")
      val expect3 = d.getDayOfWeek.getDisplayName(
        java.time.format.TextStyle.SHORT, java.util.Locale.US)
      assert(r.getString(3) == expect3, s"dayname for $d")
    }
  }

  test("datediff argument order matches Snowflake datediff(day, a, b) (C14)") {
    val df = Seq((Date.valueOf("2001-08-01"), Date.valueOf("2001-08-15"))).toDF("a", "b")
    // Snowflake datediff(day, a, b) = b - a; Spark datediff(end, start).
    assert(df.select(datediff(col("b"), col("a"))).as[Int].head() == 14)
  }

  test("exact-cents quantization is stable for 2-decimal money (Finalize)") {
    val cents = Gen.listOfN(500, Gen.choose(-50000000L, 50000000L)).sample.get
    val doubles = cents.map(_ / 100.0)
    val out = graft.model.Finalize.spark(
      doubles.toDF("x"), Seq("x" -> graft.model.Fin.Money), Seq("x"))
      .as[Double].collect()
    assert(out.toSeq.sorted == doubles.sorted) // quantization is identity on cents
  }
}
