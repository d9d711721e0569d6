package graft

import org.apache.spark.sql.functions._
import graft.quality.Checks

/** The dbt generic tests catch injected violations (and only those). */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("unique flags duplicated non-null values, ignores nulls") {
    val df = Seq(Some(1), Some(1), Some(2), None, None).toDF("k")
    assert(Checks.unique(df, "k").count() == 2) // both rows of value 1
    assert(Checks.unique(df.filter($"k" =!= 1 || $"k".isNull), "k").isEmpty)
  }

  test("notNull flags null rows") {
    val df = Seq(Some(1), None).toDF("k")
    assert(Checks.notNull(df, "k").count() == 1)
  }

  test("relationships flags orphans, ignores null FKs") {
    val child = Seq(Some(1), Some(3), None).toDF("fk")
    val parent = Seq(1, 2).toDF("pk")
    val orphans = Checks.relationships(child, "fk", parent, "pk")
    assert(orphans.as[Option[Int]].collect().toSeq == Seq(Some(3)))
  }

  test("acceptedValues flags out-of-domain, passes nulls") {
    val df = Seq(Some("a"), Some("zz"), None).toDF("v")
    assert(Checks.acceptedValues(df, "v", Seq("a", "b")).count() == 1)
  }

  test("freshness classifies against pinned clock thresholds") {
    // Clock.now = 2001-08-15 00:00; 2001-08-14 12:00 is 12h old -> pass,
    // 2001-08-13 18:00 is 30h -> warn, 2001-08-10 -> 120h -> error.
    def df(t: String) = Seq(java.sql.Timestamp.valueOf(t)).toDF("_loaded_at")
    assert(Checks.freshness(df("2001-08-14 12:00:00"), "_loaded_at", graft.model.Clock.now) == "pass")
    assert(Checks.freshness(df("2001-08-13 18:00:00"), "_loaded_at", graft.model.Clock.now) == "warn")
    assert(Checks.freshness(df("2001-08-10 00:00:00"), "_loaded_at", graft.model.Clock.now) == "error")
  }
}
