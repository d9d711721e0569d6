package graft

import java.io.File
import org.apache.spark.sql.functions._

import graft.quality.SingularTests

/** Singular (data) tests loaded from tests-dir SQL files must report exactly
  * the counts the hand-folded singular branches inside
  * DataQuality.summary produce — the loadable form and the fused form
  * are the same tests. */
class SingularTestsSpec extends SparkSpec {

  test("tests-dir SQL files load and report the same counts as the dq_summary " +
      "singular branches") {
    val loaded = SingularTests.load(new File("tests"))
    assert(loaded.map(_._1) ==
      Seq("assert_customer_email_format", "assert_positive_revenue"))
    val fromFiles = SingularTests.counts(spark, Sf0001, new File("tests"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fused = graft.quality.DataQuality.summary(spark, Sf0001)
      .filter(col("check_name").startsWith("tests."))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fused.keySet ==
      Set("tests.assert_customer_email_format", "tests.assert_positive_revenue"))
    assert(fromFiles == fused,
      s"loaded singular tests diverge from the fused branches: " +
        s"$fromFiles vs $fused")
  }

  test("an empty test file (the reference's own 0-byte state) is " +
      "intent-only and loads as nothing to run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tests_empty")
    java.nio.file.Files.writeString(dir.resolve("assert_intent_only.sql"), "")
    java.nio.file.Files.writeString(dir.resolve("assert_real.sql"),
      "SELECT * FROM {{ ref('silver_customers') }} WHERE email IS NULL")
    val loaded = SingularTests.load(dir.toFile)
    assert(loaded.map(_._1) == Seq("assert_real"),
      "empty files are declared intent, not runnable tests")
  }
}
