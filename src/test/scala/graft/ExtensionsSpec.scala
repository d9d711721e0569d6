package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions registers the native functions at session build time. */
class ExtensionsSpec extends SparkSpec {

  test("a session built with GraftExtensions resolves the functions") {
    // spark.sql.extensions is a *static* conf, so in a suite that shares a
    // SparkContext we go through builder.withExtensions — the same code
    // path the static conf triggers at cold start (verified separately
    // with spark-shell --conf spark.sql.extensions=graft.plans.GraftExtensions).
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.plans.GraftExtensions()(_))
        .getOrCreate()
      val r = extended.sql(
        """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                  str_hamming('1010', '1001') AS h,
                  length(simhash64(array('alpha', 'beta'))) AS s,
                  length(sign_bits(array(1.0D, -2.0D), 6)) AS b""").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getInt(1) == 2)
      assert(r.getInt(2) == 64)
      assert(r.getInt(3) == 6)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
