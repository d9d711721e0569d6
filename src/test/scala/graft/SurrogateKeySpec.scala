package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.model.SurrogateKey

/** C17: exact dbt_utils v1.1.1 surrogate-key fidelity (SURVEY.md §7.4.4). */
class SurrogateKeySpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("integer key hashes like md5(cast(k as varchar))") {
    import spark.implicits._
    val out = Seq(42L, 0L, 1500L).toDF("k")
      .select(SurrogateKey.of(col("k"))).as[String].collect()
    assert(out.toSeq == Seq(md5Hex("42"), md5Hex("0"), md5Hex("1500")))
  }

  test("null key uses the dbt_utils sentinel string") {
    import spark.implicits._
    val out = Seq[Option[Long]](None).toDF("k")
      .select(SurrogateKey.of(col("k"))).as[String].head()
    assert(out == md5Hex("_dbt_utils_surrogate_key_null_"))
  }

  test("multi-column form joins with '-' after sentinel coalesce") {
    import spark.implicits._
    val out = Seq(("a", null: String)).toDF("x", "y")
      .select(SurrogateKey.of(Seq(col("x"), col("y")))).as[String].head()
    assert(out == md5Hex("a-_dbt_utils_surrogate_key_null_"))
  }
}
