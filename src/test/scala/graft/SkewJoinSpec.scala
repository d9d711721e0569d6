package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

/** Salted-join results must be identical to the plain formulations. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape salting exists for.
  private lazy val skewed = (1L to 10000L)
    .map(i => (if (i % 10 == 0) i % 100 else 7L, i))
    .toDF("k", "v")
  private lazy val dim = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("saltedInner equals the plain inner join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = SkewJoin.saltedInner(skewed, dim, "k", "v", salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting genuinely spreads the hot key across all sub-keys") {
    // the mechanism, not just the equivalence: the hot key's rows must
    // land in every salt bucket, so the one straggler task becomes
    // `salts` even tasks
    val spread = skewed
      .withColumn("_salt", pmod(hash(col("v")), lit(8)))
      .filter(col("k") === 7L)
      .select("_salt").distinct().count()
    assert(spread == 8L, s"hot key only reached $spread of 8 salt buckets")
  }

  test("saltedCount equals the plain groupBy count") {
    val plain = skewed.groupBy("k").count()
    val salted = SkewJoin.saltedCount(skewed, "k", "v", salts = 8)
    val diff = plain.join(salted.withColumnRenamed("count", "salted_count"), Seq("k"))
      .filter(col("count") =!= col("salted_count"))
    assert(diff.isEmpty)
    assert(plain.count() == salted.count())
  }
}
