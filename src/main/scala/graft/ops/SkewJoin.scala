package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skewed joins (SURVEY.md §4.2 scale toolkit).
  *
  * AQE's skew-join handling covers sort-merge joins it can split, but two
  * production cases still need explicit salting at 100 TB:
  * aggregation-before-join on a hot key, and skewed joins against a
  * medium-size table that cannot broadcast. The pattern: spread the hot
  * left keys across `salts` sub-keys with a deterministic hash of a
  * high-cardinality tiebreak column, replicate the (smaller) right side
  * once per salt, and join on (key, salt) — turning one straggler task
  * into `salts` even tasks at the cost of a bounded right-side blowup.
  */
object SkewJoin {

  /** Inner equi-join on `key` with the left side salted `salts` ways.
    * `tiebreak` must be a (mostly) high-cardinality left column; the salt
    * is `pmod(hash(tiebreak), salts)` so results are deterministic. */
  def saltedInner(left: DataFrame, right: DataFrame, key: String,
      tiebreak: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(col(tiebreak)), lit(salts)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted groupBy-count for a hot grouping key: partial count per
    * (key, salt), then final sum per key — two small shuffles instead of
    * one skewed one. */
  def saltedCount(df: DataFrame, key: String, tiebreak: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(col(tiebreak)), lit(salts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("count"))
}
