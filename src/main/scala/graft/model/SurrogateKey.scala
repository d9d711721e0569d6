package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, lit, md5}

/** dbt_utils v1.1.1 `generate_surrogate_key` semantics (SURVEY.md §2.9 C17).
  *
  * The reference builds every silver surrogate key with
  * `{{ dbt_utils.generate_surrogate_key(['col']) }}`
  * (`/root/reference/models/silver/silver_customers.sql:26`,
  * `silver_orders.sql:31`, `silver_payments.sql:30`), which for a single
  * column expands to
  * `md5(cast(coalesce(cast(col as varchar), '_dbt_utils_surrogate_key_null_') as varchar))`.
  * The magic null sentinel is reproduced exactly so keys hash-match any
  * system using the same macro.
  */
object SurrogateKey {
  val NullSentinel = "_dbt_utils_surrogate_key_null_"

  /** Single-column surrogate key (the only arity the reference uses). */
  def of(c: Column): Column =
    md5(coalesce(c.cast("string"), lit(NullSentinel)))

  /** Multi-column form of the macro: values joined with '-' after the same
    * null-sentinel coalesce. Not exercised by the reference but part of the
    * macro's public contract. */
  def of(cs: Seq[Column]): Column =
    md5(org.apache.spark.sql.functions.concat_ws(
      "-", cs.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*))
}
