package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, round}

/** Presentation-layer finalization applied identically to a Spark result and
  * to its DuckDB oracle query, so the driver's value-hash compare is immune
  * to cross-engine representation noise:
  *
  *  - [[Fin.Money]]: quantize to cents as `round(x*100)/100.0`. Combined
  *    with the exact-cents aggregation in the models (Gold.cents) the input
  *    doubles are bit-identical across engines, and integer-scale `round`
  *    is "half away from zero on the true double value" in both Spark
  *    (BigDecimal HALF_UP) and DuckDB (std::round) — unlike `round(x, 2)`,
  *    whose internal ×100 differs between the engines at half-cent
  *    boundaries. Inputs are 2-decimal money, so nothing meaningful is lost.
  *  - [[Fin.I]]/[[Fin.L]]: integer width alignment (Spark `year()` is INT
  *    while DuckDB `extract(year ...)` is BIGINT; DuckDB `sum(BIGINT)` is
  *    HUGEINT while Spark is LONG).
  *  - Every query gets a total ORDER BY over a unique key so the result is
  *    row-order deterministic in both engines (Spark sorts NULLS FIRST by
  *    default; the oracle says NULLS FIRST explicitly).
  *
  * Each exposed query declares its schema once as `Seq[(name, Fin)]`; the
  * Spark projection and the oracle's outer SELECT are both generated from
  * that single spec, which also guarantees the column-name parity the
  * driver's compare requires.
  */
sealed trait Fin
object Fin {
  /** Pass through unchanged (exact types/values on both engines). */
  case object P extends Fin
  /** round(x, 2) cast to DECIMAL(18,2) — noisy double aggregates. */
  case object Money extends Fin
  /** Cast to 32-bit int on both sides. */
  case object I extends Fin
  /** Cast to 64-bit int on both sides. */
  case object L extends Fin
}

object Finalize {
  import Fin._

  def spark(df: DataFrame, cols: Seq[(String, Fin)], keys: Seq[String]): DataFrame = {
    val sel: Seq[Column] = cols.map {
      case (n, P)     => col(n)
      case (n, Money) => (round(col(n) * 100) / 100.0).as(n)
      case (n, I)     => col(n).cast("int").as(n)
      case (n, L)     => col(n).cast("bigint").as(n)
    }
    df.select(sel: _*).orderBy(keys.map(col): _*)
  }

  /** DuckDB-dialect outer SELECT mirroring [[spark]]. */
  def sql(inner: String, cols: Seq[(String, Fin)], keys: Seq[String]): String = {
    val sel = cols.map {
      case (n, P)     => n
      case (n, Money) => s"(round($n * 100) / 100.0) AS $n"
      case (n, I)     => s"CAST($n AS INTEGER) AS $n"
      case (n, L)     => s"CAST($n AS BIGINT) AS $n"
    }.mkString(", ")
    val ord = keys.map(k => s"$k NULLS FIRST").mkString(", ")
    s"SELECT $sel FROM ($inner) __fin ORDER BY $ord"
  }
}
