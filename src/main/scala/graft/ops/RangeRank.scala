package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact global / per-group rank — the distributed-sort
  * replacement for `row_number().over(Window.orderBy(...))` (one task for
  * the whole corpus) and for per-group windows whose groups are
  * unbounded (one task per language / source, half the corpus in one
  * task when one group dominates).
  *
  * Shape — the textbook distributed rank, expressed DataFrame-first:
  *
  *   1. `repartitionByRange(group ++ order)` — a range exchange: every
  *      partition holds a contiguous slice of the global (group, order)
  *      ordering, partitions are balanced by the sampler regardless of
  *      group skew (a dominant group simply spans many partitions).
  *   2. `sortWithinPartitions` + `monotonically_increasing_id` — the
  *      intra-partition position, read straight off the sorted stream
  *      (ids are consecutive within a partition, so `mid - min(mid) + 1`
  *      is the local rank). No Window operator ever touches the corpus.
  *   3. [[graft.model.Stage.pin]] — freezes one evaluation. The
  *      per-(partition, group) offset table below and the ranked rows MUST
  *      read the same (pid, mid) assignment; exchange reuse would usually
  *      deliver that, but it is an optimizer courtesy (a re-planned
  *      exchange re-samples range boundaries under a fresh seed), and an
  *      exactness contract cannot ride on optimizer luck. The pin is one
  *      extra linear, partition-parallel materialization — the same order
  *      of cost as the sort's own shuffle files — and its backend is the
  *      deployment's choice: executor-local blocks on `local[n]`, durable
  *      scratch-dir parquet (executor-loss-tolerant) on a cluster. Both
  *      are safe because the ids are STORED columns after the pin.
  *   4. A per-(partition, group) count aggregate — ≤ partitions + groups
  *      rows (groups are contiguous in range order, so each partition
  *      holds a handful) — turned into cumulative offsets by a window
  *      over that TINY frame (the only Window in the plan; its input is
  *      the aggregate, never the corpus), broadcast-joined back, and the
  *      global rank is map-only arithmetic: `local + offset`.
  *
  * The ranks are bit-identical to the single-task `row_number` they
  * replace — range partitioning preserves the total order across
  * partitions — so oracle SQL written with `row_number() OVER (...)`
  * stays valid verbatim. Ties across the order columns land in one
  * partition only if the full key ties; callers keep the usual unique
  * tie-break column (doc_id) so the ordering is total.
  *
  * Inputs small enough for one task skip all of this: see
  * [[WindowBytesKey]] — the distributed machinery's constant factor
  * (pin write + offset join, ~0.5–1 s) is pure overhead below ~10⁷
  * rows, so the gate picks the plain window form there, exactly like
  * Spark's own stats-driven broadcast-vs-shuffle join choice.
  */
object RangeRank {

  /** Adaptive small-input fallback threshold (bytes). When the SUM OF
    * LEAF SCAN SIZES of the input plan is at or below this, [[rank]] /
    * [[cumSum]] use the plain `row_number()` / running-sum window forms
    * instead of the distributed range stage — a single-task window over
    * a few MB is 2–4× cheaper than the range exchange + pin + offset
    * join (measured: `order_percentiles` 1.03→0.46 s, the histogram
    * truth rank 0.57→0.18 s at sf0.1), and both forms are bit-identical
    * (RangeRankSpec), so the choice is a pure physical-strategy pick —
    * the same stats-driven adaptivity as Spark's own broadcast-join
    * threshold.
    *
    * Why LEAF sizes, not the plan's own estimate: Catalyst's
    * size-in-bytes propagation multiplies through joins (a 10 MB
    * silver-orders chain estimates at 57 GB), which would never choose
    * the window form; the bytes actually READ track the leaves. An
    * exploding transform (posexplode of token streams) can exceed the
    * leaf sum, which is why the default stays at a few comfortable
    * seconds of one task (32 MB — the 100× probe measured a 42 MB /
    * 16M-row single-task sort at 4.4 s vs 3.1 s distributed, so the
    * crossover sits just below that) rather than anything ambitious: a
    * borderline misclassification costs one slow task, never a wrong
    * rank. At 100-TB inputs the leaves are TBs
    * and the distributed path always wins the gate. Set to 0 to force
    * the distributed form everywhere (PlanSpec does, to pin its shape);
    * frames with unknown leaf stats (LogicalRDD from a localCheckpoint)
    * default to `spark.sql.defaultSizeInBytes` = Long.Max → distributed,
    * the safe direction. */
  val WindowBytesKey = "spark.graft.rangerank.window.bytes"
  private val DefaultWindowBytes: Long = 32L << 20

  private def smallInput(df: DataFrame): Boolean = {
    // fail-loud with the key named in the failure (graft.model.Conf):
    // a bare NumberFormatException from deep inside query construction
    // is undiagnosable
    val threshold = graft.model.Conf.long(df.sparkSession,
      WindowBytesKey, DefaultWindowBytes)
    threshold > 0 && {
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      leaves.nonEmpty &&
        leaves.map(_.stats.sizeInBytes).sum <= BigInt(threshold)
    }
  }

  /** The pre-checkpoint range-staged frame of [[rank]] — split out so
    * PlanSpec can pin the corpus stage's shape (a range exchange + sort,
    * zero Window operators); [[rank]] checkpoints it. Adds the working
    * columns `_rr_mid` (intra-partition position id) and `_rr_pid`. */
  private[graft] def staged(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column]): DataFrame = {
    val rangeCols = groupCols.map(col) ++ orderCols
    df.repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("_rr_mid", monotonically_increasing_id())
      .withColumn("_rr_pid", spark_partition_id())
  }

  /** Exact `row_number` over `orderCols` within each `groupCols` group
    * (global rank when `groupCols` is empty), plus optionally the group's
    * total row count — both bit-identical to the window forms
    * `row_number().over(Window.partitionBy(groups).orderBy(order))` and
    * `count(1).over(Window.partitionBy(groups))`, with no corpus-bound
    * window partition anywhere in the plan. `orderCols` must be a total
    * order (include a unique tie-break column). The rank column is
    * IntegerType to match `row_number`. */
  def rank(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      rankName: String, groupCountName: Option[String] = None): DataFrame = {
    if (smallInput(df)) {
      // small-input fallback: the plain window forms — bit-identical
      // (the order is total by contract), single task by construction,
      // and that task's input fits the [[WindowBytesKey]] bound
      val w =
        if (groupCols.isEmpty) Window.orderBy(orderCols: _*)
        else Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
      val ranked = df.withColumn(rankName, row_number().over(w))
      return groupCountName match {
        case Some(n) =>
          val cw = if (groupCols.isEmpty) Window.partitionBy()
            else Window.partitionBy(groupCols.map(col): _*)
          ranked.withColumn(n, count(lit(1)).over(cw))
        case None => ranked
      }
    }
    val parted = graft.model.Stage.pin(staged(df, groupCols, orderCols))
    val keys = "_rr_pid" +: groupCols
    val grpStats = parted.groupBy(keys.map(col): _*)
      .agg(min(col("_rr_mid")).as("_rr_m0"), count(lit(1)).as("_rr_cnt"))
    val (offW, gnW) =
      if (groupCols.isEmpty)
        (Window.orderBy(col("_rr_pid")), Window.partitionBy())
      else
        (Window.partitionBy(groupCols.map(col): _*).orderBy(col("_rr_pid")),
          Window.partitionBy(groupCols.map(col): _*))
    val offs = grpStats
      .withColumn("_rr_off", coalesce(sum(col("_rr_cnt")).over(
        offW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_rr_gn", sum(col("_rr_cnt")).over(gnW))
      .select(keys.map(k => col(k).as(s"_rr_k_$k")) ++
        Seq(col("_rr_m0"), col("_rr_off"), col("_rr_gn")): _*)
    // NULL-SAFE join back: `Window.partitionBy(group)` ranks a NULL
    // group as its own ordinary group, and bit-equality with the window
    // form is the contract — a null-unsafe equi-join would silently DROP
    // every NULL-group row instead
    val cond = keys.map(k => col(k) <=> col(s"_rr_k_$k")).reduce(_ && _)
    val ranked = parted.join(broadcast(offs), cond)
      .drop(keys.map(k => s"_rr_k_$k"): _*)
      .withColumn(rankName,
        (col("_rr_mid") - col("_rr_m0") + 1L + col("_rr_off")).cast("int"))
    val withCount = groupCountName match {
      case Some(n) => ranked.withColumn(n, col("_rr_gn"))
      case None    => ranked
    }
    withCount.drop("_rr_pid", "_rr_mid", "_rr_m0", "_rr_off", "_rr_gn")
  }

  /** Exact running SUM of `valueCol` over `orderCols` within each group —
    * bit-identical to `sum(v).over(Window.partitionBy(groups)
    * .orderBy(order).rowsBetween(unboundedPreceding, currentRow))` for
    * EXACT value types (integral / decimal — asserted below: the offset
    * decomposition re-associates addition, which a float/double running
    * sum is not invariant under; ulp drift from the sequential window
    * form would break the bit-equality contract), with
    * no corpus-bound window partition: the same range-stage + pinned
    * layout as [[rank]], per-(partition, group) VALUE sums turned into
    * broadcast offsets, and the only data-sized window partitioned by
    * (partition id, group) — one range slice per task, never one group
    * per task. This is what sequence PACKING needs at 100 TB: a
    * per-stratum running token total where one stratum may be most of
    * the corpus. */
  def cumSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
      valueCol: String, cumName: String): DataFrame = {
    import org.apache.spark.sql.types._
    val vt = df.schema(valueCol).dataType
    val exact = vt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    require(exact,
      s"cumSum($valueCol): exact (integral/decimal) value type required " +
        s"for bit-equality with the window running sum; got ${vt.simpleString}")
    // both paths must agree on the result TYPE too: the window sum's
    // result type is the contract (the distributed offset addition could
    // widen a decimal once more)
    val sumType = df.select(sum(col(valueCol)).as("s")).schema.head.dataType
    if (smallInput(df)) {
      val w = (if (groupCols.isEmpty) Window.orderBy(orderCols: _*)
        else Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return df.withColumn(cumName, sum(col(valueCol)).over(w))
    }
    val parted = graft.model.Stage.pin(staged(df, groupCols, orderCols))
    val keys = "_rr_pid" +: groupCols
    val grpStats = parted.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("_rr_cnt"))
    val offW =
      if (groupCols.isEmpty) Window.orderBy(col("_rr_pid"))
      else Window.partitionBy(groupCols.map(col): _*).orderBy(col("_rr_pid"))
    val offs = grpStats
      .withColumn("_rr_off", coalesce(sum(col("_rr_cnt")).over(
        offW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(keys.map(k => col(k).as(s"_rr_k_$k")) :+ col("_rr_off"): _*)
    val cond = keys.map(k => col(k) <=> col(s"_rr_k_$k")).reduce(_ && _)
    // the running sum within the range slice: window partition =
    // (pid, group) = one slice of one partition — bounded by the range
    // partitioner's row balance, NOT by group size
    val localW = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted.join(broadcast(offs), cond)
      .drop(keys.map(k => s"_rr_k_$k"): _*)
      .withColumn(cumName,
        (sum(col(valueCol)).over(localW) + col("_rr_off")).cast(sumType))
      .drop("_rr_pid", "_rr_mid", "_rr_off")
  }
}
