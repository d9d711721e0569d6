package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable materialization seam for the engine's lineage-truncation /
  * layout-pin points — every place an operator must freeze ONE evaluation
  * of a subplan before reading it twice ([[graft.ops.RangeRank]]'s range
  * stage, the BPE / connected-components / MMR iteration loops, the
  * microbatch batch pin).
  *
  * Two backends, chosen per session by the runtime conf [[DirKey]]:
  *
  *   - **Unset (default, local/bench):** `localCheckpoint()` — blocks
  *     pinned in executor storage. Cheapest (no serialization to a shared
  *     filesystem), but NOT fault-tolerant: on a real cluster an executor
  *     loss discards blocks that were never persisted anywhere else, and
  *     the job aborts loudly (it can never silently recompute a DIFFERENT
  *     evaluation — Spark fails the stage because the blocks are simply
  *     gone). Acceptable for a single-JVM `local[n]` run; not for a
  *     multi-hour 1000-executor rank.
  *   - **`spark.conf.set("spark.graft.stage.dir", <scratch path>)`
  *     (cluster):** each pin writes the frame ONCE as parquet under a
  *     fresh subdirectory of the scratch path (HDFS/object-store in
  *     production) and returns a reader over it. Executor loss during any
  *     downstream stage recomputes from the durable files — the reliable
  *     form the cluster deployment needs — and the pinned bytes live on
  *     the scratch filesystem instead of competing with shuffle/execution
  *     memory on the executors. Columnar + compressed, so downstream
  *     column pruning still applies (a localCheckpoint block is
  *     row-oriented and always deserializes whole rows).
  *
  * Correctness is backend-independent: both forms freeze the frame's ROWS
  * (including nondeterministic columns like `monotonically_increasing_id`
  * and sampled range-exchange boundaries) after one evaluation, which is
  * the only property callers rely on — [[graft.ops.RangeRank]] reads its
  * partition/position ids back as STORED columns, so physical re-read
  * partitioning is free to differ (RangeRankSpec proves bit-identical
  * ranks through both backends).
  *
  * The scratch directory is job-scoped: stage files must outlive every
  * read of the returned frame (the whole action), so nothing here deletes
  * them mid-run — a deployment points [[DirKey]] at a per-run scratch
  * location and recycles the directory between runs ([[clear]] is the
  * explicit form).
  */
object Stage {

  /** Runtime conf key: when set to a non-empty path, [[pin]] stages
    * through durable parquet under it instead of `localCheckpoint`. */
  val DirKey = "spark.graft.stage.dir"

  private val counter = new java.util.concurrent.atomic.AtomicLong(0L)

  def scratchDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty)
      .map(_.stripSuffix("/"))

  /** Freeze one evaluation of `df` (see object doc for backend choice). */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    scratchDir(spark) match {
      case Some(dir) =>
        // unique per pin: a JVM-wide counter + session hash, no wall clock
        // (deterministic-environment discipline) — collisions across
        // concurrent sessions sharing one scratch dir are avoided by the
        // session hash, across pins within a session by the counter
        val path = s"$dir/stage-${System.identityHashCode(spark).toHexString}" +
          s"-${counter.incrementAndGet()}"
        df.write.parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint()
    }
  }

  /** Like [[pin]], but ALWAYS stages through parquet — for WIDE frames
    * with MANY NARROW consumers, where a columnar stage preserves the
    * column pruning a row-oriented `localCheckpoint` block cannot: each
    * dq check branch reads 1–3 columns of the pinned silver tables, and
    * at 100× deserializing full rows per branch measured 2× WORSE than
    * re-deriving the chains (dq_summary 71→155 s), while the columnar
    * stage beats both. Uses the configured scratch dir when set; on a
    * single-JVM (`local[n]`) session it falls back to a shared
    * shutdown-hook-cleaned tmpdir, and on a multi-executor session with
    * NO scratch dir it degrades to `localCheckpoint` — a driver-local
    * tmpdir is unreadable from remote executors, and a correct
    * row-oriented stage beats a columnar one that loses rows. For frames
    * whose consumers read every column (RangeRank's range stage),
    * [[pin]]'s default backend stays the cheaper choice. */
  def pinColumnar(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    scratchDir(spark) match {
      case Some(dir) =>
        val path = s"$dir/stage-${System.identityHashCode(spark).toHexString}" +
          s"-${counter.incrementAndGet()}"
        df.write.parquet(path)
        spark.read.parquet(path)
      case None if spark.sparkContext.isLocal =>
        // single-JVM fallback: a shutdown-hook-cleaned tmpdir — every
        // executor IS the driver, so a driver-local path is readable
        val path = s"$localScratch/stage-" +
          s"${System.identityHashCode(spark).toHexString}" +
          s"-${counter.incrementAndGet()}"
        df.write.parquet(path)
        spark.read.parquet(path)
      case None =>
        // multi-executor with no configured scratch dir: a driver-local
        // tmpdir is NOT readable from the executors (file:// resolves to
        // each machine's own disk) — fall back to the row-oriented but
        // universally-correct localCheckpoint rather than produce a
        // stage that loses rows; configure DirKey to get the columnar
        // form on a cluster
        df.localCheckpoint()
    }
  }

  /** One JVM-wide tmpdir for [[pinColumnar]]'s local fallback, deleted
    * recursively at JVM exit — without the hook, every dq summary's three
    * silver-table stages would outlive the process. */
  private lazy val localScratch: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-stage")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }

  /** Delete everything under the configured scratch dir — for a caller
    * recycling a per-run scratch location BETWEEN runs (never mid-run:
    * live stage frames read their files lazily). No-op when unset. */
  def clear(spark: SparkSession): Unit = scratchDir(spark).foreach { dir =>
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}
