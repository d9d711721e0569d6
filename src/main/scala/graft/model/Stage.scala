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

  /** Local-fallback stage directories created by [[pinColumnar]] this
    * JVM — tracked so [[clear]] (and the JVM-exit hook) can delete them;
    * without the per-run clear, a long-lived session repeatedly
    * evaluating dq summaries accumulates tmp-disk for the process
    * lifetime. */
  private val localStages =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def scratchDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty)
      .map(_.stripSuffix("/"))

  /** This application's OWN subtree of the scratch dir. Stage paths embed
    * `sparkContext.applicationId` — the one identifier the cluster
    * manager guarantees unique per application — precisely because the
    * realistic fleet deployment points MANY concurrent applications at
    * one shared scratch location (`hdfs:///tmp/graft-stage`): a
    * JVM-local discriminator (an identity hash, a counter) is not unique
    * across JVMs and two apps could generate the same path, killing an
    * innocent job on the ErrorIfExists write. The id is assigned once at
    * application start (no per-pin wall clock), so paths stay
    * deterministic within a run. */
  private[model] def appSubtree(dir: String, appId: String): String =
    s"$dir/app-$appId"

  private def stagePath(spark: SparkSession, dir: String): String =
    s"${appSubtree(dir, spark.sparkContext.applicationId)}" +
      s"/stage-${counter.incrementAndGet()}"

  /** Freeze one evaluation of `df` (see object doc for backend choice). */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    scratchDir(spark) match {
      case Some(dir) =>
        // unique per pin: the cluster-manager-unique applicationId scopes
        // the subtree to THIS app; the JVM-wide counter separates pins
        // within it (two sessions of one SparkContext share the app id
        // AND the counter, so they cannot collide either)
        val path = stagePath(spark, dir)
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
        val path = stagePath(spark, dir)
        df.write.parquet(path)
        spark.read.parquet(path)
      case None if spark.sparkContext.isLocal =>
        // single-JVM fallback: a shutdown-hook-cleaned tmpdir — every
        // executor IS the driver, so a driver-local path is readable
        val path = s"$localScratch/stage-${counter.incrementAndGet()}"
        df.write.parquet(path)
        localStages.add(path)
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

  /** The DataFrame's parquet stage location when (and only when) the
    * frame is one [[pinColumnar]]/[[pin]] just returned — recovered from
    * the plan's file index so callers that can exploit the staged files'
    * FOOTERS (e.g. answering `not_null` checks from null-count
    * statistics without a row scan) need no side-channel. None for the
    * `localCheckpoint` backends (no files to read footers from), and
    * None for ANY transformed frame: the match demands the plan BE the
    * bare scan (modulo aliasing) — a Filter/Project/Join on top means
    * the files no longer describe the frame's rows, and a path returned
    * for them would let a caller read footers that contradict the
    * frame. */
  def parquetPathOf(df: DataFrame): Option[String] = {
    // analyzed, not logical: Spark 4 reads are lazy (UnresolvedDataSource
    // until analysis); analysis is planning-only, never a job
    def strip(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        strip(s.child)
      case other => other
    }
    strip(df.queryExecution.analyzed) match {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if h.location.rootPaths.size == 1 =>
            Some(h.location.rootPaths.head.toString)
          case _ => None
        }
      case _ => None
    }
  }

  /** Release a [[pin]]'s executor-storage blocks NOW instead of waiting
    * for the RDD to be garbage-collected — for callers whose pinned
    * frame is provably DEAD (a local variable whose last action has
    * run). After unpin the frame must never be read again: a
    * localCheckpoint's lineage is truncated, so its blocks are the only
    * copy. Parquet-staged pins are untouched (no LogicalRDD in the
    * plan; their files are reclaimed by [[clear]]/exit hooks and
    * re-reads stay valid). Without an eager release, a build that pins
    * inside a loop (store ingest per crawl shard) parks every
    * iteration's blocks in executor storage until the context cleaner
    * happens to collect them, squeezing execution memory for everything
    * else running in the JVM. */
  def unpin(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** One JVM-wide tmpdir for [[pinColumnar]]'s local fallback, deleted
    * recursively at JVM exit — without the hook, every dq summary's three
    * silver-table stages would outlive the process. */
  private lazy val localScratch: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-stage")
    sys.addShutdownHook { rmTree(p.toFile) }
    p.toString
  }

  /** Delete THIS application's stages — for a caller recycling a per-run
    * scratch location BETWEEN runs of the application (never mid-run, and
    * APPLICATION-wide: every session sharing the JVM/SparkContext shares
    * the app subtree AND the local-fallback queue, so clear only when no
    * session still holds a live pinned frame). Scoped to the app's own
    * [[appSubtree]]: on the shared fleet scratch dir, another
    * application's live stage files are its to delete, not ours —
    * crashed applications' leftovers are reclaimed by [[clearAll]]. Also
    * drops the local-fallback stage dirs [[pinColumnar]] accumulated this
    * JVM, so a long-lived session can reclaim tmp-disk without waiting
    * for the exit hook. */
  def clear(spark: SparkSession): Unit = {
    scratchDir(spark).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(
        appSubtree(dir, spark.sparkContext.applicationId))
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    var path = localStages.poll()
    while (path != null) {
      rmTree(new java.io.File(path))
      path = localStages.poll()
    }
  }

  /** Delete EVERY application's stages under the configured scratch dir —
    * the operator's sweep for a shared fleet scratch location where
    * crashed applications left app subtrees no surviving [[clear]] will
    * ever scope to (an app-scoped clear reclaims only its own subtree by
    * design). Run it only when no application using the dir is live. */
  def clearAll(spark: SparkSession): Unit =
    scratchDir(spark).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
      ()
    }
}
