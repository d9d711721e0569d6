package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import graft.pipeline.{ParquetSink, Registry, TableLayout}

/** Train-once / serve-many lifecycle for the IVF coarse quantizer.
  *
  * [[Similarity.ivfCentroids]] is the training pass — two full Lloyd
  * sweeps over the embeddings table. A production vector pipeline builds
  * that index ONCE and serves many lookups from it; rebuilding it inside
  * every `annIvf*` call (the round-3 shape) multiplied each query's cost
  * by the training scans. This object owns the index's storage lifecycle:
  *
  *  - the centroid table is a first-class materialized model written
  *    through the same [[graft.pipeline.TableSink]] machinery as every
  *    other table (staged-rename atomic overwrite, read-back barrier);
  *  - the cache key is a content fingerprint of the embeddings parquet
  *    (file names + lengths + mtimes), so a data refresh retrains and an
  *    unchanged table never does;
  *  - [[Registry.Model]] integration ([[registryModel]]) lets a pipeline
  *    schedule the index build as a DAG node (`dbt run -s ann_ivf_index`)
  *    exactly like a gold mart.
  *
  * Correctness is unchanged: training is deterministic (fixed init, fixed
  * iterations, order-independent grid-quantized means — see
  * [[Similarity.ivfCentroids]]), and doubles round-trip parquet exactly,
  * so served centroids are bit-identical to freshly-trained ones and the
  * DuckDB oracle (which replays training in SQL) still hash-matches.
  */
object IvfIndex {

  /** Quantizer trainings this JVM has run (incremented by
    * [[Similarity.ivfCentroids]]) — the test-visible proof that a
    * warm-index query path executes ZERO Lloyd iterations. */
  val trainings = new java.util.concurrent.atomic.AtomicLong(0)

  /** Runtime conf key selecting the warehouse root for cached index
    * tables — a SESSION-scoped seam, not a mutable JVM global (two
    * concurrent sessions can point at different warehouses without
    * racing a `@volatile var`). Resolution: session conf, then the
    * `graft.ann.index.root` system property (launcher-level override),
    * then a shared JVM-tmpdir default that keeps the driver's
    * (spark, dir) query contract self-contained; a deployment points it
    * at the real warehouse. */
  val RootKey = "spark.graft.ann.index.root"

  def cacheRoot(spark: SparkSession): String =
    spark.conf.getOption(RootKey).map(_.trim).filter(_.nonEmpty)
      .getOrElse(sys.props.getOrElse("graft.ann.index.root",
        s"${sys.props("java.io.tmpdir")}/graft_ann_index"))

  private val layer = "ann"

  /** Algorithm-version component of every cache key: the cacheRoot
    * persists across JVM runs, so a code change to the training recipe
    * must invalidate cached indexes built by the old code (otherwise a
    * stale index serves results that diverge from the oracle's SQL
    * replay of the NEW recipe, with no visible cause). The training
    * constants stay in the literal; the RECIPE itself — norm pass,
    * sampling predicate, init rule, Lloyd step (grid quantization,
    * tie-break), list build, the ivfK sizing rule, and the native
    * expressions' internals — is covered by [[AnnIdentity.ivfRecipeHash]]
    * (plan hashes over the extracted build derivations plus sentinel
    * value fingerprints), so a one-expression recipe edit moves the key
    * without a human remembering a bump. Bump the literal only for what
    * neither can see: driver-side Lloyd mechanics (`localized`'s
    * collect/sort), iteration semantics beyond the count, storage
    * layout, commit protocol. */
  private[ops] def algoVersion(spark: SparkSession): String =
    s"a2i${Similarity.IvfIters}t${Similarity.IvfTrainPerCentroid}" +
      s"k${Similarity.IvfKMin}_${Similarity.IvfKMax}" +
      s"r${AnnIdentity.ivfRecipeHash(spark)}"

  /** Content fingerprint of a source table (the embeddings by default —
    * other content-keyed caches pass their own table, e.g. [[Bpe]]'s
    * dictionary memo over the documents): md5 over the absolute
    * path plus every data file's (root-relative path, length, mtime),
    * directories walked recursively — the relative path (not the bare
    * name) so files swapped between partition subdirectories change the
    * fingerprint. Metadata-only — the same cost class as planning the
    * scan, never a job. */
  def fingerprint(spark: SparkSession, dir: String,
      table: String = "embeddings.parquet"): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val rootUri = p.toUri.getPath
    def rel(st: org.apache.hadoop.fs.FileStatus): String =
      st.getPath.toUri.getPath.stripPrefix(rootUri)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[String] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.sortBy(_.getPath.getName).flatMap(walk)
      else Seq(s"${rel(st)}:${st.getLen}:${st.getModificationTime}")
    val desc = (p.toString +: walk(fs.getFileStatus(p))).mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build-if-absent through a process-unique staging name: ParquetSink's
    * own staging path is deterministic, so two JVMs sharing the
    * persistent cacheRoot (a Verify and a Bench run) could interleave
    * writes and rename a corrupt directory into place. Building under a
    * UUID name and renaming into the final name only if still absent
    * makes concurrent cold builds last-writer-loses instead of
    * corrupting; the losing build's staging table is dropped. */
  private[ops] def buildIfAbsent(spark: SparkSession, sink: ParquetSink,
      name: String, layout: TableLayout = TableLayout.none)
      (build: => DataFrame): Unit = {
    if (sink.exists(spark, layer, name)) return
    val tmp = s"${name}_b${java.util.UUID.randomUUID.toString.take(8)}"
    sink.overwrite(spark, layer, tmp, build, layout)
    val fs = new org.apache.hadoop.fs.Path(cacheRoot(spark))
      .getFileSystem(spark.sessionState.newHadoopConf())
    val src = new org.apache.hadoop.fs.Path(s"${cacheRoot(spark)}/$layer/$tmp")
    val dst = new org.apache.hadoop.fs.Path(s"${cacheRoot(spark)}/$layer/$name")
    renameIfAbsent(fs, src, dst)
    ()
  }

  /** Move `src` into place at `dst` unless `dst` already exists, in which
    * case another process won the cold-build race and `src` is dropped
    * (its index is equally valid). Returns true iff `src` became `dst`.
    *
    * A bare `fs.rename(src, dst)` is NOT a safe last-writer-loses
    * primitive here: on RawLocalFileSystem a failed `File.renameTo`
    * (e.g. dst is a non-empty directory) falls through to
    * `FileUtil.copy`, whose checkDest NESTS src *inside* the existing
    * dst directory and reports success — the losing JVM's staging table
    * would land inside the winner's cached table and corrupt every later
    * read of the index. So: treat an existing dst as a lost race before
    * renaming, and afterwards verify the copy-fallback signature (our
    * staging directory nested under dst) did not appear in the window
    * between the check and the rename, repairing if it did. */
  private[graft] def renameIfAbsent(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    if (fs.exists(dst)) { fs.delete(src, true); return false }
    val renamed =
      try fs.rename(src, dst)
      catch { case _: java.io.IOException => false }
    if (!renamed) { if (fs.exists(src)) fs.delete(src, true); return false }
    val nested = new org.apache.hadoop.fs.Path(dst, src.getName)
    if (fs.exists(nested)) {
      // dst appeared between the exists check and the rename and the
      // rename degraded to a nesting copy: undo it, keep the winner's dst
      fs.delete(nested, true)
      if (fs.exists(src)) fs.delete(src, true)
      false
    } else true
  }

  // ---- Deletion lifecycle (takedown/opt-out) ----
  //
  // A deletion ledger per corpus fingerprint: tombstone directories
  // `t=<n>/` of vec_id, committed by [[deleteVectors]] with the same
  // staged-rename discipline as every other write. Readers of the
  // row-level index tables (lists, int8/PQ codes, LSH signatures)
  // anti-join the ledger — a delete is visible immediately, at the cost
  // of one tiny broadcast join. [[compactIndex]] then makes deletions
  // PHYSICAL: it snapshots the surviving corpus, deterministically
  // retrains + rebuilds every index table from it (so the folded index
  // is bit-identical to one built on a corpus that never contained the
  // deleted vectors — the same Lloyd determinism the streaming rebuild
  // path pins), and sweeps the previous generation's tables from disk.
  // Between a delete and its fold the TRAINED models (centroids, PQ
  // codebooks) are served stale — correct (they are approximation
  // parameters, not data rows; no serving path can return a deleted id)
  // and exactly the FAISS-style economics: cheap logical delete at
  // takedown cadence, one corpus-priced rebuild at compaction cadence.
  // The ledger itself (a few longs per takedown) is retained as the
  // audit trail until the corpus fingerprint changes.

  /** The deletion ledger root for `dir`'s corpus. */
  def defaultLedger(spark: SparkSession, dir: String): String =
    s"${cacheRoot(spark)}/$layer/del_${fingerprint(spark, dir)}"

  private def resolveLedger(spark: SparkSession, dir: String,
      ledger: Option[String]): String =
    ledger.getOrElse(defaultLedger(spark, dir))

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def tombDirIds(spark: SparkSession, led: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(led)
    val fs = fsOf(spark, led)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("t=")).map(_.stripPrefix("t=").toInt)
  }

  /** Highest tombstone id already folded into a survivor-corpus
    * generation (marker dirs `folded_<m>`), or -1. */
  private def foldedMark(spark: SparkSession, led: String): Int = {
    val p = new org.apache.hadoop.fs.Path(led)
    val fs = fsOf(spark, led)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("folded_")).map(_.stripPrefix("folded_").toInt)
      .foldLeft(-1)(math.max)
  }

  /** EVERY deleted vec_id (folded or pending), distinct — or None when
    * the ledger is empty, the fast path that keeps zero-deletion plans
    * (and their DPP/broadcast pins) bit-identical to the pre-deletion
    * engine. Anti-joining an already-folded id is a no-op, so readers
    * apply the whole ledger and never need the folded/pending split. */
  def deletedIds(spark: SparkSession, led: String): Option[DataFrame] = {
    val ids = tombDirIds(spark, led).sorted
    if (ids.isEmpty) None
    else Some(ids.map(n => spark.read.parquet(s"$led/t=$n"))
      .reduce(_ unionByName _).select("vec_id").distinct())
  }

  /** Delete vectors from the index: commits `vecIds` (a `vec_id` column)
    * as a tombstone directory in the ledger — one atomic rename. Visible
    * to every row-level serving path immediately; physical after the
    * next [[compactIndex]]. */
  def deleteVectors(spark: SparkSession, led: String,
      vecIds: DataFrame): Unit = {
    val fs = fsOf(spark, led)
    val n = (tombDirIds(spark, led) :+ foldedMark(spark, led) :+ -1).max + 1
    val staging = s"$led/.staging/${java.util.UUID.randomUUID.toString.take(12)}"
    vecIds.select(col("vec_id").cast("long").as("vec_id")).distinct()
      .write.parquet(staging)
    val dst = new org.apache.hadoop.fs.Path(s"$led/t=$n")
    fs.mkdirs(dst.getParent)
    require(renameIfAbsent(fs, new org.apache.hadoop.fs.Path(staging), dst),
      s"tombstone $n already committed")
  }

  /** The physical corpus a generation's tables are built from: the raw
    * `dir` until a fold has happened, afterwards the newest survivor
    * snapshot under the ledger. Cache keys are fingerprints of THIS
    * directory, so a fold re-keys (and therefore rebuilds) every table
    * exactly once. */
  def effectiveDir(spark: SparkSession, dir: String,
      ledger: Option[String] = None): String = {
    val led = resolveLedger(spark, dir, ledger)
    val m = foldedMark(spark, led)
    if (m < 0) dir else s"$led/corpus_d$m"
  }

  /** Anti-join the deletion ledger onto a served row-level table — the
    * read-side half of the lifecycle. The ledger is takedown-sized
    * (orders of magnitude below the corpus), so it broadcasts. */
  private[ops] def minusDeleted(spark: SparkSession, df: DataFrame,
      led: String): DataFrame =
    deletedIds(spark, led) match {
      case Some(d) => df.join(broadcast(d), Seq("vec_id"), "left_anti")
      case None => df
    }

  /** Fold pending deletions into a new physical generation: snapshot the
    * surviving corpus, retrain + rebuild every index table from it
    * (deterministic, so the result is bit-identical to a fresh build on
    * a corpus that never held the deleted vectors), and sweep the
    * previous generation's tables. Crash-safe: the survivor snapshot
    * commits by atomic rename, the `folded_<m>` marker flips readers
    * atomically, and a crash in between just re-runs idempotently. */
  def compactIndex(spark: SparkSession, dir: String,
      ledger: Option[String] = None): Unit = synchronized {
    val led = resolveLedger(spark, dir, ledger)
    val m = foldedMark(spark, led)
    val pending = tombDirIds(spark, led).filter(_ > m)
    if (pending.isEmpty) return
    val newM = pending.max
    val prevEff = effectiveDir(spark, dir, ledger)
    val prevFp = fingerprint(spark, prevEff)
    val fs = fsOf(spark, led)
    // 1. survivor snapshot: generation-m corpus minus the whole ledger
    val del = deletedIds(spark, led).get
    val staging = s"$led/.staging/${java.util.UUID.randomUUID.toString.take(12)}"
    spark.read.parquet(s"$prevEff/embeddings.parquet")
      .join(broadcast(del), Seq("vec_id"), "left_anti")
      .write.parquet(s"$staging/embeddings.parquet")
    val snapDst = new org.apache.hadoop.fs.Path(s"$led/corpus_d$newM")
    renameIfAbsent(fs, new org.apache.hadoop.fs.Path(staging), snapDst)
    require(fs.exists(snapDst), "survivor snapshot failed to commit")
    // 2. flip readers to the new generation
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$led/folded_$newM"))
    // 3. warm the generation eagerly — the fold IS the rebuild, so
    //    queries never pay a cold build mid-serving
    centroids(spark, dir, ledger)
    lists(spark, dir, ledger)
    pqCodebooks(spark, dir, ledger)
    int8Codes(spark, dir, ledger)
    pqCodes(spark, dir, ledger)
    // 4. sweep the previous generation: every cached table keyed by the
    //    old corpus fingerprint (they still carry deleted rows at rest),
    //    plus the old survivor snapshot
    val tables = new org.apache.hadoop.fs.Path(s"${cacheRoot(spark)}/$layer")
    if (fs.exists(tables)) fs.listStatus(tables).toSeq.foreach { st =>
      val n = st.getPath.getName
      if (n.endsWith(s"_$prevFp") && !n.startsWith("del_") &&
          !n.startsWith("corpus_"))
        fs.delete(st.getPath, true)
    }
    if (m >= 0)
      fs.delete(new org.apache.hadoop.fs.Path(s"$led/corpus_d$m"), true)
  }

  /** The trained centroid table for `dir`'s embeddings: read from the
    * index warehouse when present, trained-and-materialized once when not.
    * Serialized JVM-wide so concurrent queries share one build;
    * cross-process races resolve via [[buildIfAbsent]]. Trained on the
    * deletion ledger's current GENERATION (stale toward pending deletes
    * until [[compactIndex]] folds them — approximation parameters, not
    * data rows). */
  def centroids(spark: SparkSession, dir: String,
      ledger: Option[String] = None): DataFrame = synchronized {
    val eff = effectiveDir(spark, dir, ledger)
    val sink = new ParquetSink(cacheRoot(spark))
    val name = s"ivf_${algoVersion(spark)}_${fingerprint(spark, eff)}"
    buildIfAbsent(spark, sink, name)(Similarity.ivfCentroids(spark, eff))
    sink.read(spark, layer, name)
  }

  /** The inverted lists for `dir`'s embeddings, materialized PARTITIONED
    * BY `centroid_id` — the directory layout is the index structure
    * itself: a probe of p lists is a p-directory read (Spark's dynamic
    * partition pruning skips the rest when the tiny probe side joins on
    * the partition column), so query cost tracks nprobe/k, not N. Built
    * once per data fingerprint from the cached [[centroids]]; doubles
    * round-trip parquet exactly, so served lists are bit-identical to a
    * fresh assignment pass.
    *
    * The partition column comes back from parquet directory names typed
    * int and ordered last — normalized here so serving is
    * indistinguishable from the inline build. */
  def lists(spark: SparkSession, dir: String,
      ledger: Option[String] = None): DataFrame = synchronized {
    minusDeleted(spark, listsRaw(spark, dir, ledger),
      resolveLedger(spark, dir, ledger))
  }

  /** The generation's list table WITHOUT the ledger anti-join — the
    * build seam: tables derived from the lists (int8/PQ codes) must bake
    * in only the GENERATION (their cache key), never the pending ledger,
    * or a later delete would silently poison a fingerprint-keyed cache. */
  private def listsRaw(spark: SparkSession, dir: String,
      ledger: Option[String]): DataFrame = synchronized {
    val eff = effectiveDir(spark, dir, ledger)
    val sink = new ParquetSink(cacheRoot(spark))
    val name = s"ivf_lists_${algoVersion(spark)}_${fingerprint(spark, eff)}"
    // repartition on the partition key so each list directory gets one
    // file instead of one-per-writing-task — without it a k-way
    // partitionBy from t tasks can write t×k small files (measured: the
    // 10× cold build was dominated by exactly that)
    buildIfAbsent(spark, sink, name,
      TableLayout(partitionBy = Seq("centroid_id")))(
      Similarity.buildIvfLists(spark, eff, centroids(spark, dir, ledger))
        .repartition(col("centroid_id")))
    sink.read(spark, layer, name)
      .select(col("vec_id"), col("centroid_id").cast("long").as("centroid_id"),
        col("vec"), col("nrm"))
  }

  /** Version key for the PQ codebook cache — the PQ geometry constants
    * in the literal; the slicing/training/encode RECIPE covered by
    * [[AnnIdentity.pqRecipeHash]] (see [[algoVersion]]'s coverage note). */
  private[ops] def pqAlgoVersion(spark: SparkSession): String =
    s"m${Similarity.PqSubspaces}k${Similarity.PqK}" +
      s"i${Similarity.IvfIters}t${Similarity.IvfTrainPerCentroid}" +
      s"r${AnnIdentity.pqRecipeHash(spark)}"

  /** The trained PQ codebooks for `dir`'s embeddings — same train-once /
    * serve-many lifecycle as [[centroids]]: a 100 TB embedding store
    * trains its product quantizer once per corpus refresh and every ADC
    * query serves from the materialized codebook table (all four
    * subspace codebooks in one table, `subspace` column); rebuilding
    * them inside each [[Similarity.annPqAdc]] call made it the suite's
    * most expensive query (4.5 s at sf0.1, dominated by 4 Lloyd loops).
    * Doubles round-trip parquet exactly, so served codebooks are
    * bit-identical to freshly-trained ones and the oracle's SQL replay
    * still hash-matches. */
  def pqCodebooks(spark: SparkSession, dir: String,
      ledger: Option[String] = None): DataFrame = synchronized {
    val eff = effectiveDir(spark, dir, ledger)
    val sink = new ParquetSink(cacheRoot(spark))
    val name = s"pq_${pqAlgoVersion(spark)}_${fingerprint(spark, eff)}"
    buildIfAbsent(spark, sink, name)(Similarity.pqCodebooks(spark, eff))
    sink.read(spark, layer, name)
  }

  /** Compressed-code encode passes this JVM has run (int8 + PQ) — the
    * test-visible proof that a warm compressed query path scans codes at
    * rest and re-quantizes NOTHING. */
  val codeBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  /** Version of the int8 code table: the quantization RECIPE
    * (scale = max|v|/127, round half-up codes, zero-vector scale 1.0,
    * VecDotInt's accumulator) is covered by
    * [[AnnIdentity.int8RecipeHash]]; the literal tracks the table SHAPE
    * (c2: codes carry their IVF list id at rest, partitioned by it). */
  private def int8Version(spark: SparkSession): String =
    s"c2r${AnnIdentity.int8RecipeHash(spark)}"

  /** Version of the PQ code-table shape (c2 = ivf_centroid co-materialized
    * + partitioned) — orthogonal to [[pqAlgoVersion]], which tracks the
    * training recipe the codes were encoded against. */
  private val PqCodesVersion = "c2"

  /** Each vector's IVF list id, `(vec_id, ivf_centroid)` — the assignment
    * the code builds below co-materialize so candidate generation can
    * restrict a code scan to probed lists WITHOUT a query-time join of two
    * corpus-sized tables. Derived from the cached [[lists]] table (itself
    * built once per corpus fingerprint). */
  private def ivfAssignment(spark: SparkSession, dir: String,
      ledger: Option[String]): DataFrame =
    listsRaw(spark, dir, ledger).select(col("vec_id"),
      col("centroid_id").as("ivf_centroid"))

  /** The int8 code table `(vec_id, scale, q, qq, ivf_centroid)` for `dir`'s
    * embeddings — quantize-on-write materialized once per corpus
    * fingerprint, so the compressed serving path
    * ([[Similarity.annInt8TopK]]) reads 4×-smaller codes at rest instead of
    * re-quantizing the float corpus per query. The vector's IVF list id is
    * joined ONCE here at build time and the table is PARTITIONED BY it, so
    * a probe-restricted consumer prunes to nprobe directories via DPP —
    * the join that would otherwise shuffle two corpus-sized tables per
    * query batch happens exactly once per corpus refresh. At 100 TB this
    * is the difference between the compressed index fitting in cluster RAM
    * and every query re-paying a full float scan. */
  def int8Codes(spark: SparkSession, dir: String,
      ledger: Option[String] = None): DataFrame = synchronized {
    val led = resolveLedger(spark, dir, ledger)
    val eff = effectiveDir(spark, dir, ledger)
    val sink = new ParquetSink(cacheRoot(spark))
    val name = s"int8_codes_${int8Version(spark)}_${fingerprint(spark, eff)}"
    buildIfAbsent(spark, sink, name,
      TableLayout(partitionBy = Seq("ivf_centroid"))) {
      codeBuilds.incrementAndGet()
      Similarity.int8Codes(spark, eff)
        .join(ivfAssignment(spark, dir, ledger), Seq("vec_id"))
        .repartition(col("ivf_centroid"))
    }
    // partition column comes back from directory names typed int and
    // ordered last — normalize so serving matches the build shape
    minusDeleted(spark, sink.read(spark, layer, name)
      .select(col("vec_id"), col("scale"), col("q"), col("qq"),
        col("ivf_centroid").cast("long").as("ivf_centroid")), led)
  }

  /** The PQ code table `(vec_id, subspace, centroid_id, ivf_centroid)` —
    * encode-on-write against the cached codebooks ([[pqCodebooks]]),
    * materialized once per corpus fingerprint WITH each vector's IVF list
    * id and PARTITIONED BY it (same rationale as [[int8Codes]]: the
    * two-stage rerank's candidate generation prunes this scan to probed
    * lists via DPP instead of joining the assignment per query). ADC
    * serving then touches only codes + broadcast lookup tables: the
    * 128×-compressed scan PQ exists for. */
  def pqCodes(spark: SparkSession, dir: String,
      ledger: Option[String] = None): DataFrame = synchronized {
    val led = resolveLedger(spark, dir, ledger)
    val eff = effectiveDir(spark, dir, ledger)
    val sink = new ParquetSink(cacheRoot(spark))
    val name =
      s"pq_codes_${PqCodesVersion}_${pqAlgoVersion(spark)}_${fingerprint(spark, eff)}"
    buildIfAbsent(spark, sink, name,
      TableLayout(partitionBy = Seq("ivf_centroid"))) {
      codeBuilds.incrementAndGet()
      Similarity.pqAssignCodes(spark, eff, pqCodebooks(spark, dir, ledger))
        .join(ivfAssignment(spark, dir, ledger), Seq("vec_id"))
        .repartition(col("ivf_centroid"))
    }
    minusDeleted(spark, sink.read(spark, layer, name)
      .select(col("vec_id"), col("subspace"), col("centroid_id"),
        col("ivf_centroid").cast("long").as("ivf_centroid")), led)
  }

  /** Drop every cached index under [[cacheRoot]] (tests; data migrations
    * would instead let fingerprints age out naturally). */
  def clearCache(spark: SparkSession): Unit = synchronized {
    val p = new org.apache.hadoop.fs.Path(cacheRoot(spark))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The index build as a schedulable DAG node: `Registry.run` with this
    * model materializes the centroid table through the run's sink like any
    * other table model, giving the index the same refresh cadence,
    * selectors, and atomicity as the marts it serves. */
  val registryModel: Registry.Model =
    Registry.Model("ann_ivf_index", layer, Registry.Table, Seq.empty,
      (s, dir, _) => Similarity.ivfCentroids(s, dir))

  /** The inverted-lists table as a DAG node downstream of the quantizer —
    * `Registry.run` rebuilds centroids then lists in dependency order,
    * landing the lists partitioned by `centroid_id` like [[lists]] does. */
  val listsRegistryModel: Registry.Model =
    Registry.Model("ann_ivf_lists", layer, Registry.Table, Seq("ann_ivf_index"),
      (s, dir, up) => Similarity.buildIvfLists(s, dir, up("ann_ivf_index")),
      layout = TableLayout(partitionBy = Seq("centroid_id")))

  /** The PQ codebook build as a DAG node, same refresh cadence and
    * selectors as the marts ADC serving depends on. */
  val pqRegistryModel: Registry.Model =
    Registry.Model("ann_pq_codebooks", layer, Registry.Table, Seq.empty,
      (s, dir, _) => Similarity.pqCodebooks(s, dir))

  /** The int8 code table as a DAG node — quantize-on-write scheduled with
    * the same cadence as the embedding refresh it compresses; downstream of
    * the lists so each code row lands with its IVF list id, partitioned by
    * it (the [[int8Codes]] shape). */
  val int8RegistryModel: Registry.Model =
    Registry.Model("ann_int8_codes", layer, Registry.Table,
      Seq("ann_ivf_lists"),
      (s, dir, up) => Similarity.int8Codes(s, dir)
        .join(up("ann_ivf_lists").select(col("vec_id"),
          col("centroid_id").cast("long").as("ivf_centroid")), Seq("vec_id"))
        .repartition(col("ivf_centroid")),
      layout = TableLayout(partitionBy = Seq("ivf_centroid")))

  /** The deletion fold as a schedulable DAG node: applies
    * [[compactIndex]] to the default ledger and materializes a one-row
    * receipt — takedowns accumulate cheaply via [[deleteVectors]] between
    * runs, and the pipeline's own cadence (daily, weekly) decides when
    * the corpus-priced physical rebuild happens. */
  val compactRegistryModel: Registry.Model =
    Registry.Model("ann_index_compact", layer, Registry.Table, Seq.empty,
      (s, dir, _) => {
        compactIndex(s, dir)
        val led = defaultLedger(s, dir)
        val nDeleted = deletedIds(s, led).map(_.count()).getOrElse(0L)
        s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            foldedMark(s, led), nDeleted)),
          org.apache.spark.sql.types.StructType.fromDDL(
            "folded_mark INT, deleted_ids BIGINT"))
      })

  /** The PQ code table as a DAG node downstream of the codebooks AND the
    * lists — `Registry.run` trains codebooks then encodes in dependency
    * order, landing codes with their IVF list id like [[pqCodes]]. */
  val pqCodesRegistryModel: Registry.Model =
    Registry.Model("ann_pq_codes", layer, Registry.Table,
      Seq("ann_pq_codebooks", "ann_ivf_lists"),
      (s, dir, up) => Similarity.pqAssignCodes(s, dir, up("ann_pq_codebooks"))
        .join(up("ann_ivf_lists").select(col("vec_id"),
          col("centroid_id").cast("long").as("ivf_centroid")), Seq("vec_id"))
        .repartition(col("ivf_centroid")),
      layout = TableLayout(partitionBy = Seq("ivf_centroid")))
}
