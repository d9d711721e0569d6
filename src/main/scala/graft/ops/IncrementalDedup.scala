package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup detection against a persisted fingerprint store —
  * the production crawl pattern: each arriving shard is fingerprinted ONCE
  * and appended to an index; detection afterwards runs entirely over the
  * index, never re-reading earlier shards' raw text.
  *
  * Store layout (immutable committed directories; every write lands via
  * stage-then-atomic-rename, so a crashed ingest or compaction leaves only
  * ignorable staging garbage, never a half-written batch):
  * {{{
  *   <root>/batches/batch=<i>/reps/  (text_hash, doc_id)  every distinct
  *                                   (text, doc) pair IN THE BATCH
  *   <root>/batches/batch=<i>/fps/   (text_hash, fingerprint) winnowing
  *                                   fingerprints of texts UNSEEN before i
  *   <root>/compact/w=<k>[r<t>]/reps|fps/  all batches ≤ k (and all
  *                                   tombstones seen at fold time) folded;
  *                                   r<t> = tombstone-only rewrite tick
  *   <root>/tombstones/t=<n>/        (doc_id) pending deletions, applied
  *                                   by readers until the next fold
  *   <root>/.staging/<uuid>/         in-flight writes (crash garbage)
  * }}}
  * The member table carries EVERY (text_hash, doc_id) pair — not just a
  * per-batch min — precisely so a doc-level [[delete]] is exact: when a
  * text's representative (min surviving doc id) is deleted, the next
  * surviving member takes over, and when every member of a text is
  * deleted the text (and, at the next fold, its fingerprints) vanish as
  * if never ingested. One row per document is the honest floor for an
  * index that must support per-document takedown.
  * Both halves of a batch commit with ONE rename of the staging directory
  * into `batches/batch=<i>` — there is no window where a batch's texts are
  * marked seen (reps present) without their fingerprints, so a retry after
  * any crash re-fingerprints at most one shard and the index never loses
  * pairs.
  *
  * A text's fingerprints depend only on the text, so a text already in
  * the store is never re-fingerprinted — its new doc ids only feed the
  * min-rep merge. At 100 TB this is the whole economics: per-crawl cost
  * is O(new shard) text processing plus joins over an index that is a few
  * percent of corpus size (fingerprint density ~2/(w+1), 32-hex keys).
  *
  * Compaction ([[compact]], auto-triggered every [[CompactEvery]] ingests)
  * folds the per-batch directories into one generation: reps min-merge
  * (min of mins = min, so generations compose), fps concatenate (disjoint
  * by construction — only unseen texts are ever fingerprinted). Readers
  * take the newest generation plus batches past its watermark, so after
  * thousands of crawls detection lists O(CompactEvery) directories instead
  * of thousands, and the min-rep merge re-aggregates one folded table
  * instead of every batch ever ingested. The generation commits (atomic
  * rename) BEFORE the folded inputs are deleted; a crash between the two
  * leaves stale directories that readers ignore (watermark rule) and the
  * next compaction sweeps.
  *
  * Detection ([[nearDupPairs]]) replays [[Dedup.winnowNearDupFrom]]'s
  * exact pipeline over the index — distinct-text representatives (min
  * doc id across ALL batches), document-frequency bounds, equi-join on
  * fingerprint, ≥ [[Dedup.MinSharedFingerprints]] shared — so its output
  * is bit-equal to the full-corpus operator no matter how the corpus was
  * batched or compacted. The DF cutoff is corpus-global state that
  * single-shard processing cannot know, which is exactly why detection
  * joins the index instead of emitting pairs at ingest time.
  * [[nearDupPairsDelta]] is the serving-path twin: pairs touching ONE new
  * shard, for the per-crawl cadence where re-listing every historic pair
  * is wasted work.
  */
object IncrementalDedup {

  /** Texts fingerprinted by the most recent [[ingest]] JVM-wide — the
    * test-visible proof that re-ingesting overlapping shards re-hashes
    * only genuinely new texts. */
  val lastIngestFingerprinted = new AtomicLong(-1L)

  /** Compactions run JVM-wide (test-visible). */
  val compactions = new AtomicLong(0L)

  /** Ingests between compactions: once this many batch directories sit
    * past the newest generation's watermark, [[ingest]] folds them. Small
    * enough that detection never lists more than a handful of directories;
    * large enough that a crawl isn't paying a full-index rewrite per
    * shard. */
  val CompactEvery = 4

  private def batchesRoot(root: String) = s"$root/batches"
  private def compactRoot(root: String) = s"$root/compact"

  private def hadoopFs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Ids of committed batch directories (any generation). */
  private def batchIds(spark: SparkSession, root: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(batchesRoot(root))
    val fs = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toInt)
  }

  /** Committed generations as (watermark, rewriteTick): `w=<k>` parses as
    * (k, 0), `w=<k>r<t>` as (k, t). The tick exists so a TOMBSTONE-ONLY
    * compaction (no new batches, so the watermark cannot advance) can
    * still commit a physically-rewritten generation under a fresh name —
    * staged-rename immutability is preserved, nothing is rewritten in
    * place. */
  private def generations(spark: SparkSession, root: String): Seq[(Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(compactRoot(root))
    val fs = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("w=")).map { n =>
        n.stripPrefix("w=").split('r') match {
          case Array(k) => (k.toInt, 0)
          case Array(k, t) => (k.toInt, t.toInt)
        }
      }
  }

  private def genName(k: Int, t: Int): String =
    if (t == 0) s"w=$k" else s"w=${k}r$t"

  /** The newest generation — max by (watermark, tick); stale older
    * generations (crash leftovers) are ignored. */
  private def newestGen(spark: SparkSession, root: String): Option[(Int, Int)] =
    generations(spark, root).sorted.lastOption

  /** Watermark of the newest compacted generation: the highest batch id it
    * folded, or -1 when no generation exists. */
  private def watermark(spark: SparkSession, root: String): Int =
    newestGen(spark, root).map(_._1).getOrElse(-1)

  private def emptyOf(spark: SparkSession, schemaDdl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))

  /** The store's logical view of `sub` (reps or fps): the newest
    * generation plus every batch past its watermark — O([[CompactEvery]])
    * directories regardless of how many crawls ever ran.
    *
    * The generation is listed ONCE and both the generation read and the
    * batch filter derive from that single snapshot: a [[compact]]
    * committing between two separate listings would pair the OLD
    * generation with the NEW watermark and silently drop every batch
    * folded in between — the concurrent-reader guarantee holds only
    * because `cur` is read exactly once here. */
  private def storeView(spark: SparkSession, root: String, sub: String,
      schemaDdl: String): DataFrame = {
    val cur = newestGen(spark, root)
    val gen = cur.map { case (k, t) =>
      spark.read.parquet(s"${compactRoot(root)}/${genName(k, t)}/$sub")
    }.toSeq
    val w = cur.map(_._1).getOrElse(-1)
    val batches = batchIds(spark, root).filter(_ > w).sorted
      .map(i => spark.read.parquet(s"${batchesRoot(root)}/batch=$i/$sub"))
    (gen ++ batches).reduceOption(_ unionByName _)
      .getOrElse(emptyOf(spark, schemaDdl))
  }

  /** RAW physical membership — every committed (text_hash, doc_id) pair,
    * tombstones NOT applied. This is the seen-text check's view: a text
    * whose fingerprints are still physically present (even when every one
    * of its docs is tombstoned but not yet folded) must NOT be
    * re-fingerprinted — its fps simply revive if the text returns. */
  private def members(spark: SparkSession, root: String): DataFrame =
    storeView(spark, root, "reps", "text_hash STRING, doc_id BIGINT")

  /** LOGICAL membership — raw members minus pending tombstones. Every
    * detection read goes through here, so a delete is visible immediately
    * (long before the fold makes it physical). The tombstone side is a
    * takedown/opt-out ledger — orders of magnitude smaller than the
    * corpus — so the anti-join broadcasts it. */
  private def reps(spark: SparkSession, root: String): DataFrame =
    tombstones(spark, root) match {
      case Some(t) => members(spark, root)
        .join(broadcast(t), Seq("doc_id"), "left_anti")
      case None => members(spark, root)
    }

  private def fps(spark: SparkSession, root: String): DataFrame =
    storeView(spark, root, "fps", "text_hash STRING, fingerprint STRING")

  private def tombRoot(root: String) = s"$root/tombstones"

  private def tombDirIds(spark: SparkSession, root: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(tombRoot(root))
    val fs = hadoopFs(spark, root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("t=")).map(_.stripPrefix("t=").toInt)
  }

  /** Pending deleted doc ids (distinct), or None when no tombstone dir
    * exists — the None fast path keeps the zero-deletion plans (and their
    * PlanSpec pins) bit-identical to the pre-deletion engine. */
  private def tombstones(spark: SparkSession, root: String): Option[DataFrame] = {
    val ids = tombDirIds(spark, root).sorted
    if (ids.isEmpty) None
    else Some(ids.map(n => spark.read.parquet(s"${tombRoot(root)}/t=$n"))
      .reduce(_ unionByName _).select("doc_id").distinct())
  }

  /** Stage `write` under `<root>/.staging/<uuid>` and commit it with one
    * atomic rename to `dst` — [[IvfIndex.renameIfAbsent]] semantics (an
    * existing `dst` wins; the staging directory is dropped). */
  private def commitStaged(spark: SparkSession, root: String,
      dst: String)(write: String => Unit): Boolean = {
    val fs = hadoopFs(spark, root)
    val staging =
      s"$root/.staging/${java.util.UUID.randomUUID.toString.take(12)}"
    write(staging)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    fs.mkdirs(dstPath.getParent)
    IvfIndex.renameIfAbsent(fs, new org.apache.hadoop.fs.Path(staging), dstPath)
  }

  /** Ingest one shard of `(doc_id, text)` rows into the store at `root`
    * as batch `batchId`: the shard's distinct (text, doc) pairs, plus
    * winnowing fingerprints of texts no earlier batch contained, committed
    * together atomically. Returns the number of texts fingerprinted (the
    * expensive work actually done). Batch ids must be monotone: a
    * generation's watermark fences everything at or below it. */
  /** Per-batch distinct (text_hash, doc) membership rows — extracted so
    * [[steadyRecipeHash]] hashes the SAME transform the ingest runs. */
  private def ingestReps(batch: DataFrame): DataFrame =
    batch.select(md5(col("text")).as("text_hash"), col("doc_id"))
      .distinct()

  /** Per-batch distinct texts with min-doc representatives (the
    * re-fingerprint gate's input) — extracted for [[steadyRecipeHash]]. */
  private def ingestNewTexts(batch: DataFrame): DataFrame =
    batch
      .select(col("doc_id"), col("text"), md5(col("text")).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))

  /** The seen-before gate: texts of the batch with no membership row —
    * the join that decides WHICH texts get fingerprinted; extracted for
    * [[steadyRecipeHash]] (an edit to the gate's semantics — e.g.
    * re-basing it on the tombstone-filtered view — changes which texts
    * enter the store and must move the cache key). */
  private def ingestUnseen(newTexts: DataFrame,
      members: DataFrame): DataFrame =
    newTexts.join(members.select("text_hash"), Seq("text_hash"), "left_anti")

  /** The membership view the seen-before gate reads: RAW members,
    * tombstones deliberately NOT applied (a text whose fingerprints are
    * still physically present must not be re-fingerprinted — see
    * [[members]]). Extracted WITH the tombstone frame in scope so
    * [[steadyRecipeHash]] covers the choice itself: re-basing the gate
    * on the tombstone-filtered view (applying the anti-join here) adds
    * the join to the hashed plan and moves the cache key. Ingest must
    * source the gate THROUGH this function — wiring a different view at
    * the call site bypasses the hash and needs a [[SteadyVersion]] bump. */
  private def gateMembers(members: DataFrame,
      tombstones: Option[DataFrame]): DataFrame = members

  /** Winnowing fingerprints of unseen texts — the one text-processing
    * pass of the ingest; extracted for [[steadyRecipeHash]]. */
  private def ingestFps(unseen: DataFrame): DataFrame =
    TextOps.winnowFingerprints(
        unseen.select(col("text_hash").as("doc_id"), col("text")))
      .select(col("doc_id").as("text_hash"), col("fingerprint"))

  def ingest(spark: SparkSession, root: String, batchId: Int,
      batch: DataFrame): Long = {
    require(batchId > watermark(spark, root),
      s"batch $batchId is at or below the compaction watermark")
    val newTexts = ingestNewTexts(batch)
    // seen-before check touches only the index's key column (pruned
    // scan); the gate's view choice (raw members vs tombstone-filtered)
    // lives in [[gateMembers]] so the recipe hash covers it
    val unseen = graft.model.Stage.pin(
      ingestUnseen(newTexts,
        gateMembers(members(spark, root), tombstones(spark, root))))
    val committed = commitStaged(spark, root,
      s"${batchesRoot(root)}/batch=$batchId") { staging =>
      // the one text-processing pass of the ingest: winnow ONLY unseen.
      // (An AQE REBALANCE on these writes was measured in r16 and
      // REVERTED: the extra shuffle cost each replay row +1.2–1.3 s at
      // sf0.1, and at shard scale the task-count files are already
      // shard_bytes/parallelism-sized — the small-files win never
      // materializes where the hint's shuffle is paid.)
      ingestFps(unseen).write.parquet(s"$staging/fps")
      ingestReps(batch).write.parquet(s"$staging/reps")
    }
    require(committed, s"batch $batchId already committed")
    val n = unseen.count()
    // the pin is dead from here (fps written, n counted): release its
    // executor-storage blocks eagerly — a replay/store build ingests
    // many shards per JVM and the parked blocks otherwise squeeze
    // execution memory until the context cleaner runs
    graft.model.Stage.unpin(unseen)
    lastIngestFingerprinted.set(n)
    if (batchIds(spark, root).count(_ > watermark(spark, root)) >= CompactEvery)
      compact(spark, root)
    n
  }

  /** Delete documents from the store: commits `docIds` (a `doc_id`
    * column) as a tombstone directory — one atomic rename, same staging
    * discipline as ingest. The delete is visible to every read
    * immediately (readers anti-join pending tombstones) and becomes
    * PHYSICAL at the next [[compact]], which folds surviving members
    * only and drops the fingerprints of texts left with no member — at
    * which point the store is bit-identical to one that never ingested
    * those docs. A tombstone applies to every copy of the doc id present
    * at fold time; re-ingesting the id (or its text) after the fold
    * revives it — the takedown-then-resubmit cycle. Auto-folds once
    * [[CompactEvery]] tombstone directories accumulate, so a delete-heavy
    * store stays bounded without ingests. */
  def delete(spark: SparkSession, root: String, docIds: DataFrame): Unit = {
    val n = (tombDirIds(spark, root) :+ -1).max + 1
    val committed = commitStaged(spark, root, s"${tombRoot(root)}/t=$n") {
      staging =>
        docIds.select(col("doc_id").cast("long").as("doc_id")).distinct()
          .write.parquet(staging)
    }
    require(committed, s"tombstone $n already committed")
    if (tombDirIds(spark, root).size >= CompactEvery) compact(spark, root)
  }

  /** Fold everything committed so far into one generation: one member
    * table (distinct surviving (text_hash, doc_id) pairs — pending
    * tombstones applied HERE, making deletions physical) and one
    * fingerprint table (per-batch fps are disjoint — only unseen texts
    * are fingerprinted — so concatenation restricted to texts that still
    * have a surviving member is exact; a fully-deleted text's fps are
    * dropped, so a later re-ingest re-fingerprints it like a fresh
    * store). Commits the new generation atomically FIRST, then deletes
    * the folded inputs (batches, the old generation, and the tombstone
    * directories applied); a crash between the two leaves stale
    * directories readers already ignore — and re-applying an
    * already-folded tombstone is a no-op anti-join, so the fold is
    * idempotent. With no new batches a pending delete still folds, under
    * a bumped rewrite tick ([[generations]]). */
  def compact(spark: SparkSession, root: String): Unit = {
    val cur = newestGen(spark, root)
    val w = cur.map(_._1).getOrElse(-1)
    val pending = batchIds(spark, root).filter(_ > w)
    val tombs = tombDirIds(spark, root)
    if (pending.isEmpty && tombs.isEmpty) return
    val fs = hadoopFs(spark, root)
    if (pending.isEmpty && cur.isEmpty) {
      // tombstones against an empty store: nothing to fold them into
      tombs.foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(s"${tombRoot(root)}/t=$n"), true))
      return
    }
    val (newK, newT) =
      if (pending.nonEmpty) (pending.max, 0) else (w, cur.get._2 + 1)
    val foldedReps = reps(spark, root).distinct()
    val foldedFps = fps(spark, root).join(
      foldedReps.select("text_hash").distinct(), Seq("text_hash"), "left_semi")
    val committed = commitStaged(spark, root,
      s"${compactRoot(root)}/${genName(newK, newT)}") { staging =>
      foldedReps.write.parquet(s"$staging/reps")
      foldedFps.write.parquet(s"$staging/fps")
    }
    if (committed) {
      pending.foreach(i => fs.delete(
        new org.apache.hadoop.fs.Path(s"${batchesRoot(root)}/batch=$i"), true))
      cur.foreach { case (k, t) => fs.delete(
        new org.apache.hadoop.fs.Path(s"${compactRoot(root)}/${genName(k, t)}"),
        true) }
      tombs.foreach(n => fs.delete(
        new org.apache.hadoop.fs.Path(s"${tombRoot(root)}/t=$n"), true))
      compactions.incrementAndGet()
    }
    ()
  }

  /** Near-dup pairs over everything ingested so far — reads ONLY the
    * store. Identical semantics (and bit-identical output) to
    * [[Dedup.winnowNearDupFrom]] over the concatenated corpus: reps are
    * min doc id per distinct text across all batches, fingerprint DF
    * bounds are corpus-global, md5(text) equality ≡ text equality. */
  def nearDupPairs(spark: SparkSession, root: String): DataFrame = {
    val rep = reps(spark, root).groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"))
    val fp = fps(spark, root).join(rep, Seq("text_hash"))
      .select("doc_id", "fingerprint")
    val keep = fp.groupBy("fingerprint").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, Dedup.MaxFingerprintDocFrequency))
      .select("fingerprint")
    val f = fp.join(keep, Seq("fingerprint"))
    f.as("a").join(f.as("b"), Seq("fingerprint"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= Dedup.MinSharedFingerprints)
  }

  /** Near-dup pairs TOUCHING one shard — the read-side twin of the
    * unseen-only ingest: a crawl tick dedups its new shard against the
    * whole store without re-listing every historic pair. Output equals
    * [[nearDupPairs]] restricted to pairs where at least one endpoint is
    * the global representative of a text delivered in `batchId`.
    *
    * The DF cutoff stays corpus-global (computed over the full fps index —
    * index-sized, which compaction keeps true); only the PAIR join is
    * restricted: one side is the shard's fingerprint rows, so the join is
    * O(shard × posting-list) instead of O(index × index). Runs before the
    * shard is folded (its batch directory must still exist — the natural
    * per-crawl cadence: ingest, delta-detect, eventually compact). */
  def nearDupPairsDelta(spark: SparkSession, root: String,
      batchId: Int): DataFrame = {
    val shardHashes = spark.read
      .parquet(s"${batchesRoot(root)}/batch=$batchId/reps")
      .select("text_hash").distinct()
      .withColumn("in_shard", lit(true))
    val rep = reps(spark, root).groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"))
    val fp = fps(spark, root).join(rep, Seq("text_hash"))
      .select("text_hash", "doc_id", "fingerprint")
    val keep = fp.groupBy("fingerprint").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, Dedup.MaxFingerprintDocFrequency))
      .select("fingerprint")
    val f = fp.join(keep, Seq("fingerprint"))
      .join(shardHashes, Seq("text_hash"), "left")
      .withColumn("in_shard", coalesce(col("in_shard"), lit(false)))
    // shard side × full side; the (shard, shard) double-emit is removed by
    // keeping the reversed orientation only when the other endpoint is
    // OUTSIDE the shard, so every touching pair surfaces exactly once
    val a = f.filter(col("in_shard"))
      .select(col("fingerprint"), col("doc_id").as("da"))
    val b = f.select(col("fingerprint"), col("doc_id").as("db"),
      col("in_shard").as("b_in_shard"))
    a.join(b, Seq("fingerprint"))
      .filter(col("da") =!= col("db"))
      .filter(col("da") < col("db") || !col("b_in_shard"))
      .groupBy(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= Dedup.MinSharedFingerprints)
  }

  /** Even/odd doc-id split for the driver replay — deterministic,
    * interleaves duplicates across the two shards (unlike a range split),
    * so the replay genuinely exercises the cross-batch rep merge and the
    * already-seen skip path. */
  val ReplayMod = 2

  /** Driver row: replay the corpus as [[ReplayMod]] successive crawl
    * shards through a fresh store, then detect over the index. The oracle
    * is the FULL-CORPUS [[Dedup.winnowNearDupOracle]] — passing means the
    * incremental path is bit-equal to recomputing from scratch. */
  def replay(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.model.Scratch.dir("graft_inc_dedup")
    val docs = TextOps.documents(spark, dir)
    (0 until ReplayMod).foreach { b =>
      ingest(spark, root, b, docs.filter(pmod(col("doc_id"),
        lit(ReplayMod.toLong)) === b))
    }
    nearDupPairs(spark, root)
  }

  /** Driver row: same replay, then [[nearDupPairsDelta]] for the LAST
    * shard — the per-crawl serving query. The oracle restricts the
    * full-corpus pairs to those touching the final shard's texts. */
  def replayDelta(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.model.Scratch.dir("graft_inc_dedup_d")
    val docs = TextOps.documents(spark, dir)
    (0 until ReplayMod).foreach { b =>
      ingest(spark, root, b, docs.filter(pmod(col("doc_id"),
        lit(ReplayMod.toLong)) === b))
    }
    nearDupPairsDelta(spark, root, ReplayMod - 1)
  }

  /** Full-corpus pairs restricted to pairs touching the last replay shard
    * (odd doc ids): the same winnow/DF/pair SQL as
    * [[Dedup.winnowNearDupOracle]], filtered to pairs whose endpoint set
    * intersects the shard's representative docs. */
  def replayDeltaOracle: String =
    s"""WITH ${TextOps.winnowCte(
        "(SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text)")},
    fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM w),
    keep AS (
      SELECT fingerprint FROM fp GROUP BY 1
      HAVING count(*) BETWEEN 2 AND ${Dedup.MaxFingerprintDocFrequency}),
    f AS (SELECT fp.doc_id, fp.fingerprint FROM fp JOIN keep USING (fingerprint)),
    shard AS (
      SELECT r.doc_id FROM
        (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text) r
      JOIN (SELECT DISTINCT text FROM documents
            WHERE doc_id % ${ReplayMod} = ${ReplayMod - 1}) s USING (text)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
      FROM f a JOIN f b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= ${Dedup.MinSharedFingerprints})
    SELECT doc_a, doc_b, shared_fps FROM pairs
    WHERE doc_a IN (SELECT doc_id FROM shard)
       OR doc_b IN (SELECT doc_id FROM shard)"""

  /** Modulus for the deletion replay: doc_id % 7 == [[DeleteResidue]]
    * interleaves deleted docs across both replay shards and exercises
    * both rep re-assignment (a text's min doc deleted, the next surviving
    * member takes over) and full-text removal (every copy deleted, the
    * text and its fingerprints vanish at the fold). */
  val DeleteMod = 7
  val DeleteResidue = 3

  /** Driver row: replay the corpus as [[ReplayMod]] crawl shards, DELETE
    * every doc with `doc_id % `[[DeleteMod]]` == `[[DeleteResidue]],
    * fold the tombstones with an explicit [[compact]], then detect. The
    * oracle is the full-corpus near-dup SQL over `documents` WITH THE
    * DELETED DOCS FILTERED OUT — passing means the
    * ingest → delete → compact lifecycle is bit-equal to never having
    * ingested the deleted documents at all. */
  def replayDelete(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.model.Scratch.dir("graft_inc_dedup_x")
    val docs = TextOps.documents(spark, dir)
    (0 until ReplayMod).foreach { b =>
      ingest(spark, root, b, docs.filter(pmod(col("doc_id"),
        lit(ReplayMod.toLong)) === b))
    }
    delete(spark, root, docs.filter(pmod(col("doc_id"),
      lit(DeleteMod.toLong)) === DeleteResidue).select("doc_id"))
    compact(spark, root)
    nearDupPairs(spark, root)
  }

  /** [[Dedup.winnowNearDupOracle]] over the corpus minus the deleted
    * docs: representatives are the min SURVIVING doc per distinct text,
    * and texts all of whose docs were deleted contribute nothing. */
  def replayDeleteOracle: String =
    deleteOracleFor(s"doc_id % $DeleteMod <> $DeleteResidue")

  /** The never-ingested oracle parameterized by the SURVIVOR predicate —
    * [[replayDeleteOracle]] is the `doc_id % 7 <> 3` instance; the
    * takedown receipt supplies an ownership-derived one. */
  def deleteOracleFor(survivorWhere: String): String =
    s"""WITH ${TextOps.winnowCte(
        s"""(SELECT min(doc_id) AS doc_id, text FROM documents
            WHERE $survivorWhere GROUP BY text)""")},
    fp AS (SELECT doc_id, unnest(fps) AS fingerprint FROM w),
    keep AS (
      SELECT fingerprint FROM fp GROUP BY 1
      HAVING count(*) BETWEEN 2 AND ${Dedup.MaxFingerprintDocFrequency}),
    f AS (SELECT fp.doc_id, fp.fingerprint FROM fp JOIN keep USING (fingerprint))
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
    FROM f a JOIN f b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= ${Dedup.MinSharedFingerprints}"""

  // ---- steady-state takedown against an EXISTING store ----
  //
  // [[graft.pipeline.Forget.takedownReceipt]] deliberately replays a
  // fresh store per invocation — that row prices the full lifecycle.
  // Production, however, repeats a much smaller operation: append a
  // tombstone to a store that ALREADY EXISTS and read back a receipt.
  // The store here is built once per corpus fingerprint (the
  // [[IvfIndex.fingerprint]]/renameIfAbsent discipline the ANN caches
  // use) and every later takedown against it costs one takedown-sized
  // tombstone write plus pruned one-column scans of the member index —
  // never a re-ingest, never a detection replay.

  /** Cache root for build-once steady-state stores. The default is a
    * JVM-PRIVATE scratch dir (exit-hook-cleaned): unlike the immutable
    * ANN caches, this store is MUTATED by every takedown (tombstone
    * append, occasionally an auto-fold that deletes folded directories),
    * and two processes sharing one root would race a reader in one
    * against a compaction in the other. Build-once still holds where it
    * matters — within the process that repeats takedowns (and Bench's
    * build/serve split is same-process). A deployment pointing this at
    * the real crawl store must serialize takedowns through one operator
    * — which a production takedown queue does anyway. */
  val SteadyRootKey = "spark.graft.dedup.steady.root"

  private lazy val jvmSteadyRoot: String =
    graft.model.Scratch.dir("graft_dedup_steady")

  private def steadyRootDir(spark: SparkSession): String =
    spark.conf.getOption(SteadyRootKey).map(_.trim).filter(_.nonEmpty)
      .orElse(sys.props.get("graft.dedup.steady.root"))
      .getOrElse(jvmSteadyRoot)

  /** Version component of the steady-store cache key: the cache persists
    * across JVMs, so a change to the ingest recipe must invalidate
    * stores built by old code. PLAN-VISIBLE semantic changes are
    * covered by [[steadyRecipeHash]] (the analyzed-plan hash of the
    * exact transforms ingest runs — reps, new-texts, the seen-before
    * gate, winnow fps, the replay-shard predicate); the hand-bumped
    * literal remains for changes the plans cannot see (directory
    * layout, commit protocol,
    * compaction fold rules). */
  private val SteadyVersion = s"s2m$ReplayMod"

  /** Code-identity component of the steady-store key — [[graft.model
    * .PlanIdentity]] over the SAME extracted transforms [[ingest]]
    * executes ([[ingestReps]]/[[ingestNewTexts]]/[[ingestFps]]/
    * [[gateMembers]]∘[[ingestUnseen]]) plus the replay-shard predicate,
    * composed over empty shaped stand-ins. Analysis-only; computed once
    * per JVM (the canonical string is session-independent). A recipe
    * edit without a [[SteadyVersion]] bump now misses the cache instead
    * of serving a store ingested by old code.
    *
    * Coverage is exactly the extracted compositions: an edit INSIDE any
    * of them (including re-basing the seen-before gate on the
    * tombstone-filtered view, which would add the anti-join to
    * gateMembers' hashed plan) moves the key; an edit that REWIRES the
    * ingest call sites around them, or changes what [[storeView]] reads
    * (directory layout, generation rules), is plan-invisible here and
    * still requires a [[SteadyVersion]] bump. */
  private lazy val steadyRecipeHashMemo =
    new java.util.concurrent.atomic.AtomicReference[String]()

  private def steadyRecipeHash(spark: SparkSession): String = {
    val got = steadyRecipeHashMemo.get()
    if (got != null) return got
    val dummy = emptyOf(spark, "doc_id BIGINT, text STRING")
    val unseenShaped = emptyOf(spark, "text_hash STRING, doc_id BIGINT, text STRING")
    val membersShaped = emptyOf(spark, "text_hash STRING, doc_id BIGINT")
    val tombShaped = emptyOf(spark, "doc_id BIGINT")
    val shard = dummy.filter(pmod(col("doc_id"), lit(ReplayMod.toLong)) === 0L)
    // the gate is hashed THROUGH gateMembers with a tombstone stand-in
    // present, so the raw-vs-filtered view choice itself is covered: if
    // gateMembers ever applies the anti-join, the hashed plan gains it
    val h = graft.model.PlanIdentity.planHash(Seq(
      ingestReps(dummy), ingestNewTexts(dummy),
      ingestUnseen(ingestNewTexts(dummy),
        gateMembers(membersShaped, Some(tombShaped))),
      ingestFps(unseenShaped), shard))
    steadyRecipeHashMemo.compareAndSet(null, h)
    h
  }

  /** Cold steady-store builds JVM-wide (test-visible proof that repeated
    * takedowns reuse the cached store instead of re-ingesting). */
  val steadyBuilds = new AtomicLong(0L)

  /** The EXISTING store for `dir`'s corpus: built on first use (the
    * corpus ingested as [[ReplayMod]] crawl shards under a staging name,
    * committed with one atomic rename — concurrent cold builds
    * last-writer-lose like every other fingerprint-keyed cache), reused
    * by content fingerprint afterwards. Returns the store root.
    *
    * The cache key folds in the CUSTOMER table's fingerprint alongside
    * the documents': unlike the immutable ANN caches, this store is
    * MUTATED by takedown tombstones whose ids derive from the customer
    * dimension (`doc_id mod |customers| mod ErasureMod`) — with a
    * persistent [[steadyCacheRoot]], two corpora sharing identical
    * documents but different customer tables (or one corpus whose
    * customer dimension changed) must NOT share a store, or the second
    * reader inherits the first's erasure tombstones and its survivor
    * metrics silently drift from the oracle. A corpus with no customer
    * table keys on the documents alone. */
  def steadyStore(spark: SparkSession, dir: String): String = {
    val fp = IvfIndex.fingerprint(spark, dir, "documents.parquet")
    val cfp =
      try IvfIndex.fingerprint(spark, dir, "customer.parquet").take(12)
      catch { case _: java.io.FileNotFoundException => "nocust" }
    val cacheRoot = steadyRootDir(spark)
    val root =
      s"$cacheRoot/store_${SteadyVersion}r${steadyRecipeHash(spark)}_${fp}_c$cfp"
    val fs = hadoopFs(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootPath)) return root
    val staging = s"$cacheRoot/.build_" +
      java.util.UUID.randomUUID.toString.take(12)
    val docs = TextOps.documents(spark, dir)
    (0 until ReplayMod).foreach { b =>
      ingest(spark, staging, b, docs.filter(pmod(col("doc_id"),
        lit(ReplayMod.toLong)) === b))
    }
    fs.mkdirs(rootPath.getParent)
    // count only the build that WON the commit race: the counter is
    // documented (and spec-asserted) as cold store builds, and a lost
    // race's discarded staging build must not spuriously fail the
    // build-once assertion under concurrent cold starts
    if (IvfIndex.renameIfAbsent(fs,
        new org.apache.hadoop.fs.Path(staging), rootPath))
      steadyBuilds.incrementAndGet()
    root
  }

  /** The steady-state operation itself: tombstone `docIds` (a `doc_id`
    * column) in the existing store at `root`, then emit a receipt read
    * from the store's post-delete LOGICAL view — requested ids, surviving
    * (text, doc) members, surviving distinct texts. Hash-equality against
    * the never-ingested oracle proves the tombstone is honored by every
    * read from the instant of the append (the physical fold is the
    * store's own [[compact]] cadence). Idempotent by construction:
    * re-deleting the same ids (tombstones dedup logically; a post-fold
    * re-delete anti-joins nothing) leaves every receipt value unchanged,
    * so repeated driver runs against the cached store stay bit-stable. */
  def steadyTakedown(spark: SparkSession, root: String,
      docIds: DataFrame): DataFrame = {
    delete(spark, root, docIds)
    val requested = docIds.select("doc_id").distinct()
      .agg(count(lit(1)).as("requested"))
    val survivors = reps(spark, root).agg(
      count(lit(1)).as("members"),
      countDistinct(col("text_hash")).as("texts"))
    requested.crossJoin(survivors)
      .select(explode(map(
        lit("docs_tombstoned"), col("requested"),
        lit("surviving_members"), col("members"),
        lit("surviving_texts"), col("texts"))).as(Seq("metric", "value")))
  }

  /** Runtime conf key selecting the warehouse root for the DAG-scheduled
    * store — same session-scoped pattern as [[IvfIndex.cacheRoot]]:
    * session conf, then the `graft.dedup.store.root` system property,
    * then a JVM-tmpdir default that keeps the (spark, dir) query
    * contract self-contained; a deployment points it at the real crawl
    * store. */
  val StoreRootKey = "spark.graft.dedup.store.root"

  def storeRoot(spark: SparkSession): String =
    spark.conf.getOption(StoreRootKey).map(_.trim).filter(_.nonEmpty)
      .getOrElse(sys.props.getOrElse("graft.dedup.store.root",
        s"${sys.props("java.io.tmpdir")}/graft_dedup_store"))

  private def nextBatchId(spark: SparkSession, root: String): Int =
    (batchIds(spark, root) :+ watermark(spark, root)).max + 1

  /** One crawl tick as a schedulable DAG node: ingest the source's
    * documents table as the next batch (unseen-only fingerprinting makes
    * re-delivery cheap; compaction folds automatically every
    * [[CompactEvery]] ingests), materializing a one-row ingest receipt. */
  val ingestRegistryModel: graft.pipeline.Registry.Model =
    graft.pipeline.Registry.Model("dedup_store_ingest", "dedup",
      graft.pipeline.Registry.Table, Seq.empty,
      (s, dir, _) => {
        val next = nextBatchId(s, storeRoot(s))
        val n = ingest(s, storeRoot(s), next, TextOps.documents(s, dir))
        s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(next, n)),
          org.apache.spark.sql.types.StructType.fromDDL(
            "batch_id INT, fingerprinted BIGINT"))
      })

  /** Detection over the store as a DAG node downstream of the tick —
    * `Registry.run` lands the corpus-wide pair table with the same refresh
    * cadence, selectors, and atomicity as any mart. */
  val pairsRegistryModel: graft.pipeline.Registry.Model =
    graft.pipeline.Registry.Model("dedup_store_pairs", "dedup",
      graft.pipeline.Registry.Table, Seq("dedup_store_ingest"),
      (s, _, _) => nearDupPairs(s, storeRoot(s)))

  /** The fold as a schedulable DAG node (downstream of the tick, so a
    * `Registry.run` lands ingest → fold in order): compacts batches AND
    * pending tombstones, then materializes a one-row metadata receipt —
    * the operational cadence knob for deletions beyond the
    * [[CompactEvery]] auto-fold. */
  val compactRegistryModel: graft.pipeline.Registry.Model =
    graft.pipeline.Registry.Model("dedup_store_compact", "dedup",
      graft.pipeline.Registry.Table, Seq("dedup_store_ingest"),
      (s, _, _) => {
        compact(s, storeRoot(s))
        val gen = newestGen(s, storeRoot(s))
          .map { case (k, t) => genName(k, t) }.getOrElse("")
        s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(gen,
            batchIds(s, storeRoot(s)).count(_ > watermark(s, storeRoot(s))),
            tombDirIds(s, storeRoot(s)).size)),
          org.apache.spark.sql.types.StructType.fromDDL(
            "generation STRING, pending_batches INT, pending_tombstones INT"))
      })
}
