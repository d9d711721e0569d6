package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-dup detection against a persisted fingerprint store —
  * the production crawl pattern: each arriving shard is fingerprinted ONCE
  * and appended to an index; detection afterwards runs entirely over the
  * index, never re-reading earlier shards' raw text.
  *
  * Store layout (append-only — immutable batch directories, so an ingest
  * never rewrites or lazily-reads-while-overwriting existing data):
  * {{{
  *   <root>/reps/batch=<i>/   (text_hash, doc_id)    one row per distinct
  *                            text IN THE BATCH with its min doc id
  *   <root>/fps/batch=<i>/    (text_hash, fingerprint) winnowing
  *                            fingerprints of texts UNSEEN before batch i
  * }}}
  * A text's fingerprints depend only on the text, so a text already in
  * the store is never re-fingerprinted — its new doc ids only feed the
  * min-rep merge. At 100 TB this is the whole economics: per-crawl cost
  * is O(new shard) text processing plus joins over an index that is a few
  * percent of corpus size (fingerprint density ~2/(w+1), 32-hex keys),
  * while a from-scratch run would re-hash every byte ever crawled.
  *
  * Detection ([[nearDupPairs]]) replays [[Dedup.winnowNearDupFrom]]'s
  * exact pipeline over the index — distinct-text representatives (min
  * doc id across ALL batches), document-frequency bounds, equi-join on
  * fingerprint, ≥ [[Dedup.MinSharedFingerprints]] shared — so its output
  * is bit-equal to the full-corpus operator no matter how the corpus was
  * batched. The DF cutoff is corpus-global state that single-shard
  * processing cannot know, which is exactly why detection joins the
  * index instead of emitting pairs at ingest time: a fingerprint's
  * posting list (and whether it is boilerplate) only settles once all
  * shards contributed.
  */
object IncrementalDedup {

  /** Texts fingerprinted by the most recent [[ingest]] JVM-wide — the
    * test-visible proof that re-ingesting overlapping shards re-hashes
    * only genuinely new texts. */
  val lastIngestFingerprinted = new AtomicLong(-1L)

  private def repsRoot(root: String) = s"$root/reps"
  private def fpsRoot(root: String) = s"$root/fps"

  private def readIfExists(spark: SparkSession, path: String,
      schemaDdl: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schemaDdl))
  }

  private def reps(spark: SparkSession, root: String): DataFrame =
    readIfExists(spark, repsRoot(root), "text_hash STRING, doc_id BIGINT")

  private def fps(spark: SparkSession, root: String): DataFrame =
    readIfExists(spark, fpsRoot(root), "text_hash STRING, fingerprint STRING")

  /** Ingest one shard of `(doc_id, text)` rows into the store at `root`
    * as batch `batchId`: appends the shard's per-text min doc ids, and
    * fingerprints of texts no earlier batch contained. Returns the number
    * of texts fingerprinted (the expensive work actually done). */
  def ingest(spark: SparkSession, root: String, batchId: Int,
      batch: DataFrame): Long = {
    val newTexts = batch
      .select(col("doc_id"), col("text"), md5(col("text")).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))
    // seen-before check touches only the index's key column (pruned scan)
    val unseen = newTexts.join(
      reps(spark, root).select("text_hash"), Seq("text_hash"), "left_anti")
      .localCheckpoint()
    newTexts.select("text_hash", "doc_id")
      .write.parquet(s"${repsRoot(root)}/batch=$batchId")
    // the one text-processing pass of the ingest: winnow ONLY unseen texts
    val newFps = TextOps.winnowFingerprints(
        unseen.select(col("text_hash").as("doc_id"), col("text")))
      .select(col("doc_id").as("text_hash"), col("fingerprint"))
    newFps.write.parquet(s"${fpsRoot(root)}/batch=$batchId")
    val n = unseen.count()
    lastIngestFingerprinted.set(n)
    n
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
    val root = java.nio.file.Files
      .createTempDirectory("graft_inc_dedup").toString
    val docs = TextOps.documents(spark, dir)
    (0 until ReplayMod).foreach { b =>
      ingest(spark, root, b, docs.filter(pmod(col("doc_id"),
        lit(ReplayMod.toLong)) === b))
    }
    nearDupPairs(spark, root)
  }
}
