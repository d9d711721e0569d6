package graft.model

import org.apache.spark.sql.DataFrame

/** Code-identity hashing for persistent, cross-JVM caches.
  *
  * A fingerprint-keyed cache that outlives the JVM ([[graft.quality
  * .SilverStage]]'s dq trio, [[graft.ops.IncrementalDedup]]'s steady
  * store) must fold the RECIPE into its key, not just the data: a code
  * change to the cached derivation without a hand-bumped version
  * constant would silently serve rows built by old code, surfacing as a
  * baffling oracle mismatch on untouched call sites. The honest cheap
  * form is hashing the derivation's ANALYZED canonical plan — any
  * expression or schema change reaches the canonical string and
  * therefore the key, analysis is planning-cost only (never a job), and
  * a spurious difference (a Spark upgrade changing canonicalization)
  * costs one rebuild, never staleness. Callers hash the SAME composed
  * functions the build executes, so the hash cannot drift from the
  * recipe. */
object PlanIdentity {

  /** md5 (truncated) over schema DDL + canonicalized analyzed plan of
    * each frame — exprIds are normalized by canonicalization, so the
    * string is stable across JVM runs for unchanged code.
    *
    * Repartition hints are normalized OUT before hashing: operators like
    * [[graft.ops.TextOps]]'s fan-out helper inject
    * `Repartition(defaultParallelism)`, which embeds the HOST's core
    * count in the plan string — semantics-neutral distribution hints
    * must not make two machines sharing one persistent cache root
    * compute different keys (the cross-JVM reuse the cache exists for
    * would silently degrade to per-host rebuilds). */
  def planHash(frames: Seq[DataFrame]): String = {
    val desc = frames.map { df =>
      val normalized = df.queryExecution.analyzed.transformUp {
        case r: org.apache.spark.sql.catalyst.plans.logical
          .RepartitionOperation => r.child
        // REBALANCE hints (AQE-sized write coalescing, guide §6) are the
        // same semantics-neutral distribution class
        case r: org.apache.spark.sql.catalyst.plans.logical
          .RebalancePartitions => r.child
      }
      df.schema.toDDL + "|" + normalized.canonicalized.toString
    }.mkString("‖")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }
}
