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
    * string is stable across JVM runs for unchanged code. */
  def planHash(frames: Seq[DataFrame]): String = {
    val desc = frames.map(df => df.schema.toDDL + "|" +
      df.queryExecution.analyzed.canonicalized.toString).mkString("‖")
    java.security.MessageDigest.getInstance("MD5")
      .digest(desc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }
}
