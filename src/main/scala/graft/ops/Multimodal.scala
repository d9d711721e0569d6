package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batches via typed `Dataset.mapPartitions` (the
  * Scala analogue of `mapInPandas` batch processing).
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * CLEARLY-MARKED deterministic fake decoder — it derives "dimensions" and
  * a checksum from the payload bytes. Everything around it is the real
  * production shape: binary column synthesis, case-class schema with an
  * `Array[Byte]` payload, per-partition batch iteration (decoder init cost
  * amortized once per partition, exactly where a codec handle would be
  * opened), and a narrow no-shuffle plan that scales linearly.
  *
  * Payloads are synthesized as `unhex(md5(text))` so the DuckDB oracle can
  * reproduce the identical 16 bytes arithmetically from the hex string.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, first_byte: Int,
    checksum: Long, stub_width: Int, stub_height: Int)

  /** Documents with a synthesized binary media payload + typed metadata. */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    TextOps.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        unhex(md5(col("text"))).as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake in place of a real codec (`???` in
    * spirit): real deployments swap this body for e.g. javax.imageio /
    * ffmpeg bindings; the signature and batch shape stay identical. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val b = r.payload.map(_ & 0xff)
    MediaFeatures(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = b.length,
      first_byte = b(0),
      checksum = b.map(_.toLong).sum % 997,
      stub_width = 1 + b(1) % 64,
      stub_height = 1 + b(2) % 64)
  }

  /** Batch feature extraction: one decoder "session" per partition. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    media(spark, dir)
      .mapPartitions { batch =>
        // decoder/codec init would happen here, once per partition
        batch.map(decodeStub)
      }
      .toDF()
      .select("doc_id", "media_type", "n_bytes", "first_byte",
        "checksum", "stub_width", "stub_height")
  }

  /** Oracle: reproduces the byte arithmetic from the md5 hex string. */
  def featuresOracle: String =
    """WITH h AS (
      SELECT doc_id, md5(text) AS hex,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
      FROM documents),
    b AS (
      SELECT doc_id, media_type,
        list_transform(range(1, 17),
          i -> (strpos('0123456789abcdef', substr(hex, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hex, 2*i, 1)) - 1)) AS bytes
      FROM h)
    SELECT doc_id, media_type,
      CAST(len(bytes) AS INTEGER) AS n_bytes,
      CAST(bytes[1] AS INTEGER) AS first_byte,
      CAST(list_sum(bytes) % 997 AS BIGINT) AS checksum,
      CAST(1 + bytes[2] % 64 AS INTEGER) AS stub_width,
      CAST(1 + bytes[3] % 64 AS INTEGER) AS stub_height
    FROM b"""
}
