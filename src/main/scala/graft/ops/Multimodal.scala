package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in batches via typed `Dataset.mapPartitions` (the
  * Scala analogue of `mapInPandas` batch processing).
  *
  * The payloads are REAL images — tiny 24-bit BMPs (54-byte header +
  * bottom-up BGR pixel rows) synthesized deterministically from
  * `md5(text)` — and the decoder is the REAL JDK codec
  * (`javax.imageio.ImageIO`), not a stub: `features` round-trips every
  * payload through an actual image decode and emits the decoded
  * dimensions plus a channel-weighted pixel checksum. Because dimensions
  * and pixel values derive arithmetically from the md5 seed, the DuckDB
  * oracle PREDICTS what a correct decoder must return without decoding
  * anything — a wrong stride, flipped row order, or swapped B/R channel
  * on the Spark side fails the hash compare.
  *
  * Scale shape: payload synthesis and decode are narrow per-row maps (no
  * shuffle); the decode sits in `mapPartitions` so a codec with per-open
  * cost initializes once per partition, exactly where an ffmpeg/turbojpeg
  * handle would live in production. `media_type` demonstrates the typed
  * routing column; this synthetic corpus is all-BMP so every row
  * exercises the real decoder.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int,
    width: Int, height: Int, pixel_checksum: Long)

  /** Decoded-image geometry derived from the 16 md5 seed bytes: width and
    * height in 1..8 (so payloads stay tens-to-hundreds of bytes), pixel
    * channel c of (x, y) = seed[(x + 7y + 3c) mod 16]. The y and c
    * multipliers make row order and channel order observable: a
    * bottom-up/top-down or BGR/RGB mistake changes the checksum. */
  private def widthOf(seed: Array[Byte]): Int = 1 + (seed(1) & 0xff) % 8
  private def heightOf(seed: Array[Byte]): Int = 1 + (seed(2) & 0xff) % 8
  private def pix(seed: Array[Byte], x: Int, y: Int, c: Int): Int =
    seed((x + 7 * y + 3 * c) % 16) & 0xff

  /** A minimal valid 24bpp BI_RGB BMP: 14-byte file header, 40-byte
    * BITMAPINFOHEADER, rows bottom-up, each padded to a 4-byte stride. */
  private[graft] def buildBmp(seed: Array[Byte]): Array[Byte] = {
    val w = widthOf(seed)
    val h = heightOf(seed)
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def le4(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le4(2, size)          // file size
    le4(10, 54)           // pixel-data offset
    le4(14, 40)           // BITMAPINFOHEADER size
    le4(18, w); le4(22, h)
    out(26) = 1           // planes
    out(28) = 24          // bits per pixel
    le4(34, stride * h)   // image size (BI_RGB: informational)
    var y = h - 1         // bottom-up: first stored row is the last image row
    var off = 54
    while (y >= 0) {
      var x = 0
      while (x < w) {
        out(off) = pix(seed, x, y, 2).toByte     // B
        out(off + 1) = pix(seed, x, y, 1).toByte // G
        out(off + 2) = pix(seed, x, y, 0).toByte // R
        x += 1; off += 3
      }
      off += stride - 3 * w
      y -= 1
    }
    out
  }

  /** Documents with a synthesized REAL BMP payload + typed metadata. */
  def media(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    TextOps.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        unhex(md5(col("text"))).as("seed"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, seed) => MediaRow(id, mt, buildBmp(seed)) }
  }

  /** REAL decode: `javax.imageio` parses the BMP container and hands back
    * the pixel raster; features are the decoded (not declared) geometry
    * and a channel-weighted sum (r + 256g + 65536b per pixel — weights
    * make channel swaps visible; ≤ 64 px × 2²⁴ keeps the exact sum far
    * inside a long). */
  def decode(r: MediaRow): MediaFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"payload of doc ${r.doc_id} is not a decodable image")
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + 256L * ((rgb >> 8) & 0xff) +
          65536L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    MediaFeatures(r.doc_id, r.media_type, r.payload.length,
      img.getWidth, img.getHeight, sum)
  }

  /** Batch feature extraction: one decoder "session" per partition. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    media(spark, dir)
      .mapPartitions { batch =>
        // codec init would happen here, once per partition (ImageIO's
        // reader registry is static, so the JDK path needs none)
        batch.map(decode)
      }
      .toDF()
      .select("doc_id", "media_type", "n_bytes", "width", "height",
        "pixel_checksum")
  }

  /** Frame-sampling stride for [[frameSample]] — every 2nd frame. */
  val FrameStride = 2

  final case class FrameFeatures(
    doc_id: Long, media_type: String, n_frames: Int, n_sampled: Int,
    container_bytes: Int, frames_checksum: Long)

  /** Frame-count formula constants, shared by [[buildContainer]] and the
    * oracle's frame-index generator (which iterates `range(0, MaxFrames)`
    * — deriving the bound here keeps a future formula change from
    * silently truncating frames in the oracle only). */
  val MinFrames = 2
  val FrameCountMod = 5
  val MaxFrames: Int = MinFrames + FrameCountMod - 1

  /** A minimal multi-frame "video" container: `GFV1` magic, LE frame
    * count, then length-prefixed frames — frame f is a real BMP whose
    * seed is the doc seed rotated by 5f bytes, so every frame differs
    * and the rotation is replayable arithmetic. Frame count
    * [[MinFrames]] + seed[0] mod [[FrameCountMod]] ∈ [2, 6]. */
  private[graft] def buildContainer(seed: Array[Byte]): Array[Byte] = {
    val n = MinFrames + (seed(0) & 0xff) % FrameCountMod
    val frames = (0 until n).map { f =>
      val r = (5 * f) % 16
      buildBmp((seed.drop(r) ++ seed.take(r)).toArray)
    }
    val out = java.nio.ByteBuffer
      .allocate(8 + frames.map(4 + _.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GFV1".getBytes("US-ASCII")).putInt(n)
    frames.foreach(fr => out.putInt(fr.length).put(fr))
    out.array()
  }

  def videos(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    TextOps.documents(spark, dir)
      .select(col("doc_id"), lit("video").as("media_type"),
        unhex(md5(col("text"))).as("seed"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, seed) => MediaRow(id, mt, buildContainer(seed)) }
  }

  /** Frame sampling — the video rung of the media ladder (decode →
    * resize → FRAME-SAMPLE): parse the container, decode every
    * [[FrameStride]]-th frame with the real codec, skip the rest
    * UNREAD (the point of sampling: IO and decode cost scale with
    * sampled frames, not stored frames — the container's length
    * prefixes are the seek table). Features: frame counts, container
    * size, and the channel-weighted checksum over sampled frames only —
    * all predicted arithmetically by the oracle, so a wrong stride,
    * frame offset, or seed rotation fails the hash compare. Same
    * `mapPartitions` batch shape as the other rungs. */
  def frameSample(r: MediaRow): FrameFeatures = {
    val buf = java.nio.ByteBuffer.wrap(r.payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GFV1",
      s"doc ${r.doc_id}: not a GFV1 container")
    val n = buf.getInt
    var checksum = 0L
    var sampled = 0
    var f = 0
    while (f < n) {
      val len = buf.getInt
      if (f % FrameStride == 0) {
        val frame = new Array[Byte](len); buf.get(frame)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(frame))
        require(img != null, s"doc ${r.doc_id} frame $f: undecodable")
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            checksum += ((rgb >> 16) & 0xff) + 256L * ((rgb >> 8) & 0xff) +
              65536L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        sampled += 1
      } else buf.position(buf.position() + len) // skip unread
      f += 1
    }
    FrameFeatures(r.doc_id, r.media_type, n, sampled, r.payload.length,
      checksum)
  }

  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videos(spark, dir)
      .mapPartitions(_.map(frameSample))
      .toDF()
      .select("doc_id", "media_type", "n_frames", "n_sampled",
        "container_bytes", "frames_checksum")
  }

  /** Oracle twin of [[frameFeatures]]: frame f's pixel (x,y,c) is
    * seed[(x + 7y + 3c + 5f) mod 16] and its geometry comes from the
    * rotated seed's bytes 2/3 — pure index arithmetic, no decoding. */
  def frameFeaturesOracle: String =
    s"""WITH h AS (
      SELECT doc_id, md5(text) AS hex FROM documents),
    b AS (
      SELECT doc_id,
        list_transform(range(1, 17),
          i -> (strpos('0123456789abcdef', substr(hex, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hex, 2*i, 1)) - 1)) AS bytes
      FROM h),
    n AS (
      SELECT doc_id, bytes, $MinFrames + bytes[1] % $FrameCountMod
        AS n_frames FROM b),
    fr AS (
      SELECT doc_id, n_frames, f,
        1 + bytes[(1 + 5*f) % 16 + 1] % 8 AS w,
        1 + bytes[(2 + 5*f) % 16 + 1] % 8 AS h,
        CASE WHEN f % $FrameStride = 0 THEN
          list_sum(flatten(list_transform(range(0, 1 + bytes[(2 + 5*f) % 16 + 1] % 8), y ->
            list_transform(range(0, 1 + bytes[(1 + 5*f) % 16 + 1] % 8), x ->
              bytes[(x + 7*y + 5*f) % 16 + 1]
              + 256 * bytes[(x + 7*y + 3 + 5*f) % 16 + 1]
              + 65536 * bytes[(x + 7*y + 6 + 5*f) % 16 + 1]))))
        ELSE 0 END AS fsum
      FROM n, range(0, $MaxFrames) t(f) WHERE f < n_frames)
    SELECT doc_id, 'video' AS media_type,
      CAST(any_value(n_frames) AS INTEGER) AS n_frames,
      CAST(sum(CASE WHEN f % $FrameStride = 0 THEN 1 ELSE 0 END) AS INTEGER)
        AS n_sampled,
      CAST(8 + sum(4 + 54 + ((3*w + 3) // 4) * 4 * h) AS INTEGER)
        AS container_bytes,
      CAST(sum(fsum) AS BIGINT) AS frames_checksum
    FROM fr GROUP BY 1"""

  /** Output grid of [[resized]] — the fixed-size thumbnail/frame-sample
    * geometry every vision preprocessor normalizes to. */
  val OutW = 4
  val OutH = 4

  final case class MediaResized(
    doc_id: Long, media_type: String, src_w: Int, src_h: Int,
    out_w: Int, out_h: Int, resized_checksum: Long, luma_sum: Long)

  /** Decode + nearest-neighbor RESIZE to a fixed [[OutW]]×[[OutH]] grid —
    * the second rung of the media ladder (decode → resize/frame-sample →
    * feature-extract): every payload, whatever its native geometry, comes
    * out as the same fixed-shape grid, exactly what a vision encoder's
    * preprocessor does. Nearest-neighbor (src = ⌊out·src_dim/out_dim⌋) is
    * chosen over interpolation deliberately: it is pure integer index
    * arithmetic on the DECODED raster, so the oracle can predict the
    * resampled checksum without decoding — keeping the whole resize
    * under the same arithmetic-prediction contract as [[features]] (a
    * wrong index map, row order, or channel swap fails the compare).
    * Same `mapPartitions` batch shape: decode and resample share the
    * per-partition codec session, no shuffle anywhere. */
  def resized(r: MediaRow): MediaResized = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"payload of doc ${r.doc_id} is not a decodable image")
    var checksum = 0L
    var luma = 0L
    var yo = 0
    while (yo < OutH) {
      val sy = yo * img.getHeight / OutH
      var xo = 0
      while (xo < OutW) {
        val sx = xo * img.getWidth / OutW
        val rgb = img.getRGB(sx, sy)
        val (rr, gg, bb) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        checksum += rr + 256L * gg + 65536L * bb
        luma += rr + gg + bb
        xo += 1
      }
      yo += 1
    }
    MediaResized(r.doc_id, r.media_type, img.getWidth, img.getHeight,
      OutW, OutH, checksum, luma)
  }

  def resizeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    media(spark, dir)
      .mapPartitions(_.map(resized))
      .toDF()
      .select("doc_id", "media_type", "src_w", "src_h", "out_w", "out_h",
        "resized_checksum", "luma_sum")
  }

  /** Oracle twin of [[resizeFeatures]]: regenerates the nearest-neighbor
    * index map (`sx = xo·w // 4`, `sy = yo·h // 4`) and the seed-pixel
    * arithmetic — no decoding, pure prediction. */
  def resizeFeaturesOracle: String =
    s"""WITH h AS (
      SELECT doc_id, md5(text) AS hex,
        CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS media_type
      FROM documents),
    b AS (
      SELECT doc_id, media_type,
        list_transform(range(1, 17),
          i -> (strpos('0123456789abcdef', substr(hex, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hex, 2*i, 1)) - 1)) AS bytes
      FROM h),
    g AS (
      SELECT doc_id, media_type, bytes,
        1 + bytes[2] % 8 AS w, 1 + bytes[3] % 8 AS h
      FROM b),
    px AS (
      SELECT doc_id, media_type, w, h,
        flatten(list_transform(range(0, $OutH), yo ->
          list_transform(range(0, $OutW), xo ->
            [bytes[((xo * w // $OutW) + 7 * (yo * h // $OutH)) % 16 + 1],
             bytes[((xo * w // $OutW) + 7 * (yo * h // $OutH) + 3) % 16 + 1],
             bytes[((xo * w // $OutW) + 7 * (yo * h // $OutH) + 6) % 16 + 1]])))
          AS cells
      FROM g)
    SELECT doc_id, media_type,
      CAST(w AS INTEGER) AS src_w, CAST(h AS INTEGER) AS src_h,
      CAST($OutW AS INTEGER) AS out_w, CAST($OutH AS INTEGER) AS out_h,
      CAST(list_sum(list_transform(cells,
        c -> c[1] + 256 * c[2] + 65536 * c[3])) AS BIGINT) AS resized_checksum,
      CAST(list_sum(list_transform(cells,
        c -> c[1] + c[2] + c[3])) AS BIGINT) AS luma_sum
    FROM px"""

  /** Audio geometry constants, shared by [[buildWav]] and the oracle:
    * sample count ∈ [32, 128], rate ∈ {8000..15000 by 1000}. */
  val AudioMinSamples = 32
  val AudioSampleMod = 97
  val AudioBaseRate = 8000

  final case class AudioFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, sample_rate: Int,
    n_samples: Int, peak_abs: Int, zero_crossings: Int, energy: Long)

  private def nSamplesOf(seed: Array[Byte]): Int =
    AudioMinSamples + (seed(5) & 0xff) % AudioSampleMod
  private def rateOf(seed: Array[Byte]): Int =
    AudioBaseRate + ((seed(6) & 0xff) % 8) * 1000
  /** Sample i = (seed[(7i+5) mod 16] − 128) · 256 — a 16-bit PCM value;
    * the ×7 walk (coprime with 16) cycles all seed bytes, so the wave
    * crosses zero and the crossing count is seed-dependent. */
  private def sampleOf(seed: Array[Byte], i: Int): Int =
    ((seed((7 * i + 5) % 16) & 0xff) - 128) * 256

  /** A minimal valid PCM WAV: 12-byte RIFF header, 24-byte `fmt ` chunk
    * (PCM, mono, 16-bit LE), `data` chunk of [[nSamplesOf]] samples. */
  private[graft] def buildWav(seed: Array[Byte]): Array[Byte] = {
    val n = nSamplesOf(seed)
    val rate = rateOf(seed)
    val dataLen = 2 * n
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)               // PCM
      .putShort(1)               // mono
      .putInt(rate)
      .putInt(rate * 2)          // byte rate
      .putShort(2)               // block align
      .putShort(16)              // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { out.putShort(sampleOf(seed, i).toShort); i += 1 }
    out.array()
  }

  /** Documents with a synthesized REAL WAV payload. */
  def audio(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    TextOps.documents(spark, dir)
      .select(col("doc_id"), lit("audio").as("media_type"),
        unhex(md5(col("text"))).as("seed"))
      .as[(Long, String, Array[Byte])]
      .map { case (id, mt, seed) => MediaRow(id, mt, buildWav(seed)) }
  }

  /** REAL decode: `javax.sound.sampled.AudioSystem` parses the RIFF
    * container and hands back the PCM frame stream; features are the
    * decoded (not declared) format plus the classic waveform summary —
    * peak amplitude, zero-crossing count (sign flips between adjacent
    * samples), and energy (sum of squared samples; 128 samples × 2¹⁵·²
    * stays far inside a long). A wrong endianness, a header-length
    * mistake, or an off-by-one in the sample walk fails the compare. */
  def decodeAudio(r: MediaRow): AudioFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
      fmt.getChannels == 1, s"doc ${r.doc_id}: unexpected decoded format $fmt")
    val bytes = in.readAllBytes()
    val n = bytes.length / 2
    var peak = 0; var zc = 0; var energy = 0L
    var prevNeg = false
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      val neg = s < 0
      if (i > 0 && neg != prevNeg) zc += 1
      prevNeg = neg
      if (math.abs(s) > peak) peak = math.abs(s)
      energy += s.toLong * s
      i += 1
    }
    AudioFeatures(r.doc_id, r.media_type, r.payload.length,
      fmt.getSampleRate.toInt, n, peak, zc, energy)
  }

  /** Batch audio feature extraction — same per-partition codec-session
    * shape as the image/video rungs. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audio(spark, dir)
      .mapPartitions(_.map(decodeAudio))
      .toDF()
      .select("doc_id", "media_type", "n_bytes", "sample_rate",
        "n_samples", "peak_abs", "zero_crossings", "energy")
  }

  /** Oracle twin of [[audioFeatures]]: regenerates every sample from the
    * md5 bytes (`(seed[(7i+5) mod 16] − 128) · 256`) and predicts the
    * decoder's waveform summary — no decoding, pure arithmetic. */
  def audioFeaturesOracle: String =
    s"""WITH h AS (
      SELECT doc_id, md5(text) AS hex FROM documents),
    b AS (
      SELECT doc_id,
        list_transform(range(1, 17),
          i -> (strpos('0123456789abcdef', substr(hex, 2*i - 1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(hex, 2*i, 1)) - 1)) AS bytes
      FROM h),
    p AS (
      SELECT doc_id,
        $AudioMinSamples + bytes[6] % $AudioSampleMod AS n_samples,
        $AudioBaseRate + (bytes[7] % 8) * 1000 AS sample_rate, bytes
      FROM b),
    s AS (
      SELECT doc_id, n_samples, sample_rate,
        list_transform(range(0, n_samples),
          i -> (bytes[(7*i + 5) % 16 + 1] - 128) * 256) AS smp
      FROM p)
    SELECT doc_id, 'audio' AS media_type,
      CAST(44 + 2 * n_samples AS INTEGER) AS n_bytes,
      CAST(sample_rate AS INTEGER) AS sample_rate,
      CAST(n_samples AS INTEGER) AS n_samples,
      CAST(list_max(list_transform(smp, x -> abs(x))) AS INTEGER) AS peak_abs,
      CAST(len(list_filter(range(1, n_samples),
        i -> (smp[i] < 0) != (smp[i + 1] < 0))) AS INTEGER)
        AS zero_crossings,
      CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS energy
    FROM s"""

  /** Oracle: predicts the decoder's output arithmetically from the md5
    * hex — dimensions from seed bytes 2/3, payload size from the padded
    * stride, checksum by regenerating every pixel channel. */
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
      FROM h),
    g AS (
      SELECT doc_id, media_type, bytes,
        1 + bytes[2] % 8 AS w, 1 + bytes[3] % 8 AS h
      FROM b)
    SELECT doc_id, media_type,
      CAST(54 + ((3*w + 3) // 4) * 4 * h AS INTEGER) AS n_bytes,
      CAST(w AS INTEGER) AS width,
      CAST(h AS INTEGER) AS height,
      CAST(list_sum(flatten(list_transform(range(0, h), y ->
        list_transform(range(0, w), x ->
          bytes[(x + 7*y) % 16 + 1]
          + 256 * bytes[(x + 7*y + 3) % 16 + 1]
          + 65536 * bytes[(x + 7*y + 6) % 16 + 1]))))
        AS BIGINT) AS pixel_checksum
    FROM g"""
}
