package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side machinery — schema, typed Datasets, per-partition
  * batch processing, partition sizing — is real and tested. Decode is
  * REAL for PPM (pure-JVM parser), PNG/JPEG/BMP/GIF (JDK
  * `javax.imageio`), animated-GIF frames, and WAV audio (JDK
  * `javax.sound.sampled`) — all headless-safe, zero added
  * dependencies. Only compressed audio (MP3/AAC) and true video remain
  * clearly-marked STUBs (the JRE ships no codecs for them):
  * `decodeStub` derives deterministic fake features from the raw
  * bytes. Swapping in a real codec changes ONE function and nothing
  * about the distributed plan.
  *
  * Scale notes:
  *   - Decode runs in `mapPartitions`, so a real codec amortizes its
  *     init (model load, JNI handles) once per partition, not per row.
  *   - Media blobs make rows wide; size input partitions by bytes
  *     (`spark.sql.files.maxPartitionBytes`), and repartition by a
  *     content-hash key before decode when sources produce skewed file
  *     sizes.
  *   - Features come out as fixed-width `Array[Float]` ready for the
  *     graft.similarity operators.
  */
object Multimodal {

  // ImageIO's default ImageInputStream cache writes a temp FILE per
  // decode — per-row disk IO on the executors. Payloads are already
  // in-memory byte arrays; keep the cache on-heap. (Object init runs
  // once per executor JVM, before the first decodeOne call.)
  javax.imageio.ImageIO.setUseCache(false)

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      declared_width: Int,
      declared_height: Int)

  /** Decoded output: per-media features + verified metadata. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Normalize an arbitrary DataFrame into the media schema: the
    * payload column is cast to binary, metadata defaulted. */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("content"),
      lit(0).as("declared_width"),
      lit(0).as("declared_height"))
      .as[MediaRecord]
  }

  /** STUB decoder ??? — deterministic fake standing in for a real codec
    * (e.g. ImageIO / ffmpeg). Derives: byte checksum, fake dimensions
    * from header bytes, frame count from payload length, and an 8-float
    * "embedding" from a byte histogram. Deterministic → testable. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.content
    val n = bytes.length
    val checksum = byteChecksum(bytes)
    val width = if (n >= 2) ((bytes(0) & 0xff) << 4) | (bytes(1) & 0x0f) else 0
    val height = if (n >= 4) ((bytes(2) & 0xff) << 4) | (bytes(3) & 0x0f) else 0
    val nFrames = r.media_type match {
      case "video" => math.max(1, n / 1024)
      case "audio" => math.max(1, n / 256)
      case _ => 1
    }
    val hist = new Array[Float](8)
    var i = 0
    while (i < n) { hist((bytes(i) & 0xff) >> 5) += 1f; i += 1 }
    if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
    MediaFeatures(r.media_id, r.media_type, n, checksum, width, height,
      nFrames, hist)
  }

  /** REAL decoder for binary PPM (P6) images — pure JVM, no codec
    * libraries: parses the header (width / height / maxval, `#`
    * comments) and computes mean R/G/B + mean-luma features over the
    * 8-bit pixel payload. One codec being real end-to-end pins the
    * exact contract (dimensions from the payload, features in [0,1],
    * fallback on malformed input) a library-backed JPEG/audio decoder
    * must meet when swapped into [[decode]]. Returns None for
    * non-PPM / malformed / 16-bit payloads → [[decodeStub]] fallback. */
  private[multimodal] def decodePpm(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 2 || b(0) != 'P'.toByte || b(1) != '6'.toByte) return None
    try {
      var pos = 2
      def skipWs(): Unit = {
        var in = true
        while (in && pos < b.length) {
          val c = b(pos).toChar
          if (c == '#') { while (pos < b.length && b(pos) != '\n'.toByte) pos += 1 }
          else if (c.isWhitespace) pos += 1
          else in = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0; var any = false
        while (pos < b.length && b(pos) >= '0'.toByte && b(pos) <= '9'.toByte) {
          v = v * 10 + (b(pos) - '0'); pos += 1; any = true
        }
        require(any, "missing integer in PPM header"); v
      }
      val w = int(); val h = int(); val maxv = int()
      pos += 1 // exactly one whitespace byte before the raster
      require(w > 0 && h > 0 && maxv > 0 && maxv < 256, "unsupported PPM")
      require(b.length - pos >= w.toLong * h * 3, "truncated PPM raster")
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = pos
      val end = pos + w * h * 3
      while (i < end) {
        sr += b(i) & 0xff; sg += b(i + 1) & 0xff; sb += b(i + 2) & 0xff
        i += 3
      }
      val checksum = byteChecksum(b)
      val denom = (w.toFloat * h) * maxv
      val (mr, mg, mb) = (sr / denom, sg / denom, sb / denom)
      val luma = 0.299f * mr + 0.587f * mg + 0.114f * mb
      Some(MediaFeatures(r.media_id, r.media_type, b.length, checksum,
        w, h, 1, Array(mr, mg, mb, luma, 0f, 0f, 0f, 0f)))
    } catch { case _: Exception => None }
  }

  /** Shared byte checksum of a payload (same polynomial across stub and
    * every real decoder, so media identity is codec-independent). */
  private def byteChecksum(b: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < b.length) { checksum = checksum * 31 + (b(i) & 0xff); i += 1 }
    checksum
  }

  /** Mean R/G/B + Rec.601 luma of a decoded image, each in [0,1] —
    * shared by still-image decode and per-frame GIF features (one
    * fix to the color math must reach both). Row-batched getRGB: a
    * per-pixel call round-trips the ColorModel per pixel. */
  private def meanRgbLuma(img: java.awt.image.BufferedImage)
      : (Float, Float, Float, Float) = {
    val w = img.getWidth
    val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val denom = w.toFloat * h * 255
    val (mr, mg, mb) = (sr / denom, sg / denom, sb / denom)
    (mr, mg, mb, 0.299f * mr + 0.587f * mg + 0.114f * mb)
  }

  /** REAL decoder for PNG / JPEG / BMP / GIF via JDK `javax.imageio` —
    * headless-safe, zero dependencies beyond the JRE. Meets the exact
    * contract [[decodePpm]] pinned: dimensions from the payload, mean
    * R/G/B + mean-luma features in [0,1], None on anything ImageIO
    * can't parse (→ stub fallback). Format sniffing is ImageIO's own
    * (magic bytes), so a mislabeled payload still decodes or falls
    * through cleanly. */
  private[multimodal] def decodeImageIo(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    if (b.length < 4) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) return None // no registered reader for the format
      if (img.getWidth <= 0 || img.getHeight <= 0) return None
      val (mr, mg, mb, luma) = meanRgbLuma(img)
      Some(MediaFeatures(r.media_id, r.media_type, b.length, byteChecksum(b),
        img.getWidth, img.getHeight, 1,
        Array(mr, mg, mb, luma, 0f, 0f, 0f, 0f)))
    } catch { case _: Exception => None }
  }

  /** REAL decoder for WAV audio via JDK `javax.sound.sampled` —
    * headless, zero dependencies. Parses the format (sample rate,
    * channels, frame count) and computes amplitude features over the
    * decoded PCM samples, normalized to [0,1]:
    * feature = (rms, meanAbs, peak, zeroCrossingRate, 0...).
    * `width` carries the sample rate, `height` the channel count,
    * `n_frames` the PCM frame count — the typed metadata a real audio
    * pipeline partitions and filters on. None for non-WAV/unsupported
    * encodings (→ stub fallback). */
  private[multimodal] def decodeWav(r: MediaRecord): Option[MediaFeatures] = {
    val b = r.content
    // RIFF....WAVE magic — don't pay a parser attempt on other payloads
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        if (bits != 16 && bits != 8) return None // PCM 8/16-bit only
        val channels = fmt.getChannels
        val frames = in.getFrameLength
        val bytes = in.readAllBytes()
        val n = bytes.length / (bits / 8)
        if (n == 0) return None
        var (sumSq, sumAbs) = (0.0, 0.0)
        var peak = 0.0
        var crossings = 0L
        var prevNeg = false
        val big = fmt.isBigEndian
        var i = 0
        while (i < n) {
          val s: Double =
            if (bits == 16) {
              val o = i * 2
              val v = if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xff))
                else ((bytes(o + 1) << 8) | (bytes(o) & 0xff))
              v.toShort / 32768.0
            } else (if (fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
              bytes(i).toDouble else ((bytes(i) & 0xff) - 128).toDouble) / 128.0
          val a = math.abs(s)
          sumSq += s * s; sumAbs += a
          if (a > peak) peak = a
          val neg = s < 0
          if (i > 0 && neg != prevNeg) crossings += 1
          prevNeg = neg
          i += 1
        }
        val checksum = byteChecksum(b)
        val rms = math.sqrt(sumSq / n).toFloat
        val feat = Array(rms, (sumAbs / n).toFloat, peak.toFloat,
          (crossings.toDouble / n).toFloat, 0f, 0f, 0f, 0f)
        Some(MediaFeatures(r.media_id, r.media_type, b.length, checksum,
          fmt.getSampleRate.toInt, channels,
          if (frames >= 0) frames.toInt else n / channels, feat))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  private def decodeOne(r: MediaRecord): MediaFeatures =
    decodePpm(r).orElse(decodeWav(r)).orElse(decodeImageIo(r))
      .getOrElse(decodeStub(r))

  /** Deterministic 16-bit mono PCM square-wave WAV — the classic test
    * signal generator. Sample i = +amp while `(i / halfPeriod)` is
    * even, else -amp; `n` samples at `rate` Hz. Chosen because the
    * decoder-facing amplitude features have CLOSED FORMS (rms =
    * meanAbs = peak = amp/32768 — exact dyadic doubles when amp is a
    * multiple of 2048 — and crossings = (n-1)/halfPeriod), which is
    * what lets the REAL javax.sound decode path sit under an
    * arithmetic oracle end-to-end (q161): a header, endianness, or
    * off-by-one bug anywhere in synth → parse → PCM walk breaks
    * equality. */
  def squareWav(amp: Int, halfPeriod: Int, n: Int, rate: Int): Array[Byte] = {
    require(amp > 0 && amp <= 32767, s"amp out of 16-bit range: $amp")
    require(halfPeriod > 0 && n > 0 && rate > 0)
    val data = new Array[Byte](44 + 2 * n)
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) {
      bb.putShort((if ((i / halfPeriod) % 2 == 0) amp else -amp).toShort)
      i += 1
    }
    data
  }

  /** Decode + feature-extract: per-partition batch loop so a real codec
    * pays init cost once per partition. PPM (pure-JVM parser),
    * PNG/JPEG/BMP/GIF (JDK ImageIO), and WAV (JDK javax.sound) decode
    * for real; compressed audio / true video go through the stub (no
    * codec libraries in the JRE). */
  def decode(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // real impl: open additional codecs/sessions HERE, close after
      // the iterator is exhausted
      it.map(decodeOne)
    }
  }

  /** REAL frame extraction for animated GIFs — the one multi-frame
    * format the JRE decodes (`javax.imageio` GIF reader): every
    * `stride`-th frame is decoded and reduced to mean-RGB+luma
    * features, rows (media_id, frame_idx, width, height, feature).
    * Frames are the raw per-frame rasters; GIF inter-frame compositing
    * (disposal methods) is NOT applied — features describe what each
    * frame encodes, which is the right input for frame-level dedup /
    * similarity. Non-animated images yield one row; undecodable
    * payloads yield none (filter upstream or fall back to
    * [[sampleFrames]]). A real video codec slots in at the same
    * per-partition position with the same row shape. */
  def sampleFramesDecoded(ds: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    require(stride >= 1, "stride must be >= 1")
    ds.flatMap { r =>
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Seq.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true) // allowSearch: in-memory, cheap
            (0 until n by stride).map { i =>
              val img = reader.read(i)
              val (mr, mg, mb, luma) = meanRgbLuma(img)
              (r.media_id, i, img.getWidth, img.getHeight,
                Array(mr, mg, mb, luma))
            }
          } finally { reader.dispose(); iis.close() }
        }
      } catch { case _: Exception => Seq.empty }
    }.toDF("media_id", "frame_idx", "width", "height", "feature")
  }

  /** Frame sampling: keep every `stride`-th kilobyte-"frame" of the
    * payload (STUB for real frame extraction — the slicing arithmetic
    * and row shape are what a real sampler produces; for animated GIFs
    * [[sampleFramesDecoded]] extracts REAL frames). */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.flatMap { r =>
      val n = math.max(1, r.content.length / 1024)
      (0 until n by stride).map { f =>
        val from = f * 1024
        val until = math.min(r.content.length, from + 1024)
        (r.media_id, f, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Resize metadata transform (STUB: real impl re-encodes pixels; the
    * metadata contract — clamp to a bounding box, keep aspect — is the
    * tested part). */
  def resizePlan(df: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / greatest(col("width"), lit(1)),
      lit(maxH.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    df.withColumn("target_width",
        ceil(col("width") * scale).cast("int"))
      .withColumn("target_height",
        ceil(col("height") * scale).cast("int"))
  }

  /** End-to-end: binary table → decode → features DataFrame, ready to
    * feed graft.similarity (feature column) or byte-level analytics. */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, mediaType: String): DataFrame =
    decode(fromBinary(df, idCol, payloadCol, mediaType)).toDF()
}
