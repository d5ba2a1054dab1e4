package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the multimodal binary-column plumbing: schema, typed
  * decode via mapPartitions, frame sampling, resize metadata. The
  * decoder is a deterministic stub; what these tests pin down is the
  * distributed shape — schemas, row counts, per-partition behavior. */
class MultimodalSpec extends AnyFunSuite {
  import graft.multimodal.Multimodal

  lazy val spark = TestSpark.spark

  private def mediaDf() = {
    import spark.implicits._
    Seq(
      (1L, "x".repeat(3000)), // 3000 bytes → ~2 "frames"
      (2L, "hello world"),
      (3L, "")) // empty payload must not crash the decoder
      .toDF("media_id", "payload")
      .withColumn("payload", col("payload").cast("binary"))
  }

  test("featurize: schema and deterministic features from the stub decoder") {
    val out = Multimodal.featurize(spark, mediaDf(), "media_id", "payload", "image")
    assert(out.columns.toSeq === Seq("media_id", "media_type", "n_bytes",
      "checksum", "width", "height", "n_frames", "feature"))
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getInt(2) === 3000)
    assert(rows(2L).getInt(2) === 11)
    assert(rows(3L).getInt(2) === 0)
    // determinism: same payload → same checksum on re-run
    val again = Multimodal.featurize(spark, mediaDf(), "media_id", "payload", "image")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { case (id, r) => assert(r.getLong(3) === again(id)) }
    // feature is a normalized 8-bin histogram
    val feat = rows(1L).getSeq[Float](7)
    assert(feat.length === 8)
    assert(math.abs(feat.sum - 1.0f) < 1e-3)
  }

  test("PPM (P6) payloads decode for REAL: header dims + exact channel means") {
    import spark.implicits._
    // 2x2 P6, maxval 255, with a header comment: pixels
    // (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array[Int](
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val ppm = header ++ pixels
    val ds = Multimodal.fromBinary(
      Seq((7L, ppm)).toDF("media_id", "payload"), "media_id", "payload", "image")
    val f = Multimodal.decode(ds).collect()(0)
    assert(f.width === 2 && f.height === 2)
    // means over 4 pixels: R=(255+0+0+255)/4/255, etc.
    assert(math.abs(f.feature(0) - 0.5f) < 1e-6)
    assert(math.abs(f.feature(1) - 0.5f) < 1e-6)
    assert(math.abs(f.feature(2) - 0.5f) < 1e-6)
    // malformed PPM (truncated raster) falls back to the stub, not a crash
    val bad = Multimodal.fromBinary(
      Seq((8L, header ++ pixels.take(5))).toDF("media_id", "payload"),
      "media_id", "payload", "image")
    val fb = Multimodal.decode(bad).collect()(0)
    assert(fb.n_bytes === header.length + 5)
  }

  test("PNG and JPEG payloads decode for REAL via JDK ImageIO") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 4x2: left half pure red, right half pure blue
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in JRE")
      bos.toByteArray
    }
    val ds = Multimodal.fromBinary(
      Seq((1L, encode("png")), (2L, encode("jpg")))
        .toDF("media_id", "payload"), "media_id", "payload", "image")
    val out = Multimodal.decode(ds).collect().map(f => f.media_id -> f).toMap
    out.values.foreach { f =>
      assert(f.width === 4 && f.height === 2, s"dims ${f.width}x${f.height}")
    }
    // PNG is lossless: exact channel means (half red + half blue)
    val png = out(1L).feature
    assert(math.abs(png(0) - 0.5f) < 1e-6)
    assert(math.abs(png(1) - 0.0f) < 1e-6)
    assert(math.abs(png(2) - 0.5f) < 1e-6)
    // JPEG is lossy: means within compression tolerance
    val jpg = out(2L).feature
    assert(math.abs(jpg(0) - 0.5f) < 0.1f, jpg.mkString(","))
    assert(math.abs(jpg(2) - 0.5f) < 0.1f, jpg.mkString(","))
    // features stay in [0,1] — the contract decodePpm pinned
    out.values.foreach(f => f.feature.foreach(v => assert(v >= 0f && v <= 1f)))
  }

  test("WAV payloads decode for REAL via javax.sound: format + amplitude features") {
    import spark.implicits._
    import javax.sound.sampled._
    // 0.1s of a 440 Hz sine at half amplitude, 8 kHz mono 16-bit PCM
    val rate = 8000
    val nSamples = 800
    val amp = 0.5
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt
      pcm(i * 2) = (s & 0xff).toByte // little-endian
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples),
      AudioFileFormat.Type.WAVE, bos)
    val ds = Multimodal.fromBinary(
      Seq((11L, bos.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", "audio")
    val f = Multimodal.decode(ds).collect()(0)
    assert(f.width === rate, "width carries the sample rate")
    assert(f.height === 1, "height carries the channel count")
    assert(f.n_frames === nSamples)
    // sine RMS = amp/sqrt(2) ~ 0.354; zero-crossing rate ~ 2*440/8000 = 0.11
    assert(math.abs(f.feature(0) - amp / math.sqrt(2)) < 0.01,
      s"rms ${f.feature(0)}")
    assert(math.abs(f.feature(2) - amp) < 0.01, s"peak ${f.feature(2)}")
    assert(math.abs(f.feature(3) - 0.11f) < 0.01, s"zcr ${f.feature(3)}")
    // malformed RIFF falls back to the stub, not a crash
    val junk = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    val fb = Multimodal.decode(Multimodal.fromBinary(
      Seq((12L, junk)).toDF("media_id", "payload"),
      "media_id", "payload", "audio")).collect()(0)
    assert(fb.n_bytes === junk.length)
  }

  test("sampleFramesDecoded: REAL animated-GIF frames, stride-sampled") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 5-frame animated GIF: solid red, green, blue, white, black
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, c)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val ds = Multimodal.fromBinary(
      Seq((9L, bos.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", "video")
    val frames = Multimodal.sampleFramesDecoded(ds, stride = 2).collect()
      .map(r => r.getInt(1) -> r).toMap
    assert(frames.keySet === Set(0, 2, 4), s"got ${frames.keySet}")
    frames.values.foreach(r => assert(r.getInt(2) === 3 && r.getInt(3) === 2))
    // frame 0 red, frame 2 blue, frame 4 black (GIF palette is lossy-ish
    // but solid primaries survive exactly)
    def feat(i: Int) = frames(i).getSeq[Float](4)
    assert(feat(0)(0) > 0.9f && feat(0)(2) < 0.1f, feat(0).mkString(","))
    assert(feat(2)(2) > 0.9f && feat(2)(0) < 0.1f, feat(2).mkString(","))
    assert(feat(4).take(3).forall(_ < 0.1f), feat(4).mkString(","))
    // undecodable payloads yield no rows, not a crash
    val junk = Multimodal.fromBinary(
      Seq((10L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"),
      "media_id", "payload", "video")
    assert(Multimodal.sampleFramesDecoded(junk, 1).count() === 0)
  }

  test("video media type derives frame counts from payload size") {
    val out = Multimodal.featurize(spark, mediaDf(), "media_id", "payload", "video")
    val frames = out.collect().map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(frames(1L) === 2) // 3000 / 1024
    assert(frames(2L) === 1)
    assert(frames(3L) === 1)
  }

  test("sampleFrames: stride-samples kilobyte frames with correct bytes") {
    val ds = Multimodal.fromBinary(mediaDf(), "media_id", "payload", "video")
    val frames = Multimodal.sampleFrames(ds, stride = 2).collect()
    val byMedia = frames.groupBy(_.getLong(0))
    // media 1: 2 frames (idx 0,1), stride 2 → keep idx 0 only
    assert(byMedia(1L).map(_.getInt(1)).toSeq === Seq(0))
    assert(byMedia(1L).head.getAs[Array[Byte]](2).length === 1024)
    // media 2: one short frame, kept
    assert(byMedia(2L).head.getAs[Array[Byte]](2).length === 11)
  }

  test("resizePlan: clamps to bounding box, keeps aspect, never upscales") {
    import spark.implicits._
    val meta = Seq((1L, 4000, 2000), (2L, 100, 50), (3L, 200, 800))
      .toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(meta, maxW = 1000, maxH = 1000)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(out(1L) === ((1000, 500)))
    assert(out(2L) === ((100, 50))) // no upscale
    assert(out(3L) === ((200, 800))) // already inside the box
  }

  test("decode runs per-partition (mapPartitions), preserving partition count") {
    val ds = Multimodal.fromBinary(mediaDf().repartition(3),
      "media_id", "payload", "image")
    val decoded = Multimodal.decode(ds)
    assert(decoded.rdd.getNumPartitions === 3)
    assert(decoded.count() === 3)
  }
}
