package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("decode plumbing: batched, deterministic, fixed-width features") {
    val df = Seq(
      (0L, "image", "hello".getBytes("UTF-8")),
      (1L, "audio", "world!".getBytes("UTF-8"))
    ).toDF("doc_id", "modality", "payload")
    val out = Multimodal.fakeDecode(df, featureDim = 8)
    val rows = out.select("doc_id", "features").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.forall(_._2.length == 8))
    // deterministic: same payload → same features across runs
    val again = Multimodal.fakeDecode(df, featureDim = 8)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
    // hand-check doc 0: byte-sum("hello") = 532; f(j) = (532*(j+1) % 997)/997
    val sum = "hello".getBytes("UTF-8").map(_ & 0xff).sum
    val expected = (0 until 8).map(j => ((sum.toLong * (j + 1)) % 997).toFloat / 997f)
    assert(rows(0)._2 == expected)
  }

  /** Render a real PNG in memory: `w`×`h`, solid RGB fill. */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("decodeImages reads real PNG payloads via the JDK codec") {
    val white = pngBytes(100, 60, 0xffffff)
    val black = pngBytes(8, 8, 0x000000)
    val df = Seq(
      (0L, white), (1L, black), (2L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeImages(df)
      .select("doc_id", "width", "height", "mean_luma", "decode_ok")
      .as[(Long, Option[Int], Option[Int], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((0L, Some(100), Some(60), Some(255.0), true)))
    assert(out(1)._2 == Some(8) && out(1)._4 == Some(0.0) && out(1)._5)
    assert(out(2) == ((2L, None, None, None, false)), "corrupt payload must not fail the task")
  }

  test("resizeImages really rescales: output PNG re-decodes at the new size") {
    val df = Seq((1L, pngBytes(100, 60, 0x808080)), (2L, pngBytes(10, 5, 0x808080)),
      (3L, "garbage".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, maxSide = 50)
      .select("doc_id", "payload", "width", "height", "decode_ok")
      .as[(Long, Array[Byte], Option[Int], Option[Int], Boolean)]
      .collect().sortBy(_._1)
    assert((out(0)._3, out(0)._4) == ((Some(50), Some(30))), "aspect-preserving downscale")
    assert((out(1)._3, out(1)._4) == ((Some(10), Some(5))), "small image never upscales")
    assert(!out(2)._5 && java.util.Arrays.equals(out(2)._2, "garbage".getBytes("UTF-8")),
      "corrupt payload passes through unchanged")
    // the emitted payload is a genuine image at the declared size
    val redecoded = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(0)._2))
    assert(redecoded.getWidth == 50 && redecoded.getHeight == 30)
  }

  test("decodeAudio reads real WAV payloads via the JDK codec (javax.sound.sampled)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize a genuine 16-bit PCM mono WAV: 0.5 s of a 440 Hz sine
    // at amplitude 0.5 → RMS = 0.5/√2, peak ≈ 0.5, 4000 frames @ 8 kHz
    val sr = 8000; val n = 4000
    val pcm = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val s = (0.5 * math.sin(2 * math.Pi * 440 * i / sr) * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val wav = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, wav)
    val df = Seq(
      (1L, wav.toByteArray),
      (2L, "definitely not audio".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudio(df)
      .select("doc_id", "sample_rate", "channels", "n_frames", "duration_ms", "rms", "peak", "decode_ok")
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Double], Option[Double], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    val good = out(0)
    assert(good._8, "real WAV must decode")
    assert(good._2 == Some(8000) && good._3 == Some(1) && good._4 == Some(4000L))
    assert(math.abs(good._5.get - 500.0) < 1e-6, s"duration ${good._5}")
    assert(math.abs(good._6.get - 0.5 / math.sqrt(2)) < 0.01, s"rms ${good._6}")
    assert(math.abs(good._7.get - 0.5) < 0.01, s"peak ${good._7}")
    assert(!out(1)._8 && out(1)._2.isEmpty, "garbage payload → decode_ok=false, null facts")
  }

  test("resize stub preserves aspect ratio and never upscales") {
    val df = Seq((1L, 640L, 480L), (2L, 100L, 50L)).toDF("doc_id", "width", "height")
      .withColumn("payload", lit(Array[Byte](1, 2)))
    val out = Multimodal.resizeMeta(df, maxSide = 320)
      .select("doc_id", "resized_width", "resized_height").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 320L, 240L)))   // downscaled, aspect kept
    assert(out(1) == ((2L, 100L, 50L)))    // already small — untouched
  }

  test("imageFeatures computes the grid-luma descriptor from real pixels") {
    // left half black, right half white, 64×64: grid=2 features are
    // row-major [left≈0, right≈1, left≈0, right≈1]
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, if (x < 32) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val df = Seq((1L, buf.toByteArray), (2L, "junk".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.imageFeatures(df, grid = 2)
      .select("doc_id", "features", "decode_ok").as[(Long, Seq[Float], Boolean)]
      .collect().sortBy(_._1)
    assert(out(0)._3 && out(0)._2.length == 4)
    val f = out(0)._2
    assert(f(0) < 0.01 && f(2) < 0.01, s"black cells must be ~0: $f")
    assert(f(1) > 0.99 && f(3) > 0.99, s"white cells must be ~1: $f")
    assert(!out(1)._3 && out(1)._2.isEmpty, "corrupt payload → empty features, ok=false")
    // default grid emits the 64-dim CLIP-shaped vector
    assert(Multimodal.imageFeatures(df).select("features").as[Seq[Float]]
      .collect().head.length == 64)
  }

  test("audioFeatures computes the temporal RMS envelope from real samples") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // first half silence, second half a constant-amplitude square wave
    // at 0.5 → slices=2 envelope is [0, 0.5]; length is a multiple of
    // the 4096-sample block so the slice boundary is exact
    val n = 4096 * 4
    val pcm = new Array[Byte](n * 2)
    (n / 2 until n).foreach { i =>
      val s: Short = if (i % 2 == 0) 16384 else -16384
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val wav = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, wav)
    val df = Seq((1L, wav.toByteArray), (2L, "junk".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.audioFeatures(df, slices = 2)
      .select("doc_id", "features", "decode_ok").as[(Long, Seq[Float], Boolean)]
      .collect().sortBy(_._1)
    assert(out(0)._3 && out(0)._2.length == 2)
    val f = out(0)._2
    assert(f(0) < 0.001, s"silent slice must be ~0: $f")
    assert(math.abs(f(1) - 0.5) < 0.01, s"square-wave slice RMS must be ~0.5: $f")
    assert(!out(1)._3 && out(1)._2.isEmpty)
  }

  // --- planted MP4 construction: a spec-conformant ISO-BMFF box tree
  // (ISO/IEC 14496-12 layouts), built byte by byte so every parsed
  // value has a known planted truth ---
  private def beInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
  private def mbox(tp: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    beInt(body.length + 8) ++ tp.getBytes("US-ASCII") ++ body
  }
  private def plantedTrak(handler: String, w: Int, h: Int, nSamples: Int,
                          sttsEntries: Seq[(Int, Int)]): Array[Byte] = {
    val tkhd = mbox("tkhd", zeros(12), beInt(1), zeros(4), beInt(1200), zeros(52),
      beInt(w << 16), beInt(h << 16))
    val mdhd = mbox("mdhd", zeros(12), beInt(600), beInt(1200), zeros(4))
    val hdlr = mbox("hdlr", zeros(8), handler.getBytes("US-ASCII"), zeros(13))
    val stsz = mbox("stsz", zeros(4), beInt(1), beInt(nSamples))
    val stts = mbox("stts", zeros(4), beInt(sttsEntries.size),
      sttsEntries.toArray.flatMap { case (c, d) => beInt(c) ++ beInt(d) })
    mbox("trak", tkhd, mbox("mdia", mdhd, hdlr, mbox("minf", mbox("stbl", stsz, stts))))
  }
  private lazy val plantedMp4: Array[Byte] = {
    val ftyp = mbox("ftyp", "isom".getBytes("US-ASCII"), beInt(0), "isom".getBytes("US-ASCII"))
    // movie: timescale 600, duration 1200 → 2000 ms; an AUDIO trak
    // FIRST (the handler filter must skip it), then the video trak:
    // 320×240, 48 frames, stts deltas 24×20 then 24×30 media ticks
    val mvhd = mbox("mvhd", zeros(12), beInt(600), beInt(1200), zeros(80))
    val audio = plantedTrak("soun", 0, 0, 999, Seq((999, 10)))
    val video = plantedTrak("vide", 320, 240, 48, Seq((24, 20), (24, 30)))
    ftyp ++ mbox("moov", mvhd, audio, video)
  }

  test("video container decode parses planted MP4 metadata; corrupt payloads flag cleanly") {
    val df = Seq((1L, plantedMp4), (2L, "not an mp4 at all".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.decodeVideo(df)
      .select("doc_id", "width", "height", "duration_ms", "n_frames", "fps", "decode_ok")
      .as[(Long, Option[Int], Option[Int], Option[Double], Option[Long], Option[Double], Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(320), Some(240), Some(2000.0), Some(48L), Some(24.0), true)))
    assert(!out(1)._7 && out(1)._2.isEmpty, "garbage payload → decode_ok=false, null facts")
  }

  test("frame sampler emits real container timestamps, bounded by maxFrames") {
    val df = Seq((1L, plantedMp4), (2L, "junk".getBytes)).toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, maxFrames = 4)
      .select("doc_id", "frame_idx", "frame_ts_ms").as[(Long, Long, Double)]
      .collect().sortBy(_._2)
    // 48 frames sampled at 4 → indices 0, 12, 24, 36; stts walk:
    // first 24 frames 20 ticks, rest 30 ticks, media timescale 600 →
    // 0 ms, 240/600 s, 480/600 s, (480+360)/600 s
    assert(out.forall(_._1 == 1L), "undecodable payload must contribute zero rows")
    assert(out.map(r => (r._2, r._3)).toSeq ==
      Seq((0L, 0.0), (12L, 400.0), (24L, 800.0), (36L, 1400.0)))
  }

  test("C12c image semantic dedup: copy and re-render dup onto the original, patterns survive, corrupt drops") {
    // render REAL PNGs of deterministic gray patterns: f(u, v) in
    // [0, 255] over normalized coordinates, so the same content
    // re-renders identically at any resolution
    def render(w: Int, h: Int)(f: (Double, Double) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = math.max(0, math.min(255, f(x.toDouble / w, y.toDouble / h)))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", buf)
      buf.toByteArray
    }
    val grad = render(64, 64)((u, _) => (u * 255).toInt)
    val gradSmall = render(32, 32)((u, _) => (u * 255).toInt) // same content, half res
    val check = render(64, 64)((u, v) =>
      if (((u * 8).toInt + (v * 8).toInt) % 2 == 0) 230 else 25)
    // distinct stripe patterns fill out the corpus (mutually
    // low-correlation under the centered grid-luma descriptor)
    val stripes = (0 until 8).map { i =>
      (10L + i, render(64, 64)((u, _) =>
        (127 + 120 * math.sin(2 * math.Pi * (i + 2) * u)).toInt))
    }
    val images = (Seq(
      (1L, grad), (2L, grad), (3L, gradSmall), (4L, check),
      (5L, "not a png".getBytes("UTF-8"))) ++ stripes)
      .toDF("doc_id", "payload")
    val out = Multimodal.imageSemDedup(images)
      .select(col("vec_id"), col("is_dup"), col("dup_of"))
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((true, Some(1L))), s"the byte-identical copy must dup onto 1: ${out(2L)}")
    assert(out(3L) == ((true, Some(1L))),
      s"the half-resolution re-render of the same content must dup onto 1: ${out(3L)}")
    assert(!out(1L)._1, "the original keeps itself (keep-lowest-id)")
    assert(!out(4L)._1 && stripes.forall(s => !out(s._1)._1),
      s"unrelated patterns must survive: ${out.filter(_._2._1)}")
    assert(!out.contains(5L), "corrupt payloads drop at the decode gate")
  }

  test("q31 metadata stays typed and payload-independent sizes line up") {
    val out = Multimodal.multimodalMeta(spark, sfDir)
    val docs = Tables(spark, sfDir).documents.count()
    assert(out.count() == docs)
    assert(out.filter(!col("modality").isin("image", "audio", "video")).count() == 0)
    // n_bytes must equal UTF-8 length of the text payload
    val bad = out.join(Tables(spark, sfDir).documents, "doc_id")
      .filter(col("n_bytes") =!= octet_length(col("text"))).count()
    assert(bad == 0)
  }
}
