package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.stages._
import graft.stages.MediaStage._
import graft.stages.ImageStage.ImageIn

/** MediaStage: real WAV decode + features against synthesized PCM with
  * known ground truth, and the fake-codec frame sampler's REAL plumbing —
  * schema, determinism, PNG validity through the production image decoder,
  * and the end-to-end video near-dup path (frame-sample → aHash →
  * pigeonhole hamming join).
  */
class MediaStageSpec extends SparkSpec {

  /** 16-bit little-endian PCM sine, wrapped as a real WAV container. */
  private def sineWav(freqHz: Double, seconds: Double, sampleRate: Float,
      amplitude: Double, channels: Int = 1, invertRight: Boolean = false)
      : Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val data = new Array[Byte](n * 2 * channels)
    for (i <- 0 until n) {
      val v = amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)
      for (c <- 0 until channels) {
        val s = (if (c == 1 && invertRight) -v else v)
        val q = (s * 32767).toInt.toShort
        data((i * channels + c) * 2) = (q & 0xff).toByte
        data((i * channels + c) * 2 + 1) = ((q >> 8) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio features from a real WAV match the signal's ground truth") {
    import spark.implicits._
    val ds = Seq(AudioIn("sine", sineWav(440.0, 0.5, 8000f, 0.5))).toDS()
    val f = MediaStage.audioFeatureStage.run(ds).collect().head
    assert(f.ok && f.sampleRate == 8000 && f.channels == 1)
    assert(f.nSamples == 4000)
    assert(math.abs(f.durationSec - 0.5) < 1e-9)
    // Sine: rms = A/sqrt(2), peak = A, zero-crossings = 2f per second.
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, f.rms)
    assert(math.abs(f.peak - 0.5) < 0.01, f.peak)
    assert(math.abs(f.zeroCrossRate - 2 * 440.0 / 8000) < 0.01, f.zeroCrossRate)
  }

  test("PCM variants normalize: 8-bit unsigned WAV and big-endian AIFF") {
    import spark.implicits._
    // 8-bit unsigned WAV (0..255 around 128) and 16-bit big-endian AIFF
    // both funnel through the signed-16 normalization path.
    def encoded(bits: Int, bigEndian: Boolean,
        fileType: AudioFileFormat.Type): Array[Byte] = {
      val (rate, n, amp) = (8000f, 2000, 0.5)
      val data = new Array[Byte](n * bits / 8)
      for (i <- 0 until n) {
        val v = amp * math.sin(2 * math.Pi * 440.0 * i / rate)
        if (bits == 8) data(i) = ((v * 127).toInt + 128).toByte
        else {
          val q = (v * 32767).toInt.toShort
          val (b0, b1) = if (bigEndian) ((q >> 8).toByte, (q & 0xff).toByte)
            else ((q & 0xff).toByte, (q >> 8).toByte)
          data(2 * i) = b0; data(2 * i + 1) = b1
        }
      }
      val fmt = new AudioFormat(
        if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED
        else AudioFormat.Encoding.PCM_SIGNED,
        rate, bits, 1, bits / 8, rate, bigEndian)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new ByteArrayInputStream(data), fmt, n.toLong), fileType, out)
      out.toByteArray
    }
    val ds = Seq(
      AudioIn("u8wav", encoded(8, bigEndian = false, AudioFileFormat.Type.WAVE)),
      AudioIn("beaiff", encoded(16, bigEndian = true, AudioFileFormat.Type.AIFF)))
      .toDS()
    val out = MediaStage.audioFeatureStage.run(ds).collect()
      .map(f => f.assetId -> f).toMap
    out.values.foreach { f =>
      assert(f.ok && f.sampleRate == 8000 && f.nSamples == 2000, f)
      // 8-bit quantization adds ~1/256 noise; both stay near A/sqrt(2).
      assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.02, f)
      assert(math.abs(f.zeroCrossRate - 2 * 440.0 / 8000) < 0.01, f)
    }
  }

  test("stereo decodes with channel-mean mixing (anti-phase cancels)") {
    import spark.implicits._
    val ds = Seq(
      AudioIn("inphase", sineWav(200.0, 0.25, 8000f, 0.4, channels = 2)),
      AudioIn("antiphase", sineWav(200.0, 0.25, 8000f, 0.4, channels = 2,
        invertRight = true))).toDS()
    val out = MediaStage.audioFeatureStage.run(ds).collect()
      .map(f => f.assetId -> f).toMap
    assert(out("inphase").channels == 2)
    assert(math.abs(out("inphase").rms - 0.4 / math.sqrt(2)) < 0.01)
    // L = -R: the channel-mean signal is (quantization-level) silence.
    assert(out("antiphase").rms < 1e-3, out("antiphase").rms)
  }

  test("undecodable audio is an ok=false row, not an exception") {
    import spark.implicits._
    val ds = Seq(AudioIn("junk", Array[Byte](1, 2, 3, 4, 5))).toDS()
    val f = MediaStage.audioFeatureStage.run(ds).collect().head
    assert(!f.ok)
  }

  private def fakeVideo(seed: Int, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((i * 31 + seed) & 0xff).toByte)

  test("frame sampling: cadence, cap, determinism, and empty input") {
    import spark.implicits._
    val v = VideoIn("v1", fakeVideo(7, 5000))
    val sampled = MediaStage.frameSampleStage(everyMs = 1000, maxFrames = 10)
      .run(Seq(v).toDS()).collect().head
    assert(sampled.ok && sampled.durationMs == 5000)
    assert(sampled.frames.map(f => (f.frameIdx, f.tsMs)) ==
      Seq((0, 0L), (1, 1000L), (2, 2000L), (3, 3000L), (4, 4000L)))
    // The per-asset cap bounds frames; the count exposes the drop.
    val capped = MediaStage.frameSampleStage(everyMs = 1000, maxFrames = 3)
      .run(Seq(v).toDS()).collect().head
    assert(capped.frames.size == 3)
    // Same bytes, same frames — bit-for-bit.
    val again = MediaStage.frameSampleStage(everyMs = 1000, maxFrames = 10)
      .run(Seq(v).toDS()).collect().head
    assert(again.frames.map(_.png.toSeq) == sampled.frames.map(_.png.toSeq))
    val empty = MediaStage.frameSampleStage(everyMs = 1000, maxFrames = 10)
      .run(Seq(VideoIn("v0", Array.emptyByteArray)).toDS()).collect().head
    assert(!empty.ok && empty.frames.isEmpty)
  }

  test("sampled frames are real PNGs: the production image decoder reads them") {
    import spark.implicits._
    val vf = MediaStage.frameSampleStage(everyMs = 500, maxFrames = 4)
      .run(Seq(VideoIn("v1", fakeVideo(3, 2000))).toDS())
    val frames = vf.flatMap(v =>
      v.frames.map(f => ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))
    val metas = ImageStage.decodeStage.run(frames).collect()
    assert(metas.length == 4)
    assert(metas.forall(m => m.ok && m.width == FakeVideoCodec.side &&
      m.height == FakeVideoCodec.side))
  }

  // ------------------------------------------------------------------
  // Real codec: MJPEG in a RIFF/AVI container, generated here frame by
  // frame (ImageIO JPEG encode + hand-rolled RIFF writer following the
  // published chunk layout), then decoded by the production MjpegAviCodec.
  // ------------------------------------------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data ++
      (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def list(typ: String, body: Array[Byte]): Array[Byte] =
    "LIST".getBytes("US-ASCII") ++ le32(body.length + 4L) ++
      typ.getBytes("US-ASCII") ++ body

  /** A gray two-tone test frame: `horizontal` splits left/right,
    * otherwise top/bottom — structurally distinct aHash patterns.
    */
  private def toneFrame(w: Int, h: Int, v: Int,
      horizontal: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val dark = if (horizontal) x < w / 2 else y < h / 2
      val g = if (dark) v else 255 - v
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A complete MJPEG AVI: RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
    * strf)) LIST('movi' 00dc*)).
    */
  private def mjpegAvi(jpegFrames: Seq[Array[Byte]], fps: Int,
      w: Int, h: Int): Array[Byte] = {
    val usPerFrame = 1000000L / fps
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
        le32(jpegFrames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps.toLong) ++ le32(0) ++
        le32(jpegFrames.length.toLong) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        "MJPG".getBytes("US-ASCII") ++ le32(w.toLong * h * 3) ++
        Array.fill(16)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", jpegFrames.flatMap(chunk("00dc", _)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  test("MJPEG/AVI: real container parse, avih timing, time-driven decode") {
    import spark.implicits._
    // 10 frames at 10 fps, gray level stepping 20..200: a 1000 ms clip.
    val clip = mjpegAvi(
      (0 until 10).map(i => toneFrame(32, 24, 20 + i * 20, horizontal = true)),
      fps = 10, w = 32, h = 24)
    val out = MediaStage.frameSampleStage(everyMs = 250, maxFrames = 10,
        codec = MediaStage.MjpegAviCodec)
      .run(Seq(VideoIn("clip", clip)).toDS()).collect().head
    assert(out.ok && out.durationMs == 1000L, out)
    assert(out.frames.map(f => (f.frameIdx, f.tsMs)) ==
      Seq((0, 0L), (1, 250L), (2, 500L), (3, 750L)))
    // Each sampled PNG is the SOURCE frame covering its timestamp: the
    // dark half's gray level tracks 20 + floor(ts/100)*20 through the
    // real JPEG decode (lossy, so tolerance).
    out.frames.foreach { f =>
      val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(f.png))
      assert(img.getWidth == 32 && img.getHeight == 24)
      val expected = 20 + (f.tsMs / 100).toInt * 20
      val got = img.getRGB(2, 12) & 0xff
      assert(math.abs(got - expected) < 10, s"ts=${f.tsMs}: $got vs $expected")
    }
    // Garbage and truncated containers land as ok=false rows, like audio.
    val bad = MediaStage.frameSampleStage(everyMs = 250, maxFrames = 10,
        codec = MediaStage.MjpegAviCodec)
      .run(Seq(VideoIn("junk", Array.tabulate(500)(_.toByte)),
        VideoIn("trunc", clip.take(200))).toDS()).collect()
    assert(bad.forall(v => !v.ok && v.frames.isEmpty))
  }

  test("hostile AVI sizes (incl. 2^31 overflow) land as ok=false rows") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // A chunk whose declared size would overflow Int bound arithmetic,
    // plus fuzz: valid RIFF/AVI magic over random bodies.
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(0xfffffff0L) ++
      "AVI ".getBytes("US-ASCII") ++ "00dc".getBytes("US-ASCII") ++
      le32(0x7ffffffaL) ++ Array.fill(32)(1.toByte)
    val fuzz = (0 until 50).map { i =>
      VideoIn(s"fz$i", "RIFF".getBytes("US-ASCII") ++ le32(rnd.nextLong() & 0xffffffffL) ++
        "AVI ".getBytes("US-ASCII") ++
        Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte))
    }
    val out = MediaStage.frameSampleStage(everyMs = 100, maxFrames = 4,
        codec = MediaStage.MjpegAviCodec)
      .run((VideoIn("evil", evil) +: fuzz).toDS()).collect()
    assert(out.length == 51 && out.forall(v => !v.ok && v.frames.isEmpty))
  }

  test("deeply nested LISTs can't blow the stack (walk is iterative)") {
    import spark.implicits._
    // ~100 KB of untrusted input buys ~8k nesting levels — enough to
    // StackOverflowError a recursive walk, and Error bypasses the stage's
    // decodability catch, killing the task. The iterative walk must keep
    // this on the ok=false path. Innermost payload is a real frame chunk
    // so a walk that silently stops early would also be caught (the bomb
    // has no avih, so a FULL parse must reject it via the require).
    val depth = 8000
    var body: Array[Byte] = chunk("00dc", Array.fill(4)(9.toByte))
    (0 until depth).foreach(_ => body = list("mdat", body))
    val bomb = "RIFF".getBytes("US-ASCII") ++ le32(body.length + 4L) ++
      "AVI ".getBytes("US-ASCII") ++ body
    val out = MediaStage.frameSampleStage(everyMs = 100, maxFrames = 4,
        codec = MediaStage.MjpegAviCodec)
      .run(Seq(VideoIn("bomb", bomb)).toDS()).collect()
    assert(out.length == 1 && !out.head.ok && out.head.frames.isEmpty)
    // And nesting does not break a well-formed parse: the standard clip
    // from the timing test still decodes when wrapped in extra LISTs
    // around hdrl/movi — a structure some muxers emit.
    val clip = mjpegAvi(Seq(toneFrame(16, 16, 40, horizontal = true)),
      fps = 4, w = 16, h = 16)
    assert(MediaStage.MjpegAviCodec.durationMs(clip) == 250L)
  }

  test("e2e REAL-codec near-dup: AVI decode -> aHash -> hamming pairs") {
    import spark.implicits._
    def clip(horizontal: Boolean): Array[Byte] = mjpegAvi(
      (0 until 6).map(i => toneFrame(32, 24, 30 + i * 25, horizontal)),
      fps = 10, w = 32, h = 24)
    // a and b are byte-identical footage; c splits its tones the other way.
    val vids = Seq(
      VideoIn("a", clip(horizontal = true)),
      VideoIn("b", clip(horizontal = true)),
      VideoIn("c", clip(horizontal = false))).toDS()
    val frames = MediaStage.frameSampleStage(everyMs = 300, maxFrames = 2,
        codec = MediaStage.MjpegAviCodec)
      .run(vids)
      .flatMap(v => v.frames.map(f => ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))
    val hashed = ImageStage.aHashStage.run(frames)
    assert(hashed.count() == 6 && hashed.filter(!_.ok).isEmpty)
    val pairs = operators.Dedup.hammingNearPairs(
        hashed.toDF(), "assetId", "ahash", bits = 64, maxDist = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def pair(a: String, b: String) = if (a < b) (a, b) else (b, a)
    // Identical footage pairs frame-for-frame at distance 0...
    assert(pairs(pair("a#0", "b#0")) == 0L)
    assert(pairs(pair("a#1", "b#1")) == 0L)
    // ...and the structurally different clip never pairs with a or b.
    assert(!pairs.keys.exists { case (x, y) =>
      (x.startsWith("c") && !y.startsWith("c")) ||
        (!x.startsWith("c") && y.startsWith("c"))
    }, pairs)
  }

  test("e2e video near-dup: frame-sample -> aHash -> hamming pairs") {
    import spark.implicits._
    // A and B are byte-identical footage; C is different.
    val vids = Seq(
      VideoIn("a", fakeVideo(1, 3000)),
      VideoIn("b", fakeVideo(1, 3000)),
      VideoIn("c", fakeVideo(2, 3000))).toDS()
    val frames = MediaStage.frameSampleStage(everyMs = 1500, maxFrames = 2)
      .run(vids)
      .flatMap(v => v.frames.map(f => ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))
    val hashed = ImageStage.aHashStage.run(frames)
    assert(hashed.count() == 6 && hashed.filter(!_.ok).isEmpty)
    val pairs = operators.Dedup.hammingNearPairs(
        hashed.toDF(), "assetId", "ahash", bits = 64, maxDist = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def pair(a: String, b: String) = if (a < b) (a, b) else (b, a)
    // Identical footage pairs frame-for-frame at distance 0...
    assert(pairs(pair("a#0", "b#0")) == 0L)
    assert(pairs(pair("a#1", "b#1")) == 0L)
    // ...and nothing pairs with the distinct video (or across timestamps).
    assert(pairs.size == 2, pairs)
  }
}
