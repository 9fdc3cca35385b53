package graft.stages

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

/** Audio/video counterparts of [[ImageStage]]: media travels as opaque
  * binary columns with typed metadata, and per-asset work runs as
  * load-nothing [[InferenceStage]]s (mapPartitions, linear in input
  * splits — the only shape that holds at 1000 executors).
  *
  * Audio is a REAL decode path: javax.sound.sampled reads WAV/AIFF/AU
  * PCM from the JDK with no added dependency, so duration, RMS energy,
  * peak and zero-crossing rate come from actual samples, and decode
  * failures land as ok=false rows (the F4 decodability convention).
  *
  * Video has no JDK codec, so frame sampling is split in two:
  * [[FakeVideoCodec]] is a clearly-marked deterministic stand-in for the
  * real decoder (swap in a JavaCV/ffmpeg-backed codec behind the same
  * two methods on a real deployment), while everything Spark-side —
  * schema, the explode to one-row-per-frame, partitioning, and the
  * downstream perceptual-hash near-dup join — is real: the fake codec
  * emits genuine PNG bytes, so sampled frames flow through
  * [[ImageStage.decodeStage]] / [[ImageStage.aHashStage]] and
  * graft.operators.Dedup.hammingNearPairs unchanged.
  */
object MediaStage {

  // ------------------------------------------------------------------
  // Audio: real PCM decode + feature extraction
  // ------------------------------------------------------------------

  final case class AudioIn(assetId: String, content: Array[Byte])

  /** Per-asset audio features over the channel-mean signal, all in one
    * streaming pass: no sample buffer grows with asset length.
    */
  final case class AudioFeatures(assetId: String, ok: Boolean,
      sampleRate: Int, channels: Int, nSamples: Long, durationSec: Double,
      rms: Double, peak: Double, zeroCrossRate: Double)

  /** Decode + feature-extract (duration, RMS, peak, zero-crossing rate,
    * each over full-scale-normalized samples in [-1, 1]). Compressed or
    * unreadable input yields an ok=false row, never an exception.
    */
  def audioFeatureStage: InferenceStage[AudioIn, AudioFeatures] =
    new InferenceStage[AudioIn, AudioFeatures] {
      def setup(): ModelHandle[AudioIn, AudioFeatures] =
        new ModelHandle[AudioIn, AudioFeatures] {
          def infer(in: AudioIn): AudioFeatures =
            try {
              val raw = AudioSystem.getAudioInputStream(
                new ByteArrayInputStream(in.content))
              // Normalize any PCM variant (8/24/32-bit, unsigned, either
              // endianness) to signed 16-bit so the sample loop below has
              // one decode path.
              val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
                raw.getFormat.getSampleRate, 16, raw.getFormat.getChannels,
                raw.getFormat.getChannels * 2, raw.getFormat.getSampleRate,
                false)
              val pcm = AudioSystem.getAudioInputStream(fmt, raw)
              val ch = fmt.getChannels
              val frameBytes = fmt.getFrameSize
              val buf = new Array[Byte](frameBytes * 1024)
              var n = 0L; var sumSq = 0.0; var peak = 0.0
              var crossings = 0L; var prevSign = 0
              var read = pcm.read(buf)
              while (read > 0) {
                var off = 0
                while (off + frameBytes <= read) {
                  // Channel-mean sample, little-endian int16 per channel.
                  var s = 0.0; var c = 0
                  while (c < ch) {
                    val lo = buf(off + 2 * c) & 0xff
                    val hi = buf(off + 2 * c + 1).toInt
                    s += ((hi << 8) | lo).toShort / 32768.0
                    c += 1
                  }
                  s /= ch
                  sumSq += s * s
                  if (math.abs(s) > peak) peak = math.abs(s)
                  val sign = if (s > 0) 1 else if (s < 0) -1 else 0
                  if (sign != 0 && prevSign != 0 && sign != prevSign)
                    crossings += 1
                  if (sign != 0) prevSign = sign
                  n += 1
                  off += frameBytes
                }
                read = pcm.read(buf)
              }
              pcm.close()
              if (n == 0) AudioFeatures(in.assetId, ok = false, 0, 0, 0, 0, 0, 0, 0)
              else AudioFeatures(in.assetId, ok = true,
                fmt.getSampleRate.toInt, ch, n, n / fmt.getSampleRate.toDouble,
                math.sqrt(sumSq / n), peak,
                if (n > 1) crossings.toDouble / (n - 1) else 0.0)
            } catch {
              case _: Exception =>
                AudioFeatures(in.assetId, ok = false, 0, 0, 0, 0, 0, 0, 0)
            }
        }
    }

  // ------------------------------------------------------------------
  // Video: pluggable codec (a REAL pure-JVM MJPEG/AVI decoder and a
  // deterministic fake), real frame-sampling plumbing
  // ------------------------------------------------------------------

  final case class VideoIn(assetId: String, content: Array[Byte])
  final case class SampledFrame(frameIdx: Int, tsMs: Long, png: Array[Byte])
  final case class VideoFrames(assetId: String, ok: Boolean,
      durationMs: Long, frames: Seq[SampledFrame])

  /** The codec seam [[frameSampleStage]] runs on: container duration and
    * time-driven frame sampling. [[MjpegAviCodec]] is the real in-JVM
    * implementation; [[FakeVideoCodec]] the deterministic test stand-in;
    * an ffmpeg/JavaCV adapter for other codecs implements the same two
    * methods. Implementations may throw on malformed input — the stage
    * maps that to an ok=false row (F4 decodability convention).
    */
  trait VideoCodec extends Serializable {
    def durationMs(content: Array[Byte]): Long
    def sampleFrames(content: Array[Byte], everyMs: Long,
        maxFrames: Int): Seq[SampledFrame]
  }

  /** DETERMINISTIC FAKE video codec — the synthetic-corpus stand-in (the
    * driver's video column is opaque random bytes, not real containers).
    * The fake is honest about shape: duration is a pure function of the
    * byte length (1 byte = 1 ms of footage), a frame at time t is a 16×16
    * image whose pixels derive from an FNV-1a hash of (content, t) — so
    * identical bytes yield identical frames, distinct bytes yield (whp)
    * distinct frames — and each frame is encoded as a REAL PNG, keeping
    * every downstream consumer (decode, aHash, hamming near-dup) on its
    * production path. Real containers go through [[MjpegAviCodec]].
    */
  object FakeVideoCodec extends VideoCodec {
    val side = 16

    def durationMs(content: Array[Byte]): Long = content.length.toLong

    /** One FNV-1a fold over the asset bytes — computed once per asset,
      * then mixed per frame, so sampling k frames costs O(bytes + k),
      * not O(k × bytes).
      */
    def contentSeed(content: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < content.length) {
        h ^= content(i) & 0xffL; h *= 0x100000001b3L
        i += 1
      }
      h
    }

    def frameAt(seed: Long, tsMs: Long): Array[Byte] = {
      var h = seed
      h ^= tsMs; h *= 0x100000001b3L
      val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          // Per-pixel splitmix64 step off the frame seed.
          var z = h + (y * side + x + 1) * 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          img.setRGB(x, y, ((z ^ (z >>> 31)) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    def sampleFrames(content: Array[Byte], everyMs: Long,
        maxFrames: Int): Seq[SampledFrame] = {
      val dur = durationMs(content)
      val seed = contentSeed(content)
      sampleTimes(dur, everyMs, maxFrames).map { case (ts, idx) =>
        SampledFrame(idx, ts, frameAt(seed, ts))
      }
    }
  }

  /** The shared sampling schedule: one frame every `everyMs` starting at
    * t=0, capped at `maxFrames`, as (tsMs, sampleIdx) pairs.
    */
  private def sampleTimes(durationMs: Long, everyMs: Long,
      maxFrames: Int): Seq[(Long, Int)] =
    Iterator.from(0).map(_ * everyMs).takeWhile(_ < durationMs)
      .take(maxFrames).zipWithIndex.toSeq

  /** REAL video decode, no native dependency: MJPEG in an AVI (RIFF)
    * container — each video frame is a complete JPEG, which the JDK's
    * ImageIO decodes — the standard pure-JVM choice in a container that
    * ships no ffmpeg. The parse follows the published RIFF/AVI layout:
    * `RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi' 00dc*))`, timing from
    * the avih MainAVIHeader (dwMicroSecPerFrame at offset 0, dwTotalFrames
    * at offset 16), frame payloads from the movi-list '00dc'/'00db'
    * chunks in stream order. Sampled frames are decoded (real JPEG
    * decode) and re-encoded as PNG so every downstream consumer sees the
    * same frame schema as the fake codec's output. Malformed containers
    * throw; [[frameSampleStage]] turns that into ok=false rows.
    *
    * An ffmpeg-CLI/JavaCV adapter for arbitrary codecs implements the
    * same [[VideoCodec]] methods on a deployment that ships one.
    */
  object MjpegAviCodec extends VideoCodec {

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** (microSecPerFrame, totalFrames, frame payload ranges in order). */
    private def parse(b: Array[Byte]): (Long, Long, Vector[(Int, Int)]) = {
      require(b.length >= 12 && fourcc(b, 0) == "RIFF" &&
        fourcc(b, 8) == "AVI ", "not a RIFF/AVI container")
      var usPerFrame = 0L
      var totalFrames = 0L
      val frames = Vector.newBuilder[(Int, Int)]
      // Long arithmetic throughout: a malformed 32-bit size near 2^31
      // would overflow Int bound checks into "valid" negatives and wedge
      // the walk; with Longs it fails the overrun check instead.
      // The walk is iterative (explicit stack, depth-first so frame
      // chunks stay in stream order): untrusted input controls LIST
      // nesting depth, and a recursive walk would let a ~100 KB container
      // of nested LISTs throw StackOverflowError — an Error, which the
      // stage's decodability catch does not (and must not) swallow.
      var stack = List((12, math.min(b.length.toLong, 8 + u32(b, 4)).toInt))
      while (stack.nonEmpty) {
        var (off, end) = stack.head
        stack = stack.tail
        var descended = false
        while (!descended && off + 8 <= end) {
          val id = fourcc(b, off)
          val size = u32(b, off + 4) // unsigned, 0 .. 2^32-1
          require(off + 8 + size <= end,
            s"chunk '$id' overruns the container")
          val next = off + (8 + size + (size & 1)).toInt // word-aligned
          if (id == "LIST") {
            require(size >= 4, s"LIST chunk too short for a type tag")
            // Resume the rest of this range after the LIST body.
            stack = (off + 12, off + 8 + size.toInt) :: (next, end) :: stack
            descended = true
          } else if (id == "avih") {
            require(size >= 20, "truncated avih header")
            usPerFrame = u32(b, off + 8)
            totalFrames = u32(b, off + 24)
          } else if (id.endsWith("dc") || id.endsWith("db")) {
            frames += ((off + 8, size.toInt))
          }
          off = next
        }
      }
      val fs = frames.result()
      require(usPerFrame > 0, "missing or zero avih dwMicroSecPerFrame")
      require(fs.nonEmpty, "no video frame chunks in movi list")
      (usPerFrame, if (totalFrames > 0) totalFrames else fs.length.toLong, fs)
    }

    def durationMs(content: Array[Byte]): Long = {
      val (us, n, _) = parse(content)
      us * n / 1000L
    }

    def sampleFrames(content: Array[Byte], everyMs: Long,
        maxFrames: Int): Seq[SampledFrame] = {
      val (us, n, frames) = parse(content)
      val durMs = us * n / 1000L
      sampleTimes(durMs, everyMs, maxFrames).map { case (ts, idx) =>
        // The source frame covering sample time ts.
        val fi = math.min(ts * 1000L / us, frames.length - 1L).toInt
        val (off, len) = frames(fi)
        val img = ImageIO.read(new ByteArrayInputStream(content, off, len))
        require(img != null, s"frame $fi is not decodable image data")
        val out = new ByteArrayOutputStream()
        ImageIO.write(img, "png", out)
        SampledFrame(idx, ts, out.toByteArray)
      }
    }
  }

  /** Sample one frame every `everyMs` (first at t=0), capped at
    * `maxFrames` per asset so one long asset can't blow a task's memory —
    * the cap is data (frames beyond it are dropped BY DESIGN and the
    * row's frame count says so), not a silent truncation of the schema.
    * Output is one row per asset with a frames array; explode it for
    * one-row-per-frame downstream processing. Undecodable assets land as
    * ok=false rows, never exceptions (F4 decodability convention).
    */
  def frameSampleStage(everyMs: Long, maxFrames: Int,
      codec: VideoCodec = FakeVideoCodec)
      : InferenceStage[VideoIn, VideoFrames] = {
    require(everyMs > 0 && maxFrames > 0)
    new InferenceStage[VideoIn, VideoFrames] {
      def setup(): ModelHandle[VideoIn, VideoFrames] =
        new ModelHandle[VideoIn, VideoFrames] {
          def infer(in: VideoIn): VideoFrames =
            if (in.content.isEmpty)
              VideoFrames(in.assetId, ok = false, 0L, Nil)
            else
              try {
                val dur = codec.durationMs(in.content)
                VideoFrames(in.assetId, ok = true, dur,
                  codec.sampleFrames(in.content, everyMs, maxFrames))
              } catch {
                case _: Exception =>
                  VideoFrames(in.assetId, ok = false, 0L, Nil)
              }
        }
    }
  }
}
