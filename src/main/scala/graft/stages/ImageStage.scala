package graft.stages

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.Dataset

/** Real image decode/resize/normalize stages over binary columns
  * (reference M7, /root/reference/data_pipeline/utils/image_utils.py:31-35
  * decode+LANCZOS-resize to 512², and dataloader.py:64-68 normalize).
  *
  * Uses javax.imageio (JDK-builtin — PNG/BMP/GIF/JPEG), so unlike the
  * quality-filter stub in sources.BinaryAssets this is a genuine pixel
  * path: decode failures yield ok=false rows instead of exceptions
  * (reference F4 decodability filter). Runs as mapPartitions so any
  * per-partition codec state is reused; at 1000 executors the work is
  * embarrassingly parallel over input splits.
  */
object ImageStage {

  final case class ImageIn(assetId: String, content: Array[Byte])
  final case class ImageMeta(assetId: String, width: Int, height: Int,
      ok: Boolean)
  final case class ResizedImage(assetId: String, width: Int, height: Int,
      ok: Boolean, png: Array[Byte])

  private def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** F4 decodability + dimension extraction. */
  def decodeStage: InferenceStage[ImageIn, ImageMeta] =
    new InferenceStage[ImageIn, ImageMeta] {
      def setup(): ModelHandle[ImageIn, ImageMeta] =
        new ModelHandle[ImageIn, ImageMeta] {
          def infer(in: ImageIn): ImageMeta = decode(in.content) match {
            case Some(img) => ImageMeta(in.assetId, img.getWidth, img.getHeight, ok = true)
            case None => ImageMeta(in.assetId, -1, -1, ok = false)
          }
        }
    }

  /** M7 resize-to-square (the reference's 512²); bilinear here — the
    * interpolation kernel is a parameter, not an architecture concern.
    */
  def resizeStage(side: Int): InferenceStage[ImageIn, ResizedImage] =
    new InferenceStage[ImageIn, ResizedImage] {
      def setup(): ModelHandle[ImageIn, ResizedImage] =
        new ModelHandle[ImageIn, ResizedImage] {
          def infer(in: ImageIn): ResizedImage = decode(in.content) match {
            case Some(img) =>
              val out = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, side, side, null)
              g.dispose()
              val buf = new ByteArrayOutputStream()
              ImageIO.write(out, "png", buf)
              ResizedImage(in.assetId, side, side, ok = true, buf.toByteArray)
            case None =>
              ResizedImage(in.assetId, -1, -1, ok = false, Array.emptyByteArray)
          }
        }
    }

  final case class ImagePair(pairId: String, a: Array[Byte], b: Array[Byte])
  final case class PairMetrics(pairId: String, ok: Boolean, mse: Double,
      mae: Double, psnr: Double, ssim: Double)

  /** Pairwise image metrics (reference M8,
    * /root/reference/experiments/standard_vton/metrics.py:13-120): MSE,
    * MAE, PSNR over RGB channels, and global SSIM (whole-image moment
    * formula — the sliding-window variant changes the kernel, not the
    * stage shape). Dimension mismatch or decode failure yields ok=false
    * rather than an exception, matching the stage family's
    * failures-as-rows convention.
    */
  def pairMetricsStage: InferenceStage[ImagePair, PairMetrics] =
    new InferenceStage[ImagePair, PairMetrics] {
      def setup(): ModelHandle[ImagePair, PairMetrics] =
        new ModelHandle[ImagePair, PairMetrics] {
          def infer(in: ImagePair): PairMetrics =
            (decode(in.a), decode(in.b)) match {
              case (Some(x), Some(y))
                  if x.getWidth == y.getWidth && x.getHeight == y.getHeight =>
                val (w, h) = (x.getWidth, x.getHeight)
                val n = w.toLong * h * 3
                var se = 0.0; var ae = 0.0
                var sa = 0.0; var sb = 0.0; var saa = 0.0; var sbb = 0.0
                var sab = 0.0
                var j = 0
                while (j < h) {
                  var i = 0
                  while (i < w) {
                    val pa = x.getRGB(i, j); val pb = y.getRGB(i, j)
                    var c = 0
                    var la = 0.0; var lb = 0.0
                    while (c < 3) {
                      val va = (pa >> (8 * c)) & 0xff
                      val vb = (pb >> (8 * c)) & 0xff
                      val d = (va - vb).toDouble
                      se += d * d; ae += math.abs(d)
                      la += va; lb += vb
                      c += 1
                    }
                    // Global SSIM over mean-channel luminance.
                    la /= 3.0; lb /= 3.0
                    sa += la; sb += lb
                    saa += la * la; sbb += lb * lb; sab += la * lb
                    i += 1
                  }
                  j += 1
                }
                val np = w.toLong * h
                val mse = se / n
                val mae = ae / n
                val psnr =
                  if (mse == 0.0) Double.PositiveInfinity
                  else 10.0 * math.log10(255.0 * 255.0 / mse)
                val ma = sa / np; val mb = sb / np
                val va = saa / np - ma * ma; val vb = sbb / np - mb * mb
                val cab = sab / np - ma * mb
                val c1 = math.pow(0.01 * 255, 2); val c2 = math.pow(0.03 * 255, 2)
                val ssim = ((2 * ma * mb + c1) * (2 * cab + c2)) /
                  ((ma * ma + mb * mb + c1) * (va + vb + c2))
                PairMetrics(in.pairId, ok = true, mse, mae, psnr, ssim)
              case _ =>
                PairMetrics(in.pairId, ok = false, -1, -1, -1, -1)
            }
        }
    }

  final case class ImageHash(assetId: String, ok: Boolean, ahash: Long)

  /** 64-bit average-hash (aHash) perceptual fingerprint: downsample to
    * 8×8 mean-channel luminance (area average — every source pixel
    * contributes, so the hash is resolution-stable), then bit i = 1 iff
    * cell i is above the global mean. Near-identical images (recompress,
    * mild resize/brightness shifts) land within a few hamming bits, which
    * plugs image dedup straight into the same pigeonhole-chunk hamming
    * join used for SimHash text pairs (Dedup.simhashNearPairs shape) —
    * the multimodal face of near-dup at 100 TB: per-row hash, shuffle
    * only on chunk keys.
    */
  def aHashStage: InferenceStage[ImageIn, ImageHash] =
    new InferenceStage[ImageIn, ImageHash] {
      def setup(): ModelHandle[ImageIn, ImageHash] =
        new ModelHandle[ImageIn, ImageHash] {
          def infer(in: ImageIn): ImageHash = decode(in.content) match {
            // Sub-8px images leave 8x8 cells empty, which would skew the
            // global mean (empty cells read as 0) and break the
            // resolution-stability property — treat them like decode
            // failures rather than emit a misleading hash.
            case Some(img) if img.getWidth >= 8 && img.getHeight >= 8 =>
              val (w, h) = (img.getWidth, img.getHeight)
              val cells = new Array[Double](64)
              val counts = new Array[Long](64)
              var y = 0
              while (y < h) {
                val cy = math.min(y * 8 / h, 7)
                var x = 0
                while (x < w) {
                  val cx = math.min(x * 8 / w, 7)
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                    (rgb & 0xff)) / 3.0
                  val c = cy * 8 + cx
                  cells(c) += lum; counts(c) += 1
                  x += 1
                }
                y += 1
              }
              var mean = 0.0
              var i = 0
              while (i < 64) {
                cells(i) = if (counts(i) > 0) cells(i) / counts(i) else 0.0
                mean += cells(i)
                i += 1
              }
              mean /= 64
              var bits = 0L
              i = 0
              while (i < 64) {
                if (cells(i) > mean) bits |= 1L << i
                i += 1
              }
              ImageHash(in.assetId, ok = true, bits)
            case _ => ImageHash(in.assetId, ok = false, 0L)
          }
        }
    }

  final case class ImageFeatures(assetId: String, ok: Boolean,
      features: Array[Double])

  /** M5 feature extraction: the compact per-image descriptor a classifier
    * head consumes — [mean luminance, luminance stddev, dark-pixel
    * fraction, log aspect ratio], computed in one pixel pass. Pairs with
    * [[MlpAcceptFilter]] for a REAL accept/reject gate behind the seam the
    * reference's MLLM filter occupies (robust_scraper.py:96-109 simulates
    * accept-all; the head here is an actual served model). Undecodable
    * input is an ok=false row (F4), so the gate composes with the decode
    * gate instead of throwing.
    */
  def featureStage: InferenceStage[ImageIn, ImageFeatures] =
    new InferenceStage[ImageIn, ImageFeatures] {
      def setup(): ModelHandle[ImageIn, ImageFeatures] =
        new ModelHandle[ImageIn, ImageFeatures] {
          def infer(in: ImageIn): ImageFeatures = decode(in.content) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var s = 0.0; var s2 = 0.0; var dark = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                    (rgb & 0xff)) / (3.0 * 255.0)
                  s += lum; s2 += lum * lum
                  if (lum < 0.25) dark += 1
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              val mean = s / n
              ImageFeatures(in.assetId, ok = true, Array(
                mean,
                math.sqrt(math.max(0.0, s2 / n - mean * mean)),
                dark.toDouble / n,
                math.log(w.toDouble / h)))
            case None => ImageFeatures(in.assetId, ok = false, Array.empty)
          }
        }
    }

  /** Channel-mean brightness in [0,1] — the scalar face of the reference's
    * normalize-to-[-1,1] tensor step, usable as a quality predicate.
    */
  def brightnessStage: InferenceStage[ImageIn, (String, Double)] =
    new InferenceStage[ImageIn, (String, Double)] {
      def setup(): ModelHandle[ImageIn, (String, Double)] =
        new ModelHandle[ImageIn, (String, Double)] {
          def infer(in: ImageIn): (String, Double) = decode(in.content) match {
            case Some(img) =>
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              (in.assetId,
                sum.toDouble / (img.getWidth.toLong * img.getHeight * 3 * 255))
            case None => (in.assetId, -1.0)
          }
        }
    }
}
