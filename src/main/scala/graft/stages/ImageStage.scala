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
