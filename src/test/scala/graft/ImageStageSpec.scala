package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.stages.ImageStage
import graft.stages.ImageStage.ImageIn

class ImageStageSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("decode stage reads real PNG dims; garbage bytes yield ok=false") {
    import spark.implicits._
    val ds = Seq(
      ImageIn("a", png(640, 480, 0x336699)),
      ImageIn("b", png(100, 200, 0xffffff)),
      ImageIn("junk", Array[Byte](1, 2, 3, 4))).toDS().repartition(2)
    val out = ImageStage.decodeStage.run(ds).collect()
      .map(m => m.assetId -> m).toMap
    assert(out("a").width == 640 && out("a").height == 480 && out("a").ok)
    assert(out("b").width == 100 && out("b").height == 200 && out("b").ok)
    assert(!out("junk").ok)
  }

  test("resize stage produces decodable square PNGs") {
    import spark.implicits._
    val ds = Seq(ImageIn("a", png(640, 480, 0x112233))).toDS()
    val out = ImageStage.resizeStage(64).run(ds).collect().head
    assert(out.ok && out.width == 64)
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out.png))
    assert(back.getWidth == 64 && back.getHeight == 64)
  }

  test("brightness stage: white ~1.0, dark ~0.0") {
    import spark.implicits._
    val ds = Seq(
      ImageIn("white", png(10, 10, 0xffffff)),
      ImageIn("black", png(10, 10, 0x000000))).toDS()
    val b = ImageStage.brightnessStage.run(ds).collect().toMap
    assert(math.abs(b("white") - 1.0) < 1e-9)
    assert(b("black") == 0.0)
  }
}
