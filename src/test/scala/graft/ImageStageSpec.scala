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

  test("pair metrics: identical, constant-shifted, and mismatched pairs") {
    import spark.implicits._
    import graft.stages.ImageStage.ImagePair
    val base = png(32, 32, 0x646464)          // every channel 0x64 = 100
    val shifted = png(32, 32, 0x6e6e6e)       // every channel 0x6e = 110
    val ds = Seq(
      ImagePair("same", base, png(32, 32, 0x646464)),
      ImagePair("shift", base, shifted),
      ImagePair("badsize", base, png(16, 16, 0x646464)),
      ImagePair("junk", base, Array[Byte](9, 9))).toDS().repartition(2)
    val m = ImageStage.pairMetricsStage.run(ds).collect()
      .map(x => x.pairId -> x).toMap
    assert(m("same").ok && m("same").mse == 0.0 && m("same").mae == 0.0)
    assert(m("same").psnr.isPosInfinity)
    assert(math.abs(m("same").ssim - 1.0) < 1e-9)
    // Constant +10 shift: mse = 100, mae = 10, psnr = 10*log10(255^2/100).
    assert(math.abs(m("shift").mse - 100.0) < 1e-9)
    assert(math.abs(m("shift").mae - 10.0) < 1e-9)
    assert(math.abs(m("shift").psnr - 10.0 * math.log10(255.0 * 255.0 / 100.0)) < 1e-9)
    assert(m("shift").ssim < 1.0 && m("shift").ssim > 0.9)
    assert(!m("badsize").ok && !m("junk").ok)
  }

  /** Gradient pattern: left half dark, right half bright — a stable
    * structure for perceptual hashing across resolutions.
    */
  private def halfPng(w: Int, h: Int, dark: Int, bright: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) dark else bright)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("aHash: resolution-stable, near-identical images within few bits, inverse far") {
    import spark.implicits._
    val ds = Seq(
      ImageIn("base", halfPng(64, 64, 0x202020, 0xd0d0d0)),
      ImageIn("big", halfPng(128, 128, 0x202020, 0xd0d0d0)),
      ImageIn("shift", halfPng(64, 64, 0x282828, 0xd8d8d8)),
      ImageIn("inverse", halfPng(64, 64, 0xd0d0d0, 0x202020)),
      ImageIn("junk", Array[Byte](7, 7, 7))).toDS().repartition(2)
    val h = ImageStage.aHashStage.run(ds).collect()
      .map(x => x.assetId -> x).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h("base").ok && !h("junk").ok)
    // Same structure at 2x resolution: identical hash (area averages equal).
    assert(ham(h("base").ahash, h("big").ahash) == 0)
    // Uniform brightness shift: thresholding vs the global mean is
    // shift-invariant, so the hash is unchanged.
    assert(ham(h("base").ahash, h("shift").ahash) == 0)
    // Inverted structure: every bit flips.
    assert(ham(h("base").ahash, h("inverse").ahash) == 64)
  }

  /** halfPng with a solid square patch overlaid at (0,0) — perturbs a
    * bounded number of aHash cells, the planted "near duplicate".
    */
  private def patchedPng(w: Int, h: Int, dark: Int, bright: Int,
      patch: Int, patchSide: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        if (x < patchSide && y < patchSide) patch
        else if (x < w / 2) dark else bright)
    val buf = new ByteArrayOutputStream()
    ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("e2e image near-dup: binaryFile scan -> aHash -> hamming pairs") {
    import spark.implicits._
    // Fixture tree: a base image, a 2x-resolution copy (hamming 0), a
    // corner-patched variant (few bits), an inverted control (~64 bits),
    // and an undecodable file that must drop out, not crash.
    val dir = java.nio.file.Files.createTempDirectory("imgdedup").toFile
    def put(name: String, bytes: Array[Byte]): Unit = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.write(f.toPath, bytes)
    }
    put("base.png", halfPng(64, 64, 0x202020, 0xd0d0d0))
    put("big.png", halfPng(128, 128, 0x202020, 0xd0d0d0))
    put("patched.png", patchedPng(64, 64, 0x202020, 0xd0d0d0, 0xffffff, 16))
    put("control.png", halfPng(64, 64, 0xd0d0d0, 0x202020))
    put("junk.png", Array[Byte](1, 2, 3))
    // Stage 1: the real binaryFile source (S4), id from the path.
    val scanned = graft.sources.BinaryAssets.scan(spark, dir.getAbsolutePath, "*.png")
      .select(graft.sources.BinaryAssets.assetId($"path").as("assetId"), $"content")
      .as[ImageIn]
    // Stage 2: perceptual hash; decode failures become ok=false rows.
    val hashed = ImageStage.aHashStage.run(scanned)
    assert(hashed.count() == 5 && hashed.filter(!_.ok).count() == 1)
    // Stage 3: the same pigeonhole hamming join text simhashes use.
    val pairs = operators.Dedup.hammingNearPairs(
        hashed.filter(_.ok).toDF(), "assetId", "ahash", bits = 64, maxDist = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def pair(a: String, b: String) = if (a < b) (a, b) else (b, a)
    // Planted near-dups found...
    assert(pairs(pair("base", "big")) == 0L)
    assert(pairs.contains(pair("base", "patched")) &&
      pairs(pair("base", "patched")) > 0L)
    assert(pairs.contains(pair("big", "patched")))
    // ...and the inverted control pairs with nothing.
    assert(!pairs.keys.exists(p => p._1 == "control" || p._2 == "control"))
    assert(pairs.size == 3)
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
