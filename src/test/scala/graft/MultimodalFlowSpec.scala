package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.stages._
import graft.stages.MediaStage._
import graft.stages.ImageStage.ImageIn

/** The multimodal counterpart of CurationFlowSpec: a video corpus flows
  * ingest → real decode (MJPEG/AVI) → decodability gate → frame sampling
  * → perceptual-hash near-dup at the ASSET level → deterministic survivor
  * selection → census, entirely on the production operators. This is the
  * curation shape a multimodal training set runs at scale; every step
  * here is the same code path a cluster deployment calls.
  */
class MultimodalFlowSpec extends SparkSpec {

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

  /** A 32×24 frame with a diagonal split at `phase` — structurally
    * distinct aHashes across phases, stable within one.
    */
  private def frame(phase: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val dark = (phase % 3) match {
        case 0 => x < 16
        case 1 => y < 12
        case 2 => x / 2 < y * 4 / 3
      }
      val g = if (dark) v else 255 - v
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A flat gray frame: uniformly `g` everywhere — the "dark footage"
    * shape the M5 quality gate rejects when g is low.
    */
  private def flatFrame(g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  private def clip(phase: Int): Array[Byte] =
    aviOf((0 until 4).map(i => frame(phase, 40 + i * 10)))

  private def aviOf(frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = chunk("avih",
      le32(100000L) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
        le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(32L) ++ le32(24L) ++ Array.fill(16)(0.toByte))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
        Array.fill(48)(0.toByte))
    val strf = chunk("strf",
      le32(40) ++ le32(32L) ++ le32(24L) ++ le16(1) ++ le16(24) ++
        "MJPG".getBytes("US-ASCII") ++ le32(32L * 24 * 3) ++
        Array.fill(16)(0.toByte))
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", avih ++ list("strl", strh ++ strf)) ++
      list("movi", frames.flatMap(chunk("00dc", _)).toArray)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length.toLong) ++ body
  }

  test("multimodal flow: ingest -> decode gate -> frame dedup -> census") {
    import spark.implicits._
    // v0/v1 duplicate footage, v2 and v3 distinct, v4 undecodable.
    val corpus = Seq(
      VideoIn("v0", clip(0)), VideoIn("v1", clip(0)),
      VideoIn("v2", clip(1)), VideoIn("v3", clip(2)),
      VideoIn("v4", Array.tabulate(300)(_.toByte))).toDS()

    // 1. Real decode + decodability gate (F4): the corrupt asset drops
    //    here as data, not as a job failure.
    val decoded = MediaStage.frameSampleStage(everyMs = 200, maxFrames = 2,
      codec = MediaStage.MjpegAviCodec).run(corpus)
    val ok = decoded.filter(_.ok)
    assert(decoded.count() == 5 && ok.count() == 4)

    // 2. Frame-level perceptual hashes through the production image path.
    val hashed = ImageStage.aHashStage.run(
      ok.flatMap(v => v.frames.map(f =>
        ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))).toDF()
    assert(hashed.count() == 8)

    // 3. Asset-level near-dup: assets pair when EVERY sampled frame
    //    position pairs within the hamming threshold — the multi-frame
    //    AND that keeps one lucky frame collision from merging distinct
    //    footage.
    val pairs = operators.Dedup.hammingNearPairs(
        hashed, "assetId", "ahash", bits = 64, maxDist = 4)
      .select(
        split($"id_a", "#").getItem(0).as("asset_a"),
        split($"id_a", "#").getItem(1).as("pos_a"),
        split($"id_b", "#").getItem(0).as("asset_b"),
        split($"id_b", "#").getItem(1).as("pos_b"))
      .filter($"asset_a" =!= $"asset_b" && $"pos_a" === $"pos_b")
      .groupBy($"asset_a", $"asset_b")
      .agg(count(lit(1)).as("n_pos"))
      .filter($"n_pos" === 2)
    val dupPairs = pairs.collect().map(r => (r.getString(0), r.getString(1)))
    assert(dupPairs.toSet == Set(("v0", "v1")), dupPairs.toSeq)

    // 4. Deterministic survivor: keep the minimum asset id per dup pair;
    //    census over the survivors.
    val losers = pairs.select(greatest($"asset_a", $"asset_b").as("assetId"))
    val survivors = ok.toDF().select($"assetId", $"durationMs")
      .join(losers, Seq("assetId"), "left_anti")
    val census = survivors.agg(
      count(lit(1)).as("n_assets"),
      sum($"durationMs").as("total_ms")).head()
    assert(census.getLong(0) == 3) // v0, v2, v3 — v1 deduped, v4 gated
    assert(census.getLong(1) == 3 * 400L)
  }

  test("multimodal flow with a REAL M5 gate: dark footage rejected pre-dedup") {
    import spark.implicits._
    // The M5 seam served by an actual model (not MockAcceptFilter's
    // accept-all): a classifier head over ImageStage.featureStage's
    // descriptor, weights in a file, loaded per partition, real forward
    // pass. The head is the exact affine+softmax encoding of "accept iff
    // mean luminance >= 0.3" — what matters here is the serving path and
    // its composition into the curation flow; MlpStageSpec already proves
    // trained weights through the same seam.
    val k = 50.0
    val path = java.nio.file.Files.createTempDirectory("m5")
      .resolve("gate.mlp").toString
    MlpModel.save(path, Seq(MlpModel.Layer(
      Array(Array(-k, 0.0, 0.0, 0.0), Array(k, 0.0, 0.0, 0.0)),
      Array(k * 0.3, -k * 0.3))))

    // v0/v1 duplicate bright footage, v2 distinct bright, vdark decodable
    // but uniformly near-black (gray 30 ≈ luma 0.12), v4 undecodable.
    val corpus = Seq(
      VideoIn("v0", clip(0)), VideoIn("v1", clip(0)),
      VideoIn("v2", clip(1)),
      VideoIn("vdark", aviOf((0 until 4).map(_ => flatFrame(30)))),
      VideoIn("v4", Array.tabulate(300)(_.toByte))).toDS()

    // 1. Decode gate: only the corrupt asset drops here — dark footage
    //    DECODES fine; rejecting it is the model's job, not the codec's.
    val ok = MediaStage.frameSampleStage(everyMs = 200, maxFrames = 2,
      codec = MediaStage.MjpegAviCodec).run(corpus).filter(_.ok)
    assert(ok.count() == 4)

    // 2. Features per sampled frame through the production extractor.
    val frames = ok.flatMap(v => v.frames.map(f =>
      ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))
    // Stable 64-bit row key for joining model scores back to frames
    // (local function: a spec-level method would drag the non-serializable
    // suite into the closure).
    val stableIdOf = (s: String) =>
      scala.util.hashing.MurmurHash3.stringHash(s).toLong
    val feats = ImageStage.featureStage.run(frames).filter(_.ok)
      .map(f => (stableIdOf(f.assetId), f.assetId, f.features))
      .toDF("fid", "frameId", "features")

    // 3. REAL model accept gate, scores joined back by the stable frame id.
    //    The gate returns its confidence alongside the verdict so a later
    //    stricter threshold never re-runs inference.
    val scored = new MlpAcceptFilter(path).run(
        feats.select($"fid", $"features").as[(Long, Array[Double])]
          .map { case (id, fs) => FeatureRow(id, fs) })
      .toDF("fid", "accepted", "prob")
    val perAsset = feats.join(scored, "fid")
      .select(split($"frameId", "#").getItem(0).as("assetId"),
        $"accepted", $"prob")
      .groupBy($"assetId")
      // An asset survives only if EVERY sampled frame passes the gate;
      // the kept min-confidence lets downstream re-threshold for free.
      .agg(min($"accepted").as("allAccepted"),
        min($"prob").as("minConf"))
    // The retained confidence is consistent with the verdict: every
    // accepted frame of a surviving asset carried prob > 0.5 (the
    // accept class won the argmax), and re-thresholding at 0.9 from the
    // stored column alone still accepts the bright assets — no second
    // inference pass.
    assert(perAsset.filter($"allAccepted" && $"minConf" <= 0.5).count() == 0)
    assert(perAsset.filter($"minConf" >= 0.9).count() ==
      perAsset.filter($"allAccepted").count())
    val surviving = perAsset.filter($"allAccepted").select("assetId")
      .as[String].collect().toSet
    assert(surviving == Set("v0", "v1", "v2"), surviving)

    // 4. Dedup among the accepted assets only (vdark never pays hash or
    //    join cost — the gate runs before the shuffle); census.
    val hashed = ImageStage.aHashStage.run(
      ok.filter(v => surviving.contains(v.assetId))
        .flatMap(v => v.frames.map(f =>
          ImageIn(s"${v.assetId}#${f.frameIdx}", f.png)))).toDF()
    val losers = operators.Dedup.hammingNearPairs(
        hashed, "assetId", "ahash", bits = 64, maxDist = 4)
      .select(
        split($"id_a", "#").getItem(0).as("asset_a"),
        split($"id_a", "#").getItem(1).as("pos_a"),
        split($"id_b", "#").getItem(0).as("asset_b"),
        split($"id_b", "#").getItem(1).as("pos_b"))
      .filter($"asset_a" =!= $"asset_b" && $"pos_a" === $"pos_b")
      .groupBy($"asset_a", $"asset_b").agg(count(lit(1)).as("n_pos"))
      .filter($"n_pos" === 2)
      .select(greatest($"asset_a", $"asset_b").as("assetId"))
    val survivors = ok.toDF().select($"assetId")
      .join(perAsset.filter($"allAccepted"), Seq("assetId"), "left_semi")
      .join(losers, Seq("assetId"), "left_anti")
      .as[String].collect().toSet
    assert(survivors == Set("v0", "v2"), survivors)
  }
}
