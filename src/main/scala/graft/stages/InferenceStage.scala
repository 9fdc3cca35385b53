package graft.stages

import org.apache.spark.sql.{Dataset, Encoder}

/** Pluggable model-inference stages (reference §2.11: Qwen-VL analysis M1
  * at /root/reference/data_pipeline/models/qwen_vl_processor.py:39-108,
  * InstructPix2Pix edit M3 at edit_model_pipeline.py:33-147, FLUX
  * generation M4 at AsyncImageGen/src/generator.py:61-82, MLLM filter M5
  * at robust_scraper.py:96-109).
  *
  * Architecture: the expensive model is loaded ONCE per partition (≈ once
  * per executor core), then streamed over the partition's rows — the Spark
  * equivalent of the reference's load-model-then-batch loop, and the only
  * sane shape at 1000 executors: no model (de)serialization per row, no
  * driver round-trips, linear scale-out with input splits. Stages are
  * deterministic functions of their input (mock implementations included
  * for tests); GPU stages plug in behind the same trait.
  */
trait InferenceStage[I, O] extends Serializable {

  /** Called once per partition before any rows — load the model here. */
  def setup(): ModelHandle[I, O]

  /** Run the stage over a Dataset: one setup per partition, then a lazy
    * per-row map so rows stream through without buffering the partition.
    */
  final def run(ds: Dataset[I])(implicit enc: Encoder[O]): Dataset[O] =
    ds.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val handle = setup()
        rows.map(handle.infer)
      }
    }
}

/** A loaded model instance; one per partition. */
trait ModelHandle[I, O] extends Serializable {
  def infer(in: I): O
}

// ---------------------------------------------------------------------
// Concrete stage shapes mirroring the reference's model stages, with
// deterministic mock models (the reference itself ships a simulated
// accept-all filter at robust_scraper.py:96-109).
// ---------------------------------------------------------------------

/** Input to VL analysis: a person×garment pairing (reference J1 output). */
final case class VlInput(pairId: Long, personRef: String, clothRef: String,
    context: String)

/** VL analysis output (reference's strict-JSON schema,
  * qwen_vl_processor.py:130-168): fit assessment + edit instructions +
  * confidence, with rawResponse kept for unparseable model output (T13).
  */
final case class VlAnalysis(pairId: Long, garmentType: String,
    editInstructions: Seq[String], editStrength: String,
    confidenceScore: Double, rawResponse: String)

/** M1 mock: deterministic VL analysis derived from the input hash. */
object MockVlStage extends InferenceStage[VlInput, VlAnalysis] {
  def setup(): ModelHandle[VlInput, VlAnalysis] =
    new ModelHandle[VlInput, VlAnalysis] {
      private val garments = Vector("tshirt", "dress", "jacket", "jeans")
      private val strengths = Vector("light", "medium", "strong")
      def infer(in: VlInput): VlAnalysis = {
        val h = math.abs((in.personRef + "|" + in.clothRef).hashCode.toLong)
        VlAnalysis(
          pairId = in.pairId,
          garmentType = garments((h % 4).toInt),
          editInstructions = Seq(
            s"align ${garments((h % 4).toInt)} to pose",
            "match lighting"),
          editStrength = strengths((h % 3).toInt),
          confidenceScore = (h % 1000) / 1000.0,
          rawResponse = "")
      }
    }
}

/** M3/M4 edit-or-generate result (reference edit_model_pipeline.py:128-145:
  * status success/failed + output path).
  */
final case class EditResult(pairId: Long, status: String, outputRef: String,
    seed: Long)

/** M3 mock: deterministic edit outcome; fails a fixed hash slice of inputs
  * to exercise failure-path aggregation (reference A5 success/failure
  * counts).
  */
object MockEditStage extends InferenceStage[VlAnalysis, EditResult] {
  def setup(): ModelHandle[VlAnalysis, EditResult] =
    new ModelHandle[VlAnalysis, EditResult] {
      def infer(in: VlAnalysis): EditResult = {
        val ok = in.confidenceScore >= 0.05
        EditResult(in.pairId,
          if (ok) "success" else "failed",
          if (ok) s"edited/${in.pairId}.png" else "",
          seed = 42L)
      }
    }
}

/** M5 accept/reject filter (the reference simulates accept-all). */
object MockAcceptFilter extends InferenceStage[VlInput, (Long, Boolean)] {
  def setup(): ModelHandle[VlInput, (Long, Boolean)] =
    new ModelHandle[VlInput, (Long, Boolean)] {
      def infer(in: VlInput): (Long, Boolean) = (in.pairId, true)
    }
}
