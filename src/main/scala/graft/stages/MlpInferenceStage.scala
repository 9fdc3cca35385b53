package graft.stages

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** A REAL model behind the [[InferenceStage]] seam — not a mock: weights
  * live in a file, every executor loads them exactly once per partition in
  * `setup()` (the load-model-then-batch lifecycle the GPU stages use, see
  * reference qwen_vl_processor.py:39-108), and `infer` runs a real dense
  * forward pass. The network is a plain feed-forward MLP (affine + ReLU
  * hidden layers, affine head + softmax), which is exactly the compute
  * shape of the classifier heads a curation pipeline runs at scale
  * (quality gates, language ID, NSFW filters); heavier runtimes (ONNX,
  * Torch) slot behind the same two-method seam, differing only in what
  * `setup()` loads — none of them ship in this environment, so this keeps
  * the REAL parts (file-distributed weights, per-partition lifecycle,
  * actual inference math) exercisable in CI.
  *
  * The weight file is a self-describing little-endian binary (magic,
  * layer count, per-layer dims + row-major float64 weights + bias) read
  * through the Hadoop FileSystem API, so the same path works on local
  * disk here and on HDFS/object stores from executors on a cluster.
  */
object MlpModel {

  private val Magic = 0x474d4c50 // "GMLP"

  /** One dense layer: weights(out)(in), bias(out). */
  final case class Layer(w: Array[Array[Double]], b: Array[Double])

  def save(path: String, layers: Seq[Layer]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val out = new DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(Magic)
      out.writeInt(layers.length)
      layers.foreach { l =>
        out.writeInt(l.w.length)     // out dim
        out.writeInt(l.w.head.length) // in dim
        l.w.foreach(_.foreach(out.writeDouble))
        l.b.foreach(out.writeDouble)
      }
    } finally out.close()
  }

  def load(path: String): MlpModel = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val in = new DataInputStream(fs.open(p))
    try {
      require(in.readInt() == Magic, s"$path is not an MLP weight file")
      val layers = Seq.fill(in.readInt()) {
        val (o, i) = (in.readInt(), in.readInt())
        require(o > 0 && i > 0, s"bad layer dims ${o}x$i in $path")
        val w = Array.fill(o)(Array.fill(i)(in.readDouble()))
        val b = Array.fill(o)(in.readDouble())
        Layer(w, b)
      }
      require(layers.nonEmpty, s"$path holds no layers")
      new MlpModel(layers)
    } finally in.close()
  }
}

/** Loaded network; [[forward]] is the real inference computation. */
final class MlpModel private[stages] (layers: Seq[MlpModel.Layer])
    extends Serializable {

  val inputDim: Int = layers.head.w.head.length
  val outputDim: Int = layers.last.w.length

  /** Class probabilities: affine+ReLU chain, softmax head. */
  def forward(x: Array[Double]): Array[Double] = {
    require(x.length == inputDim,
      s"expected $inputDim features, got ${x.length}")
    var a = x
    for ((l, li) <- layers.zipWithIndex) {
      val out = new Array[Double](l.w.length)
      var o = 0
      while (o < l.w.length) {
        var s = l.b(o)
        val row = l.w(o)
        var i = 0
        while (i < row.length) { s += row(i) * a(i); i += 1 }
        out(o) = if (li < layers.length - 1) math.max(0.0, s) else s
        o += 1
      }
      a = out
    }
    val m = a.max
    val exps = a.map(v => math.exp(v - m))
    val z = exps.sum
    exps.map(_ / z)
  }
}

final case class FeatureRow(id: Long, features: Array[Double])
final case class ClassScore(id: Long, label: Int, prob: Double)

/** The adapter: a classifier head served per partition from a weight
  * file. `setup()` is where the file I/O happens — once per partition,
  * never per row, and never on the driver — which is the lifecycle the
  * seam exists to guarantee (and what `MlpStageSpec` counts).
  */
final class MlpInferenceStage(modelPath: String)
    extends InferenceStage[FeatureRow, ClassScore] {

  def setup(): ModelHandle[FeatureRow, ClassScore] = {
    val model = MlpModel.load(modelPath)
    new ModelHandle[FeatureRow, ClassScore] {
      def infer(in: FeatureRow): ClassScore = {
        val probs = model.forward(in.features)
        var best = 0
        var i = 1
        while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
        ClassScore(in.id, best, probs(best))
      }
    }
  }
}

/** Gate verdict: the decision AND the confidence behind it. Keeping the
  * probability costs nothing here and saves a second inference pass for
  * any caller that thresholds later — the reference keeps the same
  * `confidence_score` beside its verdicts (qwen_vl_processor.py:166).
  * `prob` is the probability of `acceptLabel` specifically (not the
  * argmax class), so `accepted == (argmax == acceptLabel) && (prob >=
  * minProb)` is re-derivable from the row at any stricter threshold.
  */
final case class GateVerdict(id: Long, accepted: Boolean, prob: Double)

/** M5 accept/reject with a REAL classifier head: a row is accepted iff the
  * served MLP's argmax equals `acceptLabel` with at least `minProb`
  * confidence. This is the production counterpart of [[MockAcceptFilter]]
  * (the reference's filter simulates accept-all, robust_scraper.py:96-109,
  * so oracle-parity tests keep the mock); features typically come from
  * [[ImageStage.featureStage]]. Same per-partition weight-load lifecycle
  * as [[MlpInferenceStage]].
  */
final class MlpAcceptFilter(modelPath: String, acceptLabel: Int = 1,
    minProb: Double = 0.0)
    extends InferenceStage[FeatureRow, GateVerdict] {

  def setup(): ModelHandle[FeatureRow, GateVerdict] = {
    val model = MlpModel.load(modelPath)
    require(acceptLabel >= 0 && acceptLabel < model.outputDim,
      s"acceptLabel $acceptLabel out of range for a ${model.outputDim}-class head")
    new ModelHandle[FeatureRow, GateVerdict] {
      def infer(in: FeatureRow): GateVerdict = {
        val probs = model.forward(in.features)
        var best = 0
        var i = 1
        while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
        val p = probs(acceptLabel)
        GateVerdict(in.id, best == acceptLabel && p >= minProb, p)
      }
    }
  }
}
