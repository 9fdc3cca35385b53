package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.stages._

/** Proof that the InferenceStage seam serves a REAL model end-to-end:
  * weights trained here (deterministic backprop on XOR — a task a linear
  * model provably cannot fit), serialized to a file, loaded per partition
  * by executors, and applied row-by-row through the production stage.
  * Counts setup() calls to pin the once-per-partition lifecycle.
  */
object MlpSetupCounter {
  val n = new AtomicInteger(0)
}

class MlpStageSpec extends SparkSpec {

  // Deterministic LCG so the dataset and init are identical every run.
  private var lcg = 0x5deece66dL
  private def nextU(): Double = {
    lcg = lcg * 6364136223846793005L + 1442695040888963407L
    ((lcg >>> 11).toDouble / (1L << 53).toDouble)
  }

  /** Noisy XOR: clusters at the four corners, label = x xor y. */
  private def xorData(n: Int): Seq[(Array[Double], Int)] =
    (0 until n).map { i =>
      val (cx, cy) = (i % 4) match {
        case 0 => (0.0, 0.0)
        case 1 => (1.0, 1.0)
        case 2 => (0.0, 1.0)
        case 3 => (1.0, 0.0)
      }
      val label = if (i % 4 < 2) 0 else 1
      (Array(cx + (nextU() - 0.5) * 0.3, cy + (nextU() - 0.5) * 0.3), label)
    }

  /** Full-batch backprop for a 2-H-2 ReLU net with softmax
    * cross-entropy — the reference implementation the stage must match.
    */
  private def train(data: Seq[(Array[Double], Int)], hidden: Int,
      epochs: Int, lr: Double): Seq[MlpModel.Layer] = {
    val w1 = Array.fill(hidden, 2)((nextU() - 0.5))
    val b1 = Array.fill(hidden)(0.0)
    val w2 = Array.fill(2, hidden)((nextU() - 0.5))
    val b2 = Array.fill(2)(0.0)
    for (_ <- 0 until epochs) {
      val gw1 = Array.fill(hidden, 2)(0.0); val gb1 = Array.fill(hidden)(0.0)
      val gw2 = Array.fill(2, hidden)(0.0); val gb2 = Array.fill(2)(0.0)
      data.foreach { case (x, y) =>
        val h = Array.tabulate(hidden)(j =>
          math.max(0.0, w1(j)(0) * x(0) + w1(j)(1) * x(1) + b1(j)))
        val z = Array.tabulate(2)(k =>
          (0 until hidden).map(j => w2(k)(j) * h(j)).sum + b2(k))
        val m = z.max
        val e = z.map(v => math.exp(v - m)); val s = e.sum
        val p = e.map(_ / s)
        val dz = Array.tabulate(2)(k => p(k) - (if (k == y) 1.0 else 0.0))
        for (k <- 0 until 2; j <- 0 until hidden) gw2(k)(j) += dz(k) * h(j)
        for (k <- 0 until 2) gb2(k) += dz(k)
        for (j <- 0 until hidden; if h(j) > 0) {
          val dh = (0 until 2).map(k => dz(k) * w2(k)(j)).sum
          gw1(j)(0) += dh * x(0); gw1(j)(1) += dh * x(1); gb1(j) += dh
        }
      }
      val n = data.size.toDouble
      for (j <- 0 until hidden; i <- 0 until 2) w1(j)(i) -= lr * gw1(j)(i) / n
      for (j <- 0 until hidden) b1(j) -= lr * gb1(j) / n
      for (k <- 0 until 2; j <- 0 until hidden) w2(k)(j) -= lr * gw2(k)(j) / n
      for (k <- 0 until 2) b2(k) -= lr * gb2(k) / n
    }
    Seq(MlpModel.Layer(w1, b1), MlpModel.Layer(w2, b2))
  }

  test("trained XOR classifier served per-partition from a weight file") {
    import spark.implicits._
    val data = xorData(400)
    val layers = train(data, hidden = 8, epochs = 3000, lr = 1.0)
    val path = Files.createTempDirectory("mlp").resolve("xor.mlp").toString
    MlpModel.save(path, layers)

    // Round trip: the loaded net is the trained net (same forward math).
    val reloaded = MlpModel.load(path)
    assert(reloaded.inputDim == 2 && reloaded.outputDim == 2)
    val p0 = reloaded.forward(data.head._1)
    assert(math.abs(p0.sum - 1.0) < 1e-9)

    // Serve through the production stage: rows distributed over 3
    // partitions, weights loaded from the FILE by each partition's setup.
    MlpSetupCounter.n.set(0)
    val inner = new MlpInferenceStage(path)
    val counted = new InferenceStage[FeatureRow, ClassScore] {
      def setup(): ModelHandle[FeatureRow, ClassScore] = {
        MlpSetupCounter.n.incrementAndGet()
        inner.setup()
      }
    }
    val ds = data.zipWithIndex
      .map { case ((f, _), i) => FeatureRow(i.toLong, f) }.toDS()
      .repartition(3)
    val out = counted.run(ds).collect().map(c => c.id -> c).toMap
    // Setup ran once per non-empty partition — never per row.
    assert(MlpSetupCounter.n.get() == 3, s"${MlpSetupCounter.n.get()} setups")
    // The net really learned XOR (impossible for a linear model):
    // >= 97% train accuracy through the distributed path.
    val correct = data.zipWithIndex.count { case ((_, y), i) =>
      out(i.toLong).label == y
    }
    assert(correct >= 388, s"$correct/400 correct")
    // Stage output matches a driver-side forward pass exactly.
    data.zipWithIndex.take(20).foreach { case ((f, _), i) =>
      val probs = reloaded.forward(f)
      val best = if (probs(1) > probs(0)) 1 else 0
      assert(out(i.toLong).label == best)
      assert(math.abs(out(i.toLong).prob - probs(best)) < 1e-12)
    }
  }

  test("corrupt weight files fail loudly at load, not silently at infer") {
    val p = Files.createTempDirectory("mlp").resolve("junk.mlp")
    Files.write(p, Array.tabulate[Byte](64)(_.toByte))
    val e = intercept[IllegalArgumentException] { MlpModel.load(p.toString) }
    assert(e.getMessage.contains("not an MLP weight file"))
  }
}
