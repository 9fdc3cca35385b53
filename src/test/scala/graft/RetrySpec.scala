package graft

import graft.stages._

/** Flaky inner stage: ids divisible by `failMod` fail on their first two
  * attempts then succeed; ids divisible by `deadMod` always fail.
  */
class FlakyStage(failMod: Int, deadMod: Int)
    extends InferenceStage[VlInput, EditResult] {
  def setup(): ModelHandle[VlInput, EditResult] =
    new ModelHandle[VlInput, EditResult] {
      private val attempts = scala.collection.mutable.Map.empty[Long, Int]
      def infer(in: VlInput): EditResult = {
        val n = attempts.updateWith(in.pairId)(c => Some(c.getOrElse(0) + 1)).get
        if (in.pairId % deadMod == 0)
          throw new IllegalStateException("permanently down")
        if (in.pairId % failMod == 0 && n < 3)
          throw new RuntimeException(s"transient #$n")
        EditResult(in.pairId, "success", s"out/${in.pairId}.png", 42L)
      }
    }
}

class RetrySpec extends SparkSpec {
  test("retry wrapper recovers transients, surfaces permanent failures as rows") {
    import spark.implicits._
    val inputs = (1L to 30L).map(i => VlInput(i, s"p$i", s"c$i", "ctx"))
      .toDS().repartition(3)
    val out = RetryStage.wrap(new FlakyStage(failMod = 5, deadMod = 7), 3, 0L)
      .run(inputs).collect()
    assert(out.length == 30)
    val byId = out.map(a => a.value.map(_.pairId)
      .getOrElse(-1L) -> a).toMap
    // Transient ids (%5 but not %7) succeed on the 3rd attempt.
    Seq(5L, 10L, 15L, 20L, 25L, 30L).foreach { id =>
      val a = byId(id)
      assert(a.succeeded && a.attempts == 3, s"id $id: $a")
    }
    // Dead ids (7,14,21,28) fail all attempts but are present as rows.
    val dead = out.filter(!_.succeeded)
    assert(dead.length == 4)
    assert(dead.forall(a => a.attempts == 3 && a.lastError.contains("permanently")))
    // Everyone else: first-try success.
    assert(out.count(a => a.succeeded && a.attempts == 1) == 30 - 4 - 6)
  }
}
