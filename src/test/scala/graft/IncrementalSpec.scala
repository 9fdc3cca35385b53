package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalState
import graft.stages._

class IncrementalSpec extends SparkSpec {

  test("resume workflow: run 1 processes all, run 2 only the delta") {
    import spark.implicits._
    val statePath = Files.createTempDirectory("state").toString + "/keys"
    val state = new IncrementalState(spark, statePath, Seq("event_id"))

    val batch1 = tables.events.filter($"event_id" < 100)
    val todo1 = state.newKeys(batch1)
    assert(todo1.count() == batch1.count(), "empty state: everything is new")
    state.commit(todo1)

    // Second run sees batch1 ∪ delta; only the delta is new.
    val batch2 = tables.events.filter($"event_id" < 150)
    val todo2 = state.newKeys(batch2)
    assert(todo2.count() == batch2.count() - batch1.count())
    assert(todo2.agg(min($"event_id")).head.getLong(0) >= 100)
    state.commit(todo2)

    // Re-running the same batch is a no-op (idempotent resume).
    assert(state.newKeys(batch2).count() == 0)

    // Double-commit of the same keys doesn't break the state.
    state.commit(todo2)
    assert(state.newKeys(batch2).count() == 0)
  }

  test("rate-limited stage paces per-partition throughput") {
    import spark.implicits._
    val inputs = (1L to 20L).map(i => VlInput(i, s"p$i", s"c$i", "ctx"))
      .toDS().repartition(2)
    val limited = RateLimitedStage.wrap(MockAcceptFilter, perPartitionPerSecond = 50.0)
    val t0 = System.nanoTime()
    val out = limited.run(inputs).collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.length == 20)
    // 10 rows/partition at 50/s => >= ~180ms of pacing per partition
    // (first token free); generous lower bound to stay variance-proof.
    assert(elapsedMs >= 150, s"no pacing observed: $elapsedMs ms")
  }
}
