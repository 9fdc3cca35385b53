package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Flow, IngestGate, Similarity}

/** The gate's restartability claim at spec scale (the GateProbe
  * `restart` legs drive it as two OS processes at bench/sf1): a soak
  * interrupted between batches must continue in a NEW SparkSession —
  * the old one fully stopped, nothing carried but the parquet on disk —
  * and produce decisions identical to an unbroken run. The session
  * drop is the spec-level stand-in for a driver restart: every frame,
  * cache, and temp view dies with the context; only
  * [[IngestGate.saveState]]'s tables and [[Flow.stageBoundary]]'s
  * named boundaries survive.
  */
class GateRestartSpec extends AnyFunSuite {

  private def freshSession(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpusDocs(spark: SparkSession) = {
    import spark.implicits._
    (0 until 30).map { i =>
      (i.toLong, s"corpus document $i about durable subject ${i * 37} " +
        s"with stable narrative prose carrying token${i * 13} and " +
        s"token${i * 29} through many long passages of text body $i")
    }.toDF("doc_id", "text")
  }

  private def corpusEmb(spark: SparkSession) = {
    import spark.implicits._
    (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
  }

  /** Batch k: one novel doc, one verbatim re-send of a corpus doc, one
    * near-edit of another — pure function of k, so both runs see
    * identical inputs.
    */
  private def batchFor(spark: SparkSession, k: Int) = {
    import spark.implicits._
    val novel = (900L + k * 10,
      s"novel chronicle $k of maritime law and the history of naval " +
        s"navigation across centuries of seafaring voyage $k")
    val verbatim = (901L + k * 10,
      s"corpus document $k about durable subject ${k * 37} " +
        s"with stable narrative prose carrying token${k * 13} and " +
        s"token${k * 29} through many long passages of text body $k")
    val edited = (902L + k * 10, verbatim._2.replace("stable", "solid"))
    val bd = Seq(novel, verbatim, edited).toDF("doc_id", "text")
    val be = Seq(
      (novel._1, Array.tabulate(8)(j => math.cos(k * 11 + j * 3.7).toFloat)),
      (verbatim._1, Array.tabulate(8)(j => math.sin(k * 8 + j).toFloat)),
      (edited._1, Array.tabulate(8)(j => math.sin(k * 8 + j).toFloat))
    ).toDF("vec_id", "embedding")
    (bd, be)
  }

  private def runBatches(spark: SparkSession, root: String,
      from: Int, to: Int): Unit = {
    spark.conf.set("graft.flow.boundaryDir", s"$root/flow")
    var st = IngestGate.loadState(spark, s"$root/state-b${from - 1}")
    for (k <- from to to) {
      val (bd, be) = batchFor(spark, k)
      val d = Flow.stageBoundary(
        IngestGate.gate(st, bd, be, minCos = 0.9, nprobe = 2), s"d-b$k")
      val a = IngestGate.admit(st, d, bd, be)
      IngestGate.saveState(a, s"$root/state-b$k")
      st = IngestGate.loadState(spark, s"$root/state-b$k")
    }
  }

  test("a soak interrupted by a full session stop resumes in a new session with identical decisions") {
    val total = 6
    val rootA = java.nio.file.Files.createTempDirectory("gaterestartA")
      .toString
    val rootRef = java.nio.file.Files.createTempDirectory("gaterestartR")
      .toString

    // Session 1: build + persist state, run the unbroken reference AND
    // the first half of the interrupted leg.
    val s1 = freshSession()
    val st0 = IngestGate.buildState(corpusDocs(s1), corpusEmb(s1),
      nlist = 2)
    IngestGate.saveState(st0, s"$rootA/state-b0")
    IngestGate.saveState(st0, s"$rootRef/state-b0")
    runBatches(s1, rootRef, 1, total)
    runBatches(s1, rootA, 1, total / 2)
    // The reference decisions, collected BEFORE the session dies.
    val refDecisions = (1 to total).map { k =>
      k -> s1.read.parquet(s"$rootRef/flow/d-b$k")
        .collect().map(_.toSeq).toSet
    }.toMap

    // The restart: release every session-held cache, stop the context,
    // clear the session singletons — nothing survives but disk.
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Session 2: a genuinely new context resumes from the persisted
    // state and the named boundaries, continuing where batch 3 left off.
    val s2 = freshSession()
    assert(s2 ne s1)
    runBatches(s2, rootA, total / 2 + 1, total)
    for (k <- 1 to total) {
      val mine = s2.read.parquet(s"$rootA/flow/d-b$k")
        .collect().map(_.toSeq).toSet
      assert(mine == refDecisions(k),
        s"batch $k decisions diverged after the session restart")
      assert(mine.size == 3)
    }
    // The decisions are substantive: batch 1's verbatim re-send trims
    // exact, its near-edit trims at the signature tier, its novel
    // passes.
    val stages = s2.read.parquet(s"$rootA/flow/d-b1")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stages(911L) == "exact" && stages(912L) == "simhash" &&
      stages(910L) == "pass", s"stages: $stages")
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }
}
