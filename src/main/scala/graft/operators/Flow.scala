package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Composed-flow plumbing: the stage-boundary materialization rule as a
  * library primitive instead of a hand-placed convention.
  *
  * The lesson it encodes (measured in bench_r12_sf1.json §flow_probe):
  * a multi-stage curation flow whose stages embed the whole upstream
  * plan on both sides of every self-join pays combinatorial Catalyst
  * planning AND recomputation — the identical flow ran 40× slower
  * (1114 s vs 28 s at sf0.1; 13× planning / 43× execution) with
  * unbroken lineage. Every flow that chains dedup/containment/report
  * stages (CurationFlowSpec, FlowProbe, the reference's stage-per-file
  * pipeline layout, data_pipeline/generate_simple_wm.py:61-118) should
  * cut lineage at each stage boundary; this helper is the one place
  * that decides HOW.
  */
object Flow {

  private val counter = new AtomicLong()

  /** Materialize `df` as a stage boundary and return the detached
    * frame.
    *
    *  - Default (no config): `localCheckpoint` — the in-process cut,
    *    right for tests and single-session flows (blocks live in
    *    executor storage; an executor loss re-fails the stage, which a
    *    flow re-run absorbs).
    *  - With `graft.flow.boundaryDir` set in the session conf: a
    *    parquet round-trip under `<dir>/<name>` — what a production
    *    pipeline does between curation stages. Durable across sessions,
    *    recomputable from disk on executor loss, inspectable, and the
    *    natural resume point when a later stage fails: a NAMED boundary
    *    that already exists complete (its `_SUCCESS` marker present) is
    *    REUSED — the upstream plan is never executed — so re-running a
    *    flow that died after stage N replays stages 1..N as parquet
    *    scans and computes only from N+1 on. Set
    *    `graft.flow.resume=false` to force every boundary to recompute
    *    (the move after editing a stage's logic or inputs: resume
    *    trusts the name, it cannot see that the upstream plan changed —
    *    same contract as any checkpoint/restart scheme).
    *
    * `name` disambiguates boundaries when persisted — name your stages
    * when resuming matters. An anonymous boundary gets an ordinal
    * salted with the Spark application id (two sessions sharing a
    * boundaryDir must not clobber each other's `stage-1`), and never
    * resumes: the ordinal is assigned per materialization call, so a
    * re-run could not match it to the right prior artifact anyway.
    * The returned frame's CONTENT is identical in every mode; only the
    * storage of the cut differs.
    */
  def stageBoundary(df: DataFrame, name: String = ""): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption("graft.flow.boundaryDir")
    dir match {
      case Some(root) =>
        val named = name.nonEmpty
        val stage =
          if (named) name
          else s"stage-${spark.sparkContext.applicationId}-" +
            s"${counter.incrementAndGet()}"
        val path = s"$root/$stage"
        val resume =
          spark.conf.getOption("graft.flow.resume").forall(_.toBoolean)
        if (named && resume && boundaryComplete(spark, path)) {
          // Reuse is attributable, never silent (r14 advice): resume
          // trusts the NAME — it cannot see that a stage's logic or
          // inputs changed — so every reuse says so, and the opt-out
          // is printed with it.
          println(s"GRAFT flow: boundary '$stage' reused from $path " +
            "(set graft.flow.resume=false to force recompute)")
          spark.read.parquet(path)
        } else {
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        }
      case None => df.localCheckpoint()
    }
  }

  /** A boundary is reusable iff its directory holds a completed parquet
    * write — the `_SUCCESS` marker the committer drops only after every
    * task's output is in place. A died-mid-write directory (no marker)
    * is recomputed, not trusted.
    */
  private def boundaryComplete(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new Path(path, "_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}
