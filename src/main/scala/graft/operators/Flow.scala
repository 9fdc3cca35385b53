package graft.operators

import java.util.concurrent.atomic.AtomicLong

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
    *    natural resume point when a later stage fails.
    *
    * `name` disambiguates boundaries when persisted (an anonymous
    * boundary gets a session-unique ordinal — fine locally, but name
    * your stages when resuming matters). The returned frame's CONTENT
    * is identical either way; only the storage of the cut differs.
    */
  def stageBoundary(df: DataFrame, name: String = ""): DataFrame = {
    val spark = df.sparkSession
    val dir = spark.conf.getOption("graft.flow.boundaryDir")
    dir match {
      case Some(root) =>
        val stage =
          if (name.nonEmpty) name else s"stage-${counter.incrementAndGet()}"
        val path = s"$root/$stage"
        df.write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      case None => df.localCheckpoint()
    }
  }
}
