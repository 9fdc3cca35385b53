package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Persist-and-register helper for operator families that keep
  * session-lifetime derived indexes (shingle tables, quantized corpora,
  * converged label tables). Self-joins and sibling operators over these
  * would otherwise recompute the build subtree once per consumer.
  * CacheManager keys on the canonical plan, so repeated builds of the
  * same index share one copy; [[release]] frees everything — in-flight
  * jobs still holding the data recompute lazily, so it is always safe.
  */
final class CacheRegistry {
  private val persisted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()
  // Bounded (LRU): a long-lived serve loop that derives a NEW versioned
  // state path per micro-batch would otherwise grow one entry per batch
  // forever (r17 advice — the sqlGateBatch loop leaked one collected
  // centroid table per batch). Eviction only ever costs a recompute.
  private val counts = new LruMemo[CacheRegistry.Key, Long](512)
  private val collects =
    new LruMemo[CacheRegistry.Key, Array[org.apache.spark.sql.Row]](256)

  /** Persist df and track it for [[release]]. */
  def cache(df: DataFrame): DataFrame = {
    val cached = df.persist()
    persisted.add(cached)
    cached
  }

  /** Track an already-persisted frame for [[release]]. */
  def add(df: DataFrame): Unit = persisted.add(df)

  /** Count df at most once per [[CacheRegistry.planKey]] — the
    * plan-construction counts the MIH joins need (chunk geometry and
    * join strategy derive from relation size) run eagerly when an
    * operator is *built*, so a long-lived serve loop that rebuilds the
    * same plan per batch (or a Flow resume that replays construction)
    * would re-count an unchanged state relation every time. Keyed the
    * way CacheManager keys cache sharing PLUS a file-snapshot of every
    * file-backed leaf (see [[CacheRegistry.planKey]]), so equal-but-
    * separately-built frames share one count while an in-place
    * overwrite of the same directory re-counts, as it must.
    */
  def countOnce(df: DataFrame): Long =
    counts.getOrElseUpdate(CacheRegistry.planKey(df), df.count())

  /** Collect df at most once per [[CacheRegistry.planKey]] — the
    * [[countOnce]] doctrine applied to driver-side literal tables (IVF
    * centroid / codebook relations): a serve loop that reconstructs the
    * same plan per batch re-collects an unchanged ≤nlist-row table
    * every time, paying a Spark job per batch for rows the driver
    * already holds. A GROWN/retrained table — including a retrain
    * OVERWRITTEN IN PLACE into the same parquet dir, which canonicalizes
    * equal (r17 advice) — snapshots differently and collects fresh.
    */
  def collectOnce(df: DataFrame): Array[org.apache.spark.sql.Row] =
    collects.getOrElseUpdate(CacheRegistry.planKey(df), df.collect())

  /** Number of tracked frames (diagnostics / scope-leak specs). */
  def size: Int = persisted.size()

  /** Unpersist and forget every tracked frame and memoized count. */
  def release(): Unit = {
    val it = persisted.iterator()
    while (it.hasNext) { it.next().unpersist(); it.remove() }
    counts.clear()
    collects.clear()
  }
}

object CacheRegistry {
  /** Memo key for plan-keyed driver caches: (canonical plan, file
    * snapshot). Canonical-plan equality alone is how CacheManager keys
    * cache sharing, but Spark's file indexes compare by rootPaths — two
    * reads of the SAME directory canonicalize equal even when the files
    * under it were overwritten in between (saveState(mode=overwrite) +
    * loadState on one dir), so a plan-only memo would serve stale rows
    * (r17 advice). The snapshot folds every file-backed leaf's
    * (path, length, modificationTime) into an md5, making an in-place
    * rewrite a different key while equal-but-separately-built frames
    * still share. Listings come from the relation's own FileIndex
    * (already in driver memory — no filesystem call here).
    */
  type Key = (LogicalPlan, String)

  def planKey(df: DataFrame): Key = {
    val analyzed = df.queryExecution.analyzed
    (analyzed.canonicalized, fileSnapshot(analyzed))
  }

  private[graft] def fileSnapshot(plan: LogicalPlan): String = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}
    val md = java.security.MessageDigest.getInstance("MD5")
    var sawFiles = false
    plan.foreach {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: HadoopFsRelation =>
            sawFiles = true
            fs.location match {
              case p: PartitioningAwareFileIndex =>
                p.allFiles().foreach { st =>
                  md.update((st.getPath.toString + "|" + st.getLen + "|" +
                    st.getModificationTime + ";").getBytes("UTF-8"))
                }
              case other =>
                other.inputFiles.foreach(f =>
                  md.update((f + ";").getBytes("UTF-8")))
            }
          case _ => ()
        }
      case _ => ()
    }
    if (!sawFiles) "" // pure in-memory/literal plans: plan identity suffices
    else java.util.Base64.getEncoder.encodeToString(md.digest())
  }
}

/** Tiny synchronized LRU memo (access-order LinkedHashMap). The compute
  * runs OUTSIDE the lock — it typically launches Spark jobs — so two
  * racing threads may both compute; values are deterministic, so the
  * race is benign (last write wins, same bytes).
  */
private[graft] final class LruMemo[K, V](max: Int) {
  private val m = new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > max
  }
  def getOrElseUpdate(k: K, compute: => V): V = {
    val hit = m.synchronized(Option(m.get(k)))
    hit match {
      case Some(v) => v
      case None =>
        val v = compute
        m.synchronized {
          val again = m.get(k)
          if (again != null) again else { m.put(k, v); v }
        }
    }
  }
  def size: Int = m.synchronized(m.size())
  def clear(): Unit = m.synchronized(m.clear())
}
