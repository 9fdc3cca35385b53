package graft

import org.apache.spark.sql.DataFrame

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

  /** Persist df and track it for [[release]]. */
  def cache(df: DataFrame): DataFrame = {
    val cached = df.persist()
    persisted.add(cached)
    cached
  }

  /** Track an already-persisted frame for [[release]]. */
  def add(df: DataFrame): Unit = persisted.add(df)

  /** Unpersist and forget every tracked frame. */
  def release(): Unit = {
    val it = persisted.iterator()
    while (it.hasNext) { it.next().unpersist(); it.remove() }
  }
}
