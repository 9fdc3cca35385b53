package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component clustering over a near-dup pair graph — the shared
  * closure step behind [[Dedup.nearDupClusters]] (Jaccard pairs, q67) and
  * [[Similarity.cosineNearDupClusters]] (embedding pairs, q79): pairs in,
  * min-label components out, with cluster size and the keep-one-survivor
  * flag. Extracted rather than duplicated so both families carry the
  * identical bounded-driver/distributed-fixpoint adjudication.
  */
private[graft] object Clusters {

  /** Components of `ids` (single id column, its name reused on the
    * output) under the `pairs` edges (two id columns). Output:
    * (idCol, cluster_id, cluster_size, keep), labels = component minimum.
    *
    * Near-dup pair graphs are tiny relative to the corpus (the giant
    * components of web dedup are exact dups, removed earlier). Below a
    * driver-memory threshold, union-find locally — one collect + one
    * broadcast join instead of diameter-many propagation rounds. The
    * distributed min-label fixpoint is the unbounded-graph path; both
    * produce identical components. `registry` is the caller's session
    * index registry so intermediates free with its other indexes.
    */
  def fromPairs(ids: DataFrame, pairs: DataFrame, unionFindMaxEdges: Long,
      registry: graft.CacheRegistry): DataFrame = {
    import ids.sparkSession.implicits._
    val idCol = ids.columns.head
    // (pairs arrives cached by the pair builder, so the count and the
    // collect/union below share one computation.)
    if (pairs.count() <= unionFindMaxEdges) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.collect().foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      // Min-label roots: union-by-min above keeps every root the minimum
      // of its component.
      val labelMap = parent.keys.map(k => k -> find(k)).toMap
      val spark = ids.sparkSession
      val lm = spark.createDataFrame(labelMap.toSeq).toDF(idCol, "label")
      // Cached: the label table is consumed by both the sizes aggregate
      // and the final join.
      val labels = registry.cache(ids
        .join(broadcast(lm), Seq(idCol), "left_outer")
        .select(col(idCol), coalesce($"label", col(idCol)).as("label")))
      // sizes is one row per cluster (mostly singletons — corpus-sized):
      // a plain join, NOT a broadcast.
      val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
      return labels.join(sizes, "label")
        .select(col(idCol), $"label".as("cluster_id"), $"cluster_size",
          (col(idCol) === $"label").as("keep"))
    }
    val edges = pairs
      .union(pairs.select(pairs.columns.map(col).reverse: _*))
      .toDF("src", "dst").persist()
    edges.count() // materialize once; every round joins it
    var labels = ids.select(col(idCol), col(idCol).as("label"))
    var prevCached: DataFrame = null
    // Labels only ever decrease, so Σlabel strictly decreases until the
    // fixpoint — one cheap aggregate per round detects convergence
    // instead of a join against the previous labels. Decimal sum: a long
    // sum would overflow past ~10^12 rows of 10^12-sized ids.
    var prevSum: java.math.BigDecimal = null
    var converged = false
    while (!converged) {
      val prop = edges.join(labels, edges("src") === labels(idCol))
        .select($"dst".as(idCol), $"label")
      val next = labels.union(prop)
        .groupBy(col(idCol)).agg(min($"label").as("label")).persist()
      val s = next.agg(sum($"label".cast("decimal(38,0)"))).first().getDecimal(0)
      if (prevCached != null) prevCached.unpersist()
      prevCached = next
      labels = next
      // s is null exactly when the corpus is empty — converged trivially
      // (otherwise the null-vs-null comparison would loop forever).
      converged = s == null || (prevSum != null && s.compareTo(prevSum) == 0)
      prevSum = s
    }
    edges.unpersist()
    // The converged label table backs the query's two consumers below;
    // free it with the caller's other session indexes.
    if (prevCached != null) registry.add(prevCached)
    val sizes = labels.groupBy($"label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col(idCol), $"label".as("cluster_id"), $"cluster_size",
        (col(idCol) === $"label").as("keep"))
  }
}
