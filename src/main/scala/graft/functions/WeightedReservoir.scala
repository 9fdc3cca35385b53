package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One row offered to the reservoir: the Efraimidis–Spirakis key
  * (pow(u, 1/w), u hash-derived) and the item id.
  */
final case class ResIn(key: Double, id: Long)

/** Weighted reservoir sample of k items per group, as a single-pass
  * Aggregator (reference W6 without-replacement draws, SURVEY.md §2.5).
  *
  * Why an Aggregator and not the window formulation (row_number over
  * key desc ≤ k, used as the DuckDB oracle): the window must shuffle and
  * sort EVERY row of the group; this aggregate's partial state is only the
  * current top-k per partition, merged pairwise — at 100 TB that's the
  * difference between sorting the corpus and streaming it. Keys are
  * hash-derived (Fp.detUniform), so the result is a pure function of the
  * data: identical across partitionings, retries, and the oracle's window
  * formulation.
  */
class WeightedReservoir(k: Int)
    extends Aggregator[ResIn, Seq[ResIn], Seq[Long]] {

  private def top(xs: Seq[ResIn]): Seq[ResIn] =
    xs.sortBy(r => (-r.key, r.id)).take(k)

  override def zero: Seq[ResIn] = Nil

  override def reduce(b: Seq[ResIn], a: ResIn): Seq[ResIn] =
    // Cheap guard: only re-sort when the candidate can displace.
    if (b.size < k || a.key > b.last.key ||
        (a.key == b.last.key && a.id < b.last.id)) top(b :+ a)
    else b

  override def merge(x: Seq[ResIn], y: Seq[ResIn]): Seq[ResIn] = top(x ++ y)

  override def finish(b: Seq[ResIn]): Seq[Long] = b.map(_.id)

  override def bufferEncoder: Encoder[Seq[ResIn]] =
    ExpressionEncoder[Seq[ResIn]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object WeightedReservoir {

  /** Aggregate column: weighted sample of k ids. `key` must be the ES key
    * pow(detUniform(tag, id), 1/weight).
    */
  def sample(k: Int)(key: Column, id: Column): Column =
    udaf(new WeightedReservoir(k), ExpressionEncoder[ResIn]())
      .apply(key, id)
}
