package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fp, WeightedBucket}
import graft.operators.Sampling

class FunctionsSpec extends SparkSpec {

  test("WeightedBucket (binary search codegen) == when-chain on every row") {
    import spark.implicits._
    val u = Fp.detUniform("w1g", $"doc_id")
    val both = tables.documents.select(
      $"doc_id",
      WeightedBucket(u, Sampling.garments).as("native"),
      Sampling.weightedChoice("w1g", $"doc_id", Sampling.garments).as("chain"))
    assert(both.filter($"native" =!= $"chain").count() == 0)
  }

  test("WeightedBucket handles boundary uniforms (0.0 and just-below-1.0)") {
    import spark.implicits._
    val items = Seq("a" -> 0.5, "b" -> 0.5)
    val df = Seq(0.0, 0.499999, 0.5, 0.999999).toDF("u")
    val got = df.select(WeightedBucket($"u", items).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "a", "b", "b"))
  }

  test("WeightedReservoir equals the window formulation (same ES keys)") {
    import spark.implicits._
    val viaAgg = Sampling.weightedReservoirPerType(tables.events, 5)
      .collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").map(_.toLong).toSeq)
      .toMap
    val esKey = pow(Fp.detUniform("res", $"event_id"),
      lit(1.0) / ($"value" + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy(col("k").desc, $"event_id".asc)
    val viaWindow = tables.events
      .select($"event_type", $"event_id", esKey.as("k"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .groupBy($"event_type")
      .agg(collect_list(struct($"rk", $"event_id")).as("xs"))
      .collect().map { r =>
        r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
      }.toMap
    assert(viaAgg == viaWindow)
  }

  test("WeightedReservoir is partitioning-invariant") {
    import spark.implicits._
    val a = Sampling.weightedReservoirPerType(tables.events.repartition(1), 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Sampling.weightedReservoirPerType(tables.events.repartition(13), 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
  }
}
