package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** The last mile of the training-data pipeline, run as one dataflow:
  * leakage-safe split → temperature-rebalanced training mix → sequence
  * packing, with passage chunking on the side feeding an embedding
  * index. Each hop is a library operator on shared column contracts —
  * the flow is the assertion that the training-set assembly family
  * composes with the dedup family it depends on.
  */
class TrainingSetFlowSpec extends SparkSpec {

  test("training-set flow: split -> temperature mix -> pack, chunk alongside") {
    import spark.implicits._
    val docs = tables.documents
    val n0 = docs.count()

    // 1. Leakage-safe split: near-dup clusters never straddle splits.
    val splits = Dedup.leakageSafeSplit(docs, 0.6)
    assert(splits.count() == n0)
    val pairSplits = Dedup.jaccardNearDups(docs, 0.6, Dedup.defaultMaxDf)
      .join(splits.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(splits.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
    assert(pairSplits.filter($"sa" =!= $"sb").count() == 0)

    // 2. Temperature mix over the train split only.
    val train = docs.join(
      splits.filter($"split" === "train").select($"doc_id"), "doc_id")
    val nTrain = train.count()
    val budget = nTrain / 2
    val mixed = train.join(
      Sampling.temperatureSample(train, budget).select($"doc_id"), "doc_id")
    val nMix = mixed.count()
    assert(nMix > 0 && nMix <= budget)

    // 3. Pack the mixed training set: every selected doc lands in
    // exactly one (bucket, pack); pack payloads respect the chunk bound.
    val packBudget = 1500L
    val packed = Sampling.packDocuments(mixed, packBudget, nBuckets = 4)
    assert(packed.count() == nMix)
    assert(packed.select($"doc_id").distinct().count() == nMix)
    val payload = packed.join(mixed.select($"doc_id", $"n_chars"), "doc_id")
      .groupBy($"bucket", $"pack")
      .agg(sum($"n_chars").as("chars"), max($"n_chars").as("maxc"))
    assert(payload.filter($"chars" >= lit(packBudget) + $"maxc").count() == 0)

    // 4. Chunk the same mix for the retrieval/embedding side: chunk
    // counts are exactly ceil(n_tokens / stride) per doc — nothing
    // dropped, nothing fabricated.
    val chunks = TextAnalysis.chunkDocs(mixed, window = 32, stride = 24)
    val wantChunks = mixed
      .select((expr("(size(split(text, ' ', -1)) - 1) div 24") + 1L).as("k"))
      .agg(sum($"k")).head.getLong(0)
    assert(chunks.count() == wantChunks)

    // The whole chain is a pure function of the data: a rerun from the
    // raw table reproduces the identical pack assignment.
    val again = Sampling.packDocuments(
      docs.repartition(5).join(
        Dedup.leakageSafeSplit(docs.repartition(5), 0.6)
          .filter($"split" === "train").select($"doc_id"), "doc_id")
        .join(Sampling.temperatureSample(
          docs.join(Dedup.leakageSafeSplit(docs, 0.6)
            .filter($"split" === "train").select($"doc_id"), "doc_id"),
          budget).select($"doc_id"), "doc_id"),
      packBudget, nBuckets = 4)
    assert(again.collect().map(_.toSeq).toSet ==
      packed.collect().map(_.toSeq).toSet)
  }
}
