package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.streaming.Streams

class ExtensionsSpec extends AnyFunSuite {
  // getOrCreate() may return a shared session built elsewhere in this JVM
  // (extensions only apply at build time), so register directly — the path
  // an embedding application with an existing session uses. The
  // GraftExtensions class itself drives the same builder.
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("weighted_bucket is callable from SQL and matches the Column API") {
    import spark.implicits._
    val sql = spark.sql(
      """SELECT weighted_bucket(CAST(id AS DOUBLE) / 100.0,
        |  array('a','b','c'), array(0.5, 0.3, 0.2)) AS pick
        |FROM range(100)""".stripMargin)
      .collect().map(_.getString(0))
    assert(sql.count(_ == "a") == 50)
    assert(sql.count(_ == "b") == 30)
    assert(sql.count(_ == "c") == 20)
    val viaCol = spark.range(100)
      .select(graft.functions.WeightedBucket(
        ($"id".cast("double") / 100.0), Seq("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)))
      .collect().map(_.getString(0))
    assert(sql.toSeq == viaCol.toSeq)
  }

  test("dot_q is callable from SQL and computes exact integer dot products") {
    val r = spark.sql(
      "SELECT dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").first().getLong(0)
    assert(r == 4 + 10 + 18)
    // Mismatched lengths: dot over the common prefix.
    val p = spark.sql(
      "SELECT dot_q(array(2L, 3L), array(10L)) AS d").first().getLong(0)
    assert(p == 20)
  }

  test("intersect_count_sorted is callable from SQL and matches array_intersect") {
    val r = spark.sql(
      """SELECT intersect_count_sorted(array(1L, 3L, 5L, 9L),
        |  array(2L, 3L, 9L, 11L)) AS c""".stripMargin).first().getLong(0)
    assert(r == 2)
    val none = spark.sql(
      "SELECT intersect_count_sorted(array(1L), array(2L)) AS c")
      .first().getLong(0)
    assert(none == 0)
  }

  test("pii_redact is callable from SQL and matches the Column API scrub") {
    import spark.implicits._
    val texts = Seq(
      "mail a@b.co or dial 555-123-4567",
      "host 10.0.0.1 fine",
      "clean v1.2.3 text")
    texts.toDF("t").createOrReplaceTempView("pii_t")
    val sql = spark.sql("SELECT pii_redact(t) AS r FROM pii_t")
      .collect().map(_.getString(0)).toSeq
    val viaCol = texts.toDF("t")
      .select(graft.operators.TextAnalysis.piiRedact($"t"))
      .collect().map(_.getString(0)).toSeq
    assert(sql == viaCol)
    assert(sql == Seq("mail <EMAIL> or dial <PHONE>", "host <IP> fine",
      "clean v1.2.3 text"))
  }

  test("weighted_bucket rejects non-literal dictionaries") {
    val e = intercept[Exception] {
      spark.sql("SELECT weighted_bucket(0.5, array(CAST(id AS STRING)), array(1.0)) FROM range(2)").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("ann_topk_auto table function matches the Column-API cosineTopKAuto") {
    import spark.implicits._
    val emb = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (scala.util.hashing.MurmurHash3.productHash((i, j)) % 1000) / 1000f)
        .toSeq)
    }.toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("ann_emb_v")
    val viaSql = spark.sql(
      "SELECT qid, nid, cos, rk FROM ann_topk_auto('ann_emb_v', 5, 3, 0.9)")
      .collect().map(_.toSeq).toSet
    val viaCol = operators.Similarity.cosineTopKAuto(emb, 5, 3,
        targetRecall = 0.9)
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // The expansion composes like any relation: an outer filter + agg.
    val nQ = spark.sql(
      """SELECT count(DISTINCT qid) AS nq
        |FROM ann_topk_auto('ann_emb_v', 5, 3, 0.9) WHERE rk <= 3"""
        .stripMargin).first().getLong(0)
    assert(nQ == 5)
    // Non-literal arguments are rejected at analysis, not at runtime.
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM range(2), LATERAL ann_topk_auto('ann_emb_v', CAST(id AS INT), 3, 0.9)")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
    operators.Similarity.releaseIndexes()
  }

  test("simhash_near_pairs table function matches the Column-API pairs") {
    import spark.implicits._
    // 40 base docs + 5 one-token edits of the first five: the edits are
    // the near pairs the 60-bit signature must surface at maxDist 5.
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}")
        .mkString(" "))
    }
    val edits = (0 until 5).map { i =>
      (100L + i, base(i)._2.replaceFirst("\\bw\\d+\\b", "zz"))
    }
    (base ++ edits).toDF("doc_id", "text")
      .createOrReplaceTempView("sim_docs_v")
    val viaSql = spark.sql(
      "SELECT doc_a, doc_b, hamming FROM simhash_near_pairs('sim_docs_v', 5, 60)")
      .collect().map(_.toSeq).toSet
    val viaCol = operators.Dedup.simhashNearPairs(
        spark.table("sim_docs_v"), maxDist = 5, bits = 60)
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // Composes like a relation: count the docs with any near-twin.
    val nDocs = spark.sql(
      """SELECT count(DISTINCT doc_a) AS n
        |FROM simhash_near_pairs('sim_docs_v', 5, 60)""".stripMargin)
      .first().getLong(0)
    assert(nDocs >= 1)
  }

  test("semantic_dedup table function matches the Column-API semanticDedup") {
    import spark.implicits._
    val emb = (0 until 200).map { i =>
      // 100 sources + 100 exact copies: every copy must be dropped.
      val src = i % 100
      (i.toLong, Array.tabulate(64)(j =>
        (scala.util.hashing.MurmurHash3.productHash((src, j)) % 1000) / 1000f)
        .toSeq)
    }.toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("sem_emb_v")
    val viaSql = spark.sql(
      "SELECT vec_id, list_id, kept FROM semantic_dedup('sem_emb_v', 0.35)")
      .collect().map(_.toSeq).toSet
    val viaCol = operators.Similarity.semanticDedup(emb, 0.35)
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaCol && viaSql.nonEmpty)
    // The verdict relation filters like any relation. Never BOTH members
    // of an identical pair survive (chance ≥0.35 cosine between distinct
    // random sources can dedup a few of those too, so kept < 100).
    val bothKept = spark.sql(
      """SELECT count(*) AS n
        |FROM semantic_dedup('sem_emb_v', 0.35) a
        |JOIN semantic_dedup('sem_emb_v', 0.35) b
        |  ON b.vec_id = a.vec_id + 100
        |WHERE a.kept AND b.kept""".stripMargin).first().getLong(0)
    assert(bothKept == 0L)
    operators.Similarity.releaseIndexes()
  }

  test("gate_decisions table function matches the Column-API gate over persisted state") {
    import spark.implicits._
    import operators.IngestGate
    // A corpus with a planted near-edit and a verbatim copy, state
    // persisted to parquet, then the SQL route (loadState inside the
    // table function) against the direct Column-API gate on the SAME
    // loaded state — decision relations must be identical.
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val docs = (0 until 30).map { i =>
      (i.toLong, s"doc $i " + base + s" unique tail $i of document $i " +
        s"with extra words w$i x$i y$i z$i making the signature deep")
    }.toDF("doc_id", "text")
    val embs = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val state = IngestGate.buildState(docs, embs, nlist = 2)
    val dir = Files.createTempDirectory("gatefn").toString
    IngestGate.saveState(state, s"$dir/state")
    // Batch: a verbatim copy of doc 3, a one-word edit of doc 5, and a
    // novel doc.
    val batch = Seq(
      (100L, docs.collect()(3).getString(1)),
      (101L, docs.collect()(5).getString(1)
        .replace("unique", "peculiar")),
      (102L, "a completely different treatise about maritime law and " +
        "the history of naval navigation across centuries of seafaring")
    ).toDF("doc_id", "text")
    val bEmb = Seq(
      (100L, Array.tabulate(8)(j => math.sin(3 * 8 + j).toFloat)),
      (101L, Array.tabulate(8)(j => math.sin(5 * 8 + j).toFloat)),
      (102L, Array.tabulate(8)(j => math.cos(j * 3.7).toFloat))
    ).toDF("vec_id", "embedding")
    batch.createOrReplaceTempView("gatefn_docs_v")
    bEmb.createOrReplaceTempView("gatefn_emb_v")
    val viaSql = spark.sql(
      s"""SELECT doc_id, stage, dup_of
         |FROM gate_decisions('$dir/state', 'gatefn_docs_v',
         |  'gatefn_emb_v', 0.9, 2)""".stripMargin)
      .collect().map(_.toSeq).toSet
    val loaded = IngestGate.loadState(spark, s"$dir/state")
    val viaApi = IngestGate.gate(loaded, batch, bEmb, minCos = 0.9,
        nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(viaSql == viaApi && viaSql.size == 3)
    // The decisions themselves: verbatim → exact, near-edit → simhash,
    // novel → pass — the cascade's short-circuit order from pure SQL.
    val byId = viaSql.map(r =>
      r.head.asInstanceOf[Long] -> r(1).asInstanceOf[String]).toMap
    assert(byId(100L) == "exact" && byId(101L) == "simhash" &&
      byId(102L) == "pass", s"decisions: $byId")
    // Composability: the decision relation filters like any relation.
    val trimmed = spark.sql(
      s"""SELECT count(*) AS n
         |FROM gate_decisions('$dir/state', 'gatefn_docs_v',
         |  'gatefn_emb_v', 0.9, 2) WHERE stage <> 'pass'"""
        .stripMargin).first().getLong(0)
    assert(trimmed == 2L)
    operators.Dedup.releaseIndexes()
    operators.Similarity.releaseIndexes()
  }
}

class SessionWindowSpec extends SparkSpec {
  test("streaming session_window sessions match batch gap sessionization") {
    import spark.implicits._
    val dir = Files.createTempDirectory("events_sw")
    Files.copy(Paths.get(s"$sfDir/events.parquet"), dir.resolve("events.parquet"))
    val q = Streams.sessionizeStream(Streams.eventsStream(spark, dir.toString), 30)
      .writeStream.outputMode("complete").format("memory")
      .queryName("sessions_sw").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sessions_sw")
      .select($"user_id", $"n_events", $"start_us", $"end_us")
      .collect().map(_.toSeq).toSet
    val batch = operators.Sessions.sessionize(tables.events, 30)
      .select($"user_id", $"n_events", $"start_us", $"end_us")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
