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
