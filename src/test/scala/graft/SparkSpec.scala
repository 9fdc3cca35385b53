package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + testdata helpers; one lazy session per suite. */
trait SparkSpec extends AnyFunSuite {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val tables: Tables = Tables.load(spark, sfDir)

  def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
}
