package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + testdata helpers; one lazy session per suite. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  val sfDir = "/root/testdata/sf0.001"

  /** The session survives across suites (getOrCreate), so every cache
    * registry is drained when a suite ends — individual tests may still
    * release eagerly, but nothing persists for the whole sbt-test run
    * just because one suite touched a cached-index operator (the
    * TextAnalysis registry had no release call anywhere before this).
    */
  override def afterAll(): Unit = {
    graft.operators.Dedup.releaseIndexes()
    graft.operators.Similarity.releaseIndexes()
    graft.operators.TextAnalysis.releaseIndexes()
    super.afterAll()
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val tables: Tables = Tables.load(spark, sfDir)

  def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
}
