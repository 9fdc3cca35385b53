package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch profiling main (not part of the driver contract).
  *
  * Wall-clock on this host varies ±40% run-to-run; the stage-CPU listener
  * below separates real compute from scheduling/GC/classloading noise —
  * trust `cpu=` trends, not single `wall=` numbers.
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuAcc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        cpuAcc.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime / 1000000)
    })
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.load(spark, sf).documents
    def t(name: String)(f: => Long): Unit = {
      cpuAcc.set(0)
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(250)
      println(f"$name%-28s wall=$wall%6.2f s  cpu=${cpuAcc.get / 1e3}%7.2f s  ($n rows)")
    }
    t("warm scan")(docs.count())
    t("q26 jaccard")(operators.Dedup.jaccardNearDups(docs, 0.6).count())
    t("q27 lsh")(operators.Dedup.lshNearDups(docs, 0.9).count())
    t("q47 simhash pairs")(operators.Dedup.simhashNearPairs(docs, 1).count())
    t("q64 decontaminate")(operators.Dedup.decontaminate(docs, "src0", 5).count())
    spark.stop()
  }
}
