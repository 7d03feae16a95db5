package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Phase/stage-level profiling for the MinHash pipeline (local iteration
  * aid): prints wall time per phase plus Spark stage task-time totals.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages += ((si.stageId, wall, si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    time("full dedup_minhash op") {
      val cand = Dedup.minhashCandidates(docs)
      println("verified: " + Dedup.jaccardOnPairs(docs, cand).count())
    }
    Thread.sleep(500)
    println("stageId wall_ms taskTime_ms nTasks")
    stages.sortBy(-_._2).take(12).foreach { case (id, w, t, n) =>
      println(f"$id%7d $w%7d $t%11d $n%6d")
    }
    println(f"total stage wall: ${stages.map(_._2).sum}%d ms over ${stages.size} stages")
    spark.stop()
  }
}
