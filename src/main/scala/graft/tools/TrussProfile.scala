package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** Decremental k-truss evidence (r11 ask #6 / r13): wall, JOB COUNT,
  * STAGE COUNT, and SHUFFLE BYTES for the maintained-frames
  * implementation vs the r11 rebuild-per-round shape
  * (`Graph.kTruss(..., decremental = false)`) on the same input —
  * same fixpoint, different round plumbing. The decremental win is
  * structural: the rebuild arm re-shuffles all 2|E| adjacency rows
  * into a degree aggregation EVERY round, the maintained arm touches
  * only the dropped frontier.
  */
object TrussProfile {

  private final class Meter extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val shuffleRead = new AtomicLong(0L)
    val shuffleWrite = new AtomicLong(0L)
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); shuffleRead.set(0L); shuffleWrite.set(0L) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val und = Dedup.simhashPairs(graft.Tables(spark, sfDir, "documents"), hammingMax = 2)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(true)
    println(s"[truss] |E| = ${und.count()}")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    // only drop the blocks each rep leaked — und's own local checkpoint
    // must survive (a dropped local checkpoint cannot be recomputed)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    for (decremental <- Seq(true, false); rep <- 1 to 3) {
      meter.reset()
      val t0 = System.nanoTime()
      val n = Graph.kTruss(und, k = 5, maxRounds = 50, decremental).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async — drain the bus (blocks until every
      // already-posted event is processed) instead of a fixed sleep,
      // which under load could lag and silently undercount an arm
      org.apache.spark.GraftCoreBridge.waitForListeners(spark.sparkContext)
      val arm = if (decremental) "decremental" else "rebuild    "
      println(f"[truss] $arm rep $rep: $sec%6.2f s  jobs=${meter.jobs.get}%3d " +
        f"stages=${meter.stages.get}%4d shufRd=${meter.shuffleRead.get / 1048576.0}%8.1f MiB " +
        f"shufWr=${meter.shuffleWrite.get / 1048576.0}%8.1f MiB ($n truss edges)")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (id, r) => if (!keep(id)) r.unpersist(false)
      }
    }
    spark.stop()
  }
}
