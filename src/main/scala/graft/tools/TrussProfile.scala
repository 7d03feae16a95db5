package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Graph}

/** Wall timing for the decremental k-truss at a given SF dir — round-11
  * tuning aid (VERDICT r10 item 1). The stage-level profile that drove
  * the redesign lives in BASELINE.md: at sf0.1 the pair graph has 9.7M
  * triangles but the peel drops only 838/53/2/2 edges per round, so the
  * frontier-wedge shape (no per-round triangle-state scans) wins.
  */
object TrussProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val und = Dedup.simhashPairs(graft.Tables(spark, sfDir, "documents"), hammingMax = 2)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .localCheckpoint(true)
    println(s"[truss] |E| = ${und.count()}")
    // only drop the blocks each rep leaked — und's own local checkpoint
    // must survive (a dropped local checkpoint cannot be recomputed)
    val keep = spark.sparkContext.getPersistentRDDs.keySet
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = Graph.kTruss(und, k = 5).count()
      println(f"[truss] rep $rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n truss edges)")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (id, r) => if (!keep(id)) r.unpersist(false)
      }
    }
    spark.stop()
  }
}
