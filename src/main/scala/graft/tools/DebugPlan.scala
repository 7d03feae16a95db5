package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for inspecting one intermediate frame's plan + raw
  * noop-sink timing under the bench session config. Not part of any
  * gate; exists because iterative operators' work happens in
  * intermediate checkpoint jobs that the final explain can't show.
  */
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(label: String, f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val eArr = li.groupBy(col("l_orderkey").as("__b"))
      .agg(collect_set(col("l_partkey")).as("is"))
      .select(explode(col("is")).as("src"), col("is"))
      .select(col("src"), explode(col("is")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
    eArr.explain("formatted")
    val e = graft.ops.Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    for (i <- 1 to 3) {
      time(s"join noop $i", e.write.mode("overwrite").format("noop").save())
      time(s"arr  noop $i", eArr.write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
