package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Scan

/** Measures Scan.prefixSum against the window cumsum on a single hot
  * group — the shape where the window is structurally single-task. The
  * numbers go to BASELINE.md; the point is not the sf-scale wall time
  * but the task-count evidence: the window runs ONE task for the group
  * regardless of cores, the scan runs `numParts`.
  */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(n)
      .select(lit("hot").as("g"), col("id"), (col("id") % 1001).as("v"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scanprofile] $label%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$r)")
    }
    // warm the input generation path
    df.count()
    time("window") {
      val w = Window.partitionBy(col("g")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum", sum(col("v")).over(w)).filter(col("cum") < 0).count() + n
    }
    time("scan") {
      Scan.prefixSum(df, Seq("g"), Seq("id"), "v").filter(col("cum") < 0).count() + n
    }
    spark.stop()
  }
}
