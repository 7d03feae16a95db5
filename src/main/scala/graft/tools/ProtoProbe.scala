package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.Curation.prototypicalityPrune]] in its
  * PRODUCTION shape — FIXED cluster count across corpus sizes (a real
  * deployment trains k-means with k chosen for the data's structure,
  * not ∝ n; SemDeDup uses ~10⁵ clusters for 10⁸+ docs). The GATE
  * configuration (`centroidModulo = 40`) ties nCents ∝ n for
  * oracle-ability — the ann_ivf/dedup_semantic convention — which
  * makes the assignment pass n²·d/modulo BY CONSTRUCTION; this probe
  * scales the modulo with the corpus so nCents stays constant and the
  * whole operator is linear, the claim SCALE10X records.
  *
  *   sbt "runMain graft.tools.ProtoProbe <sfDir> <modulo>"
  *
  * Timed action = noop-sink write (honest protocol), one untimed warm
  * pass first.
  */
object ProtoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val modulo = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vectors = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .localCheckpoint(true)
    val n = vectors.count()
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ops.Curation.prototypicalityPrune(vectors, modulo, 1, 2)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val sec = run()
    println(s"""{"dir":"$dir","n":$n,"modulo":$modulo,""" +
      s""""nCents":${n / modulo},"sec":$sec}""")
    spark.stop()
  }
}
