package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the semantic-decontamination and label-noise shapes
  * in their PRODUCTION configuration — a FIXED-SIZE broadcast side
  * across corpus sizes. The gate queries tie the eval/audited set to
  * the corpus via a % split for DuckDB-oracle-ability (the
  * ann_ivf/dedup_semantic convention), which makes the timed pair work
  * n·(n/modulo)·d — quadratic BY CONSTRUCTION. A real eval set (or
  * audit sample) is a few thousand rows no matter how large the train
  * corpus grows, so the production cost is nEval·n·d — LINEAR in the
  * corpus. This probe holds the eval count constant by scaling the
  * modulo with the corpus, the claim SCALE10X records.
  *
  *   sbt "runMain graft.tools.DecontamProbe <sfDir> <modulo>"
  *
  * Timed action = noop-sink write (honest protocol), one untimed warm
  * pass first.
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val modulo = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint(true)
    val n = e.count()
    val evalQ = e.filter(col("vec_id") % modulo === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val train = e.filter(col("vec_id") % modulo =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val nEval = evalQ.count()
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.ops.Similarity.bruteForceTopK(train, evalQ, k = 5, "cosine")
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val sec = run()
    println(s"""{"dir":"$dir","n":$n,"modulo":$modulo,""" +
      s""""nEval":$nEval,"sec":$sec}""")
    spark.stop()
  }
}
