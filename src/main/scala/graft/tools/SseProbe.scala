package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** One-off probe for the r18 distortion invariants: prints the corpus
  * SSE of each codebook variant at a given sf dir.
  */
object SseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = vectors.count()
    println(s"n=$n")

    val centsMod = Similarity.pqModuloCodebook(vectors, 25)
    println(s"modulo codebook size=${centsMod.size}")
    val ncent = math.max(8, math.min(256, (n / 25L).toInt))
    val centsT = Similarity.trainPqCodebook(
      Similarity.trainSampleOf(vectors, knownCount = n).select(col("vec").as("v")),
      m = 8, ncent = ncent, seed = 42L)
    println(s"trained ncent=$ncent")
    val centsRaw64 = Similarity.trainPqCodebook(
      Similarity.trainSampleOf(vectors, knownCount = n).select(col("vec").as("v")),
      m = 8, ncent = 64, seed = 42L)

    def sse(df: org.apache.spark.sql.DataFrame): BigDecimal =
      BigDecimal(df.head.getDecimal(0))

    println("sse modulo      = " + sse(Similarity.pqCorpusSse(vectors, centsMod, 8)))
    println("sse trained     = " + sse(Similarity.pqCorpusSse(vectors, centsT, 8)))
    println("sse trainedRaw64= " + sse(Similarity.pqCorpusSse(vectors, centsRaw64, 8)))
    println("sse resid t64   = " + sse(Similarity.ivfPqResidualCorpusSse(
      vectors, ivfModulo = 40, pqModulo = 25, m = 8, trainedNcent = 64,
      knownCount = n)))
    println("sse resid mod   = " + sse(Similarity.ivfPqResidualCorpusSse(
      vectors, ivfModulo = 40, pqModulo = 25, m = 8, trainedNcent = 0,
      knownCount = n)))
    val ncentR = centsMod.size
    println("sse resid tEq   = " + sse(Similarity.ivfPqResidualCorpusSse(
      vectors, ivfModulo = 40, pqModulo = 25, m = 8, trainedNcent = ncentR,
      knownCount = n)))
    spark.stop()
  }
}
