package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Recall@10 vs nProbe sweep for the IVF pruning tiers — the standard
  * ANN engineering curve: what fraction of exact-kNN results each probe
  * budget recovers, and what it costs in wall time. Scan fraction is
  * nProbe/nClusters by construction (probe = partition pruning), so the
  * curve shows the recall price of each pruning step.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.Tables(spark, dir, "embeddings").localCheckpoint(true)
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label")).localCheckpoint(true)
      // recall denominator from the ACTUAL exact result, not a hardcoded
      // nq·10: an id space not dense from 0 (or < 8 vectors) would
      // silently deflate every reported recall otherwise
      val exactHits = exact.count().toDouble
      val nClusters = (vectors.count() / 40L + 1).toInt
      def recallAndTime(mk: Int => org.apache.spark.sql.DataFrame,
                        nProbe: Int): (Double, Double) = {
        mk(nProbe).count() // warm the plan; measure the second run
        val t0 = System.nanoTime()
        val common = mk(nProbe).select(col("qid"), col("label"))
          .join(exact, Seq("qid", "label")).count()
        ((System.nanoTime() - t0) / 1e9, common.toDouble / exactHits)
      }
      for (np <- Seq(1, 2, 4, 8, 16)) {
        val (tIvf, rIvf) = recallAndTime(
          p => Similarity.ivfTopK(vectors, queries, 10, 40, p), np)
        val (tRes, rRes) = recallAndTime(
          p => Similarity.ivfPqResidualTopK(vectors, queries, 10, 40, p, 25, 8,
            trainedNcent = 64), np)
        println(f"$dir nProbe=$np%2d scan=${np.toDouble / nClusters}%5.3f " +
          f"ivf recall=$rIvf%5.3f ${tIvf}%5.2fs | ivfpq_resid recall=$rRes%5.3f ${tRes}%5.2fs")
      }
    }
    spark.stop()
  }
}
