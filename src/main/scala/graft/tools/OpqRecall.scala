package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measured OPQ-vs-baselines recall grid (the r9 "measured, not
  * asserted" convention — cf. tools/LshRecall, tools/AnisotropicEmbed):
  * recall@10 of raw-space trained PQ, PCA+PQ (the cheap-OPQ
  * composition `ann_pca_pq` ships), and full OPQ (`ann_opq`) at an
  * identical (m, ncent) code budget, on the two corpus shapes that
  * separate the three methods:
  *
  *  - **axis-decay**: axis-aligned geometrically decaying variances.
  *    Raw subspace 0 holds ~all the energy → raw-PQ misallocates its
  *    per-subspace budget; PCA is ≈ identity here, so PCA+PQ inherits
  *    the same imbalance; OPQ's rotation rebalances it.
  *  - **rotated-aniso**: the AnisotropicEmbed cluster-mixture (rank-24
  *    signal under a dense orthogonal rotation). Raw coordinates are
  *    balanced BY the rotation, but PCA re-concentrates variance into
  *    the leading dims — the regime where the "cheap OPQ" composition
  *    is the one that misallocates, and the alternating optimization
  *    has to climb back out of its own init.
  *
  * Everything is seeded/deterministic, so the printed grid is a
  * reproducible artifact (recorded in BASELINE.md).
  */
object OpqRecall {

  private def axisDecay(spark: SparkSession, n: Int, d: Int,
                        seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val sd = Array.tabulate(d)(j => math.pow(0.88, j).max(1e-3) * 10.0)
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(d)(j => (rnd.nextGaussian() * sd(j)).toFloat))
    }.toDF("id", "vec")
  }

  private def recallAt10(exact: Set[(Long, Long)], got: DataFrame): Double = {
    val g = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    g.intersect(exact).size.toDouble / exact.size
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("opq-recall").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 4000; val d = 64; val m = 8; val ncent = 64; val nq = 100
    val iters = args.headOption.map(_.toInt).getOrElse(6)

    val shapes: Seq[(String, DataFrame)] = Seq(
      "axis-decay" -> axisDecay(spark, n, d, seed = 7L),
      "rotated-aniso" -> AnisotropicEmbed.corpus(spark, n, d)
        .select(col("id"), col("vec")))

    println(f"${"shape"}%-14s ${"raw-PQ"}%8s ${"PCA+PQ"}%8s ${"OPQ"}%8s   (recall@10, m=$m ncent=$ncent, $nq queries over $n vectors)")
    shapes.foreach { case (name, vectors0) =>
      val vectors = vectors0.cache()
      val nn = vectors.count()
      val queries = vectors.filter(col("id") < nq)
        .select(col("id").as("qid"), col("vec").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

      val rawPq = recallAt10(exact,
        Similarity.pqKmeansTopK(vectors, queries, 10, ncent = ncent, m = m,
          knownCount = nn))

      val pca = Similarity.trainPca(vectors, d, knownCount = nn)
      val rotV = vectors.select(col("id"),
        graft.functions.pcaProject(col("vec"), pca.mean, pca.components).as("vec"))
      val rotQ = queries.select(col("qid"),
        graft.functions.pcaProject(col("qv"), pca.mean, pca.components).as("qv"))
      val pcaPq = recallAt10(exact,
        Similarity.pqKmeansTopK(rotV, rotQ, 10, ncent = ncent, m = m,
          knownCount = nn))

      val model = Similarity.trainOpq(vectors, m = m, ncent = ncent,
        iters = iters, knownCount = nn)
      val opq = recallAt10(exact, Similarity.opqTopK(vectors, queries, 10, model))

      println(f"$name%-14s $rawPq%8.3f $pcaPq%8.3f $opq%8.3f   errTrace ${model.errTrace.map(e => f"$e%.3f").mkString(" -> ")}")
      vectors.unpersist()
    }
    spark.stop()
  }
}
