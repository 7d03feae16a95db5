package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Anisotropic embedding fixture — the regime PCA-coarse retrieval and
  * kNN label propagation exist for, which the near-isotropic testdata
  * embeddings never exercise (r7/r8 verdict ask).
  *
  * Construction (seeded, deterministic): cluster-mixture data of intrinsic
  * rank `rank` inside R^d — `nClusters` centers drawn in the rank-dim
  * subspace, within-cluster variation with a geometrically decaying
  * spectrum, a small isotropic noise floor in all d dims, then a dense
  * random ORTHOGONAL rotation of the whole space. The rotation is the
  * point: no coordinate prefix aligns with the signal subspace, so
  * prefix-truncation retrieval degrades while PCA (which recovers the
  * rotated subspace from data) does not. Orthogonality preserves L2, so
  * exact kNN in the rotated space is exact kNN in the latent space.
  */
object AnisotropicEmbed {

  /** (id, vec: array<float>, cls) — cls is the generating cluster. */
  def corpus(spark: SparkSession, n: Int, d: Int = 64, rank: Int = 24,
             nClusters: Int = 10, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rng = new java.util.Random(seed)
    // dense orthogonal Q via Gram-Schmidt on a gaussian matrix
    val q = Array.fill(d, d)(rng.nextGaussian())
    for (i <- 0 until d) {
      for (j <- 0 until i) {
        var dot = 0.0
        var k = 0; while (k < d) { dot += q(i)(k) * q(j)(k); k += 1 }
        k = 0; while (k < d) { q(i)(k) -= dot * q(j)(k); k += 1 }
      }
      val nrm = math.sqrt(q(i).map(x => x * x).sum)
      var k = 0; while (k < d) { q(i)(k) /= nrm; k += 1 }
    }
    val centers = Array.fill(nClusters, rank)(rng.nextGaussian() * 4.0)
    val rows = (0 until n).map { i =>
      val cls = i % nClusters
      val latent = new Array[Double](d)
      var j = 0
      while (j < rank) {
        latent(j) = centers(cls)(j) + rng.nextGaussian() * 2.5 * math.pow(0.88, j)
        j += 1
      }
      j = 0
      while (j < d) { latent(j) += rng.nextGaussian() * 0.05; j += 1 }
      // x = Q^T · latent (rows of q are the orthonormal basis)
      val x = new Array[Float](d)
      j = 0
      while (j < d) {
        var s = 0.0
        var k = 0; while (k < d) { s += q(k)(j) * latent(k); k += 1 }
        x(j) = s.toFloat
        j += 1
      }
      (i.toLong, x, cls)
    }
    rows.toDF("id", "vec", "cls").repartition(8)
  }

  private def recallVs(exact: DataFrame, approx: DataFrame): Double = {
    val nExact = exact.count().toDouble
    approx.select(col("qid"), col("label"))
      .join(exact, Seq("qid", "label")).count() / nExact
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val all = corpus(spark, n).localCheckpoint(true)
    val vectors = all.select(col("id"), col("vec"))
    val classes = all.select(col("id").as("nid"), col("cls"))
    val nq = 32
    val queries = all.filter(col("id") < nq)
      .select(col("id").as("qid"), col("vec").as("qv"))

    val model = Similarity.trainPca(vectors, 16)
    println(f"[aniso] n=$n d=64 rank=24: PCA-16 explained ratio = " +
      f"${model.explained.sum / model.totalVar}%.4f (top-8 = " +
      f"${model.explained.take(8).sum / model.totalVar}%.4f)")

    val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
      .select(col("qid"), col("label")).localCheckpoint(true)

    val rPca = recallVs(exact, Similarity.pcaRerankTopK(vectors, queries, 10, model, 4))
    val rPre = recallVs(exact, Similarity.prefixRerankTopK(vectors, queries, 10, 16, 4))
    println(f"[aniso] recall@10: pca16(expand4)=$rPca%.4f prefix16(expand4)=$rPre%.4f")

    for (np <- Seq(1, 2, 4, 8, 16)) {
      val r = recallVs(exact, Similarity.ivfTopK(vectors, queries, 10, 40, np))
      println(f"[aniso] ivf nProbe=$np%2d recall=$r%.4f")
    }

    // leave-self-out 10-NN majority classification (the ann_knn_classify
    // shape) — accuracy vs chance = 1/nClusters
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score"), col("nid"))
    val top10 = Similarity.bruteForceTopK(vectors, queries, 11, "l2")
      .select(col("qid"), col("label").as("nid"), col("score"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
    val pred = top10.join(broadcast(classes), "nid")
      .groupBy(col("qid"), col("cls")).agg(count(lit(1)).as("votes"))
      .groupBy(col("qid"))
      .agg(max(struct(col("votes"), (-col("cls")).cast("long").as("nc"))).as("best"))
      .select(col("qid"), (-col("best.nc")).cast("int").as("pred"))
    val acc = pred.join(all.select(col("id").as("qid"), col("cls")), "qid")
      .select(avg((col("pred") === col("cls")).cast("double")).as("acc"))
      .head().getDouble(0)
    println(f"[aniso] 10-NN classify accuracy = $acc%.4f (chance = 0.10)")
    spark.stop()
  }
}
