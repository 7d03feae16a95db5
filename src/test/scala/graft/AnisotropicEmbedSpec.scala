package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.tools.AnisotropicEmbed

/** The anisotropic regime the PCA/classify operators exist for (r7/r8
  * verdict ask): seeded low-rank cluster-mixture embeddings under a dense
  * random rotation — see [[graft.tools.AnisotropicEmbed]]. Deterministic
  * (fixed seed), so the measured recalls are fixed numbers; tolerances
  * below are slack against float-sum reordering only.
  *
  * Measured at n=4000 (tools run, recorded in BASELINE.md): PCA-16
  * explained 0.996, pca-rerank recall 1.000, prefix-rerank 0.919, IVF
  * recall 0.72 → 0.98 over nProbe 1 → 16, classify accuracy 1.00.
  */
class AnisotropicEmbedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val all = AnisotropicEmbed.corpus(spark, 4000).localCheckpoint(true)
  private lazy val vectors = all.select(col("id"), col("vec"))
  private lazy val queries = all.filter(col("id") < 32)
    .select(col("id").as("qid"), col("vec").as("qv"))
  private lazy val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
    .select(col("qid"), col("label")).localCheckpoint(true)

  private def recallVs(approx: org.apache.spark.sql.DataFrame): Double = {
    val n = exact.count().toDouble
    approx.select(col("qid"), col("label")).join(exact, Seq("qid", "label")).count() / n
  }

  test("the corpus is genuinely anisotropic: PCA-16 captures the spectrum") {
    val model = Similarity.trainPca(vectors, 16)
    val ratio = model.explained.sum / model.totalVar
    assert(ratio >= 0.98, s"PCA-16 explained ratio $ratio — fixture not anisotropic")
    // an isotropic corpus would give ~16/64 = 0.25; require the gap
    assert(model.explained.head > 4 * model.explained.last,
      "spectrum should decay within the kept basis")
  }

  test("PCA-coarse retrieval beats prefix truncation at equal kept width") {
    val model = Similarity.trainPca(vectors, 16)
    val rPca = recallVs(Similarity.pcaRerankTopK(vectors, queries, 10, model, 4))
    val rPre = recallVs(Similarity.prefixRerankTopK(vectors, queries, 10, 16, 4))
    assert(rPca >= 0.99, s"pca-rerank recall $rPca")
    assert(rPre <= 0.96, s"prefix-rerank recall $rPre — rotation should hurt the prefix")
    assert(rPca > rPre, s"pca $rPca must beat prefix $rPre on rotated low-rank data")
  }

  test("IVF recall rises with nProbe and prices the pruning honestly") {
    val rs = Seq(1, 4, 16).map(np =>
      np -> recallVs(Similarity.ivfTopK(vectors, queries, 10, 40, np))).toMap
    assert(rs(1) <= 0.90, s"nProbe=1 recall ${rs(1)} — pruning should cost recall here")
    assert(rs(1) <= rs(4) && rs(4) <= rs(16), s"recall must be monotone in nProbe: $rs")
    assert(rs(16) >= 0.95, s"nProbe=16 recall ${rs(16)}")
  }

  test("10-NN majority classification recovers cluster labels far above chance") {
    val classes = all.select(col("id").as("nid"), col("cls"))
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
    assert(acc >= 0.95, s"classify accuracy $acc vs chance 0.10")
  }
}
