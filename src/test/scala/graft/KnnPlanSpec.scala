package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.index.{Metric, VectorIndexFlat}
import graft.plans.{Knn, KnnPartialExec}

class KnnPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fused search plans through KnnPartialExec (custom strategy)") {
    val idx = VectorIndexFlat(spark, 8, Metric.L2)
    idx.add(Oracle.genVectors(50, 8).toSeq)
    val plan = idx.search(Oracle.queriesDf(spark, Oracle.genVectors(2, 8)), 3)
      .queryExecution.executedPlan
    // AQE wraps the tree; the node must appear (without the `!` invalid
    // marker) in the rendered plan
    val rendered = plan.toString
    assert(rendered.contains("KnnPartial"), s"expected KnnPartialExec in:\n$rendered")
    assert(!rendered.contains("!KnnPartial"), s"KnnPartialExec invalid in:\n$rendered")
  }

  test("Knn.partials emits at most nq*k rows per partition and exact scores") {
    val vecs = Oracle.genVectors(200, 16)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false), nullable = false)))
    val vdf = spark.createDataFrame(java.util.Arrays.asList(
      vecs.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v) }: _*), schema)
      .repartition(4)
    val qs = Oracle.genVectors(3, 16, seed = 7)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    val partials = Knn.partials(vdf, qs, 5, ascending = true, innerProduct = false)
    assert(partials.count() <= 4L * 3 * 5)
    // global top-k over partials equals scalar oracle
    import graft.functions.topK
    val merged = partials.groupBy(col("qid"))
      .agg(topK(col("score"), col("id"), 5, ascending = true).as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .collect().groupBy(_.getLong(0))
    val want = Oracle.bruteForceKnn(vecs, qs.map(_._2).toArray, 5, innerProduct = false)
    for (q <- 0 until 3) {
      val got = merged(q.toLong).sortBy(_.getInt(1))
        .map(_.getStruct(2).getLong(0)).toSeq
      assert(got === want(q).map(_._1).toSeq)
    }
  }
}
