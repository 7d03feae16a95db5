package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Nsw, Similarity}

/** NSW graph ANN: exhaustive-parameter equivalence with the exact path,
  * sharded-beam recall, shard-membership determinism, and edge cases.
  */
class NswSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val vecSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
  private val qSchema = StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("qv", ArrayType(FloatType, containsNull = false), nullable = false)))

  private def vecDf(vs: Array[Array[Float]], schema: StructType = vecSchema): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v.toSeq)
      }: _*), schema)

  private def qDf(vs: Array[Array[Float]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(vs.zipWithIndex.map { case (v, i) =>
        Row(i.toLong, v.toSeq)
      }: _*), qSchema)

  private def collectHits(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("qid", "rank", "label", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))

  test("exhaustive parameters reproduce bruteForceTopK bit-exactly") {
    val vs = Oracle.genVectors(60, 8, seed = 7L)
    val qs = Oracle.genVectors(5, 8, seed = 11L)
    val exact = collectHits(Similarity.bruteForceTopK(vecDf(vs), qDf(qs), 10))
    // complete graph (m >= n) + exhaustive beam (efSearch >= n), one shard
    val nsw = collectHits(Nsw.nswTopK(vecDf(vs), qDf(qs), 10,
      numShards = 1, m = 64, efConstruction = 64, efSearch = 64))
    assert(nsw === exact)
  }

  test("sharded beam search: high recall at bounded beam width") {
    val vs = Oracle.genVectors(400, 16, seed = 3L)
    val qs = Oracle.genVectors(10, 16, seed = 5L)
    val k = 10
    val exact = Similarity.bruteForceTopK(vecDf(vs), qDf(qs), k)
      .select("qid", "label")
    val nsw = Nsw.nswTopK(vecDf(vs), qDf(qs), k,
      numShards = 4, m = 12, efConstruction = 48, efSearch = 64)
      .select("qid", "label")
    val common = nsw.join(exact, Seq("qid", "label")).count()
    val recall = common.toDouble / (qs.length * k)
    // deterministic computation — the measured value is pinned by the
    // fixture; ≥ 0.9 leaves headroom for fixture edits without letting a
    // broken graph (recall ~ nShards·k/n ≈ 0.1 random) pass
    assert(recall >= 0.9, s"recall@$k = $recall")
  }

  test("result is invariant to input partitioning and repeated runs") {
    val vs = Oracle.genVectors(150, 8, seed = 13L)
    val qs = Oracle.genVectors(4, 8, seed = 17L)
    val base = vecDf(vs)
    val run1 = collectHits(Nsw.nswTopK(base, qDf(qs), 5,
      numShards = 3, m = 6, efConstruction = 16, efSearch = 16))
    val run2 = collectHits(Nsw.nswTopK(base.repartition(7, col("vec")), qDf(qs), 5,
      numShards = 3, m = 6, efConstruction = 16, efSearch = 16))
    val run3 = collectHits(Nsw.nswTopK(base.orderBy(desc("id")), qDf(qs), 5,
      numShards = 3, m = 6, efConstruction = 16, efSearch = 16))
    assert(run1 === run2)
    assert(run1 === run3)
  }

  test("k > ntotal pads sentinels exactly like the exact path") {
    val vs = Oracle.genVectors(4, 8, seed = 19L)
    val qs = Oracle.genVectors(2, 8, seed = 23L)
    val exact = collectHits(Similarity.bruteForceTopK(vecDf(vs), qDf(qs), 7))
    val nsw = collectHits(Nsw.nswTopK(vecDf(vs), qDf(qs), 7,
      numShards = 1, m = 8, efConstruction = 8, efSearch = 8))
    assert(nsw === exact)
  }

  test("empty query batch yields an empty result of the shared shape") {
    val vs = Oracle.genVectors(10, 8, seed = 29L)
    val out = Nsw.nswTopK(vecDf(vs), qDf(Array.empty).limit(0), 3)
    assert(out.columns.toSeq === Seq("qid", "rank", "label", "score"))
    assert(out.count() === 0L)
  }

  test("invalid parameters throw") {
    val vs = vecDf(Oracle.genVectors(5, 4))
    val qs = qDf(Oracle.genVectors(1, 4))
    intercept[IllegalArgumentException] { Nsw.nswTopK(vs, qs, 0) }
    intercept[IllegalArgumentException] { Nsw.nswTopK(vs, qs, 3, numShards = 0) }
    intercept[IllegalArgumentException] { Nsw.nswTopK(vs, qs, 3, m = 0) }
  }
}
