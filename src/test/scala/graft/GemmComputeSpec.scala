package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** fp32-compute (`sgemm`) vs fp64-compute (`dgemm`) GEMM path agreement —
  * the dual-path discipline of the reference's MPS-vs-CPU checks
  * (`tests/test_metal_flat.mm:270-307`: forced paths must agree within a
  * reduced-precision tolerance, not bit-exactly).
  */
class GemmComputeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixtures(n: Int, nq: Int, d: Int) = {
    val spark2 = spark
    import spark2.implicits._
    val vdf = Oracle.genVectors(n, d).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("id", "vec")
    val qdf = Oracle.genVectors(nq, d, seed = 7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("qid", "qv")
    (vdf, qdf)
  }

  for (metric <- Seq("l2", "ip", "cosine"))
    test(s"sgemm path agrees with dgemm path on $metric (scores ≤5e-2 rel, recall ≥0.98)") {
      val (vdf, qdf) = fixtures(2000, 8, 96)
      val k = 10
      def run(compute: String): Map[(Long, Long), Double] =
        Similarity.gemmTopK(vdf, qdf, k, blockRows = 300, metric = metric,
            compute = compute)
          .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
      val d64 = run("fp64")
      val f32 = run("fp32")
      // label sets per qid may swap near-ties between precisions; require
      // ≥ 0.98 overall recall of the fp64 top-k
      val common = d64.keySet intersect f32.keySet
      assert(common.size >= math.ceil(d64.size * 0.98).toInt,
        s"recall ${common.size}/${d64.size} below 0.98 for $metric")
      // matched pairs' scores agree to reduced precision: |a-b| ≤ 5e-2·max(|a|,|b|,1)
      common.foreach { key =>
        val a = d64(key); val b = f32(key)
        val tol = 5e-2 * math.max(math.max(math.abs(a), math.abs(b)), 1.0)
        assert(math.abs(a - b) <= tol, s"$metric $key: fp64=$a fp32=$b")
      }
    }

  test("sgemm path handles f16 storage and block-boundary fills") {
    val spark2 = spark
    import spark2.implicits._
    val (vdf, qdf) = fixtures(1000, 4, 33) // odd d, non-multiple of block
    val quant = vdf.select(
      org.apache.spark.sql.functions.col("id"),
      graft.functions.quantizeF16(org.apache.spark.sql.functions.col("vec")).as("vec"))
    val d64 = Similarity.gemmTopK(quant, qdf, 7, blockRows = 128,
      storage = "f16").collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val f32 = Similarity.gemmTopK(quant, qdf, 7, blockRows = 128,
      storage = "f16", compute = "fp32").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val inter = (d64 intersect f32).size
    assert(inter >= math.ceil(d64.size * 0.98).toInt, s"overlap $inter/${d64.size}")
  }

  test("compute mode survives the auto-batching route (oversize query sets)") {
    val (vdf, qdf) = fixtures(500, 12, 32)
    // maxQueries=4 forces gemmTopK through batchedTopK; fp32 must still
    // agree with the un-batched fp32 path (hash-split changes nothing)
    val direct = Similarity.gemmTopK(vdf, qdf, 5, compute = "fp32")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batched = Similarity.gemmTopK(vdf, qdf, 5, maxQueries = 4, compute = "fp32")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batched === direct)
  }

  test("unknown compute mode is rejected") {
    val (vdf, qdf) = fixtures(10, 2, 8)
    intercept[IllegalArgumentException] {
      Similarity.gemmTopK(vdf, qdf, 3, compute = "fp16").collect()
    }
  }
}
