package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B for the medium-768d GEMM shape (100k vectors × 768d,
  * nq=10, k=10) — the one bandwidth-bound workload whose best-of-3
  * full-run cells have swung 3× on unchanged code twice (r3, r9). A 2×
  * code effect cannot hide from this design: the two variants alternate
  * WITHIN one JVM session on the same cached data, ≥10 reps each, with
  * the A/B order flipped every rep so slow drift (JIT state, box load)
  * cancels instead of biasing one arm.
  *
  * Arms: fp64 `dgemm` (the default oracle-parity path) vs fp32 `sgemm`
  * (half the GEMM memory traffic — the reference's reduced-precision
  * compute idea, `shaders/simdgroup_gemm.metal:7-14,47-50`).
  *
  * `sbt "runMain graft.tools.GemmAb [nv] [d] [nq] [k] [reps]"`
  */
object GemmAb {
  def main(args: Array[String]): Unit = {
    val nv = args.lift(0).map(_.toInt).getOrElse(100000)
    val d = args.lift(1).map(_.toInt).getOrElse(768)
    val nq = args.lift(2).map(_.toInt).getOrElse(10)
    val k = args.lift(3).map(_.toInt).getOrElse(10)
    val reps = args.lift(4).map(_.toInt).getOrElse(12)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def gen(n: Int, dd: Int, seed: Long) = {
      val rnd = new scala.util.Random(seed)
      Array.fill(n)(Array.fill(dd)(rnd.nextFloat() * 2f - 1f))
    }
    // cache + materialize the corpus once: the A/B isolates GEMM compute,
    // which is exactly the axis the two arms differ on
    val vdf = spark.sparkContext
      .parallelize(gen(nv, d, 42L).zipWithIndex.map { case (v, i) => (i.toLong, v) }, 32)
      .toDF("id", "vec").localCheckpoint()
    val qdf = gen(nq, d, 99L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("qid", "qv").localCheckpoint()

    def run(compute: String): Double = {
      val t0 = System.nanoTime()
      graft.ops.Similarity.gemmTopK(vdf, qdf, k, metric = "l2", compute = compute).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"shape nv=$nv d=$d nq=$nq k=$k reps=$reps (interleaved, order-flipped)")
    val (m64, m32) = AbHarness.run(
      "dgemm(fp64)", () => run("fp64"),
      "sgemm(fp32)", () => run("fp32"), reps, nq)
    println(f"speedup dgemm/sgemm: ${m64 / m32}%.2fx")
    println(s"""{"shape":"${nv}x${d}q${nq}k$k","dgemm_median_sec":${f"$m64%.4f"},"sgemm_median_sec":${f"$m32%.4f"},"speedup":${f"${m64 / m32}%.3f"},"reps":$reps}""")
    spark.stop()
  }
}
