package graft.tools

/** Shared interleaved A/B measurement loop for the `GemmAb` / `ShapeAb`
  * tools: both arms alternate within one JVM with the order flipped
  * every rep (slow drift — JIT state, box load — cancels instead of
  * biasing one arm), then medians + IQRs print per arm. Returns the two
  * medians (arm1, arm2) for the caller's ratio line.
  */
object AbHarness {
  def stats(ts: Seq[Double]): (Double, Double, Double) = {
    val s = ts.sorted
    (s(s.size / 2), s(s.size / 4), s((s.size * 3) / 4))
  }

  def run(label1: String, arm1: () => Double,
          label2: String, arm2: () => Double,
          reps: Int, nq: Int): (Double, Double) = {
    arm1(); arm2() // untimed warmup of both arms
    val t1 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val t2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (rep <- 1 to reps) {
      if (rep % 2 == 1) { t1 += arm1(); t2 += arm2() }
      else { t2 += arm2(); t1 += arm1() }
    }
    val (m1, a1, b1) = stats(t1.toSeq)
    val (m2, a2, b2) = stats(t2.toSeq)
    println(f"$label1%-12s: median ${m1}%.3f s  IQR [${a1}%.3f, ${b1}%.3f]  ${m1 * 1000 / nq}%.1f ms/search")
    println(f"$label2%-12s: median ${m2}%.3f s  IQR [${a2}%.3f, ${b2}%.3f]  ${m2 * 1000 / nq}%.1f ms/search")
    (m1, m2)
  }
}
