package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.tools.LshRecall

/** Soft-region LSH recall: the fixture where MinHash-LSH genuinely loses
  * pairs (true-pair Jaccard 0.4–0.95, not just the saturated J ≥ 0.9
  * region). Pairs have EXACTLY known Jaccard by construction
  * (suffix-mutated replicas over disjoint vocabularies — see
  * [[graft.tools.LshRecall]]); recall is asserted against the theoretical
  * S-curve P = 1 − (1 − J^r)^b. Deterministic: md5-based MinHash over a
  * sequential vocabulary, no RNG.
  */
class LshRecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val pairsPerLevel = 60

  private lazy val (docs, truth) = {
    val (d, t) = LshRecall.corpus(spark, pairsPerLevel)
    (d.localCheckpoint(true), t.localCheckpoint(true))
  }

  test("exact prefixFilterPairs recovers the constructed truth set exactly in the soft region") {
    val exact = Dedup.prefixFilterPairs(docs, 0.4)
    assert(exact.count() === truth.count())
    assert(truth.join(exact, Seq("doc_a", "doc_b"), "left_semi").count() === truth.count())
    // and the computed jaccard equals the constructed jaccard per level
    val byLevel = truth.join(exact, Seq("doc_a", "doc_b"))
      .groupBy("level").agg(min("jaccard").as("jmin"), max("jaccard").as("jmax"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((label, k) <- LshRecall.jLevels) {
      val j = LshRecall.exactJ(k)
      val (lo, hi) = byLevel(label)
      assert(math.abs(lo - j) < 1e-9 && math.abs(hi - j) < 1e-9,
        s"level $label: constructed J=$j, measured [$lo, $hi]")
    }
  }

  test("LSH candidate recall follows the S-curve and degrades where theory says it must") {
    val configs = Seq((8, 2), (16, 2), (16, 4))
    val meas = configs.map { case (h, r) =>
      (h, r) -> LshRecall.recalls(docs, truth, h, r)
    }.toMap

    // every (config, level): measured within ±0.15 of theory (60 pairs per
    // level; the 200-pair tools run lands within 0.05 — see BASELINE.md)
    for ((h, r) <- configs; (label, k) <- LshRecall.jLevels) {
      val want = LshRecall.theory(LshRecall.exactJ(k), r, h / r)
      val got = meas((h, r))(label)
      assert(math.abs(got - want) <= 0.15,
        s"config ($h,$r) level $label: measured $got vs theory $want")
    }

    val default = meas((8, 2))
    // saturated region: essentially perfect
    assert(default("0.95") >= 0.98 && default("0.90") >= 0.98)
    // soft region: REAL loss — this is what the fixture exists to show
    assert(default("0.50") <= 0.85, s"J=0.5 recall ${default("0.50")} should be lossy")
    assert(default("0.40") <= 0.70, s"J=0.4 recall ${default("0.40")} should be lossy")
    // monotone degradation with J
    assert(default("0.40") < default("0.60") && default("0.60") < default("0.80"))
    // more bands at same r: better soft-region recall
    assert(meas((16, 2))("0.50") > default("0.50"))
    // larger r at same hash budget: steeper curve, worse at J=0.5
    assert(meas((16, 4))("0.50") < meas((16, 2))("0.50"))
  }

  test("chooseBandConfig: chosen config meets its target on the fixture, the cheaper one misses") {
    // τ = 0.70 (fixture level "0.70", exact J = 66/94), target 90%
    val tau = LshRecall.exactJ(14)
    val (h, r) = Dedup.chooseBandConfig(tau, 0.90)
    // the chooser's own theory must clear the target, and the next
    // cheaper width must NOT (otherwise the choice wasn't minimal)
    assert(Dedup.lshRecallTheory(tau, r, h / r) >= 0.90)
    val cheaperWidths = Iterator.iterate(4)(_ * 2).takeWhile(_ < h).toSeq
    for (ch <- cheaperWidths; cr <- (1 to ch).filter(ch % _ == 0))
      assert(Dedup.lshRecallTheory(tau, cr, ch / cr) < 0.90,
        s"cheaper ($ch,$cr) would have sufficed — chooser not minimal")

    // measured on the exact-Jaccard fixture: chosen config ≥ target − 0.10
    // (60 pairs/level sampling noise; r9 grid: |meas − theory| ≤ 0.043),
    // while the cheapest INfeasible config at the same width count
    // measurably misses the target
    val got = LshRecall.recalls(docs, truth, h, r)("0.70")
    assert(got >= 0.90 - 0.10, s"chosen ($h,$r) measured $got at tau=$tau")
    // a provably infeasible same-or-cheaper config: (8, 4) → b=2
    assert(Dedup.lshRecallTheory(tau, 4, 2) < 0.90)
    val miss = LshRecall.recalls(docs, truth, 8, 4)("0.70")
    assert(miss < 0.90, s"infeasible (8,4) measured $miss — should miss target")

    // chooser sanity across the τ range: wider targets need wider signatures
    val (h1, _) = Dedup.chooseBandConfig(0.5, 0.95)
    val (h2, _) = Dedup.chooseBandConfig(0.5, 0.999)
    assert(h1 <= h2)
    intercept[IllegalArgumentException] {
      Dedup.chooseBandConfig(0.05, 0.999, maxHashes = 8)
    }
  }
}
