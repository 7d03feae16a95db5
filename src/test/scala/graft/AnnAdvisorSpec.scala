package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AnnAdvisor

/** The measured-Pareto tier advisor: routing decisions are pinned (the
  * selection contract is deterministic data, not heuristics), scale
  * invariance of tier identity in n, and the advisor-routed query
  * end-to-end on real testdata.
  */
class AnnAdvisorSpec extends AnyFunSuite {

  private val n20k = 20000L
  private val d64 = 64

  test("pinned routing: the documented (target, budget) → tier decisions") {
    // quality under a 64 B/vec budget → the PCA sweet spot
    val c1 = AnnAdvisor.choose(n20k, d64, 0.99, 64.0)
    assert(c1.tier === "pca16-rerank" && c1.meetsTarget)
    // relax recall to 0.90 → ivf-p4 wins on scan bytes (~2 B/vec)
    val c2 = AnnAdvisor.choose(n20k, d64, 0.90, 64.0)
    assert(c2.tier === "ivf-p4" && c2.meetsTarget)
    assert(c2.scanBytesPerVec < c1.scanBytesPerVec)
    // tight 2 B/vec budget at 0.80 → the SQ8-quantized IVF
    val c3 = AnnAdvisor.choose(n20k, d64, 0.80, 2.0)
    assert(c3.tier === "ivf-sq8-p2" && c3.meetsTarget)
    // impossible ask (recall 1.0 within 8 B/vec): falls back to the
    // highest-recall tier that fits the budget, flagged
    val c4 = AnnAdvisor.choose(n20k, d64, 1.0, 8.0)
    assert(c4.tier === "ivf-p4" && !c4.meetsTarget)
    // budget below every tier: budget becomes advisory — globally
    // smallest scan tier, still flagged
    val c5 = AnnAdvisor.choose(n20k, d64, 0.5, 0.01)
    assert(c5.tier === "ivfpq-resid-p2-rerank" && !c5.meetsTarget)
  }

  test("tier identity is n-invariant (IVF fractions shrink with n, never grow)") {
    for (target <- Seq(0.99, 0.90, 0.80); budget <- Seq(64.0, 8.0, 2.0)) {
      val small = AnnAdvisor.choose(n20k, d64, target, budget)
      val big = AnnAdvisor.choose(200L * n20k, d64, target, budget)
      assert(small.tier === big.tier, s"target=$target budget=$budget")
      assert(big.scanBytesPerVec <= small.scanBytesPerVec + 1e-12)
    }
  }

  test("invalid inputs fail loudly") {
    intercept[IllegalArgumentException](AnnAdvisor.choose(0L, d64, 0.9, 64.0))
    intercept[IllegalArgumentException](AnnAdvisor.choose(n20k, d64, 0.0, 64.0))
    intercept[IllegalArgumentException](AnnAdvisor.choose(n20k, d64, 1.5, 64.0))
  }

  test("ann_auto end-to-end: advisor routes to pca16-rerank and recall holds") {
    val rows = SparkEntry.queries("ann_auto")(TestSpark.spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getString(1) == "pca16-rerank"))
    assert(rows.forall(_.getBoolean(2)), "recall_ok must hold on every query")
    assert(rows.forall(_.getBoolean(3)), "advisor must report meets_target")
  }
}
