package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Assoc

/** Pair-level association rules vs hand-computed support/confidence/lift. */
class AssocSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def items(rows: (Long, Long)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("basket", "item")
  }

  test("pairRules: counts, confidence, lift, support floor, incidence dedup") {
    // baskets: 1:{a,b,c}, 2:{a,b}, 3:{a,b}, 4:{c}; a=10, b=20, c=30;
    // the duplicated (2, a) row must collapse before counting
    val inc = items(1L -> 10L, 1L -> 20L, 1L -> 30L, 2L -> 10L, 2L -> 10L,
      2L -> 20L, 3L -> 10L, 3L -> 20L, 4L -> 30L)
    val got = Assoc.pairRules(inc, "basket", "item", minPairCount = 2L)
      .collect()
    assert(got.length === 1) // (a,c) and (b,c) have c_pair 1 → pruned
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((10L, 20L, 3L)))
    assert((r.getLong(3), r.getLong(4)) === ((3L, 3L)))
    assert(r.getDouble(5) === 1.0 && r.getDouble(6) === 1.0)
    // lift = c_pair·N / (c_u·c_v) = 3·4 / 9
    assert(r.getDouble(7) === 12.0 / 9.0)
  }

  test("pairRules: lift below 1 for anti-correlated items") {
    // u in baskets 1..4, v in baskets 3..6; together only in 3,4 → N=6,
    // lift = 2·6/(4·4) = 0.75
    val inc = items((1L to 4L).map(_ -> 1L) ++ (3L to 6L).map(_ -> 2L): _*)
    val r = Assoc.pairRules(inc, "basket", "item", minPairCount = 1L)
      .collect().head
    assert(r.getLong(2) === 2L)
    assert(r.getDouble(7) === 0.75)
    assert(r.getDouble(5) === 0.5 && r.getDouble(6) === 0.5)
  }

  test("pairRules rejects a non-positive support floor") {
    intercept[IllegalArgumentException] {
      Assoc.pairRules(items(1L -> 1L), "basket", "item", minPairCount = 0L)
    }
  }
}
