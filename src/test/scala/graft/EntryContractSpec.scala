package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract, pinned: every query has an oracle (the "0
  * unchecked" invariant the correctness gate relies on), names are
  * well-formed, and the flagship entry() returns rows on the smoke SF.
  */
class EntryContractSpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(q.forall(_.matches("[a-z0-9_]+")), "driver-safe names only")
  }

  test("flagship entry() returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0L)
  }
}
