package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Reconcile

/** Snapshot diff: every status class, null-safe comparisons, and the
  * diffs-only contract.
  */
class ReconcileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("x", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true)))

  private def df(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("tableDiff: added/removed/changed with changed-column names; same rows absent") {
    val before = df(
      Row(1L, 1.0, "a"), // unchanged
      Row(2L, 2.0, "b"), // x changes
      Row(3L, 3.0, "c"), // both change
      Row(4L, 4.0, "d"), // removed
      Row(5L, null, "e")) // null → value (null-safe change)
    val after = df(
      Row(1L, 1.0, "a"),
      Row(2L, 2.5, "b"),
      Row(3L, 3.5, "cc"),
      Row(5L, 9.0, "e"),
      Row(6L, 6.0, "f")) // added
    val got = Reconcile.tableDiff(before, after, Seq("id"), Seq("x", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (2L, "changed", "x"),
      (3L, "changed", "x,s"),
      (4L, "removed", ""),
      (5L, "changed", "x"),
      (6L, "added", "")))
  }

  test("tableDiff: value → null is a change; identical nulls are not") {
    val before = df(Row(1L, 1.0, null), Row(2L, null, null))
    val after = df(Row(1L, null, null), Row(2L, null, null))
    val got = Reconcile.tableDiff(before, after, Seq("id"), Seq("x", "s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "changed", "x")))
  }

  test("tableDiff: identical snapshots diff to zero rows; arg validation") {
    val t = df(Row(1L, 1.0, "a"))
    assert(Reconcile.tableDiff(t, t, Seq("id"), Seq("x", "s")).count() === 0L)
    intercept[IllegalArgumentException] {
      Reconcile.tableDiff(t, t, Seq.empty, Seq("x"))
    }
    intercept[IllegalArgumentException] {
      Reconcile.tableDiff(t, t, Seq("id"), Seq.empty)
    }
  }
}
