package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: the exact diff between two versions of a
  * table — the audit primitive behind CDC validation, backfill
  * verification, and "what changed between yesterday's corpus and
  * today's". Reports ONLY differences (added / removed / changed rows,
  * with the changed column names); at 100 TB the diff is usually tiny
  * relative to the inputs, so emitting `same` rows would dwarf the
  * signal and the shuffle.
  *
  * Scale shape: one full outer join on the primary key (both sides
  * shuffle once on pk — with both snapshots bucketed by pk on disk this
  * becomes a zero-shuffle zipper), all column comparisons are null-safe
  * codegen expressions in the join's projection.
  */
object Reconcile {

  /** Diff `after` vs `before` on primary key `pk`, comparing
    * `compareCols`. Returns (pk..., status ∈ added|removed|changed,
    * changed_cols — comma-joined names for changed rows, '' otherwise).
    */
  def tableDiff(before: DataFrame, after: DataFrame, pk: Seq[String],
                compareCols: Seq[String]): DataFrame = {
    require(pk.nonEmpty, "tableDiff needs at least one primary-key column")
    require(compareCols.nonEmpty, "tableDiff needs at least one compare column")
    val b = before.select((pk ++ compareCols).map(col): _*).alias("b")
    val a = after.select((pk ++ compareCols).map(col): _*).alias("a")
    val on = pk.map(c => col(s"b.$c") <=> col(s"a.$c")).reduce(_ && _)
    val inB = pk.map(c => col(s"b.$c").isNotNull).reduce(_ && _)
    val inA = pk.map(c => col(s"a.$c").isNotNull).reduce(_ && _)
    val colChanged: Seq[Column] = compareCols.map { c =>
      when(!(col(s"b.$c") <=> col(s"a.$c")), lit(c))
    }
    val anyChanged = compareCols.map { c =>
      !(col(s"b.$c") <=> col(s"a.$c"))
    }.reduce(_ || _)
    val status = when(!inB, lit("added"))
      .when(!inA, lit("removed"))
      .when(anyChanged, lit("changed"))
    val pkOut = pk.map(c => coalesce(col(s"b.$c"), col(s"a.$c")).as(c))
    b.join(a, on, "full_outer")
      .select(pkOut :+ status.as("status") :+
        when(inB && inA && anyChanged, concat_ws(",", colChanged: _*))
          .otherwise(lit("")).as("changed_cols"): _*)
      .filter(col("status").isNotNull)
  }
}
