package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose timestamp is ≤ the left row's timestamp.
  *
  * Implemented with the union + ordered-window trick (no Spark built-in):
  * tag left rows 1 and right rows 0, union, and take
  * `last(right value, ignoreNulls)` over
  * `(key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)` — at equal
  * timestamps the right row sorts first, so "at or before" includes ties.
  *
  * Scale shape: one shuffle on the key (the window), no range
  * cross-product — the standard formulation for event-time joins at
  * data-pipeline scale.
  */
object AsofJoin {

  /** @param left      rows to enrich
    * @param right     lookup rows
    * @param key       join key column name (present in both)
    * @param leftTs    left timestamp column name (long/comparable)
    * @param rightTs   right timestamp column name
    * @param rightVals right value columns to carry (renamed as given)
    * @return left rows + `asof_<col>` columns (null when no prior right row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__tag")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")): _*)
    // right rows carry their own key; every other left column rides as null
    val rFixed = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .select((leftCols.map { c =>
        if (c == key) col(key).as(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__ts") :+ col("__tag")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    // right rows tying on (__ts) must have a deterministic order or the
    // picked value depends on shuffle layout; ordering by the carried
    // values as final tiebreak makes any remaining tie value-identical
    val w = Window.partitionBy(col(key))
      .orderBy((col("__ts") +: col("__tag") +: rightVals.map(c => col(s"__rv_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var u = l.unionByName(rFixed)
    rightVals.foreach { c =>
      u = u.withColumn(s"asof_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(w))
    }
    u.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"asof_$c")): _*)
  }
}
