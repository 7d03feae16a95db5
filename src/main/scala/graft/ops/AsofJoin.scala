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

  /** Floor division that is exact for the full long range and floors
    * toward −∞ (a plain `div` truncates toward 0, which mis-buckets
    * negative timestamps). `ts - pmod(ts, w)` is an exact multiple of `w`,
    * and the quotient is taken with Catalyst's `IntegralDivide` (SQL
    * `div`) so the arithmetic never leaves long — Spark's `/` on longs is
    * DOUBLE division, which above 2^53 (e.g. nanosecond epochs) can land
    * one bucket off after the cast.
    */
  private def floorDiv(ts: Column, width: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val shifted = GraftBridge.expression(ts - pmod(ts, lit(width)))
    GraftBridge.column(new IntegralDivide(shifted, Literal(width)))
  }

  /** Skew-safe [[asofJoin]]: identical semantics, but no window keyed on
    * the raw join key. `Window.partitionBy(key)` puts one key's ENTIRE
    * merged history on one task — fine when keys are balanced, a straggler
    * when one key is 10⁹ rows (one hot instrument at 100 TB). This variant
    * range-buckets event time and runs two bounded passes:
    *
    *  1. in-bucket: the same union + ordered-window trick partitioned by
    *     (key, bucket) — partition size is bounded by rows-per-bucket
    *     (tunable via `bucketWidth`), not by per-key history;
    *  2. carry-forward: right rows collapse to ONE summary row per
    *     (key, bucket) (`max(struct(ts, vals…))` — exactly the window's
    *     tie rule: latest ts, then greatest carried values), and the
    *     latest summary at-or-before each left row's PREVIOUS bucket is
    *     attached with the same trick at bucket granularity, where the
    *     per-key partition is bounded by the number of distinct buckets.
    *
    * A same-bucket hit always out-timestamps every earlier-bucket row, so
    * `coalesce(pass1, pass2)` reproduces [[asofJoin]] bit-for-bit
    * (dual-planned in the spec). Use this form when a key's history can
    * exceed one task's comfort; the plain window form is one shuffle
    * cheaper and remains the default for balanced keys.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       rightVals: Seq[String],
                       bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val leftCols = left.columns.toSeq
    // ---- pass 1: union-window within (key, bucket) ----
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__b", floorDiv(col(leftTs), bucketWidth))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__b") :+ col("__tag")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")): _*)
    val rFixed = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__b", floorDiv(col(rightTs), bucketWidth))
      .withColumn("__tag", lit(0))
      .select((leftCols.map { c =>
        if (c == key) col(key).as(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__ts") :+ col("__b") :+ col("__tag")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    val wIn = Window.partitionBy(col(key), col("__b"))
      .orderBy((col("__ts") +: col("__tag") +: rightVals.map(c => col(s"__rv_$c"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var u = l.unionByName(rFixed)
    rightVals.foreach { c =>
      u = u.withColumn(s"__in_$c", last(col(s"__rv_$c"), ignoreNulls = true).over(wIn))
    }
    val inBucket = u.filter(col("__tag") === 1)
    // ---- pass 2: per-(key, bucket) right summary, carried forward ----
    val summaryStruct = struct((col("__ts") +: rightVals.map(c => col(s"__rv_$c"))): _*)
    val summaries = rFixed
      .groupBy(col(key), col("__b"))
      .agg(max(summaryStruct).as("__s"))
      .select(col(key), col("__b").as("__sb"), lit(0).as("__btag"), col("__s"))
    // left rows ask at bucket B−1: same-bucket right rows are pass 1's
    // job, and bucket B's summary may contain rows LATER than the left ts
    val asks = inBucket.select(col(key), col("__b")).distinct()
      .select(col(key), col("__b"), (col("__b") - 1).as("__sb"), lit(1).as("__btag"),
        lit(null).cast(summaries.schema("__s").dataType).as("__s"))
    val wCarry = Window.partitionBy(col(key))
      .orderBy(col("__sb"), col("__btag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = summaries.select(col(key), lit(null).cast("long").as("__b"),
        col("__sb"), col("__btag"), col("__s"))
      .unionByName(asks)
      .withColumn("__fb", last(col("__s"), ignoreNulls = true).over(wCarry))
      .filter(col("__btag") === 1)
      .select(col(key), col("__b"), col("__fb"))
    // ---- stitch: same-bucket hit wins (it always out-timestamps) ----
    inBucket.join(carried, Seq(key, "__b"), "left")
      .select(leftCols.map(col) ++ rightVals.map { c =>
        coalesce(col(s"__in_$c"), col("__fb").getField(s"__rv_$c")).as(s"asof_$c")
      }: _*)
  }

  /** Nearest-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')` — the sensor/feature-alignment variant): for every left
    * row, the right row with the same key whose timestamp is nearest in
    * EITHER direction; equidistant ties go to the earlier (at-or-before)
    * right row. Same union trick and the same single key shuffle as
    * [[asofJoin]], with TWO cumulative windows over one sort: backward
    * `last(ignoreNulls)` gives the at-or-before candidate, forward
    * `first(ignoreNulls)` the strictly-after candidate, and a narrow
    * projection picks by |Δts|. A right row tying the left timestamp
    * sorts first (tag order), so it is the backward candidate with Δ = 0
    * and always wins.
    *
    * Output: left columns + `asof_ts` (the chosen right timestamp, null
    * when the key has no right rows) + `asof_<col>` for each carried
    * value column.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightVals: Seq[String] = Seq.empty): DataFrame = {
    val leftCols = left.columns.toSeq
    val rvStruct = struct((col("__ts").as("__rts") +:
      rightVals.map(c => col(s"__rv_$c"))): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__tag")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")): _*)
    val rFixed = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(0))
      .select((leftCols.map { c =>
        if (c == key) col(key).as(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__ts") :+ col("__tag")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    // deterministic order under right-ts ties: carried values break them,
    // same as asofJoin
    val ord = Window.partitionBy(col(key))
      .orderBy((col("__ts") +: col("__tag") +: rightVals.map(c => col(s"__rv_$c"))): _*)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l.unionByName(rFixed)
      .withColumn("__r", when(col("__tag") === 0, rvStruct))
      .withColumn("__prev", last(col("__r"), ignoreNulls = true).over(wB))
      .withColumn("__next", first(col("__r"), ignoreNulls = true).over(wF))
    val chosen = when(col("__prev").isNull, col("__next"))
      .when(col("__next").isNull, col("__prev"))
      .when(col("__ts") - col("__prev").getField("__rts") <=
        col("__next").getField("__rts") - col("__ts"), col("__prev"))
      .otherwise(col("__next"))
    u.filter(col("__tag") === 1)
      .withColumn("__c", chosen)
      .select(leftCols.map(col) ++ (col("__c").getField("__rts").as("asof_ts") +:
        rightVals.map(c => col("__c").getField(s"__rv_$c").as(s"asof_$c"))): _*)
  }

  /** Skew-safe [[asofJoinNearest]] — the same two-pass range-bucketing as
    * [[asofJoinBucketed]], applied SYMMETRICALLY: pass 1 finds both
    * in-bucket candidates with windows bounded by rows-per-bucket; pass 2
    * carries per-(key, bucket) summaries in BOTH directions — the
    * backward candidate as the latest summary at-or-before bucket B−1
    * (max(struct), carried forward), the forward candidate as the
    * earliest summary at-or-after bucket B+1 (min(struct), carried
    * backward over a descending bucket order). An in-bucket hit always
    * beats the carried one on |Δts| by construction (any same-bucket ts
    * is strictly nearer than any other-bucket ts on its side), so
    * `coalesce(in-bucket, carried)` per side reproduces
    * [[asofJoinNearest]] bit-for-bit (dual-planned in the spec). No
    * window is keyed on the raw join key alone.
    */
  def asofJoinNearestBucketed(left: DataFrame, right: DataFrame, key: String,
                              leftTs: String, rightTs: String,
                              rightVals: Seq[String],
                              bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val leftCols = left.columns.toSeq
    val rvStruct = struct((col("__ts").as("__rts") +:
      rightVals.map(c => col(s"__rv_$c"))): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__b", floorDiv(col(leftTs), bucketWidth))
      .withColumn("__tag", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__b") :+ col("__tag")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")): _*)
    val rFixed = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__b", floorDiv(col(rightTs), bucketWidth))
      .withColumn("__tag", lit(0))
      .select((leftCols.map { c =>
        if (c == key) col(key).as(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__ts") :+ col("__b") :+ col("__tag")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    // ---- pass 1: both in-bucket candidates, windows bounded per bucket ----
    val ordIn = Window.partitionBy(col(key), col("__b"))
      .orderBy((col("__ts") +: col("__tag") +: rightVals.map(c => col(s"__rv_$c"))): _*)
    val inBucket = l.unionByName(rFixed)
      .withColumn("__r", when(col("__tag") === 0, rvStruct))
      .withColumn("__inPrev", last(col("__r"), ignoreNulls = true)
        .over(ordIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__inNext", first(col("__r"), ignoreNulls = true)
        .over(ordIn.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__tag") === 1)
    // ---- pass 2: per-(key, bucket) summaries carried in BOTH directions ----
    val rr = rFixed.withColumn("__r", rvStruct)
    val prevSums = rr.groupBy(col(key), col("__b"))
      .agg(max(col("__r")).as("__s"))
      .select(col(key), col("__b").as("__sb"), lit(0).as("__btag"), col("__s"))
    val nextSums = rr.groupBy(col(key), col("__b"))
      .agg(min(col("__r")).as("__s"))
      .select(col(key), col("__b").as("__sb"), lit(0).as("__btag"), col("__s"))
    val askBuckets = inBucket.select(col(key), col("__b")).distinct()
    val sType = prevSums.schema("__s").dataType
    def carried(sums: DataFrame, askAt: Column, descending: Boolean): DataFrame = {
      val asks = askBuckets.select(col(key), col("__b"), askAt.as("__sb"),
        lit(1).as("__btag"), lit(null).cast(sType).as("__s"))
      val w = Window.partitionBy(col(key))
        .orderBy(if (descending) col("__sb").desc else col("__sb").asc, col("__btag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sums.select(col(key), lit(null).cast("long").as("__b"), col("__sb"),
          col("__btag"), col("__s"))
        .unionByName(asks)
        .withColumn("__fb", last(col("__s"), ignoreNulls = true).over(w))
        .filter(col("__btag") === 1)
        .select(col(key), col("__b"), col("__fb"))
    }
    val carrPrev = carried(prevSums, col("__b") - 1, descending = false)
      .withColumnRenamed("__fb", "__cPrev")
    val carrNext = carried(nextSums, col("__b") + 1, descending = true)
      .withColumnRenamed("__fb", "__cNext")
    // ---- stitch: in-bucket hit wins its side; then pick by |Δts| ----
    val prevC = coalesce(col("__inPrev"), col("__cPrev"))
    val nextC = coalesce(col("__inNext"), col("__cNext"))
    val chosen = when(prevC.isNull, nextC)
      .when(nextC.isNull, prevC)
      .when(col("__ts") - prevC.getField("__rts") <=
        nextC.getField("__rts") - col("__ts"), prevC)
      .otherwise(nextC)
    inBucket.join(carrPrev, Seq(key, "__b"), "left")
      .join(carrNext, Seq(key, "__b"), "left")
      .withColumn("__c", chosen)
      .select(leftCols.map(col) ++ (col("__c").getField("__rts").as("asof_ts") +:
        rightVals.map(c => col("__c").getField(s"__rv_$c").as(s"asof_$c"))): _*)
  }
}
