package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for heavy-hitter keys.
  *
  * Salted two-stage aggregation: stage 1 groups on (key, salt) so a hot
  * key's rows spread over `buckets` reducers; stage 2 combines the
  * per-salt partials. Correct for any decomposable aggregate; exposed here
  * for sum/count (exact for decimal/integer sums — the combine is
  * order-independent).
  *
  * (Spark's AQE skew-join handling covers joins; this is the analog for
  * aggregations whose partial-agg state is large or whose input is so hot
  * that even map-side combine leaves reducer skew.)
  */
object Skew {

  /** `df.groupBy(keys).agg(sum(value), count(*))`, executed salted.
    * @return (keys..., sum_<value>, n_rows)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     valueName: String, buckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pn"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueName"), sum(col("__pn")).as("n_rows"))
  }

  /** Skew-safe equi join: the fact side gets a random-ish salt in
    * [0, buckets), the dim side is replicated `buckets`× with every salt
    * value, and the join key becomes (key, salt) — a hot fact key's rows
    * land on `buckets` reducers instead of one. Exact same rows as the
    * plain join (each fact row matches exactly the replica carrying its
    * salt). Use when the dim side is too big to broadcast AND AQE's
    * skew-join split can't kick in (e.g. the skew is in a grouping that
    * follows).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
