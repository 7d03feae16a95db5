package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Association-rule mining over basket data (Agrawal & Srikant 1994,
  * restricted to size-2 itemsets — the pair level that dominates
  * practical use): for co-occurring item pairs report support,
  * directional confidence, and lift. In a corpus pipeline the same
  * statistics rank tag/domain co-occurrence and n-gram collocations.
  *
  * Scale shape: one distinct pass over (basket, item), one self-join on
  * the basket key (bounded fan-out per basket — pair explosion is
  * quadratic in BASKET SIZE, not corpus size), two combiner-friendly
  * aggregations, and a broadcast-sized join against the per-item counts.
  * A support floor (`minPairCount`) prunes the pair table before the
  * stats join — the Apriori downward-closure step.
  */
object Assoc {

  /** Pair rules from `items` (one row per basket-item incidence;
    * duplicates are collapsed). Returns one row per unordered pair
    * (u < v) with c_pair ≥ minPairCount:
    * (u, v, c_pair, c_u, c_v, conf_uv, conf_vu, lift) where
    * conf_uv = P(v | u), lift = P(u,v) / (P(u)·P(v)).
    */
  def pairRules(items: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val inc = items.select(col(basketCol).as("ok"), col(itemCol).as("it"))
      .distinct().localCheckpoint(true)
    // total basket count enters lift as a plan literal (one scalar)
    val n = inc.select(col("ok")).distinct().count()
    val cItem = inc.groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = inc.select(col("ok"), col("it").as("u"))
      .join(inc.select(col("ok"), col("it").as("v")), Seq("ok"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairCount)
    pairs
      .join(cItem.select(col("it").as("u"), col("c").as("c_u")), "u")
      .join(cItem.select(col("it").as("v"), col("c").as("c_v")), "v")
      .select(col("u"), col("v"), col("c_pair"), col("c_u"), col("c_v"),
        (col("c_pair").cast(DoubleType) / col("c_u").cast(DoubleType))
          .as("conf_uv"),
        (col("c_pair").cast(DoubleType) / col("c_v").cast(DoubleType))
          .as("conf_vu"),
        ((col("c_pair") * lit(n)).cast(DoubleType) /
          (col("c_u") * col("c_v")).cast(DoubleType)).as("lift"))
  }
}
