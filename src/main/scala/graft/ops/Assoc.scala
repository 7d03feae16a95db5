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

  /** Per-basket distinct item sets — the shared root of every
    * expansion here (r18 opt): ONE exchange (the per-basket set
    * aggregation) replaces the old distinct-then-self-join chain
    * (distinct exchange + a join shuffle per expansion arm), and the
    * pair/triple explosions run as Generate nodes over in-memory
    * arrays, quadratic/cubic in BASKET size only — the same measured
    * rewrite as [[Graph.coOccurrenceEdges]]. collect_set dedups
    * exactly as the old per-side distinct did; downstream counts are
    * over the identical incidence sets, so every statistic is
    * unchanged. Checkpointed: pair and triple arms plus the item/basket
    * counts all consume it.
    */
  // r19 (opt): pin the basket aggregation's exchange to an input-size-
  // derived width (the Graph.coOccurrenceEdges rationale — the stage is
  // CPU-dense per byte and AQE serialized it to 1-2 tasks at local[32]);
  // the checkpoint then carries that width into every expansion arm.
  // r19 (ADVICE): null basket keys are dropped before grouping — the
  // pre-r18 self-join never matched them (null ≠ null in a join);
  // groupBy would have co-grouped them. Unreachable on TPC-H.
  private def basketSets(items: DataFrame, basketCol: String,
                         itemCol: String): DataFrame =
    items.select(col(basketCol).as("ok"), col(itemCol).as("it"))
      .filter(col("ok").isNotNull)
      .repartition(Dedup.sizedWidth(items, 2L << 20), col("ok"))
      .groupBy(col("ok")).agg(collect_set(col("it")).as("its"))
      .localCheckpoint(true)

  /** Unordered within-basket pair counts (u < v, c_pair) from the
    * basket sets. */
  private def pairCountsFrom(baskets: DataFrame): DataFrame =
    baskets.select(explode(col("its")).as("u"), col("its"))
      .select(col("u"), explode(col("its")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c_pair"))

  /** Within-basket pair support counts for callers that only need the
    * co-occurrence graph (q_triangles / q_communities sparsifier),
    * counted at the INCIDENCE level: a basket holding item u twice and
    * v once contributes 2 to (u, v) — the multiset semantics of the
    * original instance-pair self-join (collect_list, not collect_set).
    * Returns (u, v, c_pair), u < v.
    *
    * PRECONDITION (r19, ADVICE): basket sizes must be bounded (TPC-H
    * orders hold ≤ 7 lineitems). The array formulation materializes one
    * basket's items in a single aggregation buffer row — a degenerate
    * giant basket lands on one task's memory where the old quadratic
    * join streamed; cap basket size upstream (the df-cap pattern)
    * before calling on skewed non-TPC-H inputs. Applies to pairRules /
    * tripleRules too (see tripleRules' scale-shape note).
    */
  def incidencePairCounts(items: DataFrame, basketCol: String,
                          itemCol: String): DataFrame =
    // width pin + null-key filter: see basketSets
    pairCountsFrom(
      items.select(col(basketCol).as("ok"), col(itemCol).as("it"))
        .filter(col("ok").isNotNull)
        .repartition(Dedup.sizedWidth(items, 2L << 20), col("ok"))
        .groupBy(col("ok")).agg(collect_list(col("it")).as("its")))

  /** Pair rules from `items` (one row per basket-item incidence;
    * duplicates are collapsed). Returns one row per unordered pair
    * (u < v) with c_pair ≥ minPairCount:
    * (u, v, c_pair, c_u, c_v, conf_uv, conf_vu, lift) where
    * conf_uv = P(v | u), lift = P(u,v) / (P(u)·P(v)).
    */
  def pairRules(items: DataFrame, basketCol: String, itemCol: String,
                minPairCount: Long = 2L): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val baskets = basketSets(items, basketCol, itemCol)
    // total basket count enters lift as a plan literal (one scalar);
    // the count is a cached-frame probe, not a second distinct pass
    val n = baskets.count()
    val cItem = baskets.select(explode(col("its")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("c"))
    val pairs = pairCountsFrom(baskets)
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

  /** Size-3 itemset rules — the next Apriori level: one row per ordered
    * triple (u < v < w) with c_triple ≥ minTripleCount, each pair
    * subset's count, and the three pair→third confidences
    * P(w | {u,v}), P(v | {u,w}), P(u | {v,w}) — the "customers who
    * bought these two also bought" statistic.
    *
    * Scale shape: the triple expansion is CUBIC IN BASKET SIZE, never
    * in corpus size — both joins key on the basket id, so a basket of b
    * items contributes C(b,3) rows and the corpus cost is Σ C(b,3)
    * (TPC-H-style baskets hold ≤ 7 items; a degenerate giant basket
    * would need a basket-size cap upstream, the df-cap pattern). The
    * support floor prunes before the three pair-stat joins. The pair
    * table those joins consume is recomputed here, UNFLOORED and
    * inline (not reused from [[pairRules]]): inner joins only need a
    * superset of the surviving triples' pairs, and by downward closure
    * every such pair clears any floor a frequent triple clears — the
    * recompute trades a second pass over `inc` for not threading
    * [[pairRules]]'s aggregation through this call. Confidences are
    * one double division of exact counts — identical bits on any IEEE
    * engine.
    */
  def tripleRules(items: DataFrame, basketCol: String, itemCol: String,
                  minTripleCount: Long = 2L): DataFrame = {
    require(minTripleCount >= 1,
      s"minTripleCount must be >= 1, got $minTripleCount")
    val baskets = basketSets(items, basketCol, itemCol)
    val triples = baskets.select(explode(col("its")).as("u"), col("its"))
      .select(col("u"), explode(col("its")).as("v"), col("its"))
      .filter(col("u") < col("v"))
      .select(col("u"), col("v"), explode(col("its")).as("w"))
      .filter(col("v") < col("w"))
      .groupBy(col("u"), col("v"), col("w"))
      .agg(count(lit(1)).as("c_triple"))
      .filter(col("c_triple") >= minTripleCount)
    val pairs = pairCountsFrom(baskets)
      .localCheckpoint(true) // three consumers below
    triples
      .join(pairs.select(col("u"), col("v"), col("c_pair").as("c_uv")),
        Seq("u", "v"))
      .join(pairs.select(col("u"), col("v").as("w"), col("c_pair").as("c_uw")),
        Seq("u", "w"))
      .join(pairs.select(col("u").as("v"), col("v").as("w"), col("c_pair").as("c_vw")),
        Seq("v", "w"))
      .select(col("u"), col("v"), col("w"), col("c_triple"),
        col("c_uv"), col("c_uw"), col("c_vw"),
        (col("c_triple").cast(DoubleType) / col("c_uv").cast(DoubleType))
          .as("conf_uv_w"),
        (col("c_triple").cast(DoubleType) / col("c_uw").cast(DoubleType))
          .as("conf_uw_v"),
        (col("c_triple").cast(DoubleType) / col("c_vw").cast(DoubleType))
          .as("conf_vw_u"))
  }
}
