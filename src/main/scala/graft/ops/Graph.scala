package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed graph analytics for corpus curation.
  *
  * Web-scale pretraining pipelines weight and filter documents by graph
  * signals — PageRank over the link graph is the canonical page-quality
  * prior (Page et al. 1999, "The PageRank Citation Ranking"; CommonCrawl
  * curation pipelines rank hosts the same way). The operators here are
  * the Spark-native forms of those computations: edges stay distributed,
  * the rank vector (|V| rows, orders of magnitude smaller than |E|) is
  * broadcast into each iteration's join so the only shuffle per iteration
  * is the contribution aggregation on `dst`.
  *
  * Exactness contract: an iterative double-precision computation is only
  * oracle-able if the floating-point reduction order cannot influence the
  * result. Each iteration therefore quantizes per-edge contributions to
  * `DECIMAL(28,14)` and sums them EXACTLY in decimal (associative), then
  * applies the damping update with two scalar IEEE ops. Both engines
  * perform the identical sequence, so ranks agree bit-for-bit at every
  * iteration — the `simhashBitSql` / `zorderSqlExpr` shared-arithmetic
  * pattern extended to fixpoint iteration ([[pageRankSql]] generates the
  * unrolled oracle from the same constants).
  *
  * Reference: faiss-metal has no graph surface; this extends the engine
  * along the LLM-pipeline axis (corpus quality priors), reusing its
  * broadcast-small-side and decimal-exact-aggregate idioms.
  */
object Graph {

  /** Co-occurrence edge list: directed edges `(src, dst)` between items
    * sharing a basket, both directions, deduplicated. Self-join on the
    * basket key — bounded fanout per basket (a TPC-H order holds ≤ 7
    * lineitems), so the pair explosion is a small constant per basket
    * and never quadratic in |items|.
    */
  def coOccurrenceEdges(items: DataFrame, basketCol: String,
                        itemCol: String): DataFrame = {
    val a = items.select(col(basketCol).as("__b"), col(itemCol).as("src")).distinct()
    val b = items.select(col(basketCol).as("__b"), col(itemCol).as("dst")).distinct()
    a.join(b, Seq("__b"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
      .distinct()
  }

  /** Fixed-iteration damped PageRank on `edges` over node set `nodes`
    * (one column `id`). Unnormalized classic form (init rank 1.0):
    *
    *   r'(v) = (1 - d) + d * Σ_{u→v} q(r(u) / odeg(u))
    *
    * where `q` quantizes to DECIMAL(28,14) so the sum is exact decimal
    * arithmetic — reduction-order-independent, hence oracle-able.
    * Isolated nodes (no in-edges) settle at `1 - d`.
    *
    * Scale shape: `edges` + out-degrees are localCheckpointed once and
    * reused by every iteration; the rank vector is |V| rows and is
    * broadcast into the edge join (map-side, no shuffle on |E|), leaving
    * ONE shuffle per iteration — the `groupBy(dst)` partial-aggregated
    * contribution sum. At 100 TB of edges the per-iteration cost is a
    * single combiner-friendly aggregation; the rank vector for even a
    * billion-node graph stays a few GB and can fall back to a shuffle
    * join (`broadcastRanks = false`) without changing results.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               damping: Double = 0.85,
               broadcastRanks: Boolean = true): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1, 50], got $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("odeg")).localCheckpoint(true)
    val n = nodes.select(col("id")).distinct().localCheckpoint(true)

    var ranks = n.withColumn("r", lit(1.0))
    for (_ <- 1 to iters) {
      val rSide = if (broadcastRanks) broadcast(ranks) else ranks
      val contrib = e.join(rSide, e("src") === rSide("id"))
        .join(broadcast(deg), Seq("src"))
        .select(col("dst").as("id"),
          (col("r") / col("odeg")).cast(DecimalType(28, 14)).as("c"))
      val sums = contrib.groupBy("id").agg(sum(col("c")).as("s"))
      ranks = n.join(sums, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("s"), lit(0).cast(DecimalType(28, 14)))
              .cast(DoubleType)).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** The identical computation as engine-portable SQL — unrolled CTE per
    * iteration, generated from the same constants so the oracle cannot
    * drift from the operator. `edgesSql` must yield columns (src, dst),
    * `nodesSql` a column (id).
    */
  def pageRankSql(nodesSql: String, edgesSql: String, iters: Int,
                  damping: Double = 0.85): String = {
    require(iters >= 1 && iters <= 50)
    val base = 1.0 - damping
    val sb = new StringBuilder
    sb.append(s"WITH e AS ($edgesSql),\n")
    sb.append(s"n AS ($nodesSql),\n")
    sb.append("deg AS (SELECT src, COUNT(*) AS odeg FROM e GROUP BY src),\n")
    sb.append("r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS r FROM n)")
    for (i <- 1 to iters) {
      sb.append(s""",
s$i AS (SELECT e.dst AS id, SUM(CAST(r.r / deg.odeg AS DECIMAL(28,14))) AS s
        FROM e JOIN r${i - 1} r ON e.src = r.id JOIN deg ON deg.src = e.src
        GROUP BY e.dst),
r$i AS (SELECT n.id,
          CAST($base AS DOUBLE) + CAST($damping AS DOUBLE) *
            CAST(COALESCE(s$i.s, CAST(0 AS DECIMAL(28,14))) AS DOUBLE) AS r
        FROM n LEFT JOIN s$i ON n.id = s$i.id)""")
    }
    sb.append(s"\nSELECT id, r FROM r$iters")
    sb.toString
  }
}
