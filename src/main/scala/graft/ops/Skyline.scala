package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the multi-criteria "best tradeoffs"
  * operator (Börzsönyi et al. 2001, "The Skyline Operator", ICDE): a
  * point is IN the skyline iff no other point is ≤ in both dimensions
  * and < in at least one (minimization on both axes).
  *
  * The textbook SQL is a quadratic `NOT EXISTS` anti-join — unusable at
  * scale. The 2-D case admits an O(n log n) sort-scan instead: over the
  * DISTINCT point set sorted by (x asc, y asc), a point is dominated iff
  * some earlier point has strictly smaller y. Proof sketch: an earlier
  * point has x' < x, or x' = x with y' < y; `y' < y` makes it a
  * dominator in either case (strict in y, or strict in x with y' ≤ y
  * via y' < y), and `y' = y` forces x' < x, again a dominator — so
  * "min y over strict predecessors < ... or = ..." collapses to keeping
  * exactly the rows where `y < min(y) over preceding` (or no
  * predecessor). Distinctness removes the only equality edge case
  * (a point never dominates its duplicate — equal in both dims).
  *
  * The scan is ONE global sort + a running min — the same cost class as
  * any ORDER BY of the point set, and the point set (distinct (x, y)) is
  * usually orders of magnitude smaller than the input after the
  * aggregate that produces it. For genuinely huge distinct-point sets
  * the running min decomposes by range partition exactly like
  * [[Scan.groupedRunningAgg]]; at the per-part / per-host cardinalities
  * a curation pipeline skylines, the single-task window over the
  * distinct points is the right plan.
  */
object Skyline {

  /** Skyline points of the distinct (x, y) set, minimizing both. */
  def skyline2d(points: DataFrame, xCol: String, yCol: String): DataFrame = {
    val p = points.select(col(xCol).as("x"), col(yCol).as("y")).distinct()
    val w = Window.orderBy(col("x"), col("y"))
      .rowsBetween(Window.unboundedPreceding, -1)
    p.withColumn("__my", min(col("y")).over(w))
      .filter(col("__my").isNull || col("y") < col("__my"))
      .select(col("x"), col("y"))
  }

  /** The identical sort-scan as engine-portable SQL over a point source
    * `(x, y)` — shared formulation so the oracle cannot drift.
    */
  def skyline2dSql(pointsSql: String): String =
    s"""WITH p AS (SELECT DISTINCT x, y FROM ($pointsSql)),
       |m AS (SELECT x, y, MIN(y) OVER (ORDER BY x, y
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS my
       |      FROM p)
       |SELECT x, y FROM m WHERE my IS NULL OR y < my""".stripMargin
}
