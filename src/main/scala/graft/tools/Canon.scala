package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** The driver gate's result canonicalization, reproduced in-process
  * (r14 verdict ask #4): columns sorted BY NAME, every value rendered
  * to a string (doubles: NaN literal, else 9-dp half-even rounding of
  * the exact binary value then shortest round-trip representation —
  * `tools/check.py`'s `repr(round(v, 9))` contract; signed zero is
  * PRESERVED, which is why `+ 0.0` normalization belongs in the
  * queries, not here), rows sorted lexicographically, the whole
  * stream MD5'd. A query whose canonical hash is pinned in
  * `src/test/resources` fails `sbt test` the moment ANY refactor
  * perturbs its output — catching silently-changed results before the
  * driver's cross-engine gate does.
  *
  * This mirrors the gate's SHAPE (sort-by-name + value rendering +
  * row sort); cross-ENGINE agreement (Spark vs DuckDB rendering of
  * the same value) is still `tools/check.py`'s job — this class pins
  * Spark-vs-Spark stability across refactors and partitioning
  * (generated at local[32]/32 partitions, asserted at local[4]/4:
  * a hash that differs between the two configs is a real
  * partitioning-dependence bug).
  */
object Canon {

  def render(v: Any): String = v match {
    case null => "None"
    case d: java.lang.Double => renderDouble(d.doubleValue)
    case f: java.lang.Float => renderDouble(f.doubleValue)
    case bd: java.math.BigDecimal => bd.toPlainString
    case s: String => s
    case b: Array[Byte] => b.map(x => f"${x & 0xff}%02x").mkString
    case seq: scala.collection.Seq[_] => seq.map(render).mkString("[", ", ", "]")
    case arr: Array[_] => arr.map(render).mkString("[", ", ", "]")
    case r: Row => r.toSeq.map(render).mkString("(", ", ", ")")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, x) => render(k) + ": " + render(x) }
        .sorted.mkString("{", ", ", "}")
    case other => other.toString
  }

  def renderDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) { if (d > 0) "inf" else "-inf" }
    else {
      // exact binary value → decimal 9-dp half-even (Python round()),
      // back to the nearest double (Python round returns a float),
      // then Java 17+ shortest-unique rendering (repr's contract)
      val r = new java.math.BigDecimal(d)
        .setScale(9, java.math.RoundingMode.HALF_EVEN).doubleValue()
      java.lang.Double.toString(r)
    }

  /** Canonical "schema|md5" of a result: schema part is the sorted
    * column names (a renamed column must fail the pin even if values
    * happen to collide), hash part covers all rendered rows in sorted
    * order.
    */
  def hash(df: DataFrame): String = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect()
    val rendered = rows.map { r =>
      (0 until r.length).map(i => render(r.get(i))).mkString("")
    }.sorted
    val md = MessageDigest.getInstance("MD5")
    rendered.foreach { s =>
      md.update(s.getBytes("UTF-8")); md.update(10.toByte)
    }
    cols.mkString(",") + "|" + md.digest().map(b => f"${b & 0xff}%02x").mkString
  }
}
