package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity (Winkler 1990, "String Comparator
  * Metrics and Enhanced Decision Rules in the Fellegi-Sunter Model of
  * Record Linkage") — the record-linkage standard for short name-like
  * strings: Jaro similarity (windowed character matches + transposition
  * penalty) boosted by up to 4 characters of common prefix when the base
  * similarity exceeds 0.7.
  *
  * Pinned to the semantics DuckDB's `jaro_winkler_similarity` exposes so
  * the oracle comparison is exact (verified on 3000 random string pairs
  * to 1e-12): either input empty → 0.0 (INCLUDING both empty — not the
  * textbook 1.0), match window floor(max(|a|,|b|)/2)−1 clamped at 0,
  * prefix scale 0.1, boost threshold strictly > 0.7. Operates on UTF-16
  * chars (identical to byte/codepoint semantics on the ASCII data it is
  * used with).
  *
  * One narrow per-pair pass over blocked candidates — the scoring stage
  * of a blocking join, never run all-pairs.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      val lo = math.max(0, i - win); val hi = math.min(l2, i + win + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) { m1(i) = true; m2(j) = true; m += 1; found = true }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      j = j + 0.1 * l * (1.0 - j)
    }
    j
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
