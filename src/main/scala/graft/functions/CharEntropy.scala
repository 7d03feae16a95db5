package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (nats) of a document's code-point distribution —
  * the gibberish / encoded-blob quality filter: natural text sits in a
  * narrow entropy band, base64/hex blobs and binary spills run high,
  * repeated-character padding runs low. One narrow compiled pass per row
  * (a per-doc histogram in a hash map — no (doc, char) shuffle ever
  * exists), the same no-shuffle argument as [[TopNgram]].
  *
  * Counts Unicode CODE POINTS (matching DuckDB `string_split(text, '')`
  * so the oracle reproduces values exactly on any BMP+ text). Empty
  * input yields null (no distribution to measure).
  */
case class CharEntropy(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
