package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Most-frequent word n-gram of a token array: `struct<gram, cnt>` with a
  * deterministic tie order (count DESC, gram ASC), null when the doc has
  * fewer than `n` tokens.
  *
  * Backs the Gopher repetition filters (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1: fraction of characters in the
  * most frequent n-gram) — a per-document metric, so it must be a NARROW
  * pass: one hash map over the row's own tokens, no explode, no
  * (doc, gram) shuffle. At 100 TB this keeps the quality-signal stage
  * scan-bound, like the SimHash/MinHash kernels it sits beside.
  */
case class TopNgram(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return null
    val toks = new Array[String](len)
    var i = 0
    while (i < len) {
      val e = arr.getUTF8String(i)
      toks(i) = if (e == null) "" else e.toString
      i += 1
    }
    val counts = new java.util.HashMap[String, Int]()
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i + n <= len) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val g = sb.toString
      counts.merge(g, 1, Integer.sum _)
      i += 1
    }
    var bestG: String = null
    var bestC = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > bestC || (e.getValue == bestC && e.getKey.compareTo(bestG) < 0)) {
        bestG = e.getKey; bestC = e.getValue
      }
    }
    InternalRow(UTF8String.fromString(bestG), bestC)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
