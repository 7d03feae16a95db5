package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles from a token array, as one compiled pass —
  * distinct (set semantics, the dedup default) or positional (every
  * occurrence in order, for span-level duplicate profiling).
  *
  * The composable formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))` — runs
  * through Spark's interpreted higher-order-function path and measures
  * ~10× slower (each element pays interpreted `element_at` + `concat_ws`
  * dispatch); shingling is the innermost loop of every dedup operator, so
  * it gets a dedicated expression. Distinct output order is
  * first-occurrence, same as `array_distinct`; docs with fewer than n
  * tokens yield an empty array (DuckDB `range(1, len-1)` semantics).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val count = nt - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    if (!distinct) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        var j = 0
        while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, parts: _*)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
