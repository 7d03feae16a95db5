package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Unordered-pair generator over an `array<struct<id: bigint, h: bigint>>`
  * bucket column: one output row `(doc_a, ha, doc_b, hb)` per i < j
  * element pair, in array order.
  *
  * LSH bucket→pairs expansion is inherently quadratic in bucket size when
  * the corpus contains large near-duplicate groups; what is NOT inherent is
  * paying Spark's interpreted higher-order-function path per element. The
  * `flatten(transform(..., transform(slice(...))))` composition builds a
  * lambda-evaluated struct per pair (measured ~6× slower on
  * template-heavy corpora); this generator is one compiled loop.
  */
case class StructPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"StructPairs needs array<struct<bigint,bigint>>, got ${other.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("ha", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("hb", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val ids = new Array[Long](n)
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements carry no pairable identity
        val st = arr.getStruct(i, 2)
        ids(m) = st.getLong(0)
        hs(m) = st.getLong(1)
        m += 1
      }
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](m * (m - 1) / 2)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out += new GenericInternalRow(
          Array[Any](ids(i), hs(i), ids(j), hs(j)))
        j += 1
      }
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
