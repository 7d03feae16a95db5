package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Project an `array<float>` vector onto a trained PCA basis:
  * `out(i) = Σⱼ components(i)(j) · (v(j) − mean(j))`, emitted as
  * `array<float>` so the projected space rides every existing kNN kernel
  * (GEMM blocks, codegen L2, top-k aggregate) unchanged.
  *
  * Like [[NearestCentroids]] / [[PqEncode]], the trained parameters (mean
  * + dOut×d component matrix — a few KB) ride inside the expression: the
  * dimensionality reduction is a narrow per-row projection with no join
  * and no shuffle, and the projected corpus scans dOut/d of the raw bytes
  * — the same scan-reduction lever as PQ, but exact-arithmetic and
  * rotation-only (FAISS's PCAMatrix / VectorTransform family:
  * faiss/VectorTransform.h — the pre-transform step its index factory
  * composes in front of any index).
  *
  * fp64 accumulation throughout; the fp32 cast happens once on output,
  * matching the storage convention of every other vector expression.
  */
case class PcaProject(
    child: Expression,
    mean: Array[Double],
    components: Array[Array[Double]])
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(components.nonEmpty, "PCA projection needs at least one component")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = math.min(v.numElements(), mean.length)
    val centered = new Array[Double](mean.length)
    var j = 0
    while (j < d) { centered(j) = v.getFloat(j).toDouble - mean(j); j += 1 }
    val out = new Array[Any](components.length)
    var i = 0
    while (i < components.length) {
      val row = components(i)
      val n = math.min(row.length, centered.length)
      var acc = 0.0
      var t = 0
      while (t < n) { acc += row(t) * centered(t); t += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
