package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels: the 100 TB memory-compression ANN path.
  *
  * PQ splits each d-dim vector into `m` subspaces of d/m dims, assigns
  * each subvector to its nearest sub-centroid, and stores only the `m`
  * centroid indices — for d=64 fp32 and m=8 one-byte codes, a 32×
  * compression of the scanned bytes. Search uses ADC (asymmetric distance
  * computation): the query stays full-precision and its distance to a
  * stored vector is the sum of exact query-to-assigned-sub-centroid
  * distances — Σⱼ ‖qⱼ − cent[codeⱼ]ⱼ‖². Jégou et al., "Product
  * quantization for nearest neighbor search", TPAMI 2011 (public method).
  *
  * Both kernels embed the (small, trained) codebook in the expression —
  * encode and score are narrow per-row projections, no join against a
  * centroid table, same design as [[NearestCentroids]]. CodegenFallback:
  * one interpreted call per ROW that loops m·ncent·(d/m) elements —
  * the per-element work is compiled JVM arithmetic, not per-element
  * expression dispatch.
  */

/** vec → array<int> of `m` sub-centroid indices (positions in `centroids`,
  * which must share the vector's dimension). Argmin per subspace under the
  * (sub-L2, index) total order — deterministic on ties.
  */
case class PqEncode(
    child: Expression,
    centroids: Seq[Array[Float]],
    m: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1, s"m must be >= 1, got $m")
  require(centroids.nonEmpty, "PQ codebook must be non-empty")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val cents = centroids.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = v.numElements()
    require(d % m == 0, s"vector dim $d not divisible into $m subspaces")
    val ds = d / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * ds
      var best = 0.0
      var bestI = -1
      var ci = 0
      while (ci < cents.length) {
        val cv = cents(ci)
        var acc = 0.0
        var t = 0
        while (t < ds) {
          val dd = v.getFloat(off + t).toDouble - cv(off + t).toDouble
          acc += dd * dd
          t += 1
        }
        if (bestI < 0 || acc < best) { best = acc; bestI = ci }
        ci += 1
      }
      codes(j) = bestI
      j += 1
    }
    new GenericArrayData(codes.map(c => c: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (codes array<int>, query array<float>) → ADC distance (double):
  * Σⱼ ‖qⱼ − cent[codeⱼ]ⱼ‖², accumulated subspace-major in fp64 — equal by
  * construction to ‖q − reconstruct(codes)‖² computed over the PQ
  * reconstruction (spec-pinned).
  */
case class PqAdcScore(
    left: Expression,
    right: Expression,
    centroids: Seq[Array[Float]],
    m: Int)
  extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(m >= 1, s"m must be >= 1, got $m")
  require(centroids.nonEmpty, "PQ codebook must be non-empty")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  @transient private lazy val cents = centroids.toArray

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val q = r.asInstanceOf[ArrayData]
    val d = q.numElements()
    require(codes.numElements() == m, s"expected $m codes, got ${codes.numElements()}")
    require(d % m == 0, s"query dim $d not divisible into $m subspaces")
    val ds = d / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val cv = cents(codes.getInt(j))
      val off = j * ds
      var t = 0
      while (t < ds) {
        val dd = q.getFloat(off + t).toDouble - cv(off + t).toDouble
        acc += dd * dd
        t += 1
      }
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
