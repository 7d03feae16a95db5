package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.operators.TopKBuffer

/** The `nProbe` nearest centroid ids for a vector, best-first, under the
  * (squared-L2, cid) total order.
  *
  * The centroid table is embedded in the expression (it is by definition
  * the small side — the output of a batch "train" step), which turns IVF
  * cluster assignment and probe-list computation into a narrow per-row
  * projection instead of a cross-join + aggregate: no join rows, no
  * shuffle, one compiled loop per vector.
  */
case class NearestCentroids(
    child: Expression,
    centroids: Seq[(Long, Array[Float])],
    nProbe: Int)
  extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val cents = centroids.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val buf = new TopKBuffer(nProbe, ascending = true)
    var ci = 0
    while (ci < cents.length) {
      val cv = cents(ci)._2
      val n = math.min(vn, cv.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = v.getFloat(j).toDouble - cv(j).toDouble
        acc += d * d
        j += 1
      }
      buf.insert(acc, cents(ci)._1)
      ci += 1
    }
    val order = buf.sortedIndices
    new GenericArrayData(order.map(i => buf.labels(i): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (vec array<float>, cid long) → vec − centroid(cid), the per-row residual
  * used by residual-encoded IVFPQ (FAISS IVFPQ semantics: PQ codes the
  * residual to the coarse centroid, not the raw vector — residual energy is
  * far smaller, so the same codebook budget quantizes finer). The centroid
  * table rides inside the expression like [[NearestCentroids]]: a narrow
  * projection, no join. Unknown cid throws — a wiring bug, not data.
  */
case class CentroidResidual(
    left: Expression,
    right: Expression,
    centroids: Seq[(Long, Array[Float])])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes with CodegenFallback {

  require(centroids.nonEmpty, "centroid table must be non-empty")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), LongType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val byId: Map[Long, Array[Float]] = centroids.toMap

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cid = r.asInstanceOf[Long]
    val c = byId.getOrElse(cid,
      throw new IllegalArgumentException(s"unknown centroid id $cid"))
    val n = v.numElements()
    val out = new Array[Float](n)
    var j = 0
    while (j < n) {
      out(j) = v.getFloat(j) - (if (j < c.length) c(j) else 0f)
      j += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
