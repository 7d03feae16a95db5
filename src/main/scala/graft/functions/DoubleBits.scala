package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Order-preserving IEEE-754 double ↔ sortable-Long bijection — the
  * bridge that lets [[graft.ops.Scan.exactQuantilesByGroup]]'s
  * bounded-memory histogram refinement (LongType arithmetic) select
  * EXACT order statistics over a DoubleType column: the Long ordering
  * of `toSortable(v)` equals the numeric ordering of the doubles
  * (−0.0 < +0.0; NaN maps above +Inf, deterministic — callers should
  * filter NaN when oracle-comparing, engines disagree on NaN rank).
  *
  * The transform is the classic sign-aware bit flip (as used in
  * Lucene's NumericUtils and every LSM key encoder): keep the sign
  * bit, XOR the magnitude bits for negatives so more-negative sorts
  * lower. It is self-inverse on the sign-preserved form used here.
  */
object DoubleBits {
  def toSortable(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    bits ^ ((bits >> 63) & Long.MaxValue)
  }
  def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
}

/** `double → sortable long` as a codegen'd scalar so the mapping pass
  * stays inside whole-stage codegen on the scan side of the quantile
  * refinement (the inverse runs driver-side on groups×qs rows only).
  */
case class DoubleSortableBits(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    DoubleBits.toSortable(a.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleBits.toSortable($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
