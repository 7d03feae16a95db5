package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(key)` as a scalar predicate, with the serialized
  * filter riding INSIDE the expression (broadcast with the plan, like
  * PqEncode's codebook / BpeEncode's merge table). Backs
  * [[graft.ops.BloomJoin]]: the point is to evaluate the membership test
  * in the PROBE side's scan stage — before any shuffle — so the filter,
  * not the join, discards the non-matching bulk of a 100 TB fact table.
  *
  * Accepts long or string keys (the two join-key shapes in the corpus;
  * `BloomFilter.put` hashes both natively). False positives only —
  * rows that slip through are dropped by the exact join that follows,
  * so composition with a join is row-identical to the unpruned join.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom key must be long/int/string, got $other")
    }

  // deserialized once per executor instance, shared across rows
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => filter.mightContainLong(l)
    case i: java.lang.Integer => filter.mightContainLong(i.longValue())
    case s: UTF8String        => filter.mightContainString(s.toString)
    case other => throw new IllegalStateException(s"unexpected bloom key: $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
