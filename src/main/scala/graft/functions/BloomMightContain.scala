package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContain(key)` as a scalar predicate, with the serialized
  * filter riding a TORRENT BROADCAST — the expression carries only the
  * broadcast handle, so the task binary stays small and each executor
  * fetches the filter bytes once (r15: the bytes previously rode inside
  * the expression like PqEncode's codebook, which bloats EVERY task
  * binary by the filter size — a 23 MB filter for 2e7 keys shipped per
  * task approaches RPC limits long before the key-count cap fires).
  * Backs [[graft.ops.BloomJoin]]: the point is to evaluate the
  * membership test in the PROBE side's scan stage — before any shuffle
  * — so the filter, not the join, discards the non-matching bulk of a
  * 100 TB fact table.
  *
  * Accepts long or string keys (the two join-key shapes in the corpus;
  * `BloomFilter.put` hashes both natively). False positives only —
  * rows that slip through are dropped by the exact join that follows,
  * so composition with a join is row-identical to the unpruned join.
  */
case class BloomMightContain(child: Expression,
                             filterBcast: org.apache.spark.broadcast.Broadcast[Array[Byte]])
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

  // broadcast fetched + deserialized once per executor, shared across rows
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBcast.value))

  override def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long    => filter.mightContainLong(l)
    case i: java.lang.Integer => filter.mightContainLong(i.longValue())
    case s: UTF8String        => filter.mightContainString(s.toString)
    case other => throw new IllegalStateException(s"unexpected bloom key: $other")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
