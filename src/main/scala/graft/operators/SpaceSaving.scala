package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitter sketch state (Metwally, Agrawal & El Abbadi
  * 2005): at most `capacity` tracked items, each with an overestimating
  * count and the overestimation bound at insertion time. Invariants that
  * survive update AND merge (Agarwal et al. 2012, "Mergeable
  * Summaries" — SpaceSaving is isomorphic to Misra-Gries):
  *
  *   est(x) ≥ true(x)            (counts only ever overestimate)
  *   est(x) − err(x) ≤ true(x)   (err bounds the overestimate)
  *   any x with true(x) > n/capacity is tracked
  *
  * Eviction and merge tie-breaks are total orders ((count, item) /
  * (est desc, item)) so the sketch is deterministic for a given
  * partition structure; the VERDICT properties above hold for every
  * partition structure, which is what the oracle checks.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  // item -> (est, err)
  val counts: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

  def update(item: String): Unit = counts.get(item) match {
    case Some((c, e)) => counts.update(item, (c + 1, e))
    case None if counts.size < capacity => counts.update(item, (1L, 0L))
    case None =>
      // evict the min-count item (ties → lexicographically smallest) and
      // inherit its count as the new item's overestimate
      var minItem: String = null; var minC = Long.MaxValue
      counts.foreach { case (k, (c, _)) =>
        if (c < minC || (c == minC && (minItem == null || k < minItem))) {
          minC = c; minItem = k
        }
      }
      counts.remove(minItem)
      counts.update(item, (minC + 1, minC))
  }

  /** Upper bound on the true count of any UNTRACKED item. */
  def minCount: Long =
    if (counts.size < capacity) 0L else counts.values.iterator.map(_._1).min

  /** Merge `other` in (upper-bound merge): an item absent from one side
    * contributes that side's minCount to both est and err — keeping both
    * invariants — then the union is trimmed back to capacity keeping the
    * largest estimates ((est desc, item asc) total order).
    */
  def mergeIn(other: SpaceSavingBuffer): Unit = {
    if (other.counts.isEmpty) return
    val m1 = minCount
    val m2 = other.minCount
    val union = mutable.HashMap.empty[String, (Long, Long)]
    counts.foreach { case (k, (c, e)) =>
      other.counts.get(k) match {
        case Some((c2, e2)) => union.update(k, (c + c2, e + e2))
        case None           => union.update(k, (c + m2, e + m2))
      }
    }
    other.counts.foreach { case (k, (c2, e2)) =>
      if (!counts.contains(k)) union.update(k, (c2 + m1, e2 + m1))
    }
    counts.clear()
    union.toSeq
      .sortBy { case (k, (c, _)) => (-c, k) }
      .take(capacity)
      .foreach { case (k, ce) => counts.update(k, ce) }
  }

  /** (item, est, err) sorted est desc, item asc. */
  def sorted: Seq[(String, Long, Long)] =
    counts.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }
}

/** `spaceSavingHH(item, capacity)` → `array<struct<item, est, err>>`:
  * a mergeable heavy-hitter sketch as an ObjectHashAggregate — partial
  * sketches per partition (capacity-bounded state, skew-safe by
  * definition), capacity-row buffers shuffled, one upper-bound merge at
  * the final. The 100 TB shape: state and shuffle are O(capacity) per
  * group regardless of how many distinct items the stream carries.
  */
case class SpaceSavingAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with ImplicitCastInputTypes {

  require(capacity > 0, s"spaceSavingHH requires capacity > 0, got $capacity")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.resultType

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buffer: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (k, c, e) =>
      InternalRow(UTF8String.fromString(k), c, e)
    }.toArray[Any])

  override def serialize(buffer: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (k, (c, e)) =>
      // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
      // UTFDataFormatException past 65535 modified-UTF-8 bytes, and a
      // general-purpose string aggregate must survive long items
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new SpaceSavingBuffer(capacity)
    var i = 0
    while (i < n) {
      val kl = in.readInt()
      val kb = new Array[Byte](kl); in.readFully(kb)
      val k = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong(); val e = in.readLong()
      buf.counts.update(k, (c, e))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object SpaceSavingAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
}
