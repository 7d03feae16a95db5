package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a binary heap of at most k (score, label) pairs
  * with the WORST element at the root, so a streaming scan does one O(1)
  * threshold compare per row and O(log k) only on improvement.
  *
  * This is the Spark-shaped analog of the reference's selection kernels:
  * the per-partition partial buffer plays the role of
  * `warp_select`'s per-lane sorted queues
  * (`/root/reference/shaders/warp_select.metal:11-67`), and
  * partial-merge/final-eval mirror `block_select`'s phase-2 merge and
  * phase-3 emit (`/root/reference/shaders/block_select.metal:111-274`).
  *
  * Unlike the reference (whose tie order is scan-order dependent, see
  * SURVEY.md §5), ordering is the total order (score, label):
  * ascending=true keeps the k smallest scores (L2), false the k largest
  * (inner product); ties always break toward the smaller label. This makes
  * every result deterministic and hash-matchable.
  */
final class TopKBuffer(val k: Int, val ascending: Boolean) {
  var size: Int = 0
  val scores = new Array[Double](math.max(k, 1))
  val labels = new Array[Long](math.max(k, 1))

  /** <0 if (da,la) is strictly better than (db,lb); NaN scores are always
    * worst in BOTH directions (a NaN distance/similarity must never beat a
    * finite one), ties break toward the smaller label.
    */
  @inline private def cmp(da: Double, la: Long, db: Double, lb: Long): Int = {
    val aNaN = da != da
    val bNaN = db != db
    val c =
      if (aNaN || bNaN) { if (aNaN == bNaN) 0 else if (aNaN) 1 else -1 }
      else if (ascending) java.lang.Double.compare(da, db)
      else java.lang.Double.compare(db, da)
    if (c != 0) c else java.lang.Long.compare(la, lb)
  }

  /** Is (da,la) strictly worse than (db,lb) under the kept order? */
  @inline private def worse(da: Double, la: Long, db: Double, lb: Long): Boolean =
    cmp(da, la, db, lb) > 0

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = scores(i); scores(i) = scores(j); scores(j) = td
    val tl = labels(i); labels(i) = labels(j); labels(j) = tl
  }

  def insert(score: Double, label: Long): Unit = {
    if (size < k) {
      scores(size) = score; labels(size) = label; size += 1
      var i = size - 1
      var cont = i > 0
      while (cont) {
        val p = (i - 1) >> 1
        if (worse(scores(i), labels(i), scores(p), labels(p))) {
          swap(i, p); i = p; cont = i > 0
        } else cont = false
      }
    } else if (k > 0 && worse(scores(0), labels(0), score, label)) {
      scores(0) = score; labels(0) = label
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(scores(l), labels(l), scores(w), labels(w))) w = l
        if (r < size && worse(scores(r), labels(r), scores(w), labels(w))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.labels(i)); i += 1 }
  }

  /** Indices 0..size-1 ordered best-first under the total order. */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size)
    val ord = new Ordering[Int] {
      def compare(a: Int, b: Int): Int =
        cmp(scores(a), labels(a), scores(b), labels(b))
    }
    idx.sorted(ord)
  }
}

/** Grouped bounded top-k aggregate: `topK(score, label, k, ascending)` →
  * `array<struct<label: long, score: double>>`, best-first.
  *
  * Runs as ObjectHashAggregate: per-partition partial buffers (map-side,
  * k-bounded state → skew-safe), shuffle only the k-row buffers by group
  * key, then a final merge — never a full sort of the scored pairs. At
  * 100 TB this is the difference between shuffling k rows per group and
  * shuffling the entire cross-join output (what a window + row_number
  * formulation would do).
  *
  * `padToK` reproduces the reference's sentinel semantics
  * (`/root/reference/src/MetalIndexFlat.mm:336-399`): when a group saw
  * fewer than k rows, fill the tail with label −1 and score +Inf
  * (ascending) / −Inf (descending).
  */
case class TopKAgg(
    scoreExpr: Expression,
    labelExpr: Expression,
    k: Int,
    ascending: Boolean,
    padToK: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

  require(k > 0, s"topK requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, labelExpr)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.resultType

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val l = labelExpr.eval(input)
    if (s != null && l != null) {
      buffer.insert(s.asInstanceOf[Double], l.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val idx = buffer.sortedIndices
    val outLen = if (padToK) k else buffer.size
    val rows = new Array[Any](outLen)
    var i = 0
    while (i < buffer.size) {
      rows(i) = InternalRow(buffer.labels(idx(i)), buffer.scores(idx(i)))
      i += 1
    }
    val sentinel =
      if (ascending) Double.PositiveInfinity else Double.NegativeInfinity
    while (i < outLen) {
      rows(i) = InternalRow(-1L, sentinel)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.size)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putLong(buffer.labels(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k, ascending)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val l = bb.getLong
      buf.insert(s, l)
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
    copy(scoreExpr = newChildren(0), labelExpr = newChildren(1))
}

object TopKAgg {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("label", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
}
