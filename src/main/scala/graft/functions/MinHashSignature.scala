package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle-array column in ONE compiled pass:
  * `numHashes` 8-hex-char elements, where element j is the minimum over
  * shingles of `substr(md5("${j/4}:" || s), (j%4)*8+1, 8)` — exactly the
  * arithmetic of [[graft.ops.Dedup.minhashElemSql]], so the DuckDB oracle
  * and the exploded `groupBy(doc_id).agg(min(...))` formulation reproduce
  * it byte-for-byte (one md5 yields four signature positions; lexicographic
  * min on fixed-width lowercase hex ≡ numeric min).
  *
  * Scale rationale: the exploded formulation materializes one row per
  * (doc, shingle) — a ~50× row blowup on real corpora — and pays a
  * hash-aggregate over it (map-side combined, but still per-row agg
  * machinery). This expression computes the same signature inside the
  * scan's narrow stage: no explode, no aggregation, no shuffle.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** null for an empty shingle array (a MinHash over nothing is undefined —
    * callers filter those docs, matching the exploded/groupBy formulation
    * where such docs simply have no rows).
    */
  override def nullable: Boolean = true

  // one digest per task thread: expression instances are shared across the
  // executor's task threads in local mode, and MessageDigest is stateful
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private val nMd5 = (numHashes + 3) / 4
  private val seeds = (0 until nMd5).map(i => s"$i:".getBytes("UTF-8")).toArray

  private val hexChars = "0123456789abcdef".toCharArray

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = mdLocal.get()
    // mins(j) holds the current minimum 8-hex-char chunk for position j
    val mins = Array.fill[String](numHashes)(null)
    val hex = new Array[Char](32)
    var i = 0
    var nonNull = 0
    while (i < n) {
      if (arr.isNullAt(i)) { i += 1 } else {
      nonNull += 1
      val s = arr.getUTF8String(i).getBytes
      var m = 0
      while (m < nMd5) {
        md.reset()
        md.update(seeds(m))
        md.update(s)
        val digest = md.digest()
        var b = 0
        while (b < 16) {
          hex(b * 2) = hexChars((digest(b) >> 4) & 0xF)
          hex(b * 2 + 1) = hexChars(digest(b) & 0xF)
          b += 1
        }
        var c = 0
        while (c < 4) {
          val j = m * 4 + c
          if (j < numHashes) {
            val chunk = new String(hex, c * 8, 8)
            if (mins(j) == null || chunk.compareTo(mins(j)) < 0) mins(j) = chunk
          }
          c += 1
        }
        m += 1
      }
      i += 1
      }
    }
    if (nonNull == 0) return null // null elements skipped; all-null ≡ empty
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
