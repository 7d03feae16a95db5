package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** n-bit SimHash of a token-array column in ONE compiled pass: majority
  * vote per bit over the DISTINCT tokens, where bit b of a token's hash is
  * bit (b % 4) of hex nibble (b / 4) of `md5(token)` — exactly the
  * arithmetic of [[graft.ops.Dedup.simhashBitSql]], so a DuckDB oracle
  * (explode distinct tokens → 2·SUM(bit) > COUNT per position) reproduces
  * the fingerprint bit-for-bit. nBits ≤ 128 (md5 has 32 nibbles).
  *
  * The declarative formulation explodes one row per (doc, token) and runs
  * nBits SUM aggregates over it — a shuffle of the tokenized corpus. This
  * expression keeps the whole fingerprint inside the scan's narrow stage:
  * one md5 per distinct token, zero shuffle — the shape that matters when
  * the corpus is 100 TB.
  */
case class SimHashBits(child: Expression, nBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  require(nBits >= 1 && nBits <= 128, s"nBits must be in [1,128], got $nBits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    if (nBits <= 64) LongType else ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  /** null for an empty (or all-null-element) token array — a majority vote
    * over nothing is undefined; matches [[MinHashSignature]]'s contract and
    * the declarative formulation, where such docs simply produce no row.
    */
  override def nullable: Boolean = true

  // one digest per task thread (MessageDigest is stateful; expression
  // instances are shared across local-mode task threads)
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  override def nullSafeEval(a: Any): Any = {
    val toks = a.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](nt * 2)
    val counts = new Array[Int](nBits)
    val md = mdLocal.get()
    var n = 0
    var i = 0
    while (i < nt) {
      val tok = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (tok != null && seen.add(tok)) {
        n += 1
        md.reset()
        val digest = md.digest(tok.getBytes)
        var b = 0
        while (b < nBits) {
          // hex nibble b/4 of the digest: high nibble of byte (b/8) when
          // (b/4) is even, low nibble when odd — hex string order
          val nibIdx = b >> 2
          val byte = digest(nibIdx >> 1)
          val nib = if ((nibIdx & 1) == 0) (byte >> 4) & 0xF else byte & 0xF
          counts(b) += (nib >> (b & 3)) & 1
          b += 1
        }
      }
      i += 1
    }
    if (n == 0) return null
    if (nBits <= 64) {
      var h = 0L
      var b = 0
      while (b < nBits) { if (2 * counts(b) > n) h |= (1L << b); b += 1 }
      h
    } else {
      val words = new Array[Any]((nBits + 63) / 64)
      var w = 0
      while (w < words.length) {
        var h = 0L
        var b = w * 64
        val end = math.min(b + 64, nBits)
        while (b < end) { if (2 * counts(b) > n) h |= (1L << (b - w * 64)); b += 1 }
        words(w) = h
        w += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
