package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenizer apply — the REAL subword tokenization a
  * training-data pipeline runs, not the pre-token count approximation
  * (`TextAnalysis.bpeishTokenCount` remains alongside as the cheap
  * stand-in). Public algorithm: Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" (ACL).
  *
  * Pre-tokenizes with the engine's `[\p{L}\p{N}]`-boundary rule (the SAME
  * rule `bpeishTokenCount` and its DuckDB oracle use), then applies the
  * trained merge table to each pre-token in training order — which is
  * equivalent to the repeatedly-merge-the-lowest-rank-pair formulation,
  * and EXACTLY mirrors how [[graft.ops.TextAnalysis.trainBpe]] built the
  * table (both sides share [[BpeEncode.mergePair]], so trainer and
  * encoder cannot drift).
  *
  * The merge table rides inside the expression (serialized with the plan,
  * like PqEncode's codebook) — applying the tokenizer is a narrow
  * projection: no join, no shuffle, 100 TB-safe. Tokens never cross a
  * pre-token boundary, so concatenating the output reproduces the
  * concatenated pre-tokens exactly (the spec pins this roundtrip).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  // per-word result memo: real corpora repeat words heavily (Zipf), so
  // the merge loop runs once per DISTINCT word per executor. Bounded and
  // concurrency-safe (expression instances are shared across tasks);
  // cleared wholesale when full — a cache, not a correctness structure.
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val memoCap = 1 << 16

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    BpeEncode.preTokenize(text).foreach { w =>
      var toks = memo.get(w)
      if (toks == null) {
        toks = BpeEncode.encodeWord(w, merges)
        if (memo.size >= memoCap) memo.clear()
        memo.put(w, toks)
      }
      toks.foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {

  /** The engine's pre-token rule: maximal runs of letters/digits, i.e.
    * `split(text, "[^\p{L}\p{N}]+")` with empties dropped — identical to
    * `TextAnalysis.bpeishTokenCount` and its oracle.
    */
  private val boundary = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")

  def preTokenize(text: String): Array[String] =
    boundary.split(text, -1).filter(_.nonEmpty)

  /** Split a word into code points (NOT chars — a surrogate pair is one
    * base symbol, or merge training would manufacture invalid strings).
    */
  def baseSymbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      i += Character.charCount(cp); k += 1
    }
    out
  }

  /** One merge step: replace every left-to-right NON-OVERLAPPING
    * occurrence of (l, r) with l+r — "aaa" under (a,a) is [aa, a], the
    * canonical BPE scan order. Shared by trainer and encoder.
    */
  def mergePair(syms: Array[String], l: String, r: String): Array[String] = {
    if (syms.length < 2) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Apply the full merge table to one word, in training order. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = baseSymbols(word)
    merges.foreach { case (l, r) => if (syms.length >= 2) syms = mergePair(syms, l, r) }
    syms
  }
}
