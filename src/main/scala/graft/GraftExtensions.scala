package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._
import graft.operators.TopKAgg

/** SQL surface for graft's custom expressions, registered through the
  * public `SparkSessionExtensions` hook:
  *
  * ```scala
  * SparkSession.builder().withExtensions(new GraftExtensions). ...
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT graft_squared_l2(a.vec, b.vec) FROM ...")
  * spark.sql("SELECT qid, graft_topk(score, label, 10, true) FROM ... GROUP BY qid")
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit =
    functionList.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  /** (name, usage, builder) for every graft SQL function. */
  val functionList: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_squared_l2", "graft_squared_l2(a, b) - squared L2 distance of two float arrays",
      exprs => SquaredL2Distance(exprs(0), exprs(1))),
    ("graft_dot", "graft_dot(a, b) - inner product of two float arrays",
      exprs => DotProductFloat(exprs(0), exprs(1))),
    ("graft_norm_sq", "graft_norm_sq(v) - squared L2 norm",
      exprs => VectorNormSq(exprs(0))),
    ("graft_quantize_f16", "graft_quantize_f16(v) - fp32 array to IEEE-half bits",
      exprs => QuantizeVector16(exprs(0), bfloat = false)),
    ("graft_dequantize_f16", "graft_dequantize_f16(v) - IEEE-half bits to fp32 array",
      exprs => DequantizeVector16(exprs(0), bfloat = false)),
    ("graft_quantize_bf16", "graft_quantize_bf16(v) - fp32 array to bfloat16 bits",
      exprs => QuantizeVector16(exprs(0), bfloat = true)),
    ("graft_dequantize_bf16", "graft_dequantize_bf16(v) - bfloat16 bits to fp32 array",
      exprs => DequantizeVector16(exprs(0), bfloat = true)),
    ("graft_shingles", "graft_shingles(tokens, n) - distinct word n-gram shingles",
      exprs => WordShingles(exprs(0), intLit(exprs(1), "shingle size"))),
    ("graft_topk",
      "graft_topk(score, label, k, ascending[, pad]) - bounded top-k per group, best-first",
      exprs => {
        val pad = if (exprs.length > 4) boolLit(exprs(4), "pad") else false
        TopKAgg(exprs(0), exprs(1), intLit(exprs(2), "k"),
          boolLit(exprs(3), "ascending"), pad)
      }),
    ("graft_minhash",
      "graft_minhash(shingles, numHashes) - MinHash signature (8-hex-char mins) in one pass",
      exprs => MinHashSignature(exprs(0), intLit(exprs(1), "numHashes"))),
    ("graft_simhash",
      "graft_simhash(tokens, nBits) - n-bit SimHash (majority vote over distinct tokens)",
      exprs => SimHashBits(exprs(0), intLit(exprs(1), "nBits"))),
    ("graft_pairs",
      "graft_pairs(bucket) - unordered (doc_a, ha, doc_b, hb) pairs of an array<struct<id,h>> bucket",
      exprs => StructPairs(exprs(0))),
    ("graft_top_ngram",
      "graft_top_ngram(tokens, n) - most frequent word n-gram: struct<gram, cnt>, ties lex-min",
      exprs => TopNgram(exprs(0), intLit(exprs(1), "n"))),
    ("graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity (DuckDB-pinned semantics)",
      exprs => JaroWinkler(exprs(0), exprs(1))),
    ("graft_char_entropy",
      "graft_char_entropy(text) - Shannon entropy (nats) of the code-point distribution",
      exprs => CharEntropy(exprs(0))))

  /** Register on a LIVE session (the extensions hook only applies at
    * session build; driver-owned sessions need runtime registration).
    * Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functionList.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftBridge.registerTempFunction(spark, name, builder)
    }
}
