package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.{Profile, TextAnalysis}

/** Round-13 pipeline operators: lexical diversity (TTR + hapax share),
  * the Zipf-law OLS fit, per-doc shingle novelty, and per-dimension
  * embedding moments — each against an in-process scalar oracle (the
  * definitional computation the distributed plan replaces).
  */
class PipelineOpsR13Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: (Long, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  // ---- lexical diversity ----

  test("lexicalDiversity == definitional TTR / hapax over token multisets") {
    val docs = docsDf(
      0L -> "a b a c a b",    // 6 tokens, types {a,b,c}=3, hapax {c}=1
      1L -> "x y z",          // 3/3/3
      2L -> "w w w w")        // 4/1/0
    val got = TextAnalysis.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got(0L) === ((6L, 3L, 0.5, math.rint(1.0 / 6.0 * 1e6) / 1e6)))
    assert(got(1L) === ((3L, 3L, 1.0, 1.0)))
    assert(got(2L) === ((4L, 1L, 0.25, 0.0)))
  }

  // ---- Zipf fit ----

  test("zipfFit == closed-form OLS on (ln rank, ln count)") {
    // counts: a×8, b×4, c×2, d×1 — a perfect slope would be -1 on
    // log2/log2; on ln/ln the OLS of y=ln(2^(3-r+1))... compute exactly
    val docs = docsDf(0L -> (("a " * 8) + ("b " * 4) + ("c " * 2) + "d").trim)
    val got = TextAnalysis.zipfFit(docs, topN = 200).collect()(0)
    val cnts = Seq(8.0, 4.0, 2.0, 1.0)
    val xs = cnts.indices.map(i => math.log(i + 1.0))
    val ys = cnts.map(math.log)
    val n = cnts.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(got.getLong(0) === 4L)
    assert(got.getDouble(1) === math.rint(slope * 1e6) / 1e6)
    assert(got.getDouble(2) === math.rint(icept * 1e6) / 1e6)
    // fit is negative-sloped on any strictly decreasing count profile
    assert(got.getDouble(1) < 0.0)
  }

  test("zipfFit: rank total order is (count DESC, term) — ties pin by term") {
    // b and c tie at 2: b must take the earlier rank. Moving the tie
    // the other way would change the fit, so equality with the scalar
    // oracle below proves the order
    val docs = docsDf(0L -> "a a a b b c c")
    val got = TextAnalysis.zipfFit(docs, topN = 200).collect()(0)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(3.0, 2.0, 2.0).map(math.log)
    val n = 3.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got.getDouble(1) === math.rint(slope * 1e6) / 1e6)
  }

  // ---- shingle novelty ----

  test("shingleNovelty: min-doc_id ownership over 3-gram sets") {
    val docs = docsDf(
      0L -> "p q r s",      // shingles {p q r, q r s} — both novel
      1L -> "p q r t u",    // {p q r, q r t, r t u} — 2 of 3 novel
      2L -> "p q r s t")    // {p q r, q r s, r s t} — 1 of 3 novel
    val got = TextAnalysis.shingleNovelty(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(0L) === ((2L, 2L, 1.0)))
    assert(got(1L) === ((3L, 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6)))
    assert(got(2L) === ((3L, 1L, math.rint(1.0 / 3.0 * 1e6) / 1e6)))
  }

  test("shingleNovelty: short docs (< 3 tokens) are omitted, not zeroed") {
    val docs = docsDf(0L -> "a b", 1L -> "a b c")
    val got = TextAnalysis.shingleNovelty(docs).collect()
    assert(got.map(_.getLong(0)).toSet === Set(1L))
  }

  // ---- Heaps'-law fit ----

  test("heapsFit == closed-form OLS over the scalar cumulative curve") {
    val docs = docsDf(
      0L -> "a b a",       // tokens 3, new types {a,b}=2  → cum (3, 2)
      1L -> "a c c d",     // tokens 4, new {c,d}=2        → cum (7, 4)
      2L -> "a b e")       // tokens 3, new {e}=1          → cum (10, 5)
    val got = TextAnalysis.heapsFit(docs).collect()(0)
    val cums = Seq((3.0, 2.0), (7.0, 4.0), (10.0, 5.0))
    val xs = cums.map(c => math.log(c._1))
    val ys = cums.map(c => math.log(c._2))
    val n = cums.size.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(got.getLong(0) === 3L)
    assert(math.abs(got.getDouble(1) - slope) < 2e-6)
    assert(math.abs(got.getDouble(2) - icept) < 2e-6)
    // sub-linear vocabulary growth on this fixture
    assert(got.getDouble(1) > 0.0 && got.getDouble(1) < 1.0)
  }

  // ---- information rate ----

  test("entropyRate == closed-form H(bigram), H(marginal), H(w2|w1)") {
    // "a b a b a" → bigrams: (a b)×2, (b a)×2 → H2 = ln 2;
    // marginal: a×2, b×2 → H1 = ln 2 → h_cond = 0 (and must print
    // +0.0, not −0.0 — the signed-zero normalization)
    val got = TextAnalysis.entropyRate(docsDf(0L -> "a b a b a")).collect()(0)
    assert(got.getLong(0) === 4L)
    val ln2r = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(got.getDouble(1) === ln2r)
    assert(got.getDouble(2) === ln2r)
    assert(got.getDouble(3) === 0.0)
    assert(java.lang.Double.doubleToLongBits(got.getDouble(3)) ===
      java.lang.Double.doubleToLongBits(0.0), "h_cond must be +0.0")
    // a deterministic-next-word corpus: h_cond exactly 0, h_bigram > 0
    val det = TextAnalysis.entropyRate(docsDf(0L -> "x y z x y z x y z x"))
      .collect()(0)
    assert(det.getDouble(3) === 0.0)
    assert(det.getDouble(1) > 0.0)
  }

  // ---- per-dimension embedding moments ----

  test("dimStats == per-dimension population mean/variance") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val rows = Seq(
      Row(0L, Seq(1.0f, 10.0f)),
      Row(1L, Seq(2.0f, 10.0f)),
      Row(2L, Seq(3.0f, 10.0f)))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val got = Profile.dimStats(df, "embedding").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // dim 1: mean 2, var ((1-2)^2+(0)^2+(1)^2)/3 = 2/3; dim 2: 10, 0
    assert(got(1L) === ((3L, 2000000L, math.floor(2.0 / 3.0 * 1e6 + 0.5).toLong)))
    assert(got(2L) === ((3L, 10000000L, 0L)))
  }
}
