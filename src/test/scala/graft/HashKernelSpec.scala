package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property-style differential tests of the compiled hash kernels
  * (MinHashSignature, SimHashBits) against independent scalar Scala
  * reference implementations, over seeded random inputs including unicode
  * and adversarial shapes (empty, single, duplicate-heavy).
  */
class HashKernelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Scalar reference of the minhash arithmetic (Dedup.minhashElemSql). */
  private def refMinhash(shingles: Seq[String], numHashes: Int): Seq[String] =
    (0 until numHashes).map { j =>
      shingles.map(s => md5hex(s"${j / 4}:$s").substring((j % 4) * 8, (j % 4) * 8 + 8)).min
    }

  /** Scalar reference of the simhash arithmetic (Dedup.simhashBitSql). */
  private def refSimhash(tokens: Seq[String], nBits: Int): Long = {
    val distinct = tokens.distinct
    val n = distinct.size
    var h = 0L
    for (b <- 0 until nBits) {
      val cnt = distinct.count { t =>
        val nib = Integer.parseInt(md5hex(t).substring(b / 4, b / 4 + 1), 16)
        ((nib >> (b % 4)) & 1) == 1
      }
      if (2 * cnt > n) h |= (1L << b)
    }
    h
  }

  private val rnd = new scala.util.Random(20260812L)
  private val alphabets = Seq("abcdefg ", "日本語中文字 ", "αβγδ λμ ", "a0!?~ ")

  private def randomTokens(): Seq[String] = {
    val alpha = alphabets(rnd.nextInt(alphabets.length))
    val n = rnd.nextInt(20)
    (0 until n).map { _ =>
      val len = 1 + rnd.nextInt(6)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString.trim match {
        case "" => "x"
        case s  => s
      }
    }
  }

  private def runKernel(col0: org.apache.spark.sql.Column, input: Seq[String]): Row = {
    val schema = StructType(Seq(StructField("a",
      ArrayType(StringType, containsNull = false), nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row(input)), schema)
      .select(col0).head()
  }

  test("MinHashSignature ≡ scalar reference over 60 random inputs") {
    for (_ <- 0 until 60) {
      val sh = randomTokens()
      val got = runKernel(graft.functions.minhashSignature(col("a"), 8), sh)
      if (sh.isEmpty) assert(got.isNullAt(0))
      else {
        // kernel min is over the input AS GIVEN (duplicates don't change min)
        assert(got.getSeq[String](0) == refMinhash(sh, 8), s"input: $sh")
      }
    }
  }

  test("SimHashBits(16/63) ≡ scalar reference over 60 random inputs") {
    for (_ <- 0 until 60) {
      val toks = randomTokens()
      if (toks.nonEmpty) {
        for (bits <- Seq(16, 63)) {
          val got = runKernel(graft.functions.simhashBits(col("a"), bits), toks)
          assert(got.getLong(0) == refSimhash(toks, bits), s"bits=$bits input: $toks")
        }
      }
    }
  }

  test("null and empty inputs: kernels skip null elements, all-null/empty → null") {
    val nullableSchema = StructType(Seq(StructField("a",
      ArrayType(StringType, containsNull = true), nullable = false)))
    def run(c: org.apache.spark.sql.Column, in: Seq[String]): Row =
      spark.createDataFrame(java.util.Arrays.asList(Row(in)), nullableSchema)
        .select(c).head()
    // null elements are skipped — result equals the non-null subset's
    val withNull = run(graft.functions.minhashSignature(col("a"), 8), Seq("x y z", null))
    val clean = run(graft.functions.minhashSignature(col("a"), 8), Seq("x y z"))
    assert(withNull.getSeq[String](0) == clean.getSeq[String](0))
    assert(run(graft.functions.minhashSignature(col("a"), 8), Seq(null)).isNullAt(0))
    assert(run(graft.functions.minhashSignature(col("a"), 8), Seq.empty).isNullAt(0))
    val shNull = run(graft.functions.simhashBits(col("a"), 16), Seq("x", null))
    assert(shNull.getLong(0) == refSimhash(Seq("x"), 16))
    assert(run(graft.functions.simhashBits(col("a"), 16), Seq.empty).isNullAt(0))
    assert(run(graft.functions.simhashBits(col("a"), 16), Seq(null)).isNullAt(0))
  }

  test("charEntropy: closed forms, code-point counting, empty/null → null") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    def ent(s: String): java.lang.Double = {
      val r = Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.charEntropy(col("t"))).collect()(0)
      if (r.isNullAt(0)) null else r.getDouble(0)
    }
    assert(ent("aaaa") === 0.0)                          // one symbol
    assert(math.abs(ent("ab") - math.log(2)) < 1e-12)    // uniform 2
    assert(math.abs(ent("aab") - (-(2.0/3)*math.log(2.0/3) - (1.0/3)*math.log(1.0/3))) < 1e-12)
    assert(ent("") == null)
    assert(Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.charEntropy(col("t"))).collect()(0).isNullAt(0))
    // a surrogate-pair code point (U+1D11E) counts ONCE, not as 2 chars:
    // "𝄞𝄞aa" = two distinct code points, 2+2 → ln 2
    val clef = new String(Character.toChars(0x1D11E))
    assert(math.abs(ent(clef + clef + "aa") - math.log(2)) < 1e-12)
  }

  test("duplicate-heavy input: simhash counts DISTINCT tokens (majority basis)") {
    // 'a' ×100 + 'b' ×1 — if duplicates counted, every 'a' bit would win;
    // distinct basis makes it a 50/50 tie → majority (2*cnt > n) = false
    val toks = Seq.fill(100)("aa") ++ Seq("bb")
    val got = runKernel(graft.functions.simhashBits(col("a"), 16), toks)
    assert(got.getLong(0) == refSimhash(toks, 16))
  }
}
