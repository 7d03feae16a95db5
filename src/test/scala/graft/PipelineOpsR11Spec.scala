package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Curation, Graph, TextAnalysis}

/** Round-11 pipeline operators: Adamic–Adar link prediction, DSIR
  * importance weights, Kneser–Ney bigram LM, and the per-doc
  * corpus-duplication fraction — each checked against an in-process
  * scalar oracle (the brute-force definitional computation the
  * distributed plan replaces), plus the scale guards (degree cap,
  * broadcast model, no pair expansion).
  */
class PipelineOpsR11Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: (Long, String, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("lang", StringType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      rows.map(r => Row(r._1, r._2, r._3)): _*), schema)
  }

  private def edgesDf(es: (Long, Long)*) = {
    val schema = StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      es.map(e => Row(e._1, e._2)): _*), schema)
  }

  // ---- Adamic–Adar ----

  test("adamicAdar matches the definitional scalar computation") {
    // path 1-2-3 plus hub 0 adjacent to all: candidates are the
    // distance-2 non-edges
    val es = Seq((1L, 2L), (2L, 3L), (0L, 1L), (0L, 2L), (0L, 3L))
    val got = Graph.adamicAdar(edgesDf(es: _*), degCap = 64, minCn = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap

    // scalar oracle
    val adj = (es ++ es.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val nodes = adj.keySet
    val eSet = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val expect = (for {
      a <- nodes.toSeq; b <- nodes.toSeq if a < b && !eSet((a, b))
      common = adj(a).intersect(adj(b)) if common.nonEmpty
    } yield {
      val aa = common.toSeq.map(v => BigDecimal(1.0 / math.log(deg(v).toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      ((a, b), (common.size.toLong,
        math.floor(aa.toDouble * 1e6 + 0.5).toLong))
    }).toMap
    assert(got === expect)
  }

  test("adamicAdar degCap excludes hub-centered wedges") {
    // star: center 0 with 5 leaves; only wedges through 0 exist, so a
    // cap below 5 must yield NO candidates — the hub never becomes a
    // wedge center (the 100 TB quadratic-fanout guard)
    val es = (1L to 5L).map(l => (0L, l))
    assert(Graph.adamicAdar(edgesDf(es: _*), degCap = 4, minCn = 1).count() === 0L)
    // with the cap above the hub degree the C(5,2) leaf pairs appear
    assert(Graph.adamicAdar(edgesDf(es: _*), degCap = 8, minCn = 1).count() === 10L)
  }

  // ---- DSIR weights ----

  test("dsirWeights matches the scalar Laplace bucket model") {
    val docs = docsDf(
      (0L, "a b a", "en"), (1L, "b c", "en"),
      (2L, "c c d", "fr"), (3L, "a d", "fr"))
    val buckets = 16
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md.substring(0, 6), 16) % buckets).toInt
    }
    val toks = Map(0L -> Seq("a", "b", "a"), 1L -> Seq("b", "c"),
      2L -> Seq("c", "c", "d"), 3L -> Seq("a", "d"))
    val langs = Map(0L -> "en", 1L -> "en", 2L -> "fr", 3L -> "fr")
    val all = toks.toSeq.flatMap { case (d, ts) => ts.map(t => (d, bucket(t))) }
    val cs = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = all.filter(p => langs(p._1) == "en")
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ns = all.size.toLong
    val nt = all.count(p => langs(p._1) == "en").toLong
    val lr = cs.keys.map { b =>
      val v = math.log(((ct.getOrElse(b, 0L) + 1.0) / (nt + buckets)) /
        ((cs(b) + 1.0) / (ns + buckets)))
      b -> BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.toMap
    val expect = toks.map { case (d, ts) =>
      val slr = ts.map(t => lr(bucket(t))).sum
      d -> ((ts.size.toLong,
        math.floor(slr.toDouble / ts.size * 1e6 + 0.5).toLong))
    }
    val got = Curation.dsirWeights(docs, targetLang = "en", buckets = buckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expect)
  }

  test("dsirWeights ranks target-like docs above source-typical docs") {
    // 'en' docs use tokens {aa,bb}; 'fr' docs use {cc,dd}: an en doc must
    // outweigh a fr doc
    val docs = docsDf(
      (0L, "aa bb aa", "en"), (1L, "bb aa", "en"), (2L, "aa bb", "en"),
      (3L, "cc dd cc", "fr"), (4L, "dd cc", "fr"))
    val w = Curation.dsirWeights(docs, targetLang = "en", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w(0L) > w(3L) && w(1L) > w(4L))
  }

  // ---- Kneser–Ney bigram ----

  test("knBigramLogProb matches the scalar KN computation") {
    val docs = docsDf(
      (0L, "a b a b c", "en"), (1L, "b c a", "en"), (2L, "a b", "en"))
    val D = 0.75
    val toks = Map(0L -> Seq("a", "b", "a", "b", "c"),
      1L -> Seq("b", "c", "a"), 2L -> Seq("a", "b"))
    val allBg = toks.values.toSeq.flatMap(ts => ts.zip(ts.tail))
    val c2 = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val n1f = c2.keys.toSeq.groupBy(_._1).view.mapValues(_.size).toMap
    val n1p = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val n1all = c2.size.toDouble
    def lp(v: String, w: String): Double =
      math.log((math.max(c2((v, w)) - D, 0.0) +
        D * n1f(v) * (n1p(w) / n1all)) / cv(v))
    val expect = toks.map { case (d, ts) =>
      val lps = ts.zip(ts.tail).map { case (v, w) => lp(v, w) }
      val mean = lps.sum / lps.size
      d -> ((lps.size.toLong,
        BigDecimal(mean).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = TextAnalysis.knBigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expect)
  }

  test("knBigramLogProb: probabilities over observed+unseen mass stay < 1") {
    // sanity: per-bigram probability is a proper discount (each observed
    // bigram's P < 1, so mean_lp < 0 and ppl > 1)
    val docs = docsDf((0L, "x y x z", "en"), (1L, "y z", "en"))
    val rows = TextAnalysis.knBigramLogProb(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0.0) // mean_lp
      assert(r.getDouble(3) > 1.0) // ppl
    }
  }

  // ---- duplication fraction ----

  test("dupShingleFraction marks shared shingles and omits short docs") {
    val docs = docsDf(
      (0L, "p q r s", "en"),   // shingles: "p q r", "q r s"
      (1L, "p q r t", "en"),   // shares "p q r" with doc 0
      (2L, "u v w", "en"),     // unique shingle
      (3L, "x y", "en"))       // < 3 tokens → omitted
    val got = TextAnalysis.dupShingleFraction(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      0L -> ((2L, 1L, 500000L)), 1L -> ((2L, 1L, 500000L)),
      2L -> ((1L, 0L, 0L))))
  }

  test("dupShingleFraction counts doc occurrences, not pairs") {
    // one shingle in k docs contributes k join rows (linear), and every
    // holder sees df >= 2 — the lineDfFilter bound, no pair expansion
    val docs = docsDf((0L to 9L).map(i => (i, "same three words", "en")): _*)
    val got = TextAnalysis.dupShingleFraction(docs).collect()
    assert(got.length === 10)
    got.foreach(r => assert((r.getLong(1), r.getLong(2)) === ((1L, 1L))))
  }
}
