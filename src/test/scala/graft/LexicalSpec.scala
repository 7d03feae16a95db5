package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lexical

/** BM25 lexical retrieval + reciprocal-rank fusion vs driver-side
  * references with the same formula and tie rules.
  */
class LexicalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpus = Seq(
    0L -> "apple banana apple cherry",
    1L -> "banana cherry cherry date",
    2L -> "apple apple apple banana",
    3L -> "date egg fig grape",
    4L -> "cherry date egg apple")

  /** Scalar Okapi BM25 (k1=1.2, b=0.75, +1-smoothed idf), query doc's
    * distinct tokens, self-excluded — same spec as [[Lexical.bm25TopK]].
    */
  private def refBm25(docs: Seq[(Long, String)], qid: Long,
                      maxDf: Long = Long.MaxValue): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val avgLen = toks.values.map(_.size).sum.toDouble / docs.size
    val df = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val qTerms = toks(qid).distinct.filter(t => df(t) <= maxDf)
    docs.collect { case (id, _) if id != qid =>
      val tf = toks(id).groupBy(identity).view.mapValues(_.size).toMap
      val len = toks(id).size.toDouble
      val s = qTerms.collect { case t if tf.contains(t) =>
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf(t) * (1.2 + 1.0)) /
          (tf(t) + 1.2 * ((1.0 - 0.75) + 0.75 * len / avgLen))
      }.sum
      id -> math.floor(s * 1e6 + 0.5)
    }.filter(_._2 != 0.0)
      .sortBy { case (id, s) => (-s, id) }
  }

  test("bm25TopK matches the scalar reference (scores, ranks, self-exclusion)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = Lexical.bm25TopK(docs,
        docs.filter(col("doc_id") < 2).select(col("doc_id").as("qid"), col("text")),
        k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (qid <- Seq(0L, 1L)) {
      val want = refBm25(corpus, qid)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.map(_._3).toSeq === want.map(_._1),
        s"rank order for query $qid")
      assert(mine.map(_._4).toSeq === want.map(_._2), s"scores for query $qid")
      assert(!mine.exists(_._3 == qid), "query doc must be self-excluded")
    }
  }

  test("bm25TopK maxDf prunes high-df terms (stopword cap)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = corpus.toDF("doc_id", "text")
    // df: apple=3 banana=3 cherry=3 date=3 egg=2 fig=1 grape=1
    val got = Lexical.bm25TopK(docs,
        docs.filter(col("doc_id") === 3).select(col("doc_id").as("qid"), col("text")),
        k = 10, maxDf = 2)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    val want = refBm25(corpus, 3L, maxDf = 2)
    assert(got.map(_._1).toSeq === want.map(_._1))
    assert(got.map(_._2).toSeq === want.map(_._2))
    // 'date' (df=3) pruned → doc 1 (date only) must not appear
    assert(!got.exists(_._1 == 1L))
  }

  /** Scalar TF-IDF cosine: w(d,t) = tf·ln(1+N/df) over the df-capped
    * universe, query-side weights from query term FREQUENCIES, norms over
    * each doc's full capped vector — same spec as [[Lexical.tfidfTopK]].
    */
  private def refTfidf(docs: Seq[(Long, String)], qid: Long,
                       maxDf: Long = Long.MaxValue): Seq[(Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap.filter(_._2 <= maxDf)
    def weights(ws: Seq[String]): Map[String, Double] =
      ws.groupBy(identity).collect { case (t, occ) if df.contains(t) =>
        t -> occ.size * math.log(1.0 + n / df(t))
      }
    def norm(w: Map[String, Double]): Double =
      math.sqrt(w.values.map(v => v * v).sum)
    val qw = weights(toks(qid))
    docs.collect { case (id, _) if id != qid =>
      val dw = weights(toks(id))
      val dot = qw.collect { case (t, v) if dw.contains(t) => v * dw(t) }.sum
      id -> math.floor(dot / (norm(dw) * norm(qw)) * 1e6 + 0.5)
    }.filter(_._2 != 0.0)
      .sortBy { case (id, s) => (-s, id) }
  }

  test("tfidfTopK matches the scalar VSM reference (cosine, query tf weights, self-exclusion)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val st = Lexical.bm25Stats(docs)
    val got = Lexical.tfidfTopK(st,
        docs.filter(col("doc_id") < 2).select(col("doc_id").as("qid"), col("text")),
        k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    for (qid <- Seq(0L, 1L)) {
      val want = refTfidf(corpus, qid)
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.map(_._3).toSeq === want.map(_._1), s"rank order for query $qid")
      mine.map(_._4).zip(want.map(_._2)).foreach { case (g, w) =>
        assert(math.abs(g - w) < 2e-6, s"score for query $qid: $g vs $w")
      }
      assert(!mine.exists(_._3 == qid), "query doc must be self-excluded")
    }
    // doc 0 = "apple banana apple cherry", doc 2 = "apple apple apple
    // banana": same dominant terms → doc 2 must outrank the date-heavy
    // docs for query 0 (cosine sanity beyond the formula identity)
    assert(got.filter(_._1 == 0L).minBy(_._2)._3 == 2L)
  }

  test("unigramLogProb matches the scalar unigram-MLE reference") {
    val spark2 = spark
    import spark2.implicits._
    val got = graft.ops.TextAnalysis.unigramLogProb(corpus.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val cnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = toks.map(_._2.size).sum.toDouble
    corpus.foreach { case (id, _) =>
      val ws = toks.find(_._1 == id).get._2
      val mlp = ws.map(w => math.log(cnt(w) / total)).sum / ws.size
      val (gid, gn, glp, gppl) = got(id.toInt)
      assert(gid === id && gn === ws.size.toLong)
      assert(glp === math.rint(mlp * 1e6) / 1e6)
      assert(gppl === math.rint(math.exp(-mlp) * 1e6) / 1e6)
    }
  }

  test("bigramLogProb matches the scalar interpolated-bigram reference; <2-token docs omitted") {
    val spark2 = spark
    import spark2.implicits._
    val docs = corpus :+ (5L -> "solo")  // 1 token → no bigram positions
    val got = graft.ops.TextAnalysis.bigramLogProb(docs.toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === corpus.map(_._1))  // doc 5 omitted
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val c1 = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val total = toks.map(_._2.size).sum.toDouble
    val c2 = toks.flatMap { case (_, ws) => ws.sliding(2).filter(_.size == 2) }
      .map(p => (p(0), p(1))).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    corpus.foreach { case (id, _) =>
      val ws = toks.find(_._1 == id).get._2
      val lps = ws.sliding(2).filter(_.size == 2).map { p =>
        math.log(0.7 * c2((p(0), p(1))) / c1(p(0)) + 0.3 * c1(p(1)) / total)
      }.toSeq
      val mlp = lps.sum / lps.size
      val (gid, gn, glp, gppl) = got(id.toInt)
      assert(gid === id && gn === lps.size.toLong)
      assert(math.abs(glp - math.rint(mlp * 1e6) / 1e6) < 2e-6,
        s"doc $id: $glp vs $mlp")
      assert(math.abs(gppl - math.rint(math.exp(-mlp) * 1e6) / 1e6) < 2e-6)
    }
  }

  test("rrfFuse sums 1/(c+rank) across lists, ranks by (score desc, label)") {
    val spark2 = spark
    import spark2.implicits._
    // one query, two lists: label 10 is rank 1+2, label 20 rank 2+1,
    // label 30 only in list A rank 3, label 40 only in B rank 3
    val a = Seq((0L, 1L, 10L), (0L, 2L, 20L), (0L, 3L, 30L))
      .toDF("qid", "rank", "label")
    val b = Seq((0L, 1L, 20L), (0L, 2L, 10L), (0L, 3L, 40L))
      .toDF("qid", "rank", "label")
    val got = Lexical.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    def rr(ranks: Int*) = math.floor(ranks.map(r => 1.0 / (60.0 + r)).sum * 1e6 + 0.5)
    // 10 and 20 tie exactly (1/61+1/62 both) → smaller label first
    assert(got.toSeq === Seq(
      (1L, 10L, rr(1, 2)), (2L, 20L, rr(2, 1)), (3L, 30L, rr(3)), (4L, 40L, rr(3))))
  }

  // ---- phrase search ----

  private def phrase(docs: Seq[(Long, String)], terms: String*) = {
    val spark2 = spark
    import spark2.implicits._
    Lexical.phraseSearch(docs.toDF("doc_id", "text"), terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("phraseSearch: sequence matters, counts and 1-based first position") {
    val docs = Seq(
      1L -> "x stream table hash y stream table hash", // 2 occurrences
      2L -> "hash table stream",                        // reversed — no match
      3L -> "stream table",                             // incomplete — no match
      4L -> "stream table hash")                        // at start
    assert(phrase(docs, "stream", "table", "hash") ===
      Set((1L, 2L, 2L), (4L, 1L, 1L)))
  }

  test("phraseSearch counts overlapping occurrences separately") {
    assert(phrase(Seq(1L -> "a a a a"), "a", "a") === Set((1L, 3L, 1L)))
  }

  test("phraseSearch single term == token containment") {
    assert(phrase(Seq(1L -> "p q r", 2L -> "z z", 3L -> "q"), "q") ===
      Set((1L, 1L, 2L), (3L, 1L, 1L)))
  }

  test("phraseSearch with no matching documents is empty; empty phrase throws") {
    assert(phrase(Seq(1L -> "a b c"), "zz", "qq").isEmpty)
    val spark2 = spark
    import spark2.implicits._
    intercept[IllegalArgumentException] {
      Lexical.phraseSearch(Seq(1L -> "a").toDF("doc_id", "text"), Seq.empty)
    }
  }
}
