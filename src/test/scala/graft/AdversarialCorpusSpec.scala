package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Dedup, Skew}

/** Adversarial-corpus guard proofs (r6 verdict ask #5): the df caps,
  * quotient-graph collapse, and salting exist precisely for corpora where
  * one shingle is shared by ALL docs, one fingerprint by half of them, or
  * one join key by ~all fact rows. These specs build exactly those shapes
  * and assert the GUARDS — not the benign data — bound the work, by
  * counting the intermediate pair/edge/group rows the guarded plan
  * materializes (never wall time).
  */
class AdversarialCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(docs: Seq[(Long, String)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(docs.map { case (i, t) => Row(i, t) }: _*), schema)
  }

  /** 2000 docs all opening with the same 3-gram ("common boiler plate",
    * df = 2000) followed by a per-doc unique tail; docs (0,1), (2,3),
    * (4,5) are byte-identical — the planted true duplicates.
    */
  private def boilerplateCorpus(n: Int = 2000): Seq[(Long, String)] =
    (0 until n).map { i =>
      val u = if (i < 6) i / 2 else i // planted pairs share a tail
      (i.toLong, s"common boiler plate u${u}a u${u}b u${u}c")
    }

  test("ngramJaccardPairs: a df=2000 boilerplate shingle contributes ZERO join pairs under the cap") {
    val docs = docsDf(boilerplateCorpus())
    // Each doc has 4 distinct shingles; "common boiler plate" is hot
    // (df 2000). Uncapped, the equi-join would materialize
    // C(2000,2) = 1,999,000 pair rows from that one shingle alone.
    val raw = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), graft.functions.wordShingles(col("w"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
    val capped = Dedup.capShingleDf(raw, maxDf = 50).localCheckpoint(true)
    // the guard bound, asserted on actual intermediate rows: the capped
    // shingle equi-join materializes exactly the planted-overlap pairs
    // (3 identical pairs x 3 informative shingles each), not ~2e6
    val joinRows = capped.as("a").join(capped.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .count()
    assert(joinRows === 9L,
      s"capped join must touch only planted-overlap rows, got $joinRows")
    // end-to-end: exactly the three planted pairs, each exact (jaccard 1)
    val pairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5, maxDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(pairs === Set((0L, 1L, 3L, 1.0), (2L, 3L, 3L, 1.0), (4L, 5L, 3L, 1.0)))
  }

  test("contamination: hot n-gram on BOTH sides is dropped before the train x eval join") {
    val docs = docsDf(boilerplateCorpus())
    // eval 900 replays train doc 7 verbatim (true leak); eval 901 is pure
    // boilerplate — its only shingle is the hot one, train-side-dropped,
    // so it must contribute zero join rows AND zero reported overlap
    val evalDf = docsDf(Seq(
      900L -> "common boiler plate u7a u7b u7c",
      901L -> "common boiler plate"))
    // intermediate bound: train-side informative shingles of doc 7 are the
    // only grams shared with the eval set → exactly 3 join rows
    val tSh = Dedup.dropHotShingles(
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
        .select(col("doc_id"), graft.functions.wordShingles(col("w"), 3).as("sh"))
        .select(col("doc_id"), explode(col("sh")).as("s")), maxDf = 50)
    val eSh = Dedup.dropHotShingles(
      evalDf.select(col("doc_id").as("eval_id"), Dedup.tokens(col("text")).as("w"))
        .select(col("eval_id"), graft.functions.wordShingles(col("w"), 3).as("sh"))
        .select(col("eval_id"), explode(col("sh")).as("s")), maxDf = 50)
    assert(tSh.join(eSh, "s").count() === 3L)
    val cont = Dedup.contamination(docs, evalDf, n = 3, maxDf = 50)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getLong(2), r.getLong(3))).toMap
    assert(cont.size === 2000)
    // doc 7: 3 of its 4 distinct grams overlap (the hot one is excluded
    // from the intersection but kept in the denominator — a lower bound)
    assert(cont(7L) === ((Some(900L), 3L, 750000L)))
    assert(cont.filterNot(_._1 == 7L).values.forall(_._2 == 0L),
      "boilerplate-only overlap must never count as contamination")
  }

  test("simhashClusters: 1000 byte-identical docs are ONE quotient node, not 499500 hamming-0 edges") {
    val n = 2000
    val docs = docsDf((0 until n).map { i =>
      val text =
        if (i < n / 2) "the exact same template document repeated across half the corpus"
        else s"unique content w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h"
      (i.toLong, text)
    })
    val sims = Dedup.simhash(docs, 63).localCheckpoint(true)
    val distinctH = sims.select(col("simhash")).distinct().count()
    // the 1000 identical docs collapse to ONE fingerprint: quotient node
    // count is corpus/2 + 1 at most (unique docs may also collide)
    assert(distinctH <= (n / 2 + 1).toLong)
    // quotient edges: distinct fingerprints are never hamming-0 of each
    // other by construction, so the C(1000,2) = 499500 zero-distance doc
    // pairs contribute NO edges at all; assert the edge set the CC search
    // actually consumes stays tiny (only accidental near-collisions of
    // unique docs can appear)
    val quotient = sims.select(col("simhash").as("doc_id"), col("simhash")).distinct()
    val hEdges = Dedup.fingerprintPairs(quotient, hammingMax = 2)
    assert(hEdges.filter(col("hamming") === 0).count() === 0L)
    val nEdges = hEdges.count()
    assert(nEdges < 100L, s"quotient edge set must be ~empty, got $nEdges")
    // end-to-end: every template doc lands in cluster 0; clusters are
    // total (every doc labeled)
    val clusters = Dedup.simhashClusters(docs, hammingMax = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size === n)
    assert((0 until n / 2).forall(i => clusters(i.toLong) == 0L),
      "all template docs must share cluster 0")
  }

  test("saltedJoin/saltedSumCount: a 95%-hot key spreads over all salt buckets, rows exact") {
    val spark2 = spark
    import spark2.implicits._
    val buckets = 16
    val nFact = 100000
    val fact = (0 until nFact)
      .map(i => (if (i % 20 == 0) (i / 20).toLong % 50 else 7L, i.toLong))
      .toDF("key", "payload")
    val dim = (0L until 50L).map(k => (k, s"attr$k")).toDF("key", "attr")
    // spread proof on the stage-1 state (same salt formula as Skew):
    // the hot key's 95k rows must occupy every salt bucket, with no
    // bucket holding more than a modest factor over the even share —
    // i.e. the reducer-side group the raw join would put on ONE task is
    // provably split `buckets` ways
    val salted = fact.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col("key"), col("__salt")).count()
      .filter(col("key") === 7L)
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    val hotRows = fact.filter(col("key") === 7L).count()
    assert(salted.map(_._1).toSet.size === buckets, "hot key must hit every salt")
    assert(salted.map(_._2).max <= hotRows * 2 / buckets,
      "no salt bucket may hold more than ~2x the even share")
    // exactness: salted join ≡ plain join, row for row
    val plain = fact.join(dim, "key").select("key", "payload", "attr")
    val viaSalt = Skew.saltedJoin(fact, dim, "key", buckets).select("key", "payload", "attr")
    assert(viaSalt.count() === plain.count())
    assert(viaSalt.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(viaSalt).count() === 0L)
    // exactness: salted two-stage aggregation ≡ direct groupBy
    val direct = fact.groupBy("key").agg(sum("payload").as("sum_payload"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sc = Skew.saltedSumCount(fact, Seq("key"), col("payload"), "payload", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sc === direct)
  }
}
