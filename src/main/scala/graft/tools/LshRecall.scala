package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Soft-region LSH recall measurement (the degradation grid the reference
  * runs for its kernels across shapes — `/root/reference/tests/
  * test_metal_flat.mm:464-513` — applied to the MinHash-LSH operator where
  * ITS accuracy actually degrades: true-pair Jaccard below the S-curve
  * saturation point).
  *
  * Fixture: pairs of (base, mutated-replica) documents with EXACTLY known
  * shingle Jaccard. A base doc has n distinct words → n−2 distinct 3-word
  * shingles; replacing its last k words with fresh words leaves n−k−2
  * shared shingles of n+k−2 union → J = (n−k−2)/(n+k−2), solvable for any
  * target J. Every pair draws from its own disjoint vocabulary slice, so
  * cross-pair Jaccard is 0 and the ground-truth pair set is the
  * construction itself (independently re-derived below via
  * [[Dedup.prefixFilterPairs]], the exact operator).
  *
  * Measured: candidate recall of [[Dedup.candidatesFromSignatures]] per
  * J level for several (numHashes, rowsPerBand) configs, against the
  * theoretical S-curve P = 1 − (1 − J^r)^b.
  */
object LshRecall {

  /** n words per doc; k replaced → J = (n−k−2)/(n+k−2). */
  val docWords = 82

  val jLevels: Seq[(String, Int)] = Seq(
    // label -> k (replaced suffix words); exact J in the comment
    "0.95" -> 2,  // 78/82  = 0.9512
    "0.90" -> 4,  // 76/84  = 0.9048
    "0.80" -> 9,  // 71/89  = 0.7978
    "0.70" -> 14, // 66/94  = 0.7021
    "0.60" -> 20, // 60/100 = 0.6000
    "0.50" -> 27, // 53/107 = 0.4953
    "0.40" -> 34) // 46/114 = 0.4035

  def exactJ(k: Int): Double =
    (docWords - k - 2).toDouble / (docWords + k - 2).toDouble

  /** (docs, truth) — truth rows are (doc_a, doc_b, level). doc ids: base
    * pair p gets ids (2p, 2p+1). Deterministic (no RNG: vocabulary is
    * sequential unique words; md5-based MinHash scrambles them).
    */
  def corpus(spark: SparkSession, pairsPerLevel: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    var word = 0
    def fresh(n: Int): IndexedSeq[String] = {
      val ws = (word until word + n).map(i => s"w$i"); word += n; ws
    }
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val truth = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    var pairId = 0L
    for ((label, k) <- jLevels; _ <- 0 until pairsPerLevel) {
      val base = fresh(docWords)
      val replica = base.dropRight(k) ++ fresh(k)
      val (a, b) = (2 * pairId, 2 * pairId + 1)
      docs += ((a, base.mkString(" ")))
      docs += ((b, replica.mkString(" ")))
      truth += ((a, b, label))
      pairId += 1
    }
    (docs.toSeq.toDF("doc_id", "text"), truth.toSeq.toDF("doc_a", "doc_b", "level"))
  }

  /** recall per level for one LSH config. */
  def recalls(docs: DataFrame, truth: DataFrame, numHashes: Int,
              rowsPerBand: Int): Map[String, Double] = {
    val cand = Dedup.minhashCandidates(docs, numHashes, rowsPerBand)
      .select(col("doc_a"), col("doc_b"))
    val hit = truth.join(cand, Seq("doc_a", "doc_b"), "left_semi")
      .groupBy("level").agg(count(lit(1)).as("hits"))
    val tot = truth.groupBy("level").agg(count(lit(1)).as("n"))
    tot.join(hit, Seq("level"), "left")
      .select(col("level"), (coalesce(col("hits"), lit(0L)).cast("double") / col("n")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  def theory(j: Double, r: Int, b: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, r), b)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairsPerLevel = if (args.nonEmpty) args(0).toInt else 200
    val (docs, truth) = corpus(spark, pairsPerLevel)
    val d = docs.localCheckpoint(true)

    // ground truth re-derived with the EXACT operator: prefixFilterPairs at
    // tau=0.4 must return precisely the constructed pairs with J >= tau
    // (cross-pair J is 0 by construction, so nothing else may appear)
    val exact = Dedup.prefixFilterPairs(d, 0.4)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val nExact = exact.count()
    val nTruth = truth.count()
    val agree = truth.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
    println(s"[lsh-recall] constructed pairs=$nTruth  prefixFilterPairs(0.4)=$nExact  agree=$agree")
    require(nExact == nTruth && agree == nTruth,
      s"exact ground truth mismatch: constructed=$nTruth exact=$nExact agree=$agree")

    val configs = Seq((8, 2), (16, 2), (16, 4), (32, 4))
    println(f"| J (exact) | ${configs.map { case (h, r) => f"b=${h / r}%d,r=$r%d meas/theory" }.mkString(" | ")} |")
    println("|---|" + configs.map(_ => "---|").mkString)
    val meas = configs.map { case (h, r) => (h, r) -> recalls(d, truth, h, r) }.toMap
    for ((label, k) <- jLevels) {
      val j = exactJ(k)
      val cells = configs.map { case (h, r) =>
        f"${meas((h, r))(label)}%.3f / ${theory(j, r, h / r)}%.3f"
      }
      println(f"| $j%.3f | ${cells.mkString(" | ")} |")
    }
    spark.stop()
  }
}
