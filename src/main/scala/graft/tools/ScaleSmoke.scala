package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** 10× scale smoke for the guards added in rounds 2-4 (df cap,
  * auto-batching, cost gates, quotient CC, blacklist anti-join): no sf1
  * testdata exists, so the sf0.1 corpus is replicated `mult` times with
  * DISJOINT id ranges and per-replica letter rotation — the rotation
  * decorrelates shingles across replicas, so each replica contributes its
  * own duplicate structure and the true workload scales ~linearly (the
  * honest model of a corpus 10× the size, unlike naive replication, which
  * would multiply every duplicate GROUP by the factor and measure a
  * quadratic workload no real corpus has).
  *
  * Embeddings are replicated with per-replica scaling (cosine structure
  * preserved) — the ANN/self-kNN paths see a genuine 10× corpus.
  *
  * Prints per-operator wall seconds; compare against the sf0.1 bench to
  * confirm ≲ linear scaling (the gates firing is visible as the absence
  * of a blowup: the pre-r4 window df-cap, for instance, scaled the
  * decontamination query super-linearly on hot shingles).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      r
    }

    val letters = "etaoinshr"
    def rot(i: Int): String = {
      val k = i % letters.length
      letters.substring(k) + letters.substring(0, k)
    }
    val docs0 = graft.Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
    val docs = (0 until mult).map { i =>
      docs0.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        translate(col("text"), letters, rot(i)).as("text"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"docs: ${docs.count()} (${mult}x)")

    time("dedup_minhash") { Dedup.minhashDedup(docs).count() }
    time("ngram_jaccard (df-capped)") {
      Dedup.ngramJaccardPairs(docs.filter(col("doc_id") % 4 === 0), 0.5).count()
    }
    time("decontaminate (blacklist df-cap)") {
      Dedup.contamination(docs.filter(col("doc_id") % 7 =!= 0),
        docs.filter(col("doc_id") % 7 === 0)).count()
    }
    time("simhash_clusters (quotient CC)") { Dedup.simhashClusters(docs).count() }

    val emb0 = graft.Tables(spark, sf, "embeddings")
    val vecs = (0 until mult).map { i =>
      emb0.select((col("vec_id") + lit(i.toLong * 1000000000L)).as("id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(i.toFloat) * lit(0.05f))).as("vec"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"vectors: ${vecs.count()} (${mult}x)")

    time("topCosinePairs (self-kNN path)") { Similarity.topCosinePairs(vecs, 20).count() }
    time("bulk self-kNN (hash-batched)") {
      Similarity.gemmTopK(vecs,
        vecs.select(col("id").as("qid"), col("vec").as("qv")), 10,
        maxQueries = 2000).count()
    }
    val queries = vecs.filter(col("id") < 8)
      .select(col("id").as("qid"), col("vec").as("qv")).localCheckpoint(true)
    time("pqTopK (codes+ADC)") {
      Similarity.pqTopK(vecs, queries, 10, centroidModulo = 250).count()
    }
    time("ivfPqTopK (prune x codes)") {
      Similarity.ivfPqTopK(vecs, queries, 10,
        ivfModulo = 400, nProbe = 2, pqModulo = 250).count()
    }
    time("hammingTopK (1-bit)") { Similarity.hammingTopK(vecs, queries, 10).count() }
    time("hammingRerankTopK") { Similarity.hammingRerankTopK(vecs, queries, 10).count() }
    spark.stop()
  }
}
