package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Nsw, Similarity}

/** Consolidated ANN Pareto table — recall@10 vs ms/query vs coarse-scan
  * bytes/vector for every index tier at matched parameters on the
  * anisotropic fixture ([[AnisotropicEmbed]]), the engine's analog of
  * the reference's hardware/routing table (`README.md:22-29`): one
  * artifact a user reads to pick an index (r10 verdict ask).
  *
  * "scanB/vec" is the byte width the COARSE pass reads per corpus
  * vector — the quantity that governs 100 TB scan cost (d=64: fp32=256,
  * f16=128, 16-dim projections=64, SQ8=64, SQ4=32, PQ8 codes=8, sign
  * bits=8). IVF tiers scan only nProbe/nClusters of the corpus, shown
  * as an effective fraction of that width. Rerank stages touch only
  * k·expand rows per query — corpus-independent, so excluded from the
  * per-vector figure.
  *
  * Timing: median of 3 in-JVM runs after one untimed plan-warm run, on
  * nq=32 queries; divide by 32 for ms/query. Local wall numbers rank
  * the tiers against each other on this box — absolute values carry
  * the usual single-node caveats (BASELINE.md).
  *
  * args: [n] [tierPrefixes] — args(1), comma-separated name prefixes,
  * restricts the run (the r13 verdict's second measured point at
  * n=200k covers the routed tiers without paying a 5000-centroid
  * k-means or an NSW build over 200k nodes). Trained models are lazy
  * so a filtered run never trains what it doesn't time.
  */
object AnnPareto {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // '_' stands for ' ' in prefixes (sbt runMain args split on spaces)
    val only: Option[Seq[String]] =
      if (args.length > 1) Some(args(1).split(",").toSeq.map(_.replace('_', ' ')))
      else None
    val nq = 32
    val k = 10
    val all = AnisotropicEmbed.corpus(spark, n).localCheckpoint(true)
    val vectors = all.select(col("id"), col("vec")).localCheckpoint(true)
    val queries = all.filter(col("id") < nq)
      .select(col("id").as("qid"), col("vec").as("qv")).localCheckpoint(true)
    val exact = Similarity.bruteForceTopK(vectors, queries, k, "l2")
      .select(col("qid"), col("label")).localCheckpoint(true)
    val exactHits = exact.count().toDouble
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    // trained models and IVF indexes, built once outside any timed
    // region (lazy: a tier-filtered run never builds what its tiers
    // don't touch). IVF assignment is index BUILD (r14): timing it
    // inside the serve path re-pays n·nClusters·d FLOPs per rep —
    // invisible at 20k, ~50× the probed-fraction scan at 200k.
    lazy val pca16 = Similarity.trainPca(vectors, 16)
    lazy val jl16 = Similarity.PcaModel(Array.fill(64)(0.0),
      Similarity.jlMatrix(64, 16), explained = Array.empty, totalVar = 0.0)
    lazy val opq = Similarity.trainOpq(vectors, m = 8, ncent = 64)
    lazy val kmCents = Similarity.trainIvfKmeans(vectors, n / 40)
    lazy val ivfCents = Similarity.ivfModuloCents(vectors, 40)
    lazy val ivfFp = Similarity.ivfAssign(vectors, ivfCents)
    lazy val ivfS8 = Similarity.ivfAssign(vectors, ivfCents, "sq8")
    lazy val ivfS4 = Similarity.ivfAssign(vectors, ivfCents, "sq4")
    lazy val ivfKm = Similarity.ivfAssign(vectors, kmCents)
    // projection/f16 index payloads (r15: the coarse column is stored at
    // build, not recomputed per search — the same accounting as ivfAssign)
    lazy val f16Idx = Similarity.f16Assign(vectors)
    lazy val preIdx = Similarity.prefixAssign(vectors, 16)
    lazy val pcaIdx = Similarity.pcaAssign(vectors, pca16)
    lazy val jlIdx = Similarity.pcaAssign(vectors, jl16)

    val nClusters = (n / 40 + 1).toDouble
    def frac(nProbe: Int): Double = nProbe / nClusters

    case class Tier(name: String, scanB: Double, mk: () => DataFrame,
                    build: () => Unit = () => ())
    val tiers = Seq(
      Tier("flat fp32 (exact)", 256, () => Similarity.gemmTopK(vectors, queries, k)),
      Tier("f16 + rerank x4", 128,
        () => Similarity.f16ServeTopK(f16Idx, vectors, queries, k, 4),
        () => { f16Idx; () }),
      Tier("prefix16 + rerank x4", 64,
        () => Similarity.prefixServeTopK(preIdx, vectors, queries, k, 16, 4),
        () => { preIdx; () }),
      Tier("pca16 + rerank x4", 64,
        () => Similarity.pcaServeTopK(pca16, pcaIdx, vectors, queries, k, 4),
        () => { pcaIdx; () }),
      Tier("jl16 + rerank x4", 64,
        () => Similarity.pcaServeTopK(jl16, jlIdx, vectors, queries, k, 4),
        () => { jlIdx; () }),
      Tier("ivf fp32 p2", 256 * frac(2),
        () => Similarity.ivfServeTopK(ivfCents, ivfFp, queries, k, 2),
        () => { ivfFp; () }),
      Tier("ivf fp32 p4", 256 * frac(4),
        () => Similarity.ivfServeTopK(ivfCents, ivfFp, queries, k, 4),
        () => { ivfFp; () }),
      Tier("ivf-kmeans p2", 256 * frac(2),
        () => Similarity.ivfServeTopK(kmCents, ivfKm, queries, k, 2),
        () => { ivfKm; () }),
      Tier("ivf-sq8 p2", 64 * frac(2),
        () => Similarity.ivfServeTopK(ivfCents, ivfS8, queries, k, 2, "sq8"),
        () => { ivfS8; () }),
      Tier("ivf-sq4 p2", 32 * frac(2),
        () => Similarity.ivfServeTopK(ivfCents, ivfS4, queries, k, 2, "sq4"),
        () => { ivfS4; () }),
      Tier("pq8 (trained)", 8, () => Similarity.pqKmeansTopK(vectors, queries, k, 64, 8)),
      Tier("ivfpq-resid p2 + rerank x5", 8 * frac(2), () => Similarity.ivfPqResidualRerankTopK(
        vectors, queries, k, 40, 2, 25, 8, trainedNcent = 64, expand = 5)),
      Tier("opq8 (trained)", 8, () => Similarity.opqTopK(vectors, queries, k, opq)),
      Tier("opq8 + rerank x4", 8, () => Similarity.opqRerankTopK(vectors, queries, k, opq, 4)),
      Tier("ivf-opq p2", 8 * frac(2), () => Similarity.ivfOpqTopK(vectors, queries, k, 40, 2, opq)),
      Tier("hamming 1-bit", 8, () => Similarity.hammingTopK(vectors, queries, k)),
      Tier("hamming + rerank x4", 8, () => Similarity.hammingRerankTopK(vectors, queries, k, 4)),
      Tier("nsw graph (4 shards)", 256, () => Nsw.nswTopK(vectors, queries, k)))

    val selected = tiers.filter(t => only.forall(_.exists(t.name.startsWith)))
    println(f"[pareto] n=$n d=64 nq=$nq k=$k (anisotropic rank-24 fixture)" +
      only.map(p => s" tiers=${p.mkString(",")}").getOrElse(""))
    println("| tier | scanB/vec | recall@10 | ms/query |")
    println("|---|---|---|---|")
    selected.foreach { t =>
      // force the tier's index build OUTSIDE the timed region, then
      // snapshot: built indexes survive the sweep (p2/p4 share one),
      // while checkpoint leaks from the timed runs are still reclaimed
      t.build()
      val keepNow = keep ++ spark.sparkContext.getPersistentRDDs.keySet
      val recall = t.mk().select(col("qid"), col("label"))
        .join(exact, Seq("qid", "label")).count() / exactHits
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        t.mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = times.sorted.apply(1)
      println(f"| ${t.name} | ${t.scanB}%.1f | $recall%.3f | ${med * 1000 / nq}%.1f |")
      spark.sparkContext.getPersistentRDDs.foreach {
        case (id, r) => if (!keepNow(id)) r.unpersist(false)
      }
    }
    spark.stop()
  }
}
