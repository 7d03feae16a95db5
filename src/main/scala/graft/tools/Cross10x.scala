package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Dedup, Similarity}

/** Engine-internal cross-plan verification at 10× scale for the four
  * queries whose DuckDB oracles are super-linear at that size and time out
  * (`tools/check10x.py` → ORACLE_TIMEOUT). For each, two INDEPENDENT plans
  * — different algorithms, different physical shapes — must produce the
  * same result on the 10× corpus:
  *
  *  - dedup_clusters: driver union-find vs the distributed min-label
  *    propagation loop (forced via smallEdgeLimit = 0);
  *  - dedup_keep_best: window row_number plan vs groupBy max_by plan;
  *  - dedup_embedding_cosine: self-kNN GEMM reduction vs the direct
  *    all-bounded-pairs expression plan (forced via directLimit);
  *  - knn_l2_batched: hash-residue batched GEMM vs the declarative
  *    crossJoin + TopKAgg plan vs single-shot GEMM — all three.
  *
  * Exact column equality (no rounding except where the public query
  * itself rounds) — the same bit-identical-paths claim the sf0.1 specs
  * pin, re-proven at 10×.
  */
object Cross10x {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var fails = 0

    /** Full-outer compare on key columns: both sides must have identical
      * rows (keys AND values). Returns (mismatches, rows). */
    def cmp(a: DataFrame, b: DataFrame, keys: Seq[String]): (Long, Long) = {
      val va = a.columns.filterNot(keys.contains)
      val rows = a.as("l").join(b.as("r"), keys, "full_outer").count()
      val matched = a.as("l").join(b.as("r"),
          keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _), "inner")
        .filter(va.map(c => col(s"l.$c") <=> col(s"r.$c")).foldLeft(lit(true))(_ && _))
        .count()
      (rows - matched, rows)
    }

    def check(name: String)(f: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (diff, rows) = f
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = diff == 0 && rows > 0
      if (!ok) fails += 1
      println(f"${if (ok) "OK  " else "FAIL"} $name: rows=$rows diff=$diff (${sec}%.1f s)")
    }

    val docs = Tables(spark, dir, "documents")
    val e = Tables(spark, dir, "embeddings")
    val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.select(col("vec_id").as("qid"), col("embedding").as("qv"))

    check("dedup_clusters: driver union-find == distributed min-label") {
      val a = Dedup.simhashClusters(docs, hammingMax = 2).localCheckpoint(true)
      val b = Dedup.simhashClusters(docs, hammingMax = 2, smallEdgeLimit = 0)
        .localCheckpoint(true)
      cmp(a, b, Seq("doc_id"))
    }

    check("dedup_keep_best: window row_number == groupBy max_by") {
      import org.apache.spark.sql.expressions.Window
      val cc = Dedup.simhashClusters(docs, hammingMax = 2)
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .localCheckpoint(true)
      val w = Window.partitionBy(col("cluster_id"))
      val winPlan = cc
        .withColumn("rn", row_number().over(
          w.orderBy(col("n_chars").desc, col("doc_id"))))
        .withColumn("n_cluster", count(lit(1)).over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("keep_doc"),
          col("n_chars").as("keep_chars"), col("n_cluster"))
      // independent plan: per-cluster max over the (n_chars, -doc_id)
      // total order — one shuffle, no window
      val aggPlan = cc.groupBy(col("cluster_id"))
        .agg(max(struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("best"),
          count(lit(1)).as("n_cluster"))
        .select(col("cluster_id"), (-col("best.nd")).as("keep_doc"),
          col("best.n_chars").as("keep_chars"), col("n_cluster"))
      cmp(winPlan, aggPlan, Seq("cluster_id"))
    }

    check("knn_l2_batched: batched GEMM == single GEMM (bit-exact) == expression (round-4)") {
      val a = Similarity.batchedTopK(vectors, queries, k = 5, batches = 4)
        .select(col("qid"), col("rank"), col("label"), col("score"))
        .localCheckpoint(true)
      val b = Similarity.bruteForceTopK(vectors, queries, k = 5)
        .select(col("qid"), col("rank"), col("label"), col("score"))
        .localCheckpoint(true)
      val c = Similarity.gemmTopK(vectors, queries, k = 5)
        .select(col("qid"), col("rank"), col("label"), col("score"))
        .localCheckpoint(true)
      // batched vs single-shot GEMM share the fp64 term order → bit-exact.
      val (d1, r1) = cmp(a, c, Seq("qid", "rank"))
      // the direct per-pair expression sums in a different order → scores
      // agree to fp64 roundoff (measured ≤ 4e-15); compare on the query's
      // public surface (labels, ranks, round-4 dist — what the sf0.1
      // DuckDB oracle verifies).
      def r4(df: DataFrame) = df.select(col("qid"), col("rank"), col("label"),
        round(col("score"), 4).as("dist"))
      val (d2, r2) = cmp(r4(a), r4(b), Seq("qid", "rank"))
      (d1 + d2, math.min(r1, r2))
    }

    check("dedup_embedding_cosine: self-kNN reduction == direct bounded pairs") {
      val va = vectors.select(col("id"), col("vec"))
      val a = Similarity.topCosinePairs(va, topN = 20).localCheckpoint(true)
      val b = Similarity.topCosinePairs(va, topN = 20, directLimit = Long.MaxValue)
        .localCheckpoint(true)
      cmp(a, b, Seq("rn"))
    }

    println(s"CROSS10X SUMMARY: ${if (fails == 0) "ALL OK" else s"$fails FAIL"}")
    spark.stop()
    if (fails > 0) sys.exit(1)
  }
}
