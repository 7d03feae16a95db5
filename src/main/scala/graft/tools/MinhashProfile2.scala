package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Phase-split profiling of [[Dedup.minhashDedup]] (local iteration aid). */
object MinhashProfile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val sh = time("1 shingle+checkpoint") {
      val x = Dedup.explodedShingles(docs).localCheckpoint(true)
      println("  sh rows: " + x.count()); x
    }
    val sigs = time("2 signatures") {
      val x = Dedup.signaturesFromShingles(sh, 8).localCheckpoint(true)
      println("  sig rows: " + x.count()); x
    }
    val cand = time("3 candidates") {
      val x = Dedup.candidatesFromSignatures(sigs, 8, 2).localCheckpoint(true)
      println("  cand rows: " + x.count()); x
    }
    time("4 jaccard verify") {
      println("  verified: " + Dedup.jaccardOnShingles(sh, cand).count())
    }
    spark.stop()
  }
}
