package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Dedup

/** Phase-level profiling for the MinHash pipeline (local iteration aid). */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val sigs = time("signatures (materialize)") {
      val s = Dedup.minhashSignatures(docs).persist()
      s.count()
      s
    }
    val cand = time("band self-join -> candidates") {
      val bands = Dedup.lshBands(sigs)
      val a = bands.as("a"); val b = bands.as("b")
      val c = a.join(b, col("a.key") === col("b.key") && col("a.band") === col("b.band")
          && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared_bands"))
        .persist()
      println("candidates: " + c.count())
      c
    }
    import graft.ops.Dedup.{shingles3}
    val sh = time("sh materialize") {
      val x = docs.repartition(32)
        .select(col("doc_id"), shingles3(col("text")).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
        .persist()
      x.count()
      x
    }
    val inter = time("inter join") {
      val i = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
        .persist()
      println("inter rows: " + i.count())
      i
    }
    time("final assembly") {
      val counts = sh.groupBy("doc_id").agg(first("n_sh").as("n_sh"))
      val out = cand.join(inter, Seq("doc_a", "doc_b"))
        .join(counts.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), "doc_a")
        .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), "doc_b")
      println("final: " + out.count())
    }
    time("jaccard verification (full op)") {
      println("verified: " + Dedup.jaccardOnPairs(docs, cand).count())
    }
    spark.stop()
  }
}
