package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** One-off probe: PCA-rerank recall + spectral diagnostics at both SFs.
  * Not part of the gate — the numbers inform the `ann_pca_rerank`
  * verdict threshold recorded in SparkEntry.
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val model = Similarity.trainPca(vectors, 16)
      println(s"[$sf] explained=${model.explained.take(4).map(x => f"$x%.4f").mkString(",")}.. " +
        f"sumTop16=${model.explained.sum}%.4f total=${model.totalVar}%.4f " +
        f"ratio=${model.explained.sum / model.totalVar}%.4f")
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label"))
      for (expand <- Seq(2, 4)) {
        val pca = Similarity.pcaRerankTopK(vectors, queries, 10, model, expand)
        val ov = pca.select(col("qid"), col("label")).join(exact, Seq("qid", "label"))
          .groupBy(col("qid")).agg(count(lit(1)).as("n_common"))
          .orderBy("qid").collect()
        println(s"[$sf] expand=$expand overlap=" + ov.map(r => r.getLong(1)).mkString(","))
      }
      // prefix comparison at the same kept width
      val pre = Similarity.prefixRerankTopK(vectors, queries, 10, 16, 4)
      val ovP = pre.select(col("qid"), col("label")).join(exact, Seq("qid", "label"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_common"))
        .orderBy("qid").collect()
      println(s"[$sf] prefix16 expand=4 overlap=" + ovP.map(r => r.getLong(1)).mkString(","))
    }
    spark.stop()
  }
}
