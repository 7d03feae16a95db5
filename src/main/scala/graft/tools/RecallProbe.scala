package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.SparkEntry
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val e = graft.Tables(spark, dir, "embeddings")
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label"))
      val ivf = Similarity.ivfKmeansTopK(vectors, queries, 10, 16, 4)
        .select(col("qid"), col("label"))
      val ivfC = ivf.join(exact, Seq("qid", "label")).groupBy("qid").count()
        .orderBy("qid").collect().map(r => (r.getLong(0), r.getLong(1)))
      println(s"$dir ivf_kmeans per-query common: ${ivfC.mkString(",")}")
      // LSH
      import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
      import org.apache.spark.ml.functions.array_to_vector
      val feat = e.select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
      val lsh = new BucketedRandomProjectionLSH().setBucketLength(2.0)
        .setNumHashTables(3).setSeed(42).setInputCol("features").setOutputCol("hashes")
      val model = lsh.fit(feat)
      val q = feat.filter(col("vec_id") < 8)
      val ann = Similarity.explodeHits(
        model.approxSimilarityJoin(q, feat, 20.0, "dist")
          .select(col("datasetA.vec_id").as("qid"), col("datasetB.vec_id").as("label"),
            (col("dist") * col("dist")).as("score"))
          .groupBy(col("qid"))
          .agg(graft.functions.topK(col("score"), col("label"), 10, ascending = true).as("hits")))
        .select(col("qid"), col("label"))
      val lshC = ann.join(exact, Seq("qid", "label")).groupBy("qid").count()
        .orderBy("qid").collect().map(r => (r.getLong(0), r.getLong(1)))
      println(s"$dir lsh per-query common: ${lshC.mkString(",")}")
      // approx distinct
      val ad = graft.Tables(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx"),
          countDistinct(col("o_custkey")).as("exact"))
        .orderBy("o_orderpriority").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2)))
      println(s"$dir approx_distinct: ${ad.mkString(",")}")
    }
    spark.stop()
  }
}
