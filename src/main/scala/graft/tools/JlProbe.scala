package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** One-off recall probe for the JL-rerank composition: per-query top-10
  * overlap with exact brute force at several expand factors, sf0.01 and
  * sf0.1 — pins the `ann_jl_rerank` verdict threshold to measurement.
  */
object JlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
               else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val e = graft.Tables(spark, dir, "embeddings")
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label"))
      for (expand <- Seq(2, 4, 8)) {
        val jl = Similarity.jlRerankTopK(vectors, queries, 10, dIn = 64, dOut = 16, expand = expand)
          .select(col("qid"), col("label"))
        // left join from the query list so zero-overlap queries print as
        // 0 instead of silently vanishing
        val common = queries.select(col("qid")).distinct()
          .join(jl.join(exact, Seq("qid", "label")).groupBy("qid").count(),
            Seq("qid"), "left")
          .select(col("qid"), coalesce(col("count"), lit(0L)).as("count"))
          .orderBy("qid").collect().map(r => (r.getLong(0), r.getLong(1)))
        println(s"$dir expand=$expand per-query common: ${common.mkString(",")}")
      }
    }
    spark.stop()
  }
}
