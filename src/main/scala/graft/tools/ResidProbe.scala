package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** One-shot recall probe: raw-encoded vs residual-encoded IVFPQ at equal
  * parameters — prints per-query overlap with exact top-10 at sf0.01 and
  * sf0.1. Used to pick the `ann_ivfpq_residual` verdict thresholds.
  */
object ResidProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1"))
    for (dir <- dirs) {
      val e = graft.Tables(spark, dir, "embeddings")
      val vectors = e.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val exact = Similarity.bruteForceTopK(vectors, queries, 10, "l2")
        .select(col("qid"), col("label"))
      def common(df: org.apache.spark.sql.DataFrame): Array[(Long, Long)] =
        df.select(col("qid"), col("label")).join(exact, Seq("qid", "label"))
          .groupBy("qid").count().orderBy("qid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      // equal-budget comparison: trained codebook sized like the raw
      // modulo codebook (n/25), clamped to distinct-point limits inside
      val eq = math.max(8, (vectors.count() / 25L).toInt)
      for (np <- Seq(4, 8)) {
        val raw = common(Similarity.ivfPqTopK(vectors, queries, 10, 40, np, 25, 8))
        println(s"$dir cpus=$cpus np=$np ivfpq raw: sum=${raw.map(_._2).sum} ${raw.mkString(",")}")
        for (nc <- Seq(64, eq)) {
          val rkm = common(Similarity.ivfPqResidualTopK(vectors, queries, 10, 40, np, 25, 8,
            trainedNcent = nc))
          println(s"$dir cpus=$cpus np=$np ivfpq resid+km$nc: sum=${rkm.map(_._2).sum} ${rkm.mkString(",")}")
        }
      }
      val pqm = common(Similarity.pqTopK(vectors, queries, 10, 25, 8))
      println(s"$dir cpus=$cpus pq modulo: sum=${pqm.map(_._2).sum} ${pqm.mkString(",")}")
      for (nc <- Seq(48, math.min(256, eq))) {
        val pqk = common(Similarity.pqKmeansTopK(vectors, queries, 10, nc, 8))
        println(s"$dir cpus=$cpus pq kmeans$nc: sum=${pqk.map(_._2).sum} ${pqk.mkString(",")}")
      }
    }
    spark.stop()
  }
}
