package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-clock probe of the suite's heaviest queries ONE decade beyond the
  * sf1 correctness gate (r10 verdict item 5): run the named
  * `SparkEntry.queries` entries against a `Replicate`-generated directory
  * (10× = /tmp/sf1x, 100× = /tmp/sf10x) and print per-query seconds as a
  * single JSON line. The sf1→sf10 wall ratio per query is the strongest
  * in-sandbox evidence for the 100 TB design claims: a ratio ≲ 10× means
  * no hidden super-linear term (quadratic candidate set, driver state,
  * single-task hotspot) survived the decade.
  *
  * The timed action is a noop-sink write (the r14 honest protocol —
  * count() let the optimizer prune Window subtrees and join tails), so
  * ratios compare the FULL plan's work at both scales; the row count
  * rides the same write via an `Observation`.
  */
object HeavyTail10x {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1x")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_ktruss", "dedup_prefix_filter", "q_pagerank",
        "text_tfidf", "q_attribution_linear")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val results = names.map { n =>
      // timed action = noop-sink write (the r14 Bench protocol fix):
      // count() lets the optimizer prune cardinality-preserving work —
      // whole Window nodes, aggregate-unique left joins — so some
      // queries timed only their input scan. The row count rides the
      // SAME write via an observation (r14 ADVICE: a second count()
      // action re-executed every query, doubling the tool's runtime).
      val obs = org.apache.spark.sql.Observation(s"rows_$n")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir)
        .observe(obs, org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = obs.get("n").asInstanceOf[Long]
      println(f"$n%-28s $sec%9.2f s  ($rows rows)")
      (n, sec, rows)
    }
    val qjson = results.map { case (n, s, r) =>
      s""""$n":{"sec":${f"$s%.2f"},"rows":$r}""" }.mkString(",")
    println(s"""{"dir":"$dir","queries":{$qjson}}""")
    spark.stop()
  }
}
