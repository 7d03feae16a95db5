package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerate the pinned canonical result hashes for EVERY declared
  * query at the smoke scale (r14 verdict ask #4): runs each
  * `SparkEntry.queries` entry at sf0.001, canonicalizes with [[Canon]]
  * (the driver gate's sort-by-name / 9-dp / row-sort shape) and writes
  * the name→hash map to `src/test/resources/canonical_hashes_sf0001.json`,
  * which `CanonicalHashSpec` asserts on every `sbt test`. Regenerate —
  * and EYEBALL the diff — only when a query's output is changed on
  * purpose:
  *
  *   sbt "runMain graft.tools.CanonHashes"
  *
  * Runs at the driver's config (local[32], 32 shuffle partitions) while
  * the spec re-hashes at local[4]/4 — so a pin that holds also proves
  * the result is partitioning-invariant.
  */
object CanonHashes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(
      "src/test/resources/canonical_hashes_sf0001.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // a bounded pool overlaps the many small jobs (the Verify pattern);
    // each query is independent
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futs = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      scala.concurrent.Future(name -> Canon.hash(fn(spark, sfDir)))
    }
    val hashes =
      try futs.map(scala.concurrent.Await.result(_, scala.concurrent.duration.Duration.Inf))
      finally pool.shutdown()

    val json = hashes
      .map { case (n, h) => s"""  "$n": "$h"""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), json)
    println(s"[canon] wrote ${hashes.size} hashes to $out")
    spark.stop()
  }
}
