package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1)
    // optional extra args: run only queries whose name is listed (local
    // iteration aid; the driver always passes exactly two args)
    val only = args.drop(2).toSet
    // Default matches the driver's config (local[32]) so a green builder
    // gate implies a green driver gate (r7 verdict: What's wrong #3).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // refuse to run the gate against silently re-typed testdata (r7/r8
    // both shipped red artifacts this way); throws with each changed
    // column named — see graft.tools.SchemaGate. Scoped to the driver's
    // canonical testdata: engine-replicated dirs (e.g. /tmp/sf1 from
    // tools.Replicate) are Spark-written and legitimately carry different
    // physical types than the driver's pyarrow files.
    if (sfDir.startsWith("/root/testdata")) graft.tools.SchemaGate.check(sfDir)
    new java.io.File(outDir).mkdirs()
    // a bounded pool overlaps independent queries (the CanonHashes
    // pattern): Spark schedules the concurrent jobs fairly across the
    // local[N] cores, and per-query wall at large replicas is dominated
    // by scan/shuffle stages that interleave well. Results are written
    // to disjoint paths, so concurrency cannot cross-wire outputs.
    // Scale-aware default (r16 ADVICE): several queries carry
    // driver-heavy stages (clampedScan/kendall collects, ~30 MB kNN
    // broadcasts, 32 MB bloom builds) whose peak driver memory
    // multiplies by the pool width — at replica dirs (anything outside
    // /root/testdata, e.g. /tmp/sf1, /tmp/sf10x) the default drops to 2
    // so six such peaks never coincide. SPARK_GRAFT_VERIFY_POOL still
    // overrides both ways.
    val defaultPool = if (sfDir.startsWith("/root/testdata")) "6" else "2"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_POOL", defaultPool).toInt)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val futs = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
        scala.concurrent.Future {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            failures.incrementAndGet()
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      }
    try futs.foreach(scala.concurrent.Await.result(_,
      scala.concurrent.duration.Duration.Inf))
    finally pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // nonzero exit on ANY per-query crash (r16 ADVICE): a crashed query
    // previously left a missing output dir under exit code 0, which a
    // harness can misread as "ran clean, result empty". The oracle json
    // is written first so a partial run is still comparable.
    if (failures.get() > 0) {
      System.err.println(s"[verify] ${failures.get()} query(ies) FAILED")
      sys.exit(1)
    }
  }
}
