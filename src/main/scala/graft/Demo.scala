package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.index.{Metric, StorageType, VectorIndexFlat}

/** Smoke/demo main: drives the public API end-to-end on a local session —
  * the reference-parity semantics (sentinels, clamping, k<=0, async≡sync,
  * reduced-precision storage) observable from the outside.
  * `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(42)
    def vec(d: Int) = Array.fill(d)(rnd.nextFloat() * 2 - 1)
    val d = 16

    // -- build + search
    val idx = VectorIndexFlat(spark, d, Metric.L2)
    idx.add((0 until 100).map(_ => vec(d)))
    println(s"ntotal=${idx.ntotal}")

    val qSchema = StructType(Seq(
      StructField("qid", LongType), StructField("qvec", ArrayType(FloatType))))
    val queries = spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, vec(d)), Row(1L, vec(d))), qSchema)

    println("-- search k=3:")
    idx.search(queries, 3).orderBy("qid", "rank").show(false)

    println("-- k > ntotal (k=5 on a 3-vector index): expect 3 real + 2 sentinel rows")
    val tiny = VectorIndexFlat(spark, d, Metric.L2)
    tiny.add((0 until 3).map(_ => vec(d)))
    tiny.search(queries.limit(1), 5).orderBy("qid", "rank").show(false)

    println("-- empty index: expect all sentinel (label=-1, dist=Infinity)")
    val empty = VectorIndexFlat(spark, d, Metric.L2)
    empty.search(queries, 2).orderBy("qid", "rank").show(false)

    print("-- k=0: ")
    try { idx.search(queries, 0); println("NO EXCEPTION (BUG)") }
    catch { case e: IllegalArgumentException => println(s"throws as required: ${e.getMessage}") }

    println("-- async ≡ sync:")
    val sync = idx.search(queries, 4).orderBy("qid", "rank").collect()
    val async = idx.searchAsync(queries, 4).result()
    println(s"async==sync: ${sync.sameElements(async)}")

    println("-- f16 storage: reconstruct error vs fp32 original")
    val v0 = vec(d)
    val f16 = VectorIndexFlat(spark, d, Metric.L2, StorageType.Float16)
    f16.add(Seq(v0))
    val rec = f16.reconstruct(0L)
    val maxErr = v0.zip(rec).map { case (a, b) => math.abs(a - b) }.max
    println(s"f16 reconstruct max elem err = $maxErr (required <= 2e-3)")

    println("-- stateful streaming sessionization (2 micro-batches):")
    locally {
      import spark.implicits._
      import graft.streaming.{SessionEvent, StreamingOps}
      implicit val sqlCtx = spark.sqlContext
      val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
      val q = StreamingOps.streamingSessionize(stream.toDS(), gapUs = 1000L)
        .writeStream.format("memory").queryName("demo_sessions")
        .outputMode("append").start()
      // user 1: two sessions (gap at 5000); user 2: one long session
      stream.addData(SessionEvent(1, 1, 100), SessionEvent(1, 2, 600), SessionEvent(2, 3, 100))
      q.processAllAvailable()
      stream.addData(SessionEvent(1, 4, 5000), SessionEvent(2, 5, 900))
      q.processAllAvailable()
      q.stop()
      spark.table("demo_sessions").orderBy("user_id", "session_id").show(false)
      println("(open sessions remain in state — only closed sessions emit)")
    }

    println("-- IP metric search:")
    val ip = VectorIndexFlat(spark, d, Metric.InnerProduct)
    ip.add((0 until 50).map(_ => vec(d)))
    ip.search(queries.limit(1), 3).orderBy("qid", "rank").show(false)

    spark.stop()
  }
}
