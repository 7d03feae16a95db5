package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.index.{Metric, StorageType, VectorIndexFlat}

/** Interleaved fp32-vs-f16 STORAGE A/B on the medium-768d index path
  * (`VectorIndexFlat.search`, the BenchShapes measurement surface) —
  * the same design that settled the GEMM-path question in [[GemmAb]]:
  * both indexes built once over identical data, the two arms alternate
  * within one JVM with order flipped per rep, so a real storage-path
  * effect separates from box state. Motivated by the f16 cells of the
  * best-of-3 shapes table swinging 79→581 ms across full runs.
  *
  * `sbt "runMain graft.tools.ShapeAb [nv] [d] [nq] [k] [reps]"`
  */
object ShapeAb {
  def main(args: Array[String]): Unit = {
    val nv = args.lift(0).map(_.toInt).getOrElse(100000)
    val d = args.lift(1).map(_.toInt).getOrElse(768)
    val nq = args.lift(2).map(_.toInt).getOrElse(10)
    val k = args.lift(3).map(_.toInt).getOrElse(10)
    val reps = args.lift(4).map(_.toInt).getOrElse(12)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(d)(rnd.nextFloat() * 2f - 1f)
    val data = (0 until nv).map(_ => vec())
    val idx32 = VectorIndexFlat(spark, d, Metric.L2, StorageType.Float32)
    idx32.add(data)
    val idx16 = VectorIndexFlat(spark, d, Metric.L2, StorageType.Float16)
    idx16.add(data)
    val qSchema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val queries = spark.createDataFrame(
      java.util.Arrays.asList((0 until nq).map(i => Row(i.toLong, vec())): _*), qSchema)

    def run(idx: VectorIndexFlat): Double = {
      val t0 = System.nanoTime()
      idx.search(queries, k).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"shape nv=$nv d=$d nq=$nq k=$k reps=$reps (interleaved, order-flipped)")
    val (m32, m16) = AbHarness.run(
      "fp32 storage", () => run(idx32),
      "f16  storage", () => run(idx16), reps, nq)
    println(f"ratio fp32/f16: ${m32 / m16}%.2fx")
    idx32.reset(); idx16.reset()
    spark.stop()
  }
}
