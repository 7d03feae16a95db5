package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.index.{Metric, StorageType, VectorIndexFlat}

/** Interleaved scalar-quantized-storage A/B on the index path: fp32 vs
  * SQ8 (int8) vs SQ4 (int4) — the [[ShapeAb]] design extended one rung
  * down the ladder. Question it answers honestly: on THIS runtime, does
  * the 4×/8× stored-byte saving survive the per-row dequantize the
  * declarative search path pays for per-row-scaled codes (the 16-bit
  * formats decode in-register; SQ decodes materialize an fp32 array per
  * row)? Both comparisons alternate within one JVM with order flipped
  * per rep, so a real storage-path effect separates from box state.
  *
  * `sbt "runMain graft.tools.SqAb [nv] [d] [nq] [k] [reps]"`
  */
object SqAb {
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
    val idx8 = VectorIndexFlat(spark, d, Metric.L2, StorageType.Int8)
    idx8.add(data)
    val idx4 = VectorIndexFlat(spark, d, Metric.L2, StorageType.Int4)
    idx4.add(data)
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
    val (m32a, m8) = AbHarness.run(
      "fp32 storage", () => run(idx32),
      "sq8  storage", () => run(idx8), reps, nq)
    println(f"ratio fp32/sq8: ${m32a / m8}%.2fx")
    val (m32b, m4) = AbHarness.run(
      "fp32 storage", () => run(idx32),
      "sq4  storage", () => run(idx4), reps, nq)
    println(f"ratio fp32/sq4: ${m32b / m4}%.2fx")
    idx32.reset(); idx8.reset(); idx4.reset()
    spark.stop()
  }
}
