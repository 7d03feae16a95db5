package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One SparkSession shared across all suites in the test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Deterministic fixtures + in-process scalar oracle (the role CPU FAISS
  * plays in the reference's tests, `tests/test_metal_flat.mm:15-59`).
  */
object Oracle {
  /** Deterministic generator — fixed seed, uniform(-1, 1) like the
    * reference's `mt19937(42)` fixture (exact byte parity not required;
    * see FIXTURES.md §A).
    */
  def genVectors(n: Int, d: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(d)(rnd.nextFloat() * 2f - 1f))
  }

  /** Scalar brute-force kNN, fp64 accumulation, (dist, id) total order.
    * Returns per query: Array[(label, dist)] best-first, k entries,
    * sentinel-padded.
    */
  def bruteForceKnn(
      vectors: Array[Array[Float]],
      queries: Array[Array[Float]],
      k: Int,
      innerProduct: Boolean): Array[Array[(Long, Double)]] = {
    val sentinel =
      if (innerProduct) Double.NegativeInfinity else Double.PositiveInfinity
    queries.map { q =>
      val scored = vectors.zipWithIndex.map { case (v, i) =>
        var acc = 0.0
        var j = 0
        while (j < q.length) {
          if (innerProduct) acc += v(j).toDouble * q(j).toDouble
          else { val dd = v(j).toDouble - q(j).toDouble; acc += dd * dd }
          j += 1
        }
        (i.toLong, acc)
      }
      val sorted = scored.sortBy { case (id, dist) =>
        (if (innerProduct) -dist else dist, id)
      }
      val top = sorted.take(k)
      top ++ Array.fill(k - top.length)((-1L, sentinel))
    }
  }

  def queriesDf(spark: SparkSession, qs: Array[Array[Float]]): DataFrame = {
    val schema = StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("qvec", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rows = qs.zipWithIndex.map { case (q, i) => Row(i.toLong, q) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }
}
