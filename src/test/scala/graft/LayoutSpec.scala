package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order (Morton) clustering: exact interleave arithmetic vs a scalar
  * reference, and the locality property the layout exists for — a range
  * predicate on EITHER dimension touches a small fraction of z-sorted
  * buckets, while a single-column sort serves only its own column.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zorder2 matches the scalar bit-interleave reference") {
    val spark2 = spark
    import spark2.implicits._
    def ref(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(5L)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), 16).as("z"))
      .collect().map(_.getLong(0))
    got.zip(cases).foreach { case (z, (a, b)) =>
      assert(z === ref(a, b, 16), s"($a, $b)")
    }
    // monotone containment sanity: interleaving 16+16 bits stays < 2^32
    assert(got.forall(z => z >= 0L && z < (1L << 32)))
  }

  test("physical files: a z-range-partitioned parquet write prunes files for BOTH dims; y-sorted reads everything for x") {
    val spark2 = spark
    import spark2.implicits._
    val grid = (for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y"), 8))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // 16 files, ONE per top-4-z-bit tile, via partitionBy on the exact
    // z-block — DETERMINISTIC file boundaries (repartitionByRange
    // samples its boundaries, which flaked this assertion twice in r15
    // under suite-parallel load). Each file is then exactly one 64×64
    // (x, y) tile of the grid, so an 8-wide x-slab intersects exactly
    // the 4 tiles of its x-block — and symmetrically for y — while the
    // y-sorted control still reads ALL 16 files for any x predicate.
    grid.withColumn("pf", (col("z") / 4096).cast("int"))
      .repartition(16, col("pf"))
      .write.mode("overwrite").partitionBy("pf").parquet(s"$base/zsorted")
    grid.repartitionByRange(16, col("y")).sortWithinPartitions("y")
      .write.mode("overwrite").parquet(s"$base/ysorted")
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name().as("f")).distinct().count()
    val xPred = col("x") >= 64 && col("x") < 72
    // y-sorted: every file holds all x values → all 16 files read
    assert(filesTouched(s"$base/ysorted", xPred) === 16L)
    // z-sorted: the x-slab lives in exactly the 4 files of one x-block
    // (file-level min/max stats on x exclude the other 12), same for y
    val zx = filesTouched(s"$base/zsorted", xPred)
    val zy = filesTouched(s"$base/zsorted", col("y") >= 192 && col("y") < 200)
    assert(zx === 4L, s"x-slab touched $zx of 16 z-sorted files")
    assert(zy === 4L, s"y-slab touched $zy of 16 z-sorted files")
  }

  test("z-sorted buckets prune range predicates on BOTH dimensions; a y-sorted layout serves only y") {
    val spark2 = spark
    import spark2.implicits._
    // full 256x256 grid, bits=8; 256 equal buckets of 256 rows each
    val grid = (for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)).toDF("x", "y")
      .withColumn("z", Layout.zorder2(col("x"), col("y"), 8))
    val n = 256
    // x-slab of width 8 = 1/32 of the space (2048 rows = ideal 8 buckets)
    val xPred = col("x") >= 64 && col("x") < 72
    val zTouchedX = Layout.bucketsTouched(grid, col("z"), xPred, n)
    val ySortTouchedX = Layout.bucketsTouched(grid, col("y"), xPred, n)
    // y-sorted layout: every y-bucket holds all x values → NO pruning
    assert(ySortTouchedX === n.toLong)
    // z-sorted: the slab concentrates in few buckets (≤ 4× the ideal 8)
    assert(zTouchedX <= n / 8, s"z-order touched $zTouchedX of $n for an x-slab")
    // and the SAME layout also prunes a y-slab — the whole point
    val yPred = col("y") >= 192 && col("y") < 200
    val zTouchedY = Layout.bucketsTouched(grid, col("z"), yPred, n)
    assert(zTouchedY <= n / 8, s"z-order touched $zTouchedY of $n for a y-slab")
    // rectangle predicate: both dims constrain → even fewer buckets
    val rect = xPred && col("y") >= 64 && col("y") < 96
    val zTouchedRect = Layout.bucketsTouched(grid, col("z"), rect, n)
    assert(zTouchedRect <= 8, s"rectangle touched $zTouchedRect buckets")
  }
}
