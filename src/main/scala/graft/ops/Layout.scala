package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for multi-dimensional pruning at scale.
  *
  * A 100 TB table sorted on ONE column prunes row groups only for
  * predicates on that column; a range query on any other column scans
  * everything. Z-ORDER clustering (bit-interleaving the dimensions —
  * Morton order, the technique behind Delta Lake's `OPTIMIZE ZORDER BY`
  * and every spatial index since Orenstein 1984) makes min/max pruning
  * work on ALL interleaved dimensions at once: sorting by the
  * interleaved value keeps rows close in EVERY dimension close in file
  * order, so each parquet row group's (min, max) footprint is a small
  * rectangle instead of a full-width slab.
  *
  * Everything here is exact integer arithmetic (shifts + masks) built
  * from the same formula on the Spark and DuckDB sides
  * ([[zorderSqlExpr]] — the `simhashBitSql` shared-arithmetic pattern),
  * so the operator is hash-oracled, not asserted.
  */
object Layout {

  /** Interleave the low `bits` of two non-negative long columns into a
    * Morton code: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. With bits ≤ 31 the result stays well inside a signed long.
    * Built as a balanced sum of shift/mask terms — plain Catalyst
    * integer expressions, codegen-friendly, no UDF.
    */
  def zorder2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms: Seq[Column] = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** The identical interleave as engine-portable SQL text over two
    * integer expressions — DuckDB `>>`/`<<`/`&`/`|` on BIGINT match
    * Spark's `shiftrightunsigned`/`shiftleft`/`bitwiseAND`/`bitwiseOR`
    * exactly for non-negative inputs, so the oracle reproduces the
    * Morton code bit-for-bit.
    */
  def zorderSqlExpr(aExpr: String, bExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31)
    (0 until bits).flatMap { i =>
      Seq(s"((($aExpr >> $i) & 1) << ${2 * i})",
        s"((($bExpr >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Fraction of `nBuckets` equal-count buckets of the `z`-sorted layout
    * that a predicate touches — the pruning measure a Z-ordered table
    * delivers physically (each bucket ≈ a file/row-group whose min/max
    * the reader consults). Computed exactly: bucket = ntile over z
    * order; a bucket is "touched" when ≥ 1 matching row falls in it.
    */
  def bucketsTouched(df: DataFrame, z: Column, pred: Column,
                     nBuckets: Int): Long = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__zb", ntile(nBuckets).over(Window.orderBy(z)))
      .filter(pred)
      .select(countDistinct(col("__zb")))
      .head.getLong(0)
  }
}
