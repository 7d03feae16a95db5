package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join: build a Bloom filter over the SMALL side's
  * join keys, evaluate membership in the BIG side's scan stage, then run
  * the exact join on the survivors.
  *
  * The 100 TB story: a fact-dim join where the dim subset matches ~1% of
  * fact rows still SHUFFLES all fact rows under a plain shuffle join —
  * the filter moves that 99% discard from the reducer to the scan, so
  * shuffle bytes drop by the selectivity factor. (Spark's own runtime
  * row-level filtering has the same motivation; this is the explicit,
  * plannable form — the filter is built once and can be reused across
  * queries, which AQE's per-query runtime filter cannot.) False
  * positives (rate `fpp`) just ride through to the exact join and get
  * dropped there: the composition is row-identical to the plain join by
  * construction, which the oracle (`q_bloom_join`) verifies.
  *
  * The build side pays one aggregation job to size + fill the filter —
  * `expectedItems` skips the sizing count when the caller knows the
  * cardinality. The filter itself is O(-n·ln(fpp)/ln²2) bits regardless
  * of the big side's size (1.2 MB per million keys at 1%), serialized
  * into the plan like a broadcast.
  */
object BloomJoin {

  /** Serialized Bloom filter of `small`'s `key` column. */
  def buildFilter(small: DataFrame, key: String,
                  expectedItems: Long = 0L, fpp: Double = 0.01): Array[Byte] = {
    val n = if (expectedItems > 0) expectedItems else small.select(key).count()
    val bf = small.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The pruned join: big ⋈ small on `key`, with the bloom membership
    * test pushed into big's scan stage. Row-identical to
    * `big.join(small, key)`.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
                      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(small, key, expectedItems, fpp)
    big.filter(graft.functions.bloomMightContain(col(key), bytes)).join(small, key)
  }
}
