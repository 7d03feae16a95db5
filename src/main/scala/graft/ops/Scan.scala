package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed prefix sum (parallel scan) — the scale-safe form of
  * `sum(...).over(Window.partitionBy(g).orderBy(o))`.
  *
  * Spark's window operator puts ONE group's entire ordered history on one
  * task: a global cumulative sum is a single-task stage, and a grouped one
  * stalls on its hottest group (one language ≈ half a pretraining corpus).
  * The classic fix is the two-pass scan (Blelloch 1990, "Prefix Sums and
  * Their Applications", CMU-CS-90-190 — the textbook parallel-scan
  * decomposition):
  *
  *   1. range-partition by (group, order) and sort within partitions —
  *      ONE shuffle, the same one the window formulation pays;
  *   2. pass 1 (narrow): per-partition, per-group partial sums — at most
  *      (#groups crossing a boundary + #partitions) rows, collected;
  *   3. driver: exclusive running offset per (partition, group) — O(P+G)
  *      work on P partitions and G groups;
  *   4. pass 2 (narrow): re-scan the SAME partitions, local running sum
  *      seeded with the broadcast offset.
  *
  * Each pass is embarrassingly parallel; no partition ever holds more
  * than its range share regardless of group skew. The partitioned frame
  * is eagerly localCheckpointed so both passes provably see identical
  * partition boundaries (range partitioning re-sampled between passes
  * could silently misalign the offsets).
  *
  * Driver state is O(P + G): right for few-or-moderate group counts with
  * possibly-huge groups (the hot case windows can't handle). For HUGE
  * group counts with small groups, the plain window is already safe
  * (per-key history is bounded) and cheaper — `require`-guarded here
  * rather than silently collecting millions of offsets.
  *
  * Reference semantics: faiss-metal's partial/merge selection
  * (MetalSelect.mm:55 — per-threadgroup partials merged to a final
  * result) applies the same decompose-offset-recombine shape to top-k;
  * this is the additive-scan analog for ordered analytics (sequence
  * packing, running totals).
  */
object Scan {

  /** Append `cumCol` = inclusive prefix sum of `valueCol` over rows
    * ordered by `orderCols` within each `groupCols` group (whole frame if
    * empty). `orderCols` must be a per-group total order (e.g. a unique
    * id) for the result to be well-defined — the same contract as any
    * deterministic window cumsum.
    */
  def prefixSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
                valueCol: String, cumCol: String = "cum",
                numParts: Int = 0, maxDriverEntries: Int = 1 << 20): DataFrame = {
    require(orderCols.nonEmpty, "prefixSum needs at least one order column")
    val spark = df.sparkSession
    val p = if (numParts > 0) numParts else spark.sparkContext.defaultParallelism
    val keyCols = (groupCols ++ orderCols).map(col)
    // one shuffle; eager checkpoint pins partition boundaries for BOTH passes
    val sorted = df.repartitionByRange(p, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .localCheckpoint(true)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val vIdx = schema.fieldIndex(valueCol)
    require(schema(vIdx).dataType == LongType,
      s"prefixSum sums LongType, got ${schema(vIdx).dataType} for $valueCol")
    def key(r: Row): Seq[Any] = gIdx.toSeq.map(r.get)

    // pass 1: per-(partition, group) totals, in first-seen (= sorted) order
    val partSums: Array[(Int, Seq[(Seq[Any], Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r => val k = key(r); sums.update(k, sums.getOrElse(k, 0L) + r.getLong(vIdx)) }
        Iterator.single((pid, sums.toSeq))
      }.collect()
    val nEntries = partSums.iterator.map(_._2.size).sum
    require(nEntries <= maxDriverEntries,
      s"prefixSum driver state $nEntries > $maxDriverEntries: too many (partition, group) " +
        "slices — with this many small groups the plain window cumsum is already skew-safe")

    // driver: exclusive offsets — running total per group across pids asc
    val running = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    val offsets: Map[(Int, Seq[Any]), Long] =
      partSums.sortBy(_._1).iterator.flatMap { case (pid, sums) =>
        sums.map { case (k, s) =>
          val off = running.getOrElse(k, 0L)
          running.update(k, off + s)
          ((pid, k), off)
        }
      }.toMap
    val bcast = spark.sparkContext.broadcast(offsets)

    // pass 2: local running sum seeded with this partition's group offsets
    val outSchema = StructType(schema.fields :+ StructField(cumCol, LongType, nullable = false))
    val out = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val local = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val k = key(r)
        val cum = local.getOrElse(k, bcast.value.getOrElse((pid, k), 0L)) + r.getLong(vIdx)
        local.update(k, cum)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark.createDataFrame(out, outSchema)
  }

  /** Sequence packing on the scan: concat-and-chop each group's token
    * stream (doc order) into fixed `seqLen`-token training sequences —
    * per doc its pack id and offset within the pack. Identical output to
    * the window formulation (`q_pack_sequences`), safe when one group is
    * half the corpus.
    */
  def packSequences(docs: DataFrame, seqLen: Int, groupCols: Seq[String] = Seq("lang")): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val counted = docs.select((groupCols :+ "doc_id").map(col) :+
      size(split(col("text"), " ", -1)).cast(LongType).as("n_tokens"): _*)
    prefixSum(counted, groupCols, Seq("doc_id"), "n_tokens")
      .select(col("doc_id") +: groupCols.map(col) :+ col("n_tokens") :+
        expr(s"(cum - n_tokens) div $seqLen").as("pack_id") :+
        ((col("cum") - col("n_tokens")) % seqLen).as("pack_offset"): _*)
  }
}
