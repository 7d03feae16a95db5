package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.operators.TopKBuffer

/** Catalyst-native fused kNN: the whole-operator form of the reference's
  * fused distance+top-k kernel (`/root/reference/shaders/fused_l2_topk.metal`
  * — per-chunk partial selection, merged afterwards).
  *
  * The logical node carries the (small, broadcastable) query batch as data;
  * the physical operator runs distance + k-bounded selection in one
  * primitive-loop pass over each vector partition, emitting ≤ nq·k partial
  * rows per partition directly as `InternalRow`s — no per-pair join row,
  * no encoder copy. The regular `TopKAgg` on top performs the final merge
  * (the analog of the fused kernel's SIMD-group-0 merge).
  */
case class KnnNode(
    child: LogicalPlan,
    queries: Seq[(Long, Array[Float])],
    k: Int,
    ascending: Boolean,
    innerProduct: Boolean,
    // 0 = fp32 child rows; 1 = f16 bits (array<short>); 2 = bf16 bits.
    // Reduced precision decodes per ELEMENT inside the distance loop —
    // the scan reads half the bytes and no fp32 array is ever
    // materialized (the J4/J5 analog of the reference's half-width GEMM
    // tiles, shaders/simdgroup_gemm.metal:262-370).
    decode: Int = 0,
    // constructor field, NOT a val: tree copies (optimizer rewrites) must
    // preserve the expression ids consumers already reference
    output: Seq[Attribute] = KnnNode.freshOutput())
  extends UnaryNode {

  // this node *produces* its attributes (they don't come from the child)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): KnnNode =
    copy(child = newChild)
}

object KnnNode {
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("qid", LongType, nullable = false)(),
    AttributeReference("id", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())
}

case class KnnPartialExec(
    output: Seq[Attribute],
    queries: Seq[(Long, Array[Float])],
    k: Int,
    ascending: Boolean,
    innerProduct: Boolean,
    decode: Int,
    child: SparkPlan)
  extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val bc = session.sparkContext.broadcast(queries.toArray)
    val kk = k
    val asc = ascending
    val ip = innerProduct
    val dec = decode
    child.execute().mapPartitions({ it =>
      val qs = bc.value
      val bufs = Array.fill(qs.length)(new TopKBuffer(kk, asc))
      it.foreach { row =>
        val id = row.getLong(0)
        val vec = row.getArray(1)
        val vn = vec.numElements()
        var qi = 0
        while (qi < qs.length) {
          val qv = qs(qi)._2
          val n = math.min(vn, qv.length)
          var acc = 0.0
          var j = 0
          // element decode inline (dec 1 = f16 bits, 2 = bf16 bits): the
          // half-width array is read straight from the scan's ArrayData.
          // dec is branched OUTSIDE the element loop — the fp32 serving
          // path keeps its original tight loop
          if (ip) {
            if (dec == 0)
              while (j < n) { acc += vec.getFloat(j).toDouble * qv(j).toDouble; j += 1 }
            else if (dec == 1)
              while (j < n) {
                acc += graft.functions.FloatBits.halfBitsToFloat(vec.getShort(j)).toDouble *
                  qv(j).toDouble; j += 1
              }
            else
              while (j < n) {
                acc += graft.functions.FloatBits.bf16BitsToFloat(vec.getShort(j)).toDouble *
                  qv(j).toDouble; j += 1
              }
          } else {
            if (dec == 0)
              while (j < n) {
                val d = vec.getFloat(j).toDouble - qv(j).toDouble; acc += d * d; j += 1
              }
            else if (dec == 1)
              while (j < n) {
                val d = graft.functions.FloatBits.halfBitsToFloat(vec.getShort(j)).toDouble -
                  qv(j).toDouble
                acc += d * d; j += 1
              }
            else
              while (j < n) {
                val d = graft.functions.FloatBits.bf16BitsToFloat(vec.getShort(j)).toDouble -
                  qv(j).toDouble
                acc += d * d; j += 1
              }
          }
          bufs(qi).insert(acc, id)
          qi += 1
        }
      }
      // UnsafeRow output: lets this node sit at the ROOT of a plan too
      // (e.g. a collect of the partials for a driver-side merge) — Spark's
      // byte-array collect path casts rows to UnsafeRow
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(output.map(_.dataType).toArray)
      bufs.iterator.zipWithIndex.flatMap { case (b, qi) =>
        val order = b.sortedIndices
        order.iterator.map { i =>
          proj(new GenericInternalRow(
            Array[Any](qs(qi)._1, b.labels(i), b.scores(i)))): InternalRow
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): KnnPartialExec =
    copy(child = newChild)
}

/** Plans [[KnnNode]]; attach with `spark.experimental.extraStrategies` or
  * via [[graft.GraftExtensions]].
  */
object KnnStrategy extends SparkStrategy {


  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnNode(child, queries, k, asc, ip, dec, out) =>
      KnnPartialExec(out, queries, k, asc, ip, dec, planLater(child)) :: Nil
    case _ => Nil
  }
}

object Knn {

  /** Register the strategy on a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(KnnStrategy)) {
      spark.experimental.extraStrategies = cur :+ KnnStrategy
    }
  }

  /** Fused partial-kNN DataFrame (qid, id, score) over a (id, vec)
    * DataFrame — apply `topK` grouped by qid on top for final results.
    */
  /** @param decode 0 = the vector column is fp32; 1/2 = f16/bf16 bits
    *         (array<short>), decoded per element inside the fused loop.
    */
  def partials(vectors: DataFrame, queries: Seq[(Long, Array[Float])],
               k: Int, ascending: Boolean, innerProduct: Boolean,
               decode: Int = 0): DataFrame = {
    val spark = vectors.sparkSession
    install(spark)
    GraftBridge.ofRows(spark,
      KnnNode(vectors.queryExecution.analyzed, queries, k, ascending,
        innerProduct, decode))
  }
}
