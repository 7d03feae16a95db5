package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched per-partition transforms.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) with a deterministic fake that derives pseudo-features
  * from the bytes; everything Spark-side — schema, batching, partition
  * parallelism, the mapPartitions seam where a JNI/codec library would be
  * invoked once per batch rather than once per row — is real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false))), nullable = false)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** STUB decoder: a real implementation would hand `payloads` (one batch,
    * not one row) to an image/audio codec. The fake derives `dim` floats
    * from byte statistics so tests are deterministic. Accumulation is in
    * double with a single final float rounding — an order-insensitive
    * result (double roundoff never crosses a float rounding boundary
    * here), which lets a SQL oracle reproduce the features exactly.
    */
  def decodeBatchStub(payloads: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    payloads.map { bytes =>
      val acc = new Array[Double](dim)
      var i = 0
      while (i < bytes.length) {
        acc(i % dim) += (bytes(i) & 0xFF) / 255.0
        i += 1
      }
      val out = new Array[Float](dim)
      i = 0
      while (i < dim) { out(i) = acc(i).toFloat; i += 1 }
      out
    }

  /** Batched feature extraction over the binary column. Batches inside
    * each partition (batchSize rows per decoder call) — the shape a
    * Pandas-UDF/`mapInPandas` pipeline has in PySpark, here as
    * mapPartitions over grouped iterators: codec init once per partition,
    * vectorized calls per batch, streaming (never materializes a
    * partition).
    */
  def extractFeatures(media: DataFrame, dim: Int = 8, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .repartition(spark.sparkContext.defaultParallelism)
      .rdd.mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // one decoder invocation per batch — the expensive-init seam
          val feats = decodeBatchStub(batch.map(_.getAs[Array[Byte]]("payload")), dim)
          batch.lazyZip(feats).map { (row, f) =>
            Row(row.getLong(0), row.getAs[Array[Byte]]("payload").length.toLong,
              row.getString(2), f)
          }
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  /** Build a demo media table from the documents table (utf-8 bytes as the
    * "payload") — exercises the real binary-column path end-to-end.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))
}
