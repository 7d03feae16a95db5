package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.index.VectorIndexFlat

/** Structured-Streaming operators.
  *
  * The reference's only streaming behavior is overlapped async search
  * (`/root/reference/src/MetalIndexFlat.mm:403-490`); the Spark-native
  * generalization is: the vector index is a static side, queries arrive as
  * a stream, each micro-batch runs the same plan as a synchronous search
  * (`foreachBatch`), so stream results ≡ batch results exactly — the
  * async≡sync contract carried over to streams.
  */
object StreamingOps {

  /** Streaming kNN: every micro-batch of (qid, qvec) rows is searched
    * against the static index and appended to `sink`.
    */
  def streamingKnn(index: VectorIndexFlat, queryStream: DataFrame, k: Int)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    queryStream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(index.search(batch, k), batchId)
      }

  /** Watermarked sliding-window aggregation over the events stream —
    * event-time windows + late-data handling (none of which exist in the
    * reference; declared per the extended-surface contract).
    */
  def eventsWindowedCounts(events: DataFrame,
                           window_ : String = "1 hour",
                           slide: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Convenience: run a memory-sink streaming query to completion over a
    * bounded source (availableNow) and return the collected table name.
    */
  def runToMemory(df: DataFrame, name: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
}
