package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-provided TPC-H-ish test data
  * (`TESTDATA.md`). Every `SparkEntry.queries` entry reads through here so
  * scans stay plain parquet relations Catalyst can push filters/pruning
  * into.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * (see [[GraftSession]]); this reader converts the raw nanos back to a
    * proper timestamp via integer division (a double division would lose
    * precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
}
