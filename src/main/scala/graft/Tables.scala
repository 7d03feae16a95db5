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
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong` is set.
    * That conf is a runtime SQL conf, so this reader sets it itself — callers
    * need no special session setup — and converts the raw nanos back to a
    * proper timestamp via integer division (a double division would lose
    * precision above 2^53 ns). If a future dataset ships `ts` as a real
    * timestamp, the long branch is skipped and the column passes through.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
}
