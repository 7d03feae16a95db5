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

  /** Normalizes `events.ts` to session-TZ TIMESTAMP regardless of the
    * physical parquet type the generator happened to emit. Three cases have
    * been observed across testdata regenerations:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it unless
    *     `spark.sql.legacy.parquet.nanosAsLong` is set (a runtime SQL conf,
    *     so this reader sets it itself); the raw nanos Long is converted via
    *     integer division (a double division would lose precision above
    *     2^53 ns).
    *   - timestamp[us] without TZ annotation: Spark reads TIMESTAMP_NTZ,
    *     which `unix_micros`/`withWatermark` reject; cast to TIMESTAMP is
    *     value-exact under the pinned UTC session timezone.
    *   - TIMESTAMP: passes through.
    * `EventsContractSpec` asserts the post-read type is TimestampType so a
    * future re-type fails loudly in `sbt test` rather than in downstream
    * queries.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below (and StreamingOps.ensureEventTime) is
    // value-exact ONLY under a UTC session timezone; a session built
    // without the pin would silently shift every instant. Self-set it
    // here (runtime SQL conf, same pattern as nanosAsLong) so the read
    // boundary doesn't depend on every entrypoint remembering the config.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
}
