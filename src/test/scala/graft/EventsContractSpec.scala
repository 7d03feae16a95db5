package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-boundary contract for the events table: whatever physical type the
  * testdata generator emits for `ts` — Long nanos (TIMESTAMP(NANOS) read
  * under nanosAsLong), timestamp[us] without TZ annotation (TIMESTAMP_NTZ),
  * or a proper TIMESTAMP — `Tables.events` must surface a session-TZ
  * TIMESTAMP column with identical instant values. Two silent testdata
  * regenerations (HUGEINT in r7, NTZ in r8) broke downstream queries; this
  * spec makes the next re-type fail loudly in `sbt test` instead.
  */
class EventsContractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("Tables.events normalizes ts to TimestampType on the real testdata") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType,
      s"events.ts must read as TIMESTAMP, got ${ev.schema("ts").dataType}")
    // and the events-time surface's core accessor must analyze
    assert(ev.select(expr("unix_micros(ts)")).limit(1).count() === 1L)
  }

  test("Tables.events yields identical instants for all three physical ts types") {
    import spark.implicits._
    val micros = Seq(0L, 1_000_000L, 1_700_000_000_123_456L)
    val base = java.nio.file.Files.createTempDirectory("graft-events-contract")

    // 1. Long column (what the nanosAsLong conf turns TIMESTAMP(NANOS) into)
    val longDir = s"$base/long"
    micros.map(us => (us * 1000L, 1L)).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(longDir)

    // 2. TIMESTAMP_NTZ (timestamp[us] without TZ annotation)
    val ntzDir = s"$base/ntz"
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(ntzDir)

    // 3. proper TIMESTAMP
    val tsDir = s"$base/ts"
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"), lit(1L).as("user_id"))
      .write.mode("overwrite").parquet(tsDir)

    def readMicros(dir: String): Seq[Long] = {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType === TimestampType, s"dir=$dir")
      ev.select(expr("unix_micros(ts)").as("us")).as[Long].collect().sorted.toSeq
    }

    // Tables.events expects <dir>/events.parquet — rename each output
    for (d <- Seq(longDir, ntzDir, tsDir)) {
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.move(p, p.resolveSibling(p.getFileName.toString + ".tmp"))
      java.nio.file.Files.createDirectory(p)
      java.nio.file.Files.move(p.resolveSibling(p.getFileName.toString + ".tmp"),
        p.resolve("events.parquet"))
    }

    val fromLong = readMicros(longDir)
    val fromNtz = readMicros(ntzDir)
    val fromTs = readMicros(tsDir)
    assert(fromLong === micros.sorted)
    assert(fromNtz === micros.sorted)
    assert(fromTs === micros.sorted)
  }
}
