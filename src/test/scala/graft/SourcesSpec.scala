package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet: CSV and JSON round-trips
  * with explicit schemas (the engine's ingest boundary — SURVEY §2.1 S5/S6
  * generalized to the formats Spark ships).
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def sample = {
    import org.apache.spark.sql.Row
    spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, "alpha", 1.5), Row(2L, "beta, with comma", -2.25),
      Row(3L, null, null), Row(4L, "delta \"quoted\"", 0.0)),
      schema)
  }

  test("CSV round-trip: quoting, nulls, explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq ===
      sample.orderBy("id").collect().toSeq)
  }

  test("JSON lines round-trip with schema enforcement") {
    val dir = Files.createTempDirectory("graft_json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("id").collect().toSeq ===
      sample.orderBy("id").collect().toSeq)
  }

  test("ORC round-trip: schema, nulls, predicate pushdown reaches the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("id").collect().toSeq ===
      sample.orderBy("id").collect().toSeq)
    // vectors too: ORC is the columnar alternative to parquet, so the
    // embedding column type must survive intact
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    import org.apache.spark.sql.Row
    val vdf = spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, Array(0.25f, -1.5f)), Row(1L, Array(3.0f, 0.125f))), vecSchema)
    val vdir = Files.createTempDirectory("graft_orc_vec").toString
    vdf.write.mode("overwrite").orc(vdir)
    assert(spark.read.orc(vdir).orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq ===
      Seq(Seq(0.25f, -1.5f), Seq(3.0f, 0.125f)))
    // filters push into the ORC scan like parquet (the 100 TB contract)
    val scan = spark.read.orc(dir).filter(col("id") > 2L)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("id"),
      s"ORC scan must carry pushed filters:\n$scan")
  }

  test("vector tables survive a JSON hop (array<float> fidelity)") {
    val dir = Files.createTempDirectory("graft_vec_json").toString
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false)))
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, Array(0.25f, -1.5f)), Row(1L, Array(3.0f, 0.125f))), vecSchema)
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(vecSchema).json(dir)
    // exact: the sample values are dyadic rationals, lossless in JSON text
    assert(back.orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq ===
      Seq(Seq(0.25f, -1.5f), Seq(3.0f, 0.125f)))
  }
}
