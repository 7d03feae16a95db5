package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SqlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = { val s = TestSpark.spark; GraftExtensions.register(s); s }

  private def df = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = false), nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(
      Row(0L, Array(1f, 2f, 3f)), Row(1L, Array(4f, 5f, 6f)), Row(2L, Array(1f, 2f, 4f))),
      schema)
  }

  test("scalar functions callable from SQL") {
    df.createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT id, graft_norm_sq(v) AS n, graft_squared_l2(v, array(1.0f, 2.0f, 3.0f)) AS d,
        |       graft_dot(v, array(1.0f, 0.0f, 0.0f)) AS x
        |FROM t ORDER BY id""".stripMargin).collect()
    assert(r(0).getDouble(1) === 14.0)
    assert(r(0).getDouble(2) === 0.0)
    assert(r(2).getDouble(2) === 1.0)
    assert(r(1).getDouble(3) === 4.0)
  }

  test("quantize round-trip from SQL") {
    df.createOrReplaceTempView("t")
    val r = spark.sql(
      "SELECT graft_dequantize_f16(graft_quantize_f16(v)) AS rt FROM t WHERE id = 0")
      .collect().head.getSeq[Float](0)
    assert(r === Seq(1f, 2f, 3f)) // small ints are exact in half
  }

  test("graft_topk aggregate from SQL with padding") {
    df.createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT graft_topk(CAST(id AS DOUBLE), id, 5, true, true) AS hits FROM t""")
      .collect().head.getSeq[Row](0)
    assert(r.length === 5)
    assert(r.take(3).map(_.getLong(0)) === Seq(0L, 1L, 2L))
    assert(r.drop(3).forall(h => h.getLong(0) == -1L && h.getDouble(1).isPosInfinity))
  }

  test("graft_shingles from SQL") {
    val r = spark.sql(
      "SELECT graft_shingles(array('a','b','c','d','a','b','c','d'), 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(r === Seq("a b c", "b c d", "c d a", "d a b"))
  }

  test("graft_minhash / graft_simhash / graft_pairs from SQL") {
    val sig = spark.sql(
      "SELECT graft_minhash(array('a b c', 'b c d'), 8) AS sig")
      .collect().head.getSeq[String](0)
    assert(sig.length === 8 && sig.forall(_.length == 8))
    // matches the declarative min(substr(md5(seed || s), ...)) formulation
    val expect = spark.sql(
      """SELECT min(substr(md5(concat('0:', s)), 1, 8)) FROM
        |  (SELECT explode(array('a b c', 'b c d')) AS s)""".stripMargin)
      .head().getString(0)
    assert(sig.head === expect)

    val sh = spark.sql("SELECT graft_simhash(array('x', 'y', 'x'), 16) AS h")
      .head().getLong(0)
    assert(sh >= 0L && sh < (1L << 16))

    val pairs = spark.sql(
      """SELECT p.* FROM (SELECT array(named_struct('id', 1L, 'h', 10L),
        |  named_struct('id', 2L, 'h', 20L), named_struct('id', 3L, 'h', 30L)) AS b) t
        |LATERAL VIEW graft_pairs(b) p AS doc_a, ha, doc_b, hb""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("graft_top_ngram from SQL") {
    val r = spark.sql(
      "SELECT graft_top_ngram(array('a','b','a','b'), 2) AS t")
      .select("t.gram", "t.cnt").head()
    assert(r.getString(0) === "a b" && r.getInt(1) === 2)
    // below n tokens → null struct
    assert(spark.sql("SELECT graft_top_ngram(array('x'), 2) AS t")
      .head().isNullAt(0))
  }

  test("graft_jaro_winkler / graft_char_entropy from SQL") {
    val jw = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS jw")
      .head().getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
    // DuckDB-pinned empty edge
    assert(spark.sql("SELECT graft_jaro_winkler('', '') AS jw").head().getDouble(0) === 0.0)
    val h = spark.sql("SELECT graft_char_entropy('aabb') AS h").head().getDouble(0)
    assert(math.abs(h - math.log(2.0)) < 1e-12)
  }

  test("runtime registration works on a derived session") {
    val s2 = spark.newSession()
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_norm_sq(array(3.0f, 4.0f)) AS n").head().getDouble(0) === 25.0)
  }
}
