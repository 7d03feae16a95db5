package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ops.Profile

/** Data-quality operators: profile statistics (incl. nulls) and each
  * constraint type's violation counting, against hand-computed truth.
  */
class ProfileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("x", DoubleType, nullable = true),
    StructField("s", StringType, nullable = true)))

  private def df(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private def fixture = df(
    Row(1L, 10.0, "a"),
    Row(2L, -5.0, "b"),
    Row(2L, 7.5, null), // dup key, null string
    Row(null, null, "zz"), // null key + numeric
    Row(4L, 100.0, "q"))

  test("profile: non-null/distinct counts, typed min/max, null slots") {
    val got = Profile.profile(fixture, numericCols = Seq("k", "x"),
        stringCols = Seq("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("k", "x", "s"))
    val k = got("k")
    assert(k.getLong(1) === 4L && k.getLong(2) === 3L) // nonnull, distinct
    assert(k.getDouble(3) === 1.0 && k.getDouble(4) === 4.0)
    assert(k.isNullAt(5) && k.isNullAt(6))
    val x = got("x")
    assert(x.getLong(1) === 4L && x.getLong(2) === 4L)
    assert(x.getDouble(3) === -5.0 && x.getDouble(4) === 100.0)
    val s = got("s")
    assert(s.getLong(1) === 4L && s.getLong(2) === 4L)
    assert(s.isNullAt(3) && s.isNullAt(4))
    assert(s.getString(5) === "a" && s.getString(6) === "zz")
  }

  test("runChecks counts violations per constraint type") {
    val got = Profile.runChecks(fixture, Seq(
        Profile.Unique("u", Seq("k")),
        Profile.Complete("c", "x"),
        Profile.InRange("r", "x", 0.0, 50.0),
        Profile.InSet("d", "s", Seq("a", "b"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // Unique: 5 rows − 3 non-null distinct k = 2 (COUNT(DISTINCT)
    // ignores nulls in BOTH engines, so every null-key row violates —
    // the right reading for a PK check: a key must be non-null unique)
    // Complete: one null x → 1
    // InRange [0,50]: -5.0, null, 100.0 → 3
    // InSet {a,b}: null, zz, q → 3
    assert(got.toSeq === Seq(("c", 1L, false), ("d", 3L, false),
      ("r", 3L, false), ("u", 2L, false)))
  }

  test("runChecks passes on clean data and on an empty table") {
    val clean = Profile.runChecks(fixture.filter("k = 1"), Seq(
        Profile.Unique("u", Seq("k")), Profile.Complete("c", "x")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(clean.toSeq === Seq(("c", 0L, true), ("u", 0L, true)))
    val empty = Profile.runChecks(fixture.filter("k = -999"), Seq(
        Profile.Complete("c", "x")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(empty.toSeq === Seq(("c", 0L, true)))
  }

  test("ksDrift == hand-computed two-sample KS statistic") {
    // A = {1,2,3}, B = {2,3,4,5} → D at v=3: |1 − 2/4| = 0.5
    val rows = Seq(1.0 -> "A", 2.0 -> "A", 3.0 -> "A",
      2.0 -> "B", 3.0 -> "B", 4.0 -> "B", 5.0 -> "B")
      .zipWithIndex.map { case ((x, g), i) => Row(i.toLong, x, g) }
    val r = Profile.ksDrift(df(rows: _*), "x", "s", "A", "B").head
    assert((r.getLong(0), r.getLong(1)) === ((3L, 4L)))
    assert(r.getDouble(2) === 0.5)
  }

  test("ksDrift: identical samples → 0, disjoint samples → 1, empty side throws") {
    val same = Seq(1.0, 2.0, 3.0).flatMap(x => Seq(x -> "A", x -> "B"))
      .zipWithIndex.map { case ((x, g), i) => Row(i.toLong, x, g) }
    assert(Profile.ksDrift(df(same: _*), "x", "s", "A", "B")
      .head.getDouble(2) === 0.0)
    val disj = (Seq(1.0 -> "A", 2.0 -> "A") ++ Seq(9.0 -> "B", 8.0 -> "B"))
      .zipWithIndex.map { case ((x, g), i) => Row(i.toLong, x, g) }
    assert(Profile.ksDrift(df(disj: _*), "x", "s", "A", "B")
      .head.getDouble(2) === 1.0)
    intercept[IllegalArgumentException] {
      Profile.ksDrift(df(Row(1L, 1.0, "A")), "x", "s", "A", "B")
    }
  }

  test("psiDrift == scalar PSI incl. the both-empty buckets' smoothed terms") {
    // two halves by time (pivot = 50): A = {0,0,0,9}, B = {0,9,9};
    // range [0,9], 10 buckets → only buckets 0 and 9 are populated,
    // buckets 1..8 are empty on BOTH sides yet still contribute their
    // Laplace term (1/(4+10) vs 1/(3+10) differs since n_a != n_b)
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("tu", LongType, nullable = false)))
    val rows = Seq(0.0, 0.0, 0.0, 9.0).map(v => Row("g", v, 0L)) ++
      Seq(0.0, 9.0, 9.0).map(v => Row("g", v, 100L))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val r = Profile.psiDrift(df, "v", "tu", "g", buckets = 10).head
    assert((r.getLong(1), r.getLong(2)) === ((4L, 3L)))
    def term(fa: Long, fb: Long): BigDecimal = {
      val pa = (fa + 1).toDouble / 14; val pb = (fb + 1).toDouble / 13
      BigDecimal((pa - pb) * math.log(pa / pb))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val populated = term(3, 1) + term(1, 2)
    val full = populated + term(0, 0) * 8
    assert(r.getLong(3) === math.floor(full.toDouble * 1e6 + 0.5).toLong)
    // the empty-bucket terms are real contributions, not noise
    assert(full > populated)
  }

  test("jsDrift == scalar JS; bounded by ln 2; zero on identical halves; symmetric") {
    val schema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("tu", LongType, nullable = false)))
    // same fixture as the PSI spec: A = {0,0,0,9}, B = {0,9,9}
    val rows = Seq(0.0, 0.0, 0.0, 9.0).map(v => Row("g", v, 0L)) ++
      Seq(0.0, 9.0, 9.0).map(v => Row("g", v, 100L))
    val df1 = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val r = Profile.jsDrift(df1, "v", "tu", "g", buckets = 10).head
    assert((r.getLong(1), r.getLong(2)) === ((4L, 3L)))
    def term(fa: Long, fb: Long): BigDecimal = {
      val pa = (fa + 1).toDouble / 14; val pb = (fb + 1).toDouble / 13
      val m = (pa + pb) / 2.0
      BigDecimal((pa * math.log(pa / m) + pb * math.log(pb / m)) * 0.5)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }
    val full = term(3, 1) + term(1, 2) + term(0, 0) * 8
    assert(r.getLong(3) === math.floor(full.toDouble * 1e6 + 0.5).toLong)
    assert(r.getLong(3) > 0L && r.getLong(3) <= math.floor(math.log(2.0) * 1e6 + 0.5).toLong)
    // identical halves → js = 0 exactly (pa == pb ⇒ m == pa, ln 1 = +0)
    val same = Seq(0L, 100L).flatMap(t =>
      Seq(1.0, 2.0, 5.0, 9.0).map(v => Row("g", v, t)))
    val r0 = Profile.jsDrift(
      spark.createDataFrame(java.util.Arrays.asList(same: _*), schema),
      "v", "tu", "g", buckets = 10).head
    assert(r0.getLong(3) === 0L)
    // symmetric in the halves: flipping which side is "first" flips
    // (n_a, n_b) but not js — PSI's asymmetric log-ratio weighting is
    // exactly what JS removes
    val flipped = rows.map(row =>
      Row(row.getString(0), row.getDouble(1), 100L - row.getLong(2)))
    val rf = Profile.jsDrift(
      spark.createDataFrame(java.util.Arrays.asList(flipped: _*), schema),
      "v", "tu", "g", buckets = 10).head
    assert((rf.getLong(1), rf.getLong(2)) === ((3L, 4L)))
    assert(rf.getLong(3) === r.getLong(3))
  }

  test("riCheck counts orphans and null child keys") {
    val child = fixture.select("k")
    val parent = df(Row(1L, 0.0, "p"), Row(2L, 0.0, "p"))
    val got = Profile.riCheck("ri", child, "k", parent, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // orphans: 4L and the null key row → 2
    assert(got.toSeq === Seq(("ri", 2L, false)))
  }
}
