package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Independent property checks for the round-15 audit/eval queries —
  * beyond the canonical-hash pin (regression + partitioning invariance)
  * and the DuckDB oracle (cross-engine), each test here recomputes the
  * statistic a DIFFERENT way on the driver and demands exact agreement,
  * so a bug that changed both engine outputs in lockstep would still be
  * caught.
  */
class QualityAuditSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(TestSpark.spark, sfDir)

  test("q_rolling_median ≡ driver brute force over collected order sequences") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val base = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("p"))
      .collect()
      .groupBy(_.getLong(0))
    val expected = base.flatMap { case (ck, rows) =>
      val seq = rows.sortBy(r =>
        (r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC)
          .toEpochMilli, r.getLong(1)))
      seq.indices.drop(6).map { i =>
        val win = (i - 6 to i).map(j => seq(j).getDecimal(3)).sortBy(identity)
        (ck, seq(i).getLong(1)) -> win(3).doubleValue()
      }
    }.toMap
    val got = q("q_rolling_median").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"median mismatch at $k") }
  }

  test("q_benford: shares sum to ~1e6, counts sum to the corpus, deviations tie out") {
    val rows = q("q_benford").collect()
    val nTotal = Tables(TestSpark.spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == nTotal)
    val shareSum = rows.map(_.getLong(2)).sum
    // 9 half-up roundings of exact fractions that sum to 1 → within 9/2 ulps of 1e6
    assert(math.abs(shareSum - 1000000L) <= 5, s"share_e6 sum $shareSum")
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3)) // dev = share - benford
    }
  }

  test("q_autocorr ≡ driver recomputation from the collected daily series") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(col("o_orderdate").cast(org.apache.spark.sql.types.DateType).as("d"))
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("rev"))
      .collect()
      .map(r => r.getDate(0).toLocalDate -> r.getDecimal(1)).toMap
    val expected = (1 to 7).flatMap { lag =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d.plusDays(lag)).map(y => (x, y))
      }
      val n = pairs.size.toDouble
      if (pairs.size < 2) None else {
        def s(f: ((java.math.BigDecimal, java.math.BigDecimal)) => java.math.BigDecimal) =
          pairs.map(f).reduce(_.add(_)).doubleValue()
        val sx = s(_._1); val sy = s(_._2)
        val sxy = s(p => p._1.multiply(p._2))
        val sxx = s(p => p._1.multiply(p._1))
        val syy = s(p => p._2.multiply(p._2))
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx > 0.0 && vy > 0.0) {
          val r = (n * sxy - sx * sy) / math.sqrt(vx * vy)
          Some(lag.toLong -> math.floor(r * 1e6 + 0.5).toLong)
        } else None
      }
    }.toMap
    val got = q("q_autocorr").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("q_label_noise: vote accounting is internally consistent") {
    val rows = q("q_label_noise").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val own = r.getInt(1); val pred = r.getInt(2)
      val predVotes = r.getLong(3); val nAgree = r.getLong(4)
      val suspect = r.getBoolean(5)
      assert(predVotes >= nAgree,
        "predicted class cannot have fewer votes than the own class")
      assert(predVotes >= 1L && predVotes <= 10L && nAgree <= 10L)
      assert(suspect == (pred != own))
      if (nAgree > 5L) assert(!suspect,
        "an absolute majority for the own label cannot be out-voted")
    }
  }

  test("q_eval_ndcg: bounded by the closed-form ideal, exact at full recall") {
    val rows = q("q_eval_ndcg").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) <= 29966114L)
      assert(r.getLong(2) == r.getLong(1) * 1000000L / 29966114L)
    }
    // the recall companion says which queries retrieved all ten exact
    // hits; a perfect-recall-and-order query must score nDCG = 1e6 iff
    // dcg hits the ideal
    rows.filter(_.getLong(1) == 29966114L).foreach(r => assert(r.getLong(2) == 1000000L))
  }

  test("q_mode_by_group ≡ driver argmax over the collected frequency table") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val freq = Tables(spark, sfDir, "orders")
      .groupBy(trunc(col("o_orderdate"), "month").as("m"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getDate(0))
    val expected = freq.map { case (m, rows) =>
      val best = rows.minBy(r => (-r.getLong(2), r.getString(1)))
      val total = rows.map(_.getLong(2)).sum
      m -> (best.getString(1), best.getLong(2),
        (best.getLong(2) * 2000000L + total) / (total * 2L))
    }
    val got = q("q_mode_by_group").collect()
      .map(r => r.getDate(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("q_k_anonymity: violation verdict matches class size; classes cover the corpus") {
    val rows = q("q_k_anonymity").collect()
    rows.foreach(r => assert(r.getBoolean(4) == (r.getLong(3) < 5L)))
    val nDocs = Tables(TestSpark.spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(3)).sum == nDocs)
  }

  test("Scan.holtLinear ≡ sequential reference; bounded-group contract enforced") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    val df = spark.range(0, 40)
      .select((col("id") % 2).as("g"), col("id").as("t"),
        (col("id") * col("id") % 17).cast(DoubleType).as("x"))
    val got = graft.ops.Scan.holtLinear(df, Seq("g"), Seq("t"), "x",
        alpha = 0.3, beta = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (_, grp) =>
      var l = 0.0; var b = 0.0
      grp.sortBy(_._2).zipWithIndex.foreach { case ((g, t, x), i) =>
        if (i == 0) { l = x; b = 0.0 }
        else {
          val lNew = 0.3 * x + (1.0 - 0.3) * (l + b)
          b = 0.1 * (lNew - l) + (1.0 - 0.1) * b
          l = lNew
        }
        assert(got((g, t)) == ((l, b)), s"holt state mismatch at ($g, $t)")
      }
    }
    val big = spark.range(0, 100)
      .select(lit(0L).as("g"), col("id").as("t"), col("id").cast(DoubleType).as("x"))
    val e = intercept[Exception] {
      graft.ops.Scan.holtLinear(big, Seq("g"), Seq("t"), "x", 0.3, 0.1,
        maxGroupRows = 50).collect()
    }
    assert(e.getMessage.contains("calendar-bounded"))
  }

  test("q7/q8: revenue positive and market share a valid e6 fraction") {
    val q7 = q("q7_volume_shipping").collect()
    assert(q7.nonEmpty)
    q7.foreach(r => assert(r.getDouble(3) > 0.0))
    val q8 = q("q8_market_share").collect()
    assert(q8.nonEmpty)
    q8.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000000L)
      assert(r.getDouble(1) <= r.getDouble(2))
    }
  }
}
