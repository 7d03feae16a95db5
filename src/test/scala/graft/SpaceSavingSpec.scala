package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.spaceSavingHH
import graft.operators.SpaceSavingBuffer

/** SpaceSaving sketch invariants on adversarial (zipf) data, for every
  * partition structure: est >= true, est - err <= true, and every item
  * with true count > n/capacity is tracked (Metwally et al. 2005;
  * mergeability per Agarwal et al. 2012).
  */
class SpaceSavingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // zipf-ish stream: item i (1..120) appears ceil(600/i) times
  private val stream: Seq[String] = (1 to 120).flatMap { i =>
    Seq.fill((600 + i - 1) / i)(f"item$i%03d")
  }
  private val truth: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private val n = stream.size.toLong

  private def checkInvariants(rows: Seq[(String, Long, Long)], cap: Int): Unit = {
    rows.foreach { case (item, est, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item: est $est must overestimate true $t")
      assert(est - err <= t, s"$item: est-err ${est - err} must lower-bound $t")
    }
    val tracked = rows.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (t > n / cap)
        assert(tracked(item), s"heavy item $item (true $t > ${n / cap}) must be tracked")
    }
    assert(rows.size <= cap)
  }

  test("driver buffer: invariants hold through updates and an upper-bound merge") {
    val cap = 20
    val (a, b) = stream.splitAt(stream.size / 3)
    val b1 = new SpaceSavingBuffer(cap); a.foreach(b1.update)
    val b2 = new SpaceSavingBuffer(cap); b.foreach(b2.update)
    b1.mergeIn(b2)
    checkInvariants(b1.sorted, cap)
    // single-buffer (no merge) pass too
    val b3 = new SpaceSavingBuffer(cap); stream.foreach(b3.update)
    checkInvariants(b3.sorted, cap)
  }

  test("distributed sketch: invariants hold at every partition count") {
    val spark2 = spark
    import spark2.implicits._
    val cap = 20
    for (parts <- Seq(1, 3, 8)) {
      val df = stream.toDF("item").repartition(parts)
      val rows = df.agg(spaceSavingHH(col("item"), cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      checkInvariants(rows.toSeq, cap)
      // output is sorted est desc, item asc
      assert(rows.toSeq == rows.sortBy { case (k, c, _) => (-c, k) }.toSeq)
    }
  }

  test("streaming sketch: invariants hold at every micro-batch boundary, state stays capped") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val cap = 20
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val out = graft.streaming.StreamingOps.streamingHeavyHitters(
      in.toDF().withColumnRenamed("value", "item"), "item", cap)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    try {
      // three uneven micro-batches; after each, the CURRENT sketch must
      // satisfy the invariants against the prefix-truth so far
      val cuts = Seq(stream.size / 5, stream.size / 2, stream.size)
      var done = 0
      cuts.foreach { cut =>
        in.addData(stream.slice(done, cut)); done = cut
        q.processAllAvailable()
        val prefix = stream.take(cut)
        val pTruth = prefix.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val rows = spark.table("hh_stream")
          .select(explode(col("hh")).as("e"))
          .select(col("e.item"), col("e.est"), col("e.err"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        assert(rows.size <= cap, "state must stay capped at every boundary")
        rows.foreach { case (item, est, err) =>
          val t = pTruth.getOrElse(item, 0L)
          assert(est >= t, s"$item@$cut: est $est < true $t")
          assert(est - err <= t, s"$item@$cut: est-err ${est - err} > true $t")
        }
        val tracked = rows.map(_._1).toSet
        pTruth.foreach { case (item, t) =>
          if (t > cut / cap) assert(tracked(item), s"heavy $item@$cut must be tracked")
        }
      }
    } finally q.stop()
  }

  test("windowed streaming heavy hitters == exact per-window counts when capacity covers items") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-win").toString
    events.write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(events.schema).parquet(dir)
    val agg = graft.streaming.StreamingOps.streamingWindowedHeavyHitters(
      streamIn, "event_type", capacity = 10)
    val q = graft.streaming.StreamingOps.runToMemory(agg, "hh_win")
    q.awaitTermination(60000)
    val got = spark.table("hh_win")
      .select(col("window_start"), explode(col("hh")).as("e"))
      .select(col("window_start"), col("e.item"), col("e.est"))
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2))).toMap
    // capacity (10) ≥ distinct event types (3): the sketch degenerates to
    // exact counts, so every per-window entry must equal the batch truth
    val want = events
      .groupBy(window(col("ts"), "1 hour", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => ((r.getTimestamp(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("capacity >= distinct items degenerates to exact counts") {
    val spark2 = spark
    import spark2.implicits._
    val rows = stream.toDF("item").repartition(5)
      .agg(spaceSavingHH(col("item"), 200).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === truth.size)
    rows.foreach { case (item, est, err) =>
      assert(est === truth(item) && err === 0L, s"$item must be exact")
    }
  }
}
