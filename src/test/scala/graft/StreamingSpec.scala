package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.index.{Metric, VectorIndexFlat}
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streaming kNN over micro-batches ≡ synchronous search (async contract)") {
    import spark.implicits._
    val d = 16
    val vecs = Oracle.genVectors(200, d)
    val idx = VectorIndexFlat(spark, d, Metric.L2)
    idx.add(vecs.toSeq)

    val qs = Oracle.genVectors(6, d, seed = 4242)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Array[Float])]
    val queryDf = stream.toDF().toDF("qid", "qvec")
      .select(col("qid"), col("qvec").cast("array<float>").as("qvec"))

    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val writer = StreamingOps.streamingKnn(idx, queryDf, 5) { (result, _) =>
      collected ++= result.orderBy("qid", "rank").collect()
    }
    val q = writer.start()
    // two micro-batches of 3 queries each
    stream.addData(qs.take(3).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
    q.processAllAvailable()
    stream.addData(qs.drop(3).zipWithIndex.map { case (v, i) => ((i + 3).toLong, v) }.toSeq)
    q.processAllAvailable()
    q.stop()

    val sync = idx.search(Oracle.queriesDf(spark, qs), 5)
      .orderBy("qid", "rank").collect()
    assert(collected.sortBy(r => (r.getLong(0), r.getInt(1))) === sync.toSeq)
  }

  test("stream-static enrichment join ≡ batch join, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val stream = MemoryStream[(Long, Long)]
    val events = stream.toDF().toDF("event_id", "user_id")
    val collected = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = StreamingOps.enrichStream(events, dim, "user_id").writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) => collected ++= b.collect(); () }
      .start()
    stream.addData(Seq((10L, 1L), (11L, 3L)))
    q.processAllAvailable()
    stream.addData(Seq((12L, 2L)))
    q.processAllAvailable()
    q.stop()
    val got = collected.map(r => (r.getAs[Long]("user_id"), r.getAs[String]("segment"))).toSet
    assert(got == Set((1L, "gold"), (3L, null), (2L, "silver")))
  }

  test("stream-stream interval join (watermarked) ≡ batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long)] // (user, ts_sec)
    val buys = MemoryStream[(Long, Long)]
    def toTs(df: org.apache.spark.sql.DataFrame, u: String, t: String) =
      df.select(col("_1").as(u), timestamp_seconds(col("_2")).as(t))
    val joined = StreamingOps.intervalJoin(
      toTs(clicks.toDF(), "user_id", "click_ts"),
      toTs(buys.toDF(), "buy_user", "buy_ts").withColumnRenamed("buy_user", "user_id"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      within = "10 SECONDS", watermark = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    clicks.addData(Seq((1L, 100L), (1L, 200L), (2L, 100L)))
    buys.addData(Seq((1L, 105L), (1L, 150L), (2L, 109L), (3L, 100L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij")
      .select(col("user_id"), expr("unix_seconds(click_ts)"), expr("unix_seconds(buy_ts)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // matches: click(1,100)→buy(1,105); click(2,100)→buy(2,109);
    // NOT buy(1,150) (outside 10s), NOT user 3 (no click)
    assert(got == Set((1L, 100L, 105L), (2L, 100L, 109L)))
  }

  test("streaming dedup: duplicate keys across micro-batches emit once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long)] // (content_hash, ts_sec)
    val in = stream.toDF()
      .select(col("_1").as("h"), timestamp_seconds(col("_2")).as("ts"))
    val q = StreamingOps.streamingDedup(in, "h", "ts", "1 minute")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    stream.addData(Seq(("a", 100L), ("b", 101L), ("a", 102L)))
    q.processAllAvailable()
    stream.addData(Seq(("a", 103L), ("c", 104L), ("b", 105L)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sdedup")
      .select(col("h"), expr("unix_seconds(ts)")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // first occurrence of each key only, across batch boundaries
    assert(got == Set(("a", 100L), ("b", 101L), ("c", 104L)))
  }

  test("streaming minhash near-dup dedup: band-bucket state suppresses near-dups across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val nearDup = "the quick brown fox jumps over the lazy dog near the old stone bridge tonight"
    val other = "completely different content about database engines and query optimization at scale"
    val otherDup = "completely different content about database engines and query optimization at speed"
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val flags = StreamingOps.streamingMinhashDedup(in)
    val q = flags.toDF().writeStream.format("memory").queryName("smdedup")
      .outputMode("append").start()
    // batch 1: base + an unrelated doc — both survive
    stream.addData(Seq(0L -> base, 1L -> other))
    q.processAllAvailable()
    // batch 2: near-dups of BOTH batch-1 docs (cross-batch suppression)
    // plus one genuinely new doc
    stream.addData(Seq(2L -> nearDup, 3L -> otherDup,
      4L -> "entirely novel text with no overlap to anything seen before in this stream",
      5L -> "too short")) // <3 tokens → null signature → must pass through,
                          // exactly as batch minhashDedup keeps it
    q.processAllAvailable()
    q.stop()
    val kept = StreamingOps.keptDocs(spark.table("smdedup"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 4L, 5L), s"got $kept")
    // id-ordered arrival reproduces the batch formulation exactly:
    // doc kept iff it is the min doc_id of EVERY one of its band buckets
    val docs = Seq(0L -> base, 1L -> other, 2L -> nearDup, 3L -> otherDup).toDF("doc_id", "text")
    val sigs = graft.ops.Dedup.minhashSignatures(docs)
    val batchKept = graft.ops.Dedup.lshBands(sigs)
      .groupBy(col("band"), col("key")).agg(min(col("doc_id")).as("first_id"),
        collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"), col("first_id"))
      .groupBy(col("doc_id"))
      .agg(max(when(col("doc_id") =!= col("first_id"), 1L).otherwise(0L)).as("lost_any"))
      .filter(col("lost_any") === 0L).collect().map(_.getLong(0)).toSet
    assert(batchKept === Set(0L, 1L), s"batch formulation: $batchKept")
  }

  test("streaming incremental dedup vs static store == batch incrementalMinhash, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    val nearDup = "the quick brown fox jumps over the lazy dog near the old stone bridge tonight"
    val other = "completely different content about database engines and query optimization at scale"
    val store = graft.ops.Dedup.minhashStore(
      Seq(0L -> base, 1L -> other).toDF("doc_id", "text"))
    val stream = MemoryStream[(Long, String)]
    val in = stream.toDF().select(col("_1").as("doc_id"), col("_2").as("text"))
    val flags = StreamingOps.streamingIncrementalDedup(in, store)
    val q = flags.writeStream.format("memory").queryName("sincdedup")
      .outputMode("append").start()
    // two micro-batches; the second re-tests the store with no carryover
    // state (exact copy of base must flag in BOTH batches — stateless)
    stream.addData(Seq(10L -> nearDup, 11L ->
      "entirely novel sentence with tokens appearing nowhere else in any stored document here"))
    q.processAllAvailable()
    stream.addData(Seq(12L -> base, 13L -> other))
    q.processAllAvailable()
    q.stop()
    val got = StreamingOps.bestStoredMatch(spark.table("sincdedup"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // batch reference over the SAME new docs — stateless streaming must
    // reproduce it exactly, including jaccard values
    val batch = graft.ops.Dedup.incrementalMinhash(
        Seq(10L -> nearDup, 11L -> "entirely novel sentence with tokens appearing nowhere else in any stored document here",
          12L -> base, 13L -> other).toDF("doc_id", "text"), store)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === batch.toSeq)
    assert(got.map(_._1).toSeq === Seq(10L, 12L, 13L))
    assert(got(1)._3 === 1000000L && got(2)._3 === 1000000L) // exact copies
  }

  test("stateful streaming sessionization == batch sessions (closed sessions)") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, SessionOut}

    // batch truth from the same events (reuse the oracle-checked query logic)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id", $"event_id", $"ts_us")
      .as[SessionEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val gap = 1800L * 1000000L
    val batchSessions = ev.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts_us, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
      var sid = 0L; var start = 0L; var last = Long.MinValue; var n = 0L
      sorted.foreach { e =>
        if (n == 0 || e.ts_us - last > gap) {
          if (n > 0) sessions += ((u, sid, n, start, last))
          sid += 1; start = e.ts_us; n = 1L
        } else n += 1
        last = e.ts_us
      }
      // the final (open) session is NOT emitted by the stream → exclude
      sessions
    }.toSet

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = graft.streaming.StreamingOps.streamingSessionize(stream.toDS(), gap)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // feed in three chronological chunks (cross-batch state must carry)
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()

    val got = spark.table("sess_out").as[SessionOut].collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.start_us, s.end_us)).toSet
    assert(got === batchSessions)
    assert(got.nonEmpty)
  }

  test("streaming SCD2 == batch q_scd2_history closed intervals across micro-batches") {
    import spark.implicits._
    import graft.streaming.{Scd2Event, Scd2Out}
    val dir = "/root/testdata/sf0.001"
    // batch truth from the ORACLE-CHECKED registry query, restricted to
    // closed intervals (the NULL-valid_to open row is the stream's state)
    val batch = SparkEntry.queries("q_scd2_history")(spark, dir)
      .filter(col("valid_to_us").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id", $"event_id", $"ts_us", $"event_type".as("state"))
      .as[Scd2Event].collect().sortBy(e => (e.ts_us, e.event_id))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Scd2Event]
    val out = graft.streaming.StreamingOps.streamingScd2(stream.toDS())
    val q = out.writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    // a state change straddling a batch boundary must still close at the
    // right timestamp — feed three chronological chunks
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("scd2_out").as[Scd2Out].collect()
      .map(s => (s.user_id, s.state, s.valid_from_us, s.valid_to_us)).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("streaming clamped accumulator == batch clampedScan across micro-batches, bit-exact") {
    import spark.implicits._
    import graft.streaming.{BucketEvent, BucketOut}
    val dir = "/root/testdata/sf0.001"
    // deltas from the events stream: views refill +1, clicks/purchases
    // drain -2 — both clamps engage
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        when($"event_type" === "view", 1L).otherwise(-2L).as("delta"))
      .as[BucketEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    val want = graft.ops.Scan.clampedScan(
        batchIn.toDF(), Seq("key"), Seq("ts_us", "event_id"), "delta", 0L, 5L)
      .select("key", "event_id", "level").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[BucketEvent]
    val out = graft.streaming.StreamingOps.streamingClampedAccumulator(stream.toDS(), 0L, 5L)
    val q = out.writeStream.format("memory").queryName("bucket_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("bucket_out").as[BucketOut].collect()
      .map(b => (b.key, b.event_id) -> b.level).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming gap-decayed counter == batch timeDecayedSum across micro-batches") {
    import spark.implicits._
    import graft.streaming.{DecayEvent, DecayOut}
    val dir = "/root/testdata/sf0.001"
    val hl = 3600L * 1000000L
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us", lit(1.0).as("x"))
      .as[DecayEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    val want = graft.ops.Scan.timeDecayedSum(
        batchIn.toDF(), Seq("key"), Seq("ts_us", "event_id"), "ts_us", "x", hl)
      .select("key", "event_id", "decayed").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[DecayEvent]
    val out = graft.streaming.StreamingOps.streamingTimeDecayedSum(stream.toDS(), hl)
    val q = out.writeStream.format("memory").queryName("decay_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("decay_out").as[DecayOut].collect()
      .map(d => (d.key, d.event_id) -> d.decayed).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      val w = want(k)
      assert(math.abs(v - w) / math.max(1.0, math.abs(w)) <= 1e-9, s"$k: $v vs $w")
    }
    assert(got.nonEmpty)
  }

  test("streaming Holt == batch holtLinear BIT-EXACT across micro-batches") {
    import spark.implicits._
    import graft.streaming.{HoltEvent, HoltOut}
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        ($"value" + lit(0.0)).as("x"))
      .as[HoltEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    val want = graft.ops.Scan.holtLinear(
        batchIn.toDF(), Seq("key"), Seq("ts_us", "event_id"), "x",
        alpha = 0.3, beta = 0.1)
      .select("key", "event_id", "level", "trend").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[HoltEvent]
    val out = graft.streaming.StreamingOps.streamingHolt(stream.toDS(), 0.3, 0.1)
    val q = out.writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("holt_out").as[HoltOut].collect()
      .map(h => (h.key, h.event_id) -> ((h.level, h.trend))).toMap
    assert(got === want) // exact — both faces are the same sequential fold
    assert(got.nonEmpty)
  }

  test("streaming Holt: same-timestamp events STRADDLING a batch boundary " +
       "fold in (ts_us, event_id) order, bit-exact vs batch") {
    // r16 ADVICE: the old ts-only gate admitted a same-ts event from a
    // later micro-batch regardless of event_id, folding ties in arrival
    // order. The (ts_us, event_id) pair gate folds the forward tie and
    // drops the backward one — exactly the batch scan's order.
    import spark.implicits._
    import graft.streaming.{HoltEvent, HoltOut}
    val ev = Seq(
      HoltEvent(1L, 1L, 1000L, 2.0),
      HoltEvent(1L, 2L, 2000L, 4.0),   // batch 1 ends here
      HoltEvent(1L, 3L, 2000L, 8.0),   // same ts as id 2, later batch → folds (id 3 > 2)
      HoltEvent(1L, 4L, 3000L, 1.0))
    val batchIn = spark.createDataset(ev)
    val want = graft.ops.Scan.holtLinear(
        batchIn.toDF(), Seq("key"), Seq("ts_us", "event_id"), "x",
        alpha = 0.3, beta = 0.1)
      .select("key", "event_id", "level", "trend").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[HoltEvent]
    val out = graft.streaming.StreamingOps.streamingHolt(stream.toDS(), 0.3, 0.1)
    val q = out.writeStream.format("memory").queryName("holt_tie_out")
      .outputMode("append").start()
    stream.addData(ev(0), ev(1)); q.processAllAvailable()
    stream.addData(ev(2), ev(3)); q.processAllAvailable()
    // and a same-ts event with a SMALLER id arriving later must be
    // dropped as late, not folded backwards
    stream.addData(HoltEvent(1L, 0L, 3000L, 99.0)); q.processAllAvailable()
    q.stop()
    val got = spark.table("holt_tie_out").as[HoltOut].collect()
      .map(h => (h.key, h.event_id) -> ((h.level, h.trend))).toMap
    assert(got === want)
    assert(got.size === 4)
  }

  test("streaming rolling median == batch 7-frame window BIT-EXACT across micro-batches") {
    // r16: integer-cents frames make ≡ trivial by construction; the
    // spec still forces three micro-batch splits AND a same-timestamp
    // straddler to exercise the (ts_us, event_id) late-gate pair
    import spark.implicits._
    import graft.streaming.{RollMedEvent, RollMedOut}
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .filter($"user_id" <= 40)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        round($"value" * 100, 0).cast("long").as("cents"))
      .as[RollMedEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    assert(ev.length > 30)
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"key").orderBy($"ts_us", $"event_id")
      .rowsBetween(-6, Window.currentRow)
    val want = batchIn
      .select($"key", $"event_id",
        sort_array(collect_list($"cents").over(w)).as("win"),
        count(lit(1)).over(w).as("nwin"))
      .filter($"nwin" === 7)
      .select($"key", $"event_id", element_at($"win", 4).as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[RollMedEvent]
    val out = graft.streaming.StreamingOps.streamingRollingMedian(stream.toDS())
    val q = out.writeStream.format("memory").queryName("rollmed_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    // late straddler: duplicate the last event's timestamp with a
    // SMALLER event_id from a later batch — must be dropped, not folded
    val last = ev.last
    stream.addData(RollMedEvent(last.key, last.event_id - 1000000L,
      last.ts_us, 999999L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rollmed_out").as[RollMedOut].collect()
      .map(o => (o.key, o.event_id) -> o.med7_cents).toMap
    assert(got === want) // exact — integer frames, same fold order
    assert(got.nonEmpty)
  }

  test("streaming mode-per-group == batch running argmax BIT-EXACT across micro-batches") {
    // r17 (verdict task #7): integer counts + deterministic (−count,
    // cat) argmin make ≡ exact by construction; three forced splits and
    // a same-timestamp straddler exercise the late-gate pair
    import spark.implicits._
    import graft.streaming.{ModeEvent, ModeOut}
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .filter($"user_id" <= 40)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        $"event_type".as("cat"))
      .as[ModeEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    assert(ev.length > 30)
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy($"key", $"cat").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w2 = Window.partitionBy($"key").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = batchIn
      .withColumn("rc", count(lit(1)).over(w1))
      .withColumn("best", min(concat(
        lpad((lit(10000000000L) - $"rc").cast("string"), 12, "0"),
        $"cat")).over(w2))
      .select($"key", $"event_id", expr("substr(best, 13)").as("c"),
        (lit(10000000000L) - substring($"best", 1, 12).cast("long")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[ModeEvent]
    val out = graft.streaming.StreamingOps.streamingModeByGroup(stream.toDS())
    val q = out.writeStream.format("memory").queryName("mode_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    // same-timestamp straddler with a SMALLER event_id from a later
    // batch — must be dropped by the (ts, event_id) pair-gate
    val last = ev.last
    stream.addData(ModeEvent(last.key, last.event_id - 1000000L,
      last.ts_us, "zzz_bogus"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mode_out").as[ModeOut].collect()
      .map(o => (o.key, o.event_id) -> (o.mode_cat, o.mode_count)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming benford digit counts == batch running windows BIT-EXACT across micro-batches") {
    import spark.implicits._
    import graft.streaming.{BenfordEvent, BenfordOut}
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .filter($"user_id" <= 40 &&
        $"value".cast(org.apache.spark.sql.types.DecimalType(18, 2)) >= 1)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        substring($"value".cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("string"), 1, 1).cast("int").as("digit"))
      .as[BenfordEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    assert(ev.length > 30)
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy($"key", $"digit").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w2 = Window.partitionBy($"key").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = batchIn
      .select($"key", $"event_id", count(lit(1)).over(w1).as("dn"),
        count(lit(1)).over(w2).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[BenfordEvent]
    val out = graft.streaming.StreamingOps.streamingBenford(stream.toDS())
    val q = out.writeStream.format("memory").queryName("benford_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    val last = ev.last
    stream.addData(BenfordEvent(last.key, last.event_id - 1000000L,
      last.ts_us, 9))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("benford_out").as[BenfordOut].collect()
      .map(o => (o.key, o.event_id) -> (o.digit_n, o.n)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming lag-1 autocorr witnesses == batch running sums BIT-EXACT across micro-batches") {
    import spark.implicits._
    import graft.streaming.{LagEvent, LagOut}
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .filter($"user_id" <= 40)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        round($"value" * 100, 0).cast("long").as("cents"))
      .as[LagEvent].collect().sortBy(e => (e.ts_us, e.event_id))
    assert(ev.length > 30)
    val batchIn = spark.createDataset(ev.toIndexedSeq)
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy($"key").orderBy($"ts_us", $"event_id")
    val w2 = Window.partitionBy($"key").orderBy($"ts_us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = batchIn
      .withColumn("p", lag($"cents", 1).over(wl))
      .select($"key", $"event_id",
        count(lit(1)).over(w2).as("n"), sum($"cents").over(w2).as("s1"),
        sum($"cents" * $"cents").over(w2).as("s2"),
        sum(coalesce($"cents" * $"p", lit(0L))).over(w2).as("sl1"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[LagEvent]
    val out = graft.streaming.StreamingOps.streamingLagAutocorr(stream.toDS())
    val q = out.writeStream.format("memory").queryName("lagac_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    // a dropped straddler must not perturb the (prev, sums) state
    val last = ev.last
    stream.addData(LagEvent(last.key, last.event_id - 1000000L,
      last.ts_us, 999999L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("lagac_out").as[LagOut].collect()
      .map(o => (o.key, o.event_id) -> (o.n, o.s1, o.s2, o.sl1)).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming CUSUM == batch reflected-walk closed form BIT-EXACT across micro-batches") {
    import spark.implicits._
    import graft.streaming.{CusumEvent, CusumOut}
    val dir = "/root/testdata/sf0.001"
    val cents = Tables.events(spark, dir)
      .filter($"user_id" <= 40)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        round($"value" * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cents.length > 30)
    val ref = cents.map(_._4).sum / cents.length
    val ev = cents.map { case (k, e, t, c) => CusumEvent(k, e, t, c - ref) }
      .sortBy(e => (e.ts_us, e.event_id))
    // batch face: S_i = P_i - min(0, min_{j<=i} P_j) over the prefix sum
    val want = ev.groupBy(_.key).flatMap { case (k, es) =>
      var p = 0L; var mn = 0L
      es.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        p += e.delta; mn = math.min(mn, p)
        (k, e.event_id) -> (p - math.min(mn, 0L))
      }.toSeq
    }.toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CusumEvent]
    val out = graft.streaming.StreamingOps.streamingCusum(stream.toDS())
    val q = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    // a dropped same-timestamp straddler must not perturb the level
    val last = ev.last
    stream.addData(CusumEvent(last.key, last.event_id - 1000000L,
      last.ts_us, 999999L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cusum_out").as[CusumOut].collect()
      .map(o => (o.key, o.event_id) -> o.cusum).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming KS-to-reference == batch window face BIT-EXACT across micro-batches") {
    import spark.implicits._
    import graft.streaming.{KsEvent, KsOut}
    val dir = "/root/testdata/sf0.001"
    val cents = Tables.events(spark, dir)
      .filter($"user_id" <= 40)
      .withColumn("ts_us", expr("unix_micros(ts)"))
      .select($"user_id".as("key"), $"event_id", $"ts_us",
        round($"value" * 100, 0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cents.length > 30)
    val mn = cents.map(_._4).min
    val mx = cents.map(_._4).max
    def bk(c: Long): Int = math.min(((c - mn) * 10L / (mx - mn + 1L)).toInt, 9)
    val refCounts = Array.fill(10)(0L)
    cents.foreach(r => refCounts(bk(r._4)) += 1L)
    val refCum = refCounts.scanLeft(0L)(_ + _).tail.toSeq
    val nRef = refCum.last
    val ev = cents.map { case (k, e, t, c) => KsEvent(k, e, t, bk(c)) }
      .sortBy(e => (e.ts_us, e.event_id))
    val want = ev.groupBy(_.key).flatMap { case (k, es) =>
      val counts = Array.fill(10)(0L)
      var n = 0L
      es.sortBy(e => (e.ts_us, e.event_id)).map { e =>
        counts(e.bucket) += 1L; n += 1L
        var cum = 0L; var ksNum = 0L
        (0 until 10).foreach { b =>
          cum += counts(b)
          ksNum = math.max(ksNum, math.abs(cum * nRef - refCum(b) * n))
        }
        (k, e.event_id) -> ((n, ksNum))
      }.toSeq
    }.toMap
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[KsEvent]
    val out = graft.streaming.StreamingOps.streamingKsToRef(stream.toDS(), refCum)
    val q = out.writeStream.format("memory").queryName("ks_out")
      .outputMode("append").start()
    val chunks = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
    chunks.foreach { c => stream.addData(c.toIndexedSeq); q.processAllAvailable() }
    // dropped straddler + out-of-domain bucket must not perturb the counts
    val last = ev.last
    stream.addData(KsEvent(last.key, last.event_id - 1000000L, last.ts_us, 3))
    stream.addData(KsEvent(last.key, last.event_id + 1000000L, last.ts_us + 1, 17))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ks_out").as[KsOut].collect()
      .map(o => (o.key, o.event_id) -> ((o.n, o.ks_num))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("streaming sessionize drops cross-batch late events instead of corrupting sessions") {
    import spark.implicits._
    import graft.streaming.{SessionEvent, SessionOut}
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[SessionEvent]
    val out = graft.streaming.StreamingOps.streamingSessionize(stream.toDS(), gapUs = 1000L)
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    stream.addData(SessionEvent(1, 1, 10000)); q.processAllAvailable()
    // late event (5000 < lastTs 10000) then on-time 10500: without the
    // guard the session would falsely split; with it, nothing closes
    stream.addData(SessionEvent(1, 2, 5000), SessionEvent(1, 3, 10500))
    q.processAllAvailable()
    // a genuine gap closes ONE session spanning 10000..10500 (2 events)
    stream.addData(SessionEvent(1, 4, 100000)); q.processAllAvailable()
    q.stop()
    val sessions = spark.table("late_sessions").as[SessionOut].collect()
    assert(sessions.length === 1)
    assert(sessions.head.n_events === 2L)
    assert(sessions.head.start_us === 10000L && sessions.head.end_us === 10500L)
  }

  test("watermarked windowed counts over availableNow == batch aggregation") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(events.schema).parquet(dir)
    val agg = StreamingOps.eventsWindowedCounts(streamIn)
    val q = StreamingOps.runToMemory(agg, "win_out")
    q.awaitTermination(60000)

    val got = spark.table("win_out")
      .select(col("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type").collect()
    val want = events
      .groupBy(window(col("ts"), "1 hour", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type").collect()
    assert(got === want)
  }

  test("streaming windowed moment profile == batch, bit-exact (decimal state merge)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    // many small files → many micro-batch boundaries crossing windows:
    // the decimal moment state must merge exactly across all of them
    events.repartition(8).write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val agg = StreamingOps.eventsWindowedMoments(streamIn)
    val q = StreamingOps.runToMemory(agg, "mom_out")
    q.awaitTermination(60000)

    val got = spark.table("mom_out")
      .orderBy("window_start", "event_type").collect()
    val want = StreamingOps.eventsWindowedMoments(events)
      .orderBy("window_start", "event_type").collect()
    assert(got.length > 0)
    assert(got === want)
  }

  test("streaming windowed PSI vs frozen reference == batch, bit-exact; drift raises it") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    // reference cohort = first time half (the psiDrift convention)
    val piv = events.agg(min(col("ts")), max(col("ts"))).head
    val mid = new java.sql.Timestamp(
      (piv.getTimestamp(0).getTime + piv.getTimestamp(1).getTime) / 2)
    val ref = graft.ops.Profile.psiReference(
      events.filter(col("ts") <= lit(mid)), "value", buckets = 10)
    assert(ref.counts.sum > 0)

    val dir = java.nio.file.Files.createTempDirectory("graft-stream-psi").toString
    // many small files → micro-batch boundaries crossing windows: the
    // per-(window,bucket) long counts must merge exactly across them
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val agg = StreamingOps.eventsWindowedPsi(streamIn, ref)
    val q = StreamingOps.runToMemory(agg, "psi_out")
    q.awaitTermination(60000)

    val got = spark.table("psi_out").orderBy("window_start").collect()
    val want = StreamingOps.eventsWindowedPsi(events, ref)
      .orderBy("window_start").collect()
    assert(got.length > 0)
    assert(got === want)

    // drift sanity: shifting every value far outside the reference range
    // piles the whole window into an edge bucket — PSI must exceed the
    // unshifted score in every window (clamped, never NaN/infinite)
    val shifted = StreamingOps.eventsWindowedPsi(
        events.withColumn("value", col("value") + lit(1e7)), ref)
      .orderBy("window_start").collect()
    val byWin = want.map(r => r.getTimestamp(0) -> r.getDouble(2)).toMap
    shifted.foreach { r =>
      val psi = r.getDouble(2)
      assert(!psi.isNaN && !psi.isInfinite)
      assert(psi > byWin(r.getTimestamp(0)),
        s"shifted PSI $psi not above baseline ${byWin(r.getTimestamp(0))}")
    }
  }

  test("streaming windowed JS vs frozen reference == batch, bit-exact; bounded by ln 2") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val piv = events.agg(min(col("ts")), max(col("ts"))).head
    val mid = new java.sql.Timestamp(
      (piv.getTimestamp(0).getTime + piv.getTimestamp(1).getTime) / 2)
    val ref = graft.ops.Profile.psiReference(
      events.filter(col("ts") <= lit(mid)), "value", buckets = 10)

    val dir = java.nio.file.Files.createTempDirectory("graft-stream-js").toString
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val agg = StreamingOps.eventsWindowedJs(streamIn, ref)
    val q = StreamingOps.runToMemory(agg, "js_out")
    q.awaitTermination(60000)

    val got = spark.table("js_out").orderBy("window_start").collect()
    val want = StreamingOps.eventsWindowedJs(events, ref)
      .orderBy("window_start").collect()
    assert(got.length > 0)
    assert(got === want)

    // JS stays inside [0, ln 2] even under total drift — the bounded
    // gauge PSI isn't: the same +1e7 shift that blows PSI's log-ratio
    // up keeps JS clamped at its ceiling
    val shifted = StreamingOps.eventsWindowedJs(
        events.withColumn("value", col("value") + lit(1e7)), ref)
      .orderBy("window_start").collect()
    val byWin = want.map(r => r.getTimestamp(0) -> r.getDouble(2)).toMap
    shifted.foreach { r =>
      val js = r.getDouble(2)
      assert(!js.isNaN && !js.isInfinite)
      assert(js > byWin(r.getTimestamp(0)) && js <= math.log(2.0),
        s"shifted JS $js outside (baseline, ln 2]")
    }
  }

  test("streaming windowed heavy hitters: mergeable-summaries bounds hold under forced splits") {
    val spark2 = spark
    import spark2.implicits._
    // geometric item distribution (the q_heavy_hitters shape): h0 holds
    // half the mass, each next class halves — real heavy hitters exist
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("v", pmod(col("user_id"), lit(1024)))
      .withColumn("item",
        when(col("v") < 512, "h0").when(col("v") < 768, "h1")
          .when(col("v") < 896, "h2").when(col("v") < 960, "h3")
          .when(col("v") < 992, "h4").otherwise("h5"))
      .drop("v")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-hh").toString
    events.repartition(8).write.mode("overwrite").parquet(dir)
    val streamIn = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 2).parquet(dir)
    val cap = 4
    val agg = StreamingOps.eventsWindowedHeavyHitters(streamIn, "item", capacity = cap)
    val q = StreamingOps.runToMemory(agg, "hh_out")
    q.awaitTermination(60000)

    val got = spark.table("hh_out").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // exact per-(window, item) truth from the batch side
    val exact = events
      .groupBy(window(col("ts"), "1 hour", "1 hour"), col("item"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("item"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    // (1) every tracked row's sandwich: est ≥ true ≥ est − err — under
    // the FORCED 2-file micro-batch merges, the mergeable guarantee
    got.foreach { case (w, _, item, est, err) =>
      val t = exact.getOrElse((w, item), 0L)
      assert(est >= t, s"$w/$item: est $est < true $t")
      assert(est - err <= t, s"$w/$item: est-err ${est - err} > true $t")
    }
    // (2) completeness: any item with true share > n/capacity is tracked
    val trackedBy = got.groupBy(_._1).map { case (w, rows) => w -> rows.map(_._3).toSet }
    val nByWin = got.groupBy(_._1).map { case (w, rows) => w -> rows.head._2 }
    exact.foreach { case ((w, item), cnt) =>
      if (nByWin.contains(w) && cnt * cap > nByWin(w))
        assert(trackedBy(w).contains(item), s"$w: heavy $item ($cnt) not tracked")
    }
    // (3) the window totals are exact longs (count state merges exactly)
    val wantN = events.groupBy(window(col("ts"), "1 hour", "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    nByWin.foreach { case (w, n) => assert(n === wantN(w), s"window $w total") }
  }

  test("windowed heavy-hitter VERDICT frame is bit-identical across micro-batch splits == batch gate query") {
    // the q_heavy_hitters_windowed contract end-to-end (r14 verdict ask
    // #8): (est, err) internals are merge-order-sensitive, but the
    // EMITTED verdict frame — heavy set + the mergeable-summaries
    // theorem booleans — must be bit-identical under ANY micro-batch
    // split, and identical to the batch gate query's rows
    val sfDir = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sfDir)
      .withColumn("v", pmod(col("user_id"), lit(1024)))
      .withColumn("item",
        when(col("v") < 512, "h0").when(col("v") < 768, "h1")
          .when(col("v") < 896, "h2").when(col("v") < 960, "h3")
          .when(col("v") < 992, "h4").when(col("v") < 1008, "h5")
          .when(col("v") < 1016, "h6").when(col("v") < 1020, "h7")
          .otherwise("h8"))
      .drop("v")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-hhw").toString
    events.repartition(8).write.mode("overwrite").parquet(dir)

    def trackedEst(maxFiles: Int, name: String): Map[(java.sql.Timestamp, String), (Long, Long)] = {
      val streamIn = spark.readStream.schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", maxFiles).parquet(dir)
      val agg = StreamingOps.eventsWindowedHeavyHitters(streamIn, "item",
        capacity = 6, window_ = "1 day", slide = "1 day", watermark = "2 days")
      val q = StreamingOps.runToMemory(agg, name)
      q.awaitTermination(60000)
      spark.table(name).collect()
        .map(r => (r.getTimestamp(0), r.getString(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
    }
    val splitA = trackedEst(2, "hhw_a")
    val splitB = trackedEst(5, "hhw_b")

    // exact per-(day, item) truth + the strict-share heavy set
    val exact = events
      .groupBy(window(col("ts"), "1 day").getField("start").as("w"), col("item"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val nByDay = exact.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val heavy = exact.filter { case ((w, _), cnt) => cnt * 6 > nByDay(w) }.toSeq
      .sortBy { case ((w, item), _) => (w.getTime, item) }
    assert(heavy.nonEmpty)

    val dayFmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    dayFmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC")) // session TZ
    def verdicts(sk: Map[(java.sql.Timestamp, String), (Long, Long)]) =
      heavy.map { case ((w, item), cnt) =>
        val hit = sk.get((w, item))
        (dayFmt.format(w), item, cnt,
          hit.isDefined,
          hit.forall { case (est, _) => est >= cnt },
          hit.forall { case (est, err) => est - err <= cnt })
      }
    val fa = verdicts(splitA)
    val fb = verdicts(splitB)
    assert(fa === fb, "verdict frame differs between micro-batch splits")
    fa.foreach { r =>
      assert(r._4 && r._5 && r._6, s"theorem verdict false for $r")
    }
    // == the batch gate query, row for row
    val batch = SparkEntry.queries("q_heavy_hitters_windowed")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(batch === fa, "streaming verdict frame != batch gate query")
  }

  test("streaming windowed HLL distinct == batch approx_count_distinct per window") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-hll").toString
    events.write.mode("overwrite").parquet(dir)

    val streamIn = spark.readStream.schema(events.schema).parquet(dir)
    val agg = StreamingOps.streamingWindowedDistinct(streamIn, "user_id")
    val q = StreamingOps.runToMemory(agg, "hll_out")
    q.awaitTermination(60000)

    val got = spark.table("hll_out")
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    val want = events
      .groupBy(window(col("ts"), "1 hour", "1 hour"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("n_distinct"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_distinct"), col("n_events"))
      .orderBy("window_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2)))
    assert(got === want)
    // the sketch answers are within the 5% rsd envelope of exact truth
    val exact = events
      .groupBy(window(col("ts"), "1 hour", "1 hour"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .select(col("window.start").as("window_start"), col("exact"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    got.foreach { case (w, nd, _) =>
      val ex = exact(w).toDouble
      assert(math.abs(nd - ex) / math.max(1.0, ex) < 0.25, s"window $w: $nd vs $ex")
    }
  }

  test("streaming semantic dedup == batch semanticDedup across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def v(x: Double, y: Double, z: Double) = Array(x.toFloat, y.toFloat, z.toFloat)
    // the batch spec's fixture: two clusters (centroids 0 and 40), dups
    // inside each, one cross-cluster near-identical pair that must survive
    val rows: Seq[(Long, Array[Float])] = Seq(
      0L -> v(1, 0, 0), 1L -> v(1, 0.01, 0), 2L -> v(0.6, 0, 0.8),
      3L -> v(1, 0.011, 0), 40L -> v(0, 1, 0), 41L -> v(0.01, 1, 0),
      43L -> v(0, 0.6, -0.8), 50L -> v(0.72, 0.69, 0), 51L -> v(0.69, 0.72, 0))
    val cents = rows.filter(_._1 % 40 == 0).sortBy(_._1)
    val stream = MemoryStream[(Long, Array[Float])]
    val in = stream.toDF().select(col("_1").as("id"), col("_2").as("vec"))
    val flags = StreamingOps.streamingSemanticDedup(in, cents, tau = 0.9)
    val q = flags.toDF().writeStream.format("memory").queryName("semdd")
      .outputMode("append").start()
    // split so the dup pair (0, 1) straddles a batch boundary — state, not
    // the within-batch fold, must carry the anchor
    stream.addData(Seq(rows(0), rows(2)))         // ids 0, 2
    q.processAllAvailable()
    stream.addData(Seq(rows(1), rows(3), rows(4))) // ids 1, 3, 40
    q.processAllAvailable()
    stream.addData(Seq(rows(5), rows(6), rows(7), rows(8))) // 41, 43, 50, 51
    q.processAllAvailable()
    q.stop()
    val got = spark.table("semdd").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    val want = graft.ops.Similarity.semanticDedup(
        rows.toDF("id", "vec"), centroidModulo = 40, tau = 0.9)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }

  test("streaming quantiles ≡ batch percentile_approx across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic skewed values over two keys
    val rows = (0 until 3000).map { i =>
      (if (i % 3 == 0) "a" else "b", ((i * 1103515245L + 12345) % 10007).toDouble)
    }
    val qs = Seq(0.25, 0.5, 0.9)
    val stream = MemoryStream[(String, Double)]
    val out = StreamingOps.streamingQuantiles(
      stream.toDS().toDF("k", "v"), "v", qs, accuracy = 500, groupCols = Seq("k"))
    val q = out.writeStream.format("memory").queryName("squant")
      .outputMode("complete").start()
    rows.grouped(1000).foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
    q.stop()
    val got = spark.table("squant").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = StreamingOps.streamingQuantiles( // same plan, batch df
        rows.toDF("k", "v"), "v", qs, accuracy = 500, groupCols = Seq("k"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // GK merge order may differ between the incremental and batch runs;
    // the CONTRACT is the rank guarantee, so re-rank each side's answers
    // against the data: |rank(v) − q·n| ≤ n/accuracy (+1 slack)
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    for (k <- Seq("a", "b"); side <- Seq(got, want); (qq, v) <- qs.zip(side(k))) {
      val data = byKey(k); val n = data.length.toDouble
      val below = data.count(_ < v); val atOrBelow = data.count(_ <= v)
      assert(below <= qq * n + n / 500 + 1 && atOrBelow >= qq * n - n / 500 - 1,
        s"key $k q=$qq v=$v violates the rank guarantee (n=$n below=$below)")
    }
    assert(got.keySet === Set("a", "b"))
  }

  test("streaming as-of enrichment ≡ batch asofJoin across micro-batch boundaries") {
    import spark.implicits._
    import graft.streaming.{AsofEvent, AsofEnriched, AsofStateRow}
    implicit val sqlCtx = spark.sqlContext
    // state rows: two keys, multiple versions, one equal-ts tie (key 1 @
    // ts 3000 has values 5.0 and 7.0 — batch tie rule keeps 7.0)
    val states = Seq(
      AsofStateRow(1L, 1000L, 1.0), AsofStateRow(1L, 3000L, 5.0),
      AsofStateRow(1L, 3000L, 7.0), AsofStateRow(1L, 8000L, 9.0),
      AsofStateRow(2L, 2000L, 4.0))
    // events: before any state (→ null), at exact state ts (tie
    // inclusive), between versions, after all; key 3 has no state at all
    val events = Seq(
      AsofEvent(1L, 10L, 500L), AsofEvent(1L, 11L, 3000L),
      AsofEvent(1L, 12L, 5000L), AsofEvent(1L, 13L, 9000L),
      AsofEvent(2L, 20L, 1999L), AsofEvent(2L, 21L, 2000L),
      AsofEvent(3L, 30L, 4000L))
    val sStream = MemoryStream[AsofStateRow]
    val eStream = MemoryStream[AsofEvent]
    val out = StreamingOps.streamingAsofEnrich(sStream.toDS(), eStream.toDS())
    val q = out.writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append").start()
    // batch 1: early state + the pre-state event
    sStream.addData(states(0), states(4)); eStream.addData(events(0), events(4))
    q.processAllAvailable()
    // batch 2: the ts-3000 versions (tie) + events at/after it — the
    // feature-store case: state from batch 1 enriches THESE events too
    sStream.addData(states(1), states(2)); eStream.addData(events(1), events(5), events(6))
    q.processAllAvailable()
    // batch 3: later state + remaining events (state from batch 2 carries)
    sStream.addData(states(3)); eStream.addData(events(2), events(3))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_enrich").as[AsofEnriched].collect()
      .map(e => (e.key, e.event_id, e.ts_us, e.asof_ts, e.asof_value)).toSet
    // batch truth: asofJoin over the data with the equal-ts tie removed —
    // in-batch equal-ts right-row order is unspecified in the window
    // form, so the batch side is made tie-free; the STREAMING side still
    // ingests both ts-3000 versions, and matching the tie-free batch
    // output proves its (ts, value)-lex-max tie rule resolved to 7.0
    val lbatch = events.toDF().select(col("key"), col("event_id"),
      col("ts_us").as("ts"))
    val rbatch = states.filterNot(s => s.ts_us == 3000L && s.value == 5.0)
      .toDF().select(col("key"), col("ts_us").as("sts"),
        col("value"), col("ts_us").as("state_ts"))
    val want = graft.ops.AsofJoin.asofJoin(lbatch, rbatch, "key", "ts",
        "sts", Seq("value", "state_ts")).collect()
      .map { r =>
        val ts = if (r.isNullAt(4)) None else Some(r.getLong(4))
        val v = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        (r.getLong(0), r.getLong(1), r.getLong(2), ts, v)
      }.toSet
    assert(got === want)
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
  }
}
