package graft

import graft.streaming.StreamingSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class StreamTurn(conv_id: String, role: String, text: String,
    tool: String, ts: Timestamp)

case class StreamDoc(id: Long, text: String, ts: Timestamp)

class StreamingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  type Turn = StreamTurn
  private def Turn(c: String, r: String, x: String, t: String, ts: Timestamp) =
    StreamTurn(c, r, x, t, ts)

  test("streaming sketch aggregation matches batch estimates") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val rows = (0 until 500).map { i =>
      Turn(s"conv-${i % 37}", if (i % 2 == 0) "user" else "assistant",
        s"text $i ${"pad " * (i % 11)}",
        if (i % 5 == 0) s"tool_${i % 3}" else null,
        new Timestamp(1700000000000L + i * 1000L))
    }
    mem.addData(rows: _*)
    val q = StreamingSketch.runningSketches(mem.toDF(), p = 12)
      .writeStream.format("memory").queryName("running_sketches")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("running_sketches")
        .orderBy("role").collect()
      val batch = StreamingSketch.runningSketches(rows.toDF(), p = 12)
        .orderBy("role").collect()
      assert(got.length == 2 && got.length == batch.length)
      got.zip(batch).foreach { case (s, b) =>
        assert(s.getString(0) == b.getString(0))
        assert(s.getDouble(1) == b.getDouble(1),
          "streaming hll estimate != batch")
        assert(s.getLong(2) == b.getLong(2), "streaming cms total != batch")
      }
      // exact distinct convs is 37 per role-split; estimate within bound
      val est = got.head.getDouble(1)
      assert(math.abs(est - 37) <= 3 * graft.sketch.Hll.stdError(12) * 37 + 2)
    } finally q.stop()
  }

  test("streaming sessionize equals batch across micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    // 12 convs × 24 turns; inter-turn gaps alternate 30s / 400s so every
    // conversation splits sessions repeatedly, including ACROSS the three
    // micro-batch boundaries below. All convs share a < 2h epoch window —
    // the event-time watermark advances with the GLOBAL max, so a conv
    // lagging more than the watermark behind another would have its later
    // turns dropped as late data (the documented delivery contract).
    val rows = for (c <- 0 until 12; i <- 0 until 24) yield {
      val gapSum = (1 to i).map(j => if (j % 3 == 0) 400L else 30L).sum
      graft.streaming.SessTurn(f"c$c%03d", i,
        if (i % 2 == 0) "user" else "assistant", s"t$c-$i",
        new Timestamp((1700000000L + c * 100L + gapSum) * 1000L))
    }
    val mem = MemoryStream[graft.streaming.SessTurn]
    val q = StreamingSketch.sessionizeStream(mem.toDF(), gapSeconds = 300)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // in canonical order per conv, split at turn 8 and 16 — genuine
      // micro-batch boundaries inside every conversation
      Seq(0 until 8, 8 until 16, 16 until 24).foreach { r =>
        mem.addData(rows.filter(t => r.contains(t.turn_idx)): _*)
        q.processAllAvailable()
      }
      val got = spark.table("sess_stream")
        .orderBy("conv_id", "turn_idx")
        .as[(String, Int, String, Long)].collect().toSeq
      val want = graft.operators.Conversations
        .sessionize(mem.toDF().sparkSession.createDataFrame(rows), 300)
        .select(col("conv_id"), col("turn_idx"), col("role"),
          col("session_idx"))
        .orderBy("conv_id", "turn_idx")
        .as[(String, Int, String, Long)].collect().toSeq
      assert(got == want)
      // non-vacuous: sessions actually split (gap pattern → 8 splits/conv)
      assert(got.map(_._4).max >= 7)
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival of each content hash") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val t0 = 1700000000000L
    mem.addData(
      StreamDoc(1L, "alpha", new Timestamp(t0)),
      StreamDoc(2L, "beta", new Timestamp(t0 + 1000)),
      StreamDoc(3L, "alpha", new Timestamp(t0 + 2000)), // dup of 1 → dropped
      StreamDoc(4L, "gamma", new Timestamp(t0 + 3000)),
      StreamDoc(5L, "beta", new Timestamp(t0 + 4000))) // dup of 2 → dropped
    val q = StreamingSketch.dedupStream(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_stream")
        .select("id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("streaming dedup against a persisted index equals the batch probe") {
    implicit val sq = spark.sqlContext
    val base =
      "the quick brown fox jumps over the lazy dog again and again " * 8
    val old = Seq(
      (0L, base),
      (1L, "completely different reference material on stream state " * 8)
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-stream-fpidx").toString
    graft.operators.Dedup.buildFingerprintIndex(old, "doc_id", "text", idx)
    val out = java.nio.file.Files
      .createTempDirectory("graft-stream-dedup").toString + "/matches"
    val t0 = 1700000000000L
    val b1 = Seq(
      StreamDoc(10L, base, new Timestamp(t0)), // exact dup of 0
      StreamDoc(11L, "fresh unrelated content nothing shared here " * 8,
        new Timestamp(t0 + 1000)))
    val b2 = Seq(
      StreamDoc(12L, base.replace("quick", "rapid"), // near dup of 0
        new Timestamp(t0 + 2000)))
    val mem = MemoryStream[StreamDoc]
    val q = mem.toDF()
      .writeStream
      .foreachBatch(StreamingSketch.dedupAgainstIndexBatch(
        idx, "id", "text", out))
      .start()
    try {
      // two genuine micro-batches: add → drain → add → drain
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select("doc_id", "match_id", "kind", "jaccard_x1m")
      .as[(Long, Long, String, Long)].collect().toSet
    val batch = graft.operators.Dedup.dedupAgainstIndex(
        (b1 ++ b2).toDF().select($"id".as("doc_id"), $"text"),
        "doc_id", "text", idx)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(got == batch,
      s"stream/batch divergence:\n stream=$got\n batch=$batch")
    assert(got.exists(r => r._1 == 10L && r._3 == "exact"), s"got $got")
    assert(got.exists(r => r._1 == 12L && r._3 == "near"), s"got $got")
    assert(!got.exists(_._1 == 11L), s"clean doc matched: $got")
  }

  test("streaming windowed top-k satisfies the misra-gries bounds") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val t0 = 1700000000000L
    // skewed keys over 3 event-time hours: "hot" carries half the stream
    val rows = (0 until 600).map { i =>
      StreamDoc(i.toLong,
        if (i % 2 == 0) "hot" else s"k${i % 13}",
        new Timestamp(t0 + i * 18000L)) // one per 18s -> 3 hours
    }
    mem.addData(rows: _*)
    val q = StreamingSketch.windowedTopK(
        mem.toDF().withColumnRenamed("text", "key"), "key",
        capacity = 4, k = 4, windowLen = "1 hour", watermark = "30 minutes")
      .writeStream.format("memory").queryName("windowed_topk")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark far enough to close all three windows
      mem.addData(StreamDoc(9999L, "late",
        new Timestamp(t0 + 12 * 3600 * 1000L)))
      q.processAllAvailable()
      val got = spark.table("windowed_topk")
        .select(col("window.start").cast("long").as("ws"),
          col("items"), col("n"), col("dec"))
        .collect()
      assert(got.length >= 3, s"expected 3 closed windows, got ${got.length}")
      val exactByWindow = rows.groupBy(_.ts.getTime / 3600000L)
        .map { case (h, rs) =>
          h -> rs.groupBy(_.text).map { case (k, g) => k -> g.size.toLong } }
      got.foreach { r =>
        val exact = exactByWindow(r.getLong(0) / 3600L)
        val n = r.getLong(2)
        assert(n == exact.values.sum, "window total mismatch")
        val items = r.getSeq[org.apache.spark.sql.Row](1)
          .map(it => it.getString(0) -> it.getLong(1)).toMap
        // no overcount; undercount bounded; the heavy key enumerated
        items.foreach { case (k, est) =>
          assert(est <= exact(k), s"overcount on $k")
          assert(exact(k) - est <= n / 5, s"undercount bound broken on $k")
        }
        assert(items.contains("hot"), s"heavy key missing: $items")
      }
    } finally q.stop()
  }

  test("windowed KS drift flags the shifted window against a frozen reference") {
    implicit val sq = spark.sqlContext
    // frozen reference: text lengths 1..50 uniform
    val ref = {
      val kll = graft.sketch.Kll.empty(200)
      (0 until 5000).foreach(i => kll.update(i % 50 + 1.0))
      kll.toBytes
    }
    val mem = MemoryStream[Turn]
    // hour 1 matches the reference; hour 2 is shifted +200 chars
    val rows = (0 until 600).map { i =>
      val hour2 = i >= 300
      val len = (i % 50 + 1) + (if (hour2) 200 else 0)
      Turn(s"c${i % 13}", "user", "x" * len, null,
        // hour-aligned base so each fixture hour is exactly one window
        new Timestamp(1699999200000L + (if (hour2) 3600000L else 0L) + (i % 300) * 10000L))
    }
    mem.addData(rows: _*)
    val q = StreamingSketch
      .windowedKsDrift(mem.toDF().withColumn("len", length(col("text"))),
        "len", ref, "1 hour", "2 hours", threshold = 0.2)
      .writeStream.format("memory").queryName("ks_drift")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark past both hours so they close
      mem.addData(Turn("cx", "user", "late", null,
        new Timestamp(1699999200000L + 20 * 3600000L)))
      q.processAllAvailable()
      val got = spark.table("ks_drift")
        .select(col("window.start").cast("long").as("start"), col("n_rows"),
          col("ks_est"), col("drifted"))
        .orderBy("start").as[(Long, Long, Double, Boolean)].collect()
      assert(got.length >= 2, s"expected 2 closed windows, got ${got.length}")
      // n is tracked exactly by the blob: each closed hour saw 300 rows
      assert(got.take(2).forall(_._2 == 300L), got.toSeq.toString)
      val slack = 3 * 2 * (2.296 / 200)
      assert(got.head._3 <= slack && !got.head._4,
        s"in-distribution window drifted: ${got.head}")
      // +200 shift is total separation: KS ~ 1
      assert(got(1)._3 >= 0.9 && got(1)._4, s"shifted window: ${got(1)}")
    } finally q.stop()
  }

  test("windowed sketches with watermark produce per-window rows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Turn]
    val rows = (0 until 400).map { i =>
      Turn(s"c${i % 13}", "user", "x" * (i % 50 + 1), null,
        new Timestamp(1700000000000L + i * 60000L)) // 1/min -> ~7 hours
    }
    mem.addData(rows: _*)
    val q = StreamingSketch.windowedSketches(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("windowed_sketches")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(Turn("cx", "user", "late", null,
        new Timestamp(1700000000000L + 500 * 60000L)))
      q.processAllAvailable()
      val got = spark.table("windowed_sketches").collect()
      assert(got.length >= 4, s"expected several closed windows, got ${got.length}")
      got.foreach { r =>
        assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      }
    } finally q.stop()
  }
}
