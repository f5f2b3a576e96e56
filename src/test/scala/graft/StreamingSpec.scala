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
