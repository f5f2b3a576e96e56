package graft

import graft.GraftFunctions._
import graft.operators.SaltedAgg
import graft.sources.Transcripts
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end sketch aggregation over the canonical transcripts table:
  * every estimate checked against an exact GROUP BY baseline within the
  * published bound (north rule), plus salted-vs-unsalted byte identity.
  */
class SketchAggSpec extends AnyFunSuite with SparkTestBase {
  private lazy val turns =
    Transcripts.generate(spark, nConvs = 300, avgTurns = 16).cache()

  test("transcripts generator is deterministic across repartitioning") {
    val a = turns.orderBy("conv_id", "turn_idx").collect()
    val b = Transcripts.generate(spark, 300, 16).repartition(13)
      .orderBy("conv_id", "turn_idx").collect()
    assert(a.sameElements(b))
  }

  test("hll per-role distinct conv_id within published bound") {
    val p = 12
    val got = turns.groupBy("role")
      .agg(hll_estimate(hll_agg(col("conv_id"), p)).as("est"),
        countDistinct(col("conv_id")).cast("double").as("exact"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val est = r.getDouble(1); val exact = r.getDouble(2)
      val bound = 3 * graft.sketch.Hll.stdError(p) * exact + 2
      assert(math.abs(est - exact) <= bound,
        s"role=${r.getString(0)} est=$est exact=$exact")
    }
  }

  test("hll over exploded shingle hashes matches exact distinct") {
    val p = 14
    val sh = turns.select(col("conv_id"),
      explode(shingles(col("text"), 8)).as("h"))
    val got = sh.groupBy("conv_id")
      .agg(hll_estimate(hll_agg_hashed(col("h"), p)).as("est"),
        countDistinct(col("h")).cast("double").as("exact"))
      .collect()
    got.foreach { r =>
      val est = r.getDouble(1); val exact = r.getDouble(2)
      val bound = 3 * graft.sketch.Hll.stdError(p) * exact + 2
      assert(math.abs(est - exact) <= bound, s"conv=${r.getString(0)}")
    }
  }

  test("cms tool counts: no undercount, overcount within eps*N") {
    val eps = 0.001; val delta = 0.01
    val toolRows = turns.where(col("tool").isNotNull)
    val sketchRow = toolRows
      .agg(cms_agg(col("tool"), eps, delta).as("cms")).collect()(0)
    val sketch = sketchRow.getAs[Array[Byte]](0)
    val exact = toolRows.groupBy("tool").count().collect()
    val total = exact.map(_.getLong(1)).sum
    exact.foreach { r =>
      val est = graft.sketch.CountMin.estimate(
        sketch,
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
          org.apache.spark.sql.types.StringType, 42L))
      assert(est >= r.getLong(1), s"undercount ${r.getString(0)}")
      assert(est <= r.getLong(1) + math.max(1, (eps * total).toLong),
        s"overcount ${r.getString(0)}: $est vs ${r.getLong(1)}")
    }
  }

  test("cms blob is byte-identical across partitionings (sparse wire path)") {
    // the aggregation's shuffle boundary now ships sparse partials
    // (CountMin.toWire); counter addition is order-independent, so the
    // final dense blob must be byte-identical no matter how many partials
    // the plan produced or in which order they merged
    val toolRows = turns.where(col("tool").isNotNull)
    def blob(parts: Int): Array[Byte] = toolRows.repartition(parts)
      .agg(cms_agg(col("tool"), 0.0001, 0.01).as("cms"))
      .collect()(0).getAs[Array[Byte]](0)
    val one = blob(1)
    assert(blob(8).sameElements(one), "8-partition blob diverged")
    assert(blob(3).sameElements(one), "3-partition blob diverged")
    assert(one(1) == graft.sketch.CountMin.VER, "eval output must be dense")
  }

  test("hll + bloom blobs byte-identical across partitionings (sparse wire)") {
    val toolRows = turns.where(col("tool").isNotNull)
    def blobs(parts: Int): (Array[Byte], Array[Byte]) = {
      val r = toolRows.repartition(parts)
        .agg(hll_agg(col("tool"), 14).as("h"),
          bloom_agg(col("tool"), 1 << 16, 0.0039).as("b"))
        .collect()(0)
      (r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1))
    }
    val (h1, b1) = blobs(1)
    val (h8, b8) = blobs(8)
    assert(h8.sameElements(h1), "hll blob diverged across partitionings")
    assert(b8.sameElements(b1), "bloom blob diverged across partitionings")
    assert(h1(1) == graft.sketch.Hll.VER && b1(1) == graft.sketch.Bloom.VER,
      "eval outputs must be dense")
  }

  test("cms estimate expression matches exact within bound end-to-end") {
    val eps = 0.0005
    val toolRows = turns.where(col("tool").isNotNull)
    val sk = toolRows.agg(cms_agg(col("tool"), eps, 0.01).as("cms"))
    val joined = toolRows.groupBy("tool").count()
      .crossJoin(broadcast(sk))
      .select(col("tool"), col("count"),
        cms_estimate(col("cms"), col("tool")).as("est"),
        cms_total(col("cms")).as("n"))
      .collect()
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))
      assert(r.getLong(2) <= r.getLong(1) + math.max(1, (eps * r.getLong(3)).toLong))
    }
  }

  test("bloom: all member shingles found; held-out fpr within bound") {
    val fpp = 0.01
    val sh = turns.select(col("role"), explode(shingles(col("text"), 8)).as("h"))
    val filters = sh.groupBy("role")
      .agg(bloom_agg_hashed(col("h"), 200000, fpp).as("bf"))
    // membership: every (role, shingle) pair must hit its own filter
    val misses = sh.join(filters, "role")
      .where(!bloom_contains_hashed(col("bf"), col("h")))
      .count()
    assert(misses == 0, "bloom false negative")
    // held-out: hashes from a disjoint seed-space
    val missRate = spark.range(100000)
      .select(xxhash64(col("id"), lit("heldout")).as("h"))
      .crossJoin(broadcast(filters.where(col("role") === "user")))
      .where(bloom_contains_hashed(col("bf"), col("h")))
      .count() / 100000.0
    assert(missRate <= 3 * fpp, s"fpr=$missRate")
  }

  test("kll + tdigest: turn-length quantiles within rank error vs exact") {
    val lens = turns.select(length(col("text")).cast("double").as("len"))
    val sk = lens.agg(
      kll_agg(col("len"), 200).as("kll"),
      tdigest_agg(col("len"), 100).as("td")).collect()(0)
    val kll = graft.sketch.Kll.fromBytes(sk.getAs[Array[Byte]](0))
    val td = graft.sketch.TDigest.fromBytes(sk.getAs[Array[Byte]](1))
    val exact = lens.orderBy("len").collect().map(_.getDouble(0))
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val rk = exact.count(_ < kll.quantile(q)).toDouble / exact.length
      val rt = exact.count(_ < td.quantile(q)).toDouble / exact.length
      assert(math.abs(rk - q) <= 3 * kll.rankErrorBound + 0.01, s"kll q=$q rank=$rk")
      assert(math.abs(rt - q) <= 0.02, s"tdigest q=$q rank=$rt")
    }
  }

  test("inter-turn latency quantiles from ts via window lag") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    val lat = turns
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
      .where(col("gap").isNotNull)
      .select(col("gap").cast("double").as("gap"))
    val sk = lat.agg(tdigest_agg(col("gap"), 100).as("td")).collect()(0)
    val td = graft.sketch.TDigest.fromBytes(sk.getAs[Array[Byte]](0))
    val exact = lat.orderBy("gap").collect().map(_.getDouble(0))
    val med = td.quantile(0.5)
    val rank = exact.count(_ < med).toDouble / exact.length
    assert(rank > 0.4 && rank < 0.6, s"median=$med rank=$rank")
  }

  test("array-input sketch agg is byte-identical to exploded-input agg") {
    val withSh = turns.select(col("role"), shingles(col("text"), 8).as("sh"))
    val arr = withSh.groupBy("role").agg(
      hll_agg_hashed(col("sh"), 12).as("h"),
      bloom_agg_hashed(col("sh"), 50000, 0.01).as("b"))
      .orderBy("role").collect()
    val expl = withSh.select(col("role"), explode(col("sh")).as("x"))
      .groupBy("role").agg(
        hll_agg_hashed(col("x"), 12).as("h"),
        bloom_agg_hashed(col("x"), 50000, 0.01).as("b"))
      .orderBy("role").collect()
    arr.zip(expl).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 2).foreach(i => assert(java.util.Arrays.equals(
        a.getAs[Array[Byte]](i), b.getAs[Array[Byte]](i))))
    }
  }

  test("salted two-stage agg is byte-identical to direct agg (hll/bloom/cms)") {
    val direct = turns.groupBy("role").agg(
      hll_agg(col("text"), 12).as("hll"),
      bloom_agg(col("text"), 100000, 0.01).as("bf"),
      cms_agg(col("tool"), 0.001, 0.01).as("cms"))
    val salted = SaltedAgg.twoStage(
      turns, Seq("role"), buckets = 8,
      saltOn = Seq(col("conv_id"), col("turn_idx")),
      partialAggs = Seq(
        hll_agg(col("text"), 12).as("hll_p"),
        bloom_agg(col("text"), 100000, 0.01).as("bf_p"),
        cms_agg(col("tool"), 0.001, 0.01).as("cms_p")),
      finalAggs = Seq(
        hll_merge_agg(col("hll_p"), 12).as("hll"),
        bloom_merge_agg(col("bf_p"), 100000, 0.01).as("bf"),
        cms_merge_agg(col("cms_p"), 0.001, 0.01).as("cms")))
    val d = direct.orderBy("role").collect()
    val s = salted.orderBy("role").collect()
    assert(d.length == s.length)
    d.zip(s).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 3).foreach { i =>
        assert(java.util.Arrays.equals(
          a.getAs[Array[Byte]](i), b.getAs[Array[Byte]](i)),
          s"sketch $i differs for role ${a.getString(0)}")
      }
    }
  }
}
