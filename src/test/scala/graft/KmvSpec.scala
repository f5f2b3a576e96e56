package graft

import graft.operators.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("portable hashSql polynomial equals the conv-based Column hash") {
    // the oracle-side decode (instr digit polynomial) and the engine-side
    // conv() must agree on the same engine before we trust them across
    // engines
    val df = (1L to 500L).toDF("id")
      .select(col("id"), Kmv.hash(col("id"), "graft").as("h_col"),
        // the digit polynomial is verbatim-portable; the id→string cast is
        // caller-side (DuckDB spells it VARCHAR, Spark SQL spells it STRING)
        expr(Kmv.hashSql("CAST(id AS STRING)", "graft")).as("h_sql"))
    assert(df.where(col("h_col") =!= col("h_sql")).count() === 0)
    // hashes live in [0, 2^60)
    val mx = df.agg(max("h_col"), min("h_col")).first()
    assert(mx.getLong(1) >= 0L && mx.getLong(0) < (1L << 60))
  }

  test("estimate is exact below k and within 5 sigma above it") {
    val k = 64
    val small = (1L to 40L).toDF("id").withColumn("g", lit("s"))
    val skS = Kmv.sketch(small, Seq("g"), "id", k)
    val estS = skS.select(Kmv.estimate(col("ks"), k)).first().getDouble(0)
    assert(estS === 40.0)

    val n = 20000L
    val big = (1L to n).toDF("id").withColumn("g", lit("b"))
    val estB = Kmv.sketch(big, Seq("g"), "id", k)
      .select(Kmv.estimate(col("ks"), k)).first().getDouble(0)
    assert(math.abs(estB - n) <= 5.0 * n / math.sqrt(k - 2.0),
      s"est $estB vs exact $n")
  }

  test("merge equals a direct sketch over the union (min-k law)") {
    val k = 32
    val a = (1L to 3000L).toDF("id").withColumn("g", lit("x"))
    val b = (2000L to 6000L).toDF("id").withColumn("g", lit("x"))
    val skA = Kmv.sketch(a, Seq("g"), "id", k).select(col("ks").as("ka"))
    val skB = Kmv.sketch(b, Seq("g"), "id", k).select(col("ks").as("kb"))
    val merged = skA.crossJoin(skB)
      .select(Kmv.merge(col("ka"), col("kb"), k).as("ks"))
      .first().getSeq[Long](0)
    val direct = Kmv.sketch(a.union(b), Seq("g"), "id", k)
      .select("ks").first().getSeq[Long](0)
    assert(merged === direct)
  }

  test("jaccard/intersection estimates: identity, disjoint, and 4-sigma") {
    val k = 128
    def sk(lo: Long, hi: Long) = Kmv
      .sketch((lo to hi).toDF("id").withColumn("g", lit("j")), Seq("g"), "id", k)
      .select("ks").first().getSeq[Long](0)
    def pair(a: Seq[Long], b: Seq[Long]) = Seq((a, b)).toDF("ka", "kb")
      .select(Kmv.jaccardEstimate(col("ka"), col("kb"), k).as("j"),
        Kmv.intersectionEstimate(col("ka"), col("kb"), k).as("i"))
      .first()
    val x = sk(1, 6000)
    val idr = pair(x, x)
    assert(idr.getDouble(0) === 1.0)
    // identical sketches: intersection estimate equals the union estimate
    assert(math.abs(idr.getDouble(1) - 6000.0) <= 5.0 * 6000 / math.sqrt(k - 2))
    val disj = pair(sk(1, 3000), sk(100000, 103000))
    // disjoint sets share no hashes, so the numerator is exactly 0
    assert(disj.getDouble(0) === 0.0 && disj.getDouble(1) === 0.0)
    // 50% overlap: A=[1,6000], B=[3001,9000] → J = 3000/9000 = 1/3
    val half = pair(x, sk(3001, 9000))
    assert(math.abs(half.getDouble(0) - 1.0 / 3) <= 4.0 * math.sqrt(0.25 / k),
      s"jaccard ${half.getDouble(0)}")
    assert(math.abs(half.getDouble(1) - 3000.0) <= 5.0 * 9000 / math.sqrt(k - 2),
      s"intersection ${half.getDouble(1)}")
  }

  test("sketch is invariant to partitioning and row order") {
    val k = 16
    val rows = (1L to 1000L).toDF("id").withColumn("g", lit("p"))
    val s1 = Kmv.sketch(rows.repartition(1), Seq("g"), "id", k)
      .select("ks").first().getSeq[Long](0)
    val s2 = Kmv.sketch(rows.repartition(7, col("id")).orderBy(desc("id")),
      Seq("g"), "id", k).select("ks").first().getSeq[Long](0)
    assert(s1 === s2)
  }
}
