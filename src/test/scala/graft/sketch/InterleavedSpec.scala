package graft.sketch

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

class InterleavedSpec extends AnyFunSuite {
  private def rnd(seed: Long, n: Int): Array[Long] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextLong())
  }

  private def check(bins: Int): Unit = {
    // per-bin filters with overlapping member sets, same params
    val filters = (0 until bins).map { b =>
      val f = Bloom.empty(500, 0.01, seed = 9)
      rnd(100 + b, 300).foreach(Bloom.update(f, _))
      rnd(7, 50).foreach(Bloom.update(f, _)) // shared across all bins
      f
    }
    val blob = Interleaved.fromFilters(filters)
    assert(Interleaved.nBins(blob) === bins)
    val probes = rnd(7, 50) ++ rnd(100, 120) ++ rnd(999, 80)
    val arr = new GenericArrayData(probes)
    val bulk = Interleaved.countContained(blob, arr)
    // bulk count per bin == probing that bin's flat filter alone
    (0 until bins).foreach { b =>
      val expect = probes.count(Bloom.contains(filters(b), _))
      assert(bulk(b) === expect, s"bin $b of $bins")
    }
  }

  test("bulk count matches per-filter probes (single-word blocks)") {
    check(20)
  }

  test("bulk count matches per-filter probes across word boundaries") {
    check(70) // blocks span two 64-bit words; bins 64..69 exercise word 1
    check(64) // exact word boundary
    check(1)
  }

  test("mismatched filter params are rejected") {
    val a = Bloom.empty(500, 0.01, seed = 1)
    val b = Bloom.empty(500, 0.01, seed = 2)
    intercept[IllegalArgumentException] {
      Interleaved.fromFilters(Seq(a, b))
    }
  }
}
