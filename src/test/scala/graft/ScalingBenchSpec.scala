package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic coverage for the scaling protocol's parsing and estimator
  * helpers (no Spark) — the child/parent rep wire format must round-trip
  * exactly or a level-block silently falls back in-process. */
class ScalingBenchSpec extends AnyFunSuite {
  test("rep wire format round-trips through the child stdout line") {
    val line = """[{"rows":1518480,"tps":91222.4,"cpu":68.55,""" +
      """"gc":0.569,"mhz":2100,"steal":0.08},""" +
      """{"rows":1518480,"tps":-1.0,"cpu":386.81,""" +
      """"gc":14.474,"mhz":-1,"steal":65.16}]"""
    val reps = ScalingBench.parseReps(line)
    assert(reps.length == 2)
    assert(reps.head.rows == 1518480L && reps.head.tps == 91222.4 &&
      reps.head.cpuS == 68.55 && reps.head.gcPct == 0.569 &&
      reps.head.mhz == 2100.0 && reps.head.stealS == 0.08)
    assert(reps(1).stealS == 65.16 && reps(1).mhz == -1.0)
    // junk lines parse to empty, which the caller treats as fork failure
    assert(ScalingBench.parseReps("Exception in thread main").isEmpty)
    assert(ScalingBench.parseReps("[]").isEmpty)
  }

  test("rep wire format is locale-independent (comma-decimal JVMs)") {
    // a de_DE default locale would make an f-interpolator print "91222,4"
    // and silently disable the fresh-JVM protocol; repsJson pins ROOT
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      val reps = Seq(
        ScalingBench.Rep(1518480L, 91222.4, 68.55, 0.569, 2100.0, 0.08))
      val parsed = ScalingBench.parseReps(ScalingBench.repsJson(reps))
      assert(parsed == reps, s"wire round-trip broke under de_DE: $parsed")
    } finally java.util.Locale.setDefault(prev)
  }

  test("median is the midpoint convention the artifact documents") {
    assert(Bench.median(Seq(3.0)) == 3.0)
    assert(Bench.median(Seq(1.0, 9.0)) == 5.0)
    assert(Bench.median(Seq(9.0, 1.0, 5.0)) == 5.0)
    assert(Bench.median(Seq(4.0, 1.0, 9.0, 6.0)) == 5.0)
  }

  test("jsonEscape keeps artifact JSON parseable for hostile env values") {
    // input chars: a \ b " c  ->  a \\ b \" c
    assert(Bench.jsonEscape("a\\b\"c") == "a\\\\b\\\"c")
    assert(Bench.jsonEscape("\n\t\u0001") == "\\u000a\\u0009\\u0001")
    assert(Bench.jsonEscape("plain") == "plain")
  }

  test("steal counter read is well-formed on this kernel") {
    val s = ScalingBench.stealTicks()
    assert(s >= 0L, s"/proc/stat steal parse failed: $s")
  }
}
