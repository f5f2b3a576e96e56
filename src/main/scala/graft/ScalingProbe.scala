package graft

import graft.sources.Transcripts

/** Scaling-phase isolation probe: runs ONLY the north-rule sketch-build
  * throughput job at the requested core counts and prints, per sample, the
  * shared-JVM-resource diagnostics the full Bench cannot afford to
  * interleave — GC time fraction, process CPU utilisation, and the mean
  * core frequency — so a sub-linear N→4N reading can be attributed (GC
  * contention vs clock throttle vs genuine engine serialization) instead
  * of guessed at.
  *
  * Usage (run ALONE, like Bench):
  *   sbt -batch "runMain graft.ScalingProbe 4 16 4 16"
  *   GRAFT_EXTRA_JVM="-XX:+UseParallelGC" sbt -batch "runMain graft.ScalingProbe 4 16"
  * Reps per level via SPARK_GRAFT_REPS (default 2), input size via
  * SPARK_GRAFT_BENCH_CONVS (default 90000 conversations).
  */
object ScalingProbe {
  import ScalingBench.{gcMillis, cpuNanos, meanMhz}

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScalingProbe <cores>...")
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "90000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    // defaults = Bench's committed scaling protocol (fixed split grid);
    // overrides for A/B: SPARK_GRAFT_ADAPTIVE=1 (legacy bytes-per-core
    // splitting), SPARK_GRAFT_WAVES=w (w*cores splits), or
    // SPARK_GRAFT_FIXED_SPLITS=n; SPARK_GRAFT_INPUT_FILES for the grid.
    val inFiles = sys.env.getOrElse("SPARK_GRAFT_INPUT_FILES",
      Bench.ScalingInputFiles.toString).toInt
    val adaptive = sys.env.get("SPARK_GRAFT_ADAPTIVE").contains("1")
    val minPartsFor: Int => Int =
      sys.env.get("SPARK_GRAFT_WAVES").map(w => (c: Int) => w.toInt * c)
        .orElse(sys.env.get("SPARK_GRAFT_FIXED_SPLITS")
          .map(n => (_: Int) => n.toInt))
        .getOrElse((_: Int) => Bench.ScalingSplits)
    val gen = Bench.session(32, splitSmallFiles = false)
    val input = java.nio.file.Files
      .createTempDirectory("graft-scaling-probe").toString + "/turns"
    Transcripts.generate(gen, convs).repartition(inFiles)
      .write.mode("overwrite").parquet(input)
    val bloomItems = Bench.estimateDistinctShingles(gen, input)
    Bench.sketchBuildThroughput(gen, input, bloomItems) // warm JIT/page cache
    gen.stop()
    args.map(_.toInt).foreach { cores =>
      System.gc()
      val s = Bench.session(cores, splitSmallFiles = false,
        fixedMinPartitions = if (adaptive) 0 else minPartsFor(cores))
      (1 to reps).foreach { i =>
        val gc0 = gcMillis()
        val cpu0 = cpuNanos()
        val (rows, tps) = Bench.sketchBuildThroughput(s, input, bloomItems)
        val wall = rows / tps
        val gcMs = gcMillis() - gc0
        val cpuS = (cpuNanos() - cpu0) / 1e9
        println(f"[probe] cores=$cores rep=$i tps=${tps.toLong}%d " +
          f"wall=$wall%.2fs cpu=$cpuS%.1fs " +
          f"(util=${cpuS / wall / cores * 100}%.0f%% of $cores cores) " +
          f"gc=${gcMs}ms (${gcMs / 10.0 / wall}%.1f%% of wall) " +
          f"mhz=${meanMhz()}%.0f")
      }
      s.stop()
    }
  }
}
