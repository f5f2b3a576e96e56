package graft

import graft.GraftFunctions._
import graft.sources.Transcripts
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round benchmark main. Prints ONE JSON line:
  * {"metric","value","unit","queries",<extras>,"sf"}.
  *
  * Extras implement the north-rule metric: turns/sec of the one-pass
  * six-sketch build (HLL conv_id + shingles, Bloom shingles, CMS tool,
  * KLL + t-digest of length, GROUP BY role) at two N-vs-4N parallelism
  * pairs on identical parquet input (the sandbox stand-in for N vs 4N
  * executors):
  *   - local[4] vs local[16] — headline: walls at both levels are long
  *     enough that stage-boundary overheads amortize, so it measures the
  *     engine's scaling, as a multi-node cluster would;
  *   - local[8] vs local[32] — reported too: at 32 threads the job's wall
  *     is ~3 s, so utilization drops to 80-86% (stage barrier + the
  *     ~6-task final merge) and CPU-seconds run ~9% above the 8-core
  *     level (memory contention) — both single-box artifacts a real
  *     4N-executor cluster does not share (decomposition measured with
  *     graft.ScalingProbe; see BASELINE.md round-4 section).
  *
  * The Bloom is sized from a cheap sampled-HLL cardinality pre-pass (the
  * reference's layout-planning analogue, taxor_build.cpp:168-233) so the
  * filter is as cache-resident as the data allows.
  */
object Bench {
  /** Contention sentinel: a contaminated bench (another JVM hammering the
    * box) is machine-detectable from the artifact itself — record the
    * 1-minute load average and the number of live java processes (a clean
    * solo run shows exactly 2: the sbt launcher + this forked JVM). */
  private def sentinel(): (Double, Int) = {
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val javas =
      try {
        new java.io.File("/proc").listFiles()
          .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
          .count { d =>
            try new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(d.getPath, "comm"))).trim == "java"
            catch { case _: Throwable => false }
          }
      } catch { case _: Throwable => -1 }
    (math.rint(load * 100) / 100, javas)
  }

  /** Minimal JSON string escape for values interpolated into the artifact
    * (env-sourced text): backslash first, then quote, then control chars —
    * a GRAFT_EXTRA_JVM containing `\` or a newline must not yield an
    * unparseable bench JSON. */
  private[graft] def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Median (even length: mean of the middle two). */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** r4: the scaling pair must compare IDENTICAL WORK. Spark sizes file
    * splits by bytes-per-core, so under defaults the 4-core level ran ~16
    * map tasks while the 16-core level ran ~64 — and each map task emits
    * one partial sketch blob per group (the eps=1e-4 CMS alone is ~1.06 MB
    * per role per task), so the high-core level serialized and merged ~4×
    * the partial volume for the same rows: different physical work, and
    * the ratio systematically punished it. A real N vs 4N executor
    * comparison holds the input split grid fixed; so does the bench now —
    * `ScalingSplits` map tasks at EVERY level (2 input files per split).
    * Measured A/B in one box window (ScalingProbe, per-sample CPU-seconds
    * equalized by the fix): adaptive 0.58/0.77 vs fixed 0.89/0.91. */
  val ScalingInputFiles = 128
  val ScalingSplits = 64

  /** `splitSmallFiles` applies the small-file scan knobs used by the
    * per-query phase: sf0.1 parquet files are a few MB and with the
    * default 4 MB openCostInBytes floor each maps to ONE split, so every
    * scan-rooted stage runs single-task and leaves cores-1 threads idle
    * (observed: classify_* probe stages at 1 task × 1-14 s — the 14 s
    * mode is a fresh codegen class running before C2 compiles it,
    * amplified cores× by the serial stage). The SCALING sessions instead
    * pin `fixedMinPartitions` (= ScalingSplits) so the map-task grid — and
    * with it the partial-blob work — is identical at every level. */
  private[graft] def session(cores: Int, splitSmallFiles: Boolean = true,
      fixedMinPartitions: Int = 0): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (splitSmallFiles) {
      b.config("spark.sql.files.minPartitionNum", cores)
        .config("spark.sql.files.openCostInBytes", 64 * 1024)
    } else if (fixedMinPartitions > 0) {
      b.config("spark.sql.files.minPartitionNum", fixedMinPartitions)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }

  /** C3 planning heuristic: HLL estimate of distinct shingles over the full
    * input (one cheap pre-pass; a row-sample would undercount a long-tail
    * shingle vocabulary and mis-size the filter below its design fpp). */
  private[graft] def estimateDistinctShingles(spark: SparkSession, input: String): Long = {
    val est = spark.read.parquet(input)
      .select(explode(shingles(col("text"), 8)).as("h"))
      .agg(hll_estimate(hll_agg_hashed(col("h"), 14)))
      .first().getDouble(0)
    math.max(4096L, (est * 1.3).toLong)
  }

  /** One-pass six-sketch build over per-turn shingle hash sets; rows/sec. */
  private[graft] def sketchBuildThroughput(
      spark: SparkSession, input: String, bloomItems: Long): (Long, Double) = {
    val turns = spark.read.parquet(input)
      .withColumn("sh", shingles(col("text"), 8))
    val t0 = System.nanoTime()
    val out = turns.groupBy("role").agg(
      hll_agg(col("conv_id"), 14).as("hll_convs"),
      hll_agg_hashed(col("sh"), 14).as("hll_shingles"),
      bloom_agg_hashed(col("sh"), bloomItems, 0.0039).as("bf_shingles"),
      cms_agg(col("tool"), 0.0001, 0.01).as("cms_tools"),
      kll_agg(length(col("text")), 200).as("kll_len"),
      tdigest_agg(length(col("text")), 100).as("td_len"))
    out.collect() // force full execution, result is tiny (|roles| rows)
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = turns.count()
    (rows, rows / secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "90000").toLong
    val sentStart = sentinel()

    // --- per-query timings at the requested parallelism -------------------
    var spark = session(cpus)
    // warm the session first (classloading, whole-stage codegen, parquet
    // footer cache) so the alphabetically-first query is not charged JVM
    // startup — measured ~9s of warmup landing on ann_recall_floor otherwise
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // a crashing query reports the -1 sentinel (never a fast "success").
    // Each query starts from a clean slate: drop any cache a previous
    // query's library call left persisted and hint a GC, so one query's
    // leaked executor state can't be billed to its alphabetical neighbour
    // (observed: classify_bloom_bounds 17s in a sweep vs 2-3s isolated —
    // pure neighbour GC debt).
    def timeQuery(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> timeQuery(name, fn)
    }
    // outlier re-run: a query whose first timing exceeds 10 s gets exactly
    // one re-run and reports the min — observed failure mode is a fresh
    // codegen class running un-JITted for a whole serial stage (10x pure
    // CPU on identical work), which a clean artifact should not carry as
    // that query's cost. Both samples are recorded under "reruns" so the
    // artifact shows what was re-measured and why.
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    val results = firstPass.map { case (name, t1) =>
      if (t1 <= 10.0) name -> t1
      else {
        val t2 = timeQuery(name, SparkEntry.queries(name))
        reruns(name) = (t1, t2)
        name -> (if (t2 < 0) t1 else math.min(t1, t2))
      }
    }
    val failed = results.collect { case (n, t) if t < 0 => n }

    // full iterative profile chain (classify matches → F5/F6 cascade →
    // association filter → erase-worst EM → abundance → CAMI report):
    // driver-side fixpoint + EM loop are not one-SQL-oracle-expressible, so
    // it is timed here (semantics covered by OperatorsSpec)
    val emFullSec = {
      val t0 = System.nanoTime()
      try {
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
          .select(col("source").as("group"), col("text"))
        val qs = docs.where(pmod(col("doc_id"), lit(10)) === 0)
          .select(col("doc_id").as("query_id"), col("text"))
        val matches = graft.operators.Classify
          .exact(corpus, qs, minFraction = 0.05)
          .withColumnRenamed("group", "ref").cache()
        val cascade = graft.operators.ProfilePipeline.lowConfidenceFilter(
          graft.operators.ProfilePipeline.uniqueMappingFilter(matches),
          minUnique = 2, minRatio = 0.01)
        val filtered = if (cascade.isEmpty) matches else cascade
        val resolved =
          graft.operators.ProfilePipeline.associationFilter(filtered)
        val assigned =
          graft.operators.ProfilePipeline.emAssign(resolved, maxIters = 20)
        val abund = graft.operators.ProfilePipeline.abundance(assigned)
        val taxonomy = matches.select(col("ref")).distinct()
          .withColumn("path", array(
            struct(lit(0).as("rank"), lit("all").as("node")),
            struct(lit(1).as("rank"), col("ref").as("node"))))
        graft.operators.ProfilePipeline.camiReport(
          graft.operators.ProfilePipeline.rollup(abund, taxonomy)).count()
        matches.unpersist()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] profile_em_full FAILED: ${e.getMessage}")
        -1.0
      }
    }

    // --- north-rule scaling evidence ---------------------------------------
    val input = java.nio.file.Files
      .createTempDirectory("graft-bench-turns").toString + "/turns"
    // ScalingInputFiles single-row-group files so the fixed split grid
    // (ScalingSplits) packs 2 files per split at every level
    Transcripts.generate(spark, benchConvs)
      .repartition(ScalingInputFiles)
      .write.mode("overwrite").parquet(input)
    val bloomItems = estimateDistinctShingles(spark, input)
    // warm run: primes the OS page cache for the generated input (shared
    // with the forked scaling child) and JITs the agg path for the cmp
    // phase below; the scaling child does its own in-JVM warm-up pair
    sketchBuildThroughput(spark, input, bloomItems)
    spark.stop()

    // --- ours vs Spark built-ins on the identical job ----------------------
    // (same input, same groups: our UDAFs should match or beat the built-in
    // approximate aggregates they correspond to)
    def timeJob(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val cmp = {
      // turns input, not sf tables: default packing (see session scaladoc)
      val s = session(cpus, splitSmallFiles = false)
      val turns = s.read.parquet(input)
      // warm-up + best-of-3: the cmp phase is short enough that a single
      // throttle window can double one side's reading (observed: KLL ours
      // 0.3 → 4.1 s in one artifact); a third timed rep bounds that
      def best(f: => Unit): Double = { f; Seq(timeJob(f), timeJob(f), timeJob(f)).min }
      val builtinHll = best(turns.groupBy("role")
        .agg(approx_count_distinct(col("conv_id"), 0.0081)).collect())
      val oursHll = best(turns.groupBy("role")
        .agg(hll_estimate(hll_agg(col("conv_id"), 14))).collect())
      // error-matched: accuracy=100 gives ~1% rank error like KLL k=200
      val builtinPct = best(turns.groupBy("role")
        .agg(percentile_approx(length(col("text")), lit(0.5), lit(100)))
        .collect())
      val oursKll = best(turns.groupBy("role")
        .agg(kll_quantile(kll_agg(length(col("text")), 200), 0.5)).collect())
      // heavy-hitter enumeration: Spark has no built-in enumerating top-k —
      // the baseline is the exact pass (groupBy every key, global sort,
      // limit). topk_agg shuffles O(capacity) counter blobs instead of one
      // row per distinct key, at the documented eps = 1/(capacity+1) cost.
      val exactTopk = best(turns.groupBy("tool").count()
        .orderBy(col("count").desc, col("tool")).limit(10).collect())
      val oursTopk = best(turns
        .agg(topk_items(topk_agg(col("tool"), 64), 10)).collect())
      s.stop()
      (builtinHll, oursHll, builtinPct, oursKll, exactTopk, oursTopk)
    }

    // Scaling rounds: every level-block runs in its OWN forked fresh JVM
    // (graft.ScalingBench — protocol, root-cause history and the
    // per-round CPU/GC diagnostics are documented there; run it
    // standalone for an identical-protocol replay). The orchestration
    // below is cheap and runs in this JVM; only measurement is isolated.
    val sentScaling = sentinel()
    val scalingJson = ScalingBench.run(input, bloomItems)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rerunsJson = reruns.map { case (k, (a, b)) =>
      "\"" + k + "\":[" + a + "," + b + "]"
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    def r3(x: Double) = math.rint(x * 1000) / 1000
    val artifact =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""failed":$failedJson,"reruns":$rerunsJson,""" +
        s""""profile_em_full_sec":${r3(emFullSec)},""" +
        s""""sketch_build":$scalingJson,""" +
        s""""sentinel":{"load_avg_start":${sentStart._1},""" +
        s""""java_procs_start":${sentStart._2},""" +
        s""""load_avg_scaling":${sentScaling._1},""" +
        s""""java_procs_scaling":${sentScaling._2},""" +
        s""""clean_java_procs":2,""" +
        // a leftover ScalingProbe GC experiment (GRAFT_EXTRA_JVM) would
        // silently change the JVM under the headline numbers — record it
        // so a contaminated artifact is self-evident (clean = "")
        s""""extra_jvm":"${jsonEscape(
          sys.env.getOrElse("GRAFT_EXTRA_JVM", ""))}"},""" +
        s""""vs_builtin":{"hll_builtin_sec":${r3(cmp._1)},""" +
        s""""hll_ours_sec":${r3(cmp._2)},""" +
        s""""pctile_builtin_sec":${r3(cmp._3)},""" +
        s""""kll_ours_sec":${r3(cmp._4)},""" +
        s""""topk_exact_sec":${r3(cmp._5)},""" +
        s""""topk_ours_sec":${r3(cmp._6)}},""" +
        s""""sf":"$sfDir"}"""
    // the committed r4 artifact kept only the tail of the bench stdout
    // (sbt buffering truncated the first half of the per-query map) — the
    // artifact is also written to a file so the committed record is
    // self-contained regardless of how stdout is captured
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_last.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), artifact + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: $e")
    }
    println(artifact)
  }
}
