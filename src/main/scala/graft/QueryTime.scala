package graft

import org.apache.spark.sql.SparkSession

/** Variance probe: run named SparkEntry queries N times in one session and
  * print per-repeat wall times. Usage:
  *   runMain graft.QueryTime <sfDir> <reps> <query...>
  * Bimodal timings here (same JVM, same plan) point at cache eviction / GC,
  * not at plan shape — the complement of PlanCheck.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", 64 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    // per-JOB accounting: multi-action gates (index build/append/compact,
    // checked-equality counts) spend their wall in DRIVER job round-trips,
    // not in any one stage — print every job's wall + gap since the last
    // job ended (the gap is pure driver-side work: planning, collect
    // consumption, manifest IO)
    val lastJobEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, j.time)
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = Option(starts.remove(j.jobId)).getOrElse(j.time)
          val prev = lastJobEnd.getAndSet(j.time)
          val gap = if (prev == 0L) 0.0 else (t0 - prev) / 1e3
          println(f"[qtime-job] job=${j.jobId} wall=${(j.time - t0) / 1e3}%.2f s " +
            f"gap=$gap%.2f s")
        }
      })
    // print any stage slower than 2s with its straggler profile, so a slow
    // rep can be attributed to a stage (and to skew vs uniform slowness)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val wall = (for {
            s <- info.submissionTime; c <- info.completionTime
          } yield (c - s) / 1e3).getOrElse(0.0)
          if (wall > 0.5) {
            val m = info.taskMetrics
            println(f"[qtime-stage] stage=${info.stageId} wall=$wall%.1f s " +
              f"tasks=${info.numTasks} " +
              f"cpu=${m.executorCpuTime / 1e9}%.1f s " +
              f"run=${m.executorRunTime / 1e3}%.1f s " +
              f"shRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0f MB " +
              f"shWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0f MB " +
              f"in=${m.inputMetrics.bytesRead / 1e6}%.0f MB " +
              s"rdd=${sc.stageInfo.rddInfos.map(_.name).mkString("|").take(120)}")
          }
        }
      })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        // match the bench's per-query hygiene: without this, caches and
        // GC debt left by earlier gates inflate later ones (observed:
        // semdedup 2.5 s standalone vs 7.3 s ninth-in-session)
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[qtime] $name rep$i: $sec%.2f s ($n rows)")
        sec
      }
      println(f"[qtime] $name min=${times.min}%.2f max=${times.max}%.2f")
    }
    spark.stop()
  }
}
