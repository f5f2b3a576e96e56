package graft

import org.apache.spark.sql.SparkSession

/** One-off per-query timing probe: `runMain graft.TimeQuery <sfDir>
  * <query...>` — runs each named SparkEntry query SPARK_GRAFT_REPS times
  * (default 2) in one warmed JVM and prints each wall time. For isolating
  * a single query's cost from the full Bench sweep (JIT/GC/neighbour
  * effects).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: TimeQuery <sfDir> <query...>  (reps via SPARK_GRAFT_REPS, default 2)")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val names = args.drop(1)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, args(0)).count()
        println(f"[timequery] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
