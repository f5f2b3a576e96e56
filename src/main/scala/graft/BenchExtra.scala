package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extra benchmarks OUTSIDE the frozen driver contract (guide §1.4):
  * isolated timings for heavy composite chains, with the noop sink where
  * a DataFrame is the product. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchExtra <sfDir> [reps]"
  * Prints one [bench-extra] line per measurement; does not touch
  * bench_last.json or the Bench JSON contract.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
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

    def time(name: String)(f: => Unit): Unit =
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        println(f"[bench-extra] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    // the full iterative profile chain exactly as Bench times it
    // (classify matches -> F5/F6 cascade -> association filter ->
    // erase-worst EM maxIters=20 -> abundance -> CAMI report), with a
    // per-phase split so the EM loop is attributable
    time("profile_em_full") {
      def t0 = System.nanoTime()
      var m = t0
      def lap(name: String): Unit = {
        val now = System.nanoTime()
        println(f"[bench-extra]   phase $name: ${(now - m) / 1e9}%.2f s")
        m = now
      }
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
      lap("classify+cascade(isEmpty)")
      val resolved =
        graft.operators.ProfilePipeline.associationFilter(filtered)
      lap("association")
      val assigned =
        graft.operators.ProfilePipeline.emAssign(resolved, maxIters = 20)
      lap("emAssign")
      val abund = graft.operators.ProfilePipeline.abundance(assigned)
      val taxonomy = matches.select(col("ref")).distinct()
        .withColumn("path", array(
          struct(lit(0).as("rank"), lit("all").as("node")),
          struct(lit(1).as("rank"), col("ref").as("node"))))
      graft.operators.ProfilePipeline.camiReport(
        graft.operators.ProfilePipeline.rollup(abund, taxonomy)).count()
      lap("abundance+rollup+report")
      matches.unpersist()
    }
    spark.stop()
  }
}
