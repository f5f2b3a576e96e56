package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so the
  * shuffle/broadcast/codegen/pushdown story can be audited by eye.
  * Usage: runMain graft.PlanCheck <sfDir> [queryName ...]
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "classify_exact", "ann_topk",
        "dedup_minhash_lsh", "hll_distinct_users")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    names.foreach { n =>
      println(s"\n===== PLAN: $n =====")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted")))
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
