package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional trailing args = query-name filter (fast single-gate
    // iteration); oracle_sql.json is filtered to match so check_oracle.py
    // compares exactly what was dumped.
    val (sfDir, outDir, only) = (args(0), args(1), args.drop(2).toSet)
    // a typo'd gate name would otherwise dump nothing and oracle_sql.json
    // = {}, which check_oracle.py passes vacuously — the stale-verify trap
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // split small parquet files to all cores (same knobs as Bench): the
      // sf-table files are a few MB and would otherwise scan single-task
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.files.openCostInBytes", 64 * 1024)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Oracle-SQL invariant guard: every shingle-based oracle caps positions
    // at generate_series(1,1000) and uses CHAR-based substr, while the Spark
    // shingles are BYTE k-grams over the full text. Both are equivalent only
    // while documents.text is ASCII (char == byte) and shorter than 1008
    // bytes — fail loudly here if the data ever violates that, so a gate
    // mismatch is attributed to data, not the engine.
    locally {
      import org.apache.spark.sql.functions._
      val bad = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(octet_length(col("text")) > 1007 ||
          octet_length(col("text")) =!= length(col("text")))
        .count()
      require(bad == 0,
        s"$bad documents violate the oracle invariant (ASCII, <=1007 bytes); " +
          "shingle oracle SQL in SparkEntry.oracleSql is not valid for this data")
    }
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape (shared with the bench artifact writer): a tab or
    // CR in builder-authored SQL would otherwise make the driver's
    // json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + Bench.jsonEscape(s) + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
