package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Self-describing persisted sketch tables (IO6 analogue of the reference's
  * versioned cereal index, /root/reference/src/main/index.hpp:208-244).
  *
  * Layout: `<dir>/data` (parquet: group keys + BINARY sketch columns; the
  * sketch blobs already carry a type+version header — graft.sketch codecs)
  * plus `<dir>/manifest.json` recording the schema, sketch params and seeds
  * so a reader can validate compatibility before merging — deterministic
  * seeds are required for resume and cross-job merge correctness.
  */
object SketchTable {
  case class Params(entries: Map[String, String])

  def save(df: DataFrame, dir: String, params: Map[String, String]): Unit = {
    df.write.mode("overwrite").parquet(s"$dir/data")
    val fs = new Path(dir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val cols = df.schema.fields
      .map(f => s""""${f.name}":"${f.dataType.simpleString}"""").mkString(",")
    val ps = params.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val json = s"""{"version":1,"columns":{$cols},"params":{$ps}}"""
    val out = fs.create(new Path(s"$dir/manifest.json"), true)
    out.write(json.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  /** Manifest-only writer for tables whose data is laid out by the caller
    * (e.g. partitioned parquet for the IVF index). */
  def saveManifestOnly(
      spark: SparkSession, dir: String, params: Map[String, String]): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ps = params.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    val out = fs.create(new Path(s"$dir/manifest.json"), true)
    out.write(s"""{"version":1,"params":{$ps}}"""
      .getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  def readManifest(spark: SparkSession, dir: String): String = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$dir/manifest.json"))
    val manifest = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    in.close()
    manifest
  }

  def load(spark: SparkSession, dir: String): (DataFrame, String) = {
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$dir/manifest.json"))
    val manifest = new String(in.readAllBytes(), StandardCharsets.UTF_8)
    in.close()
    (spark.read.parquet(s"$dir/data"), manifest)
  }
}
