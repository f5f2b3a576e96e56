package graft

import graft.GraftFunctions._
import graft.sources.{SketchCheckpoint, Transcripts}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** North-rule resume test: kill after partial commit (drop commit records),
  * rerun, assert final sketches byte-identical to a single-shot run. */
class CheckpointSpec extends AnyFunSuite with SparkTestBase {
  private def rmrf(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  private val partialAggs = Seq(
    hll_agg(col("conv_id"), 12).as("hll"),
    bloom_agg(col("text"), 100000, 0.01).as("bf"),
    cms_agg(col("tool"), 0.001, 0.01).as("cms"))
  private val mergeAggs = Seq(
    hll_merge_agg(col("hll"), 12).as("hll"),
    bloom_merge_agg(col("bf"), 100000, 0.01).as("bf"),
    cms_merge_agg(col("cms"), 0.001, 0.01).as("cms"))

  test("resume after simulated kill produces byte-identical sketches") {
    val tmp = Files.createTempDirectory("graft-ckpt").toString
    val input = s"$tmp/input"
    Transcripts.generate(spark, 200).repartition(8)
      .write.parquet(input)

    // single-shot reference run
    val ref = SketchCheckpoint.buildOrResume(spark, input, s"$tmp/run_ref",
      Seq("role"), partialAggs, mergeAggs, filesPerChunk = 2)
      .orderBy("role").collect()

    // first run, then simulate a crash: drop half the commit records AND
    // their partials (as if those chunks never finished)
    SketchCheckpoint.buildOrResume(spark, input, s"$tmp/run_kill",
      Seq("role"), partialAggs, mergeAggs, filesPerChunk = 2)
    val commits = Files.list(Paths.get(s"$tmp/run_kill/_commits"))
      .iterator().asScala.toSeq
      .filter { p => // skip Hadoop LocalFS .crc sidecars
        val n = p.getFileName.toString
        n.endsWith(".json") && !n.startsWith(".")
      }
      .sortBy(_.getFileName.toString)
    val toKill = commits.drop(commits.size / 2)
    toKill.foreach { c =>
      val id = c.getFileName.toString.stripSuffix(".json")
      Files.delete(c)
      val crc = c.getParent.resolve(s".$id.json.crc")
      if (Files.exists(crc)) Files.delete(crc)
      rmrf(Paths.get(s"$tmp/run_kill/partials/chunk=$id"))
    }
    val resumed = SketchCheckpoint.buildOrResume(spark, input, s"$tmp/run_kill",
      Seq("role"), partialAggs, mergeAggs, filesPerChunk = 2)
      .orderBy("role").collect()

    assert(ref.length == resumed.length && ref.nonEmpty)
    ref.zip(resumed).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 3).foreach { i =>
        assert(java.util.Arrays.equals(
          a.getAs[Array[Byte]](i), b.getAs[Array[Byte]](i)),
          s"sketch $i differs for role ${a.getString(0)} after resume")
      }
      assert(a.getLong(4) == b.getLong(4), "rows_seen differs")
    }
    // manifest records the resume
    val manifest = Files.readString(Paths.get(s"$tmp/run_kill/manifest.json"))
    assert(manifest.contains("\"resumed_chunks\":"))
    // commit records carry lineage + metrics
    val commit = Files.readString(
      Files.list(Paths.get(s"$tmp/run_kill/_commits")).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".json") &&
          !p.getFileName.toString.startsWith("."))
        .next())
    assert(commit.contains("\"files\":[") && commit.contains("\"rows_per_sec\":"))
    rmrf(Paths.get(tmp))
  }
}
