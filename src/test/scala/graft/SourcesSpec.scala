package graft

import graft.operators.{Classify, ProfilePipeline}
import graft.sources.{BucketedTable, SketchTable, Timing, Tsv}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class SourcesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("search-results tsv: header, '-' nulls, read-id space cut") {
    val tmp = Files.createTempDirectory("graft-tsv")
    val f = tmp.resolve("res.tsv")
    Files.writeString(f,
      "QUERY_NAME\tACCESSION\tREFERENCE_NAME\tTAXID\tREF_LEN\tQUERY_LEN\t" +
        "QHASH_COUNT\tQHASH_MATCH\tTAX_STR\tTAX_ID_STR\n" +
        "read1 extra comment\tACC1\tRef One\t123\t1000\t150\t140\t120\tk__A;p__B\t1;2\n" +
        "read2\t-\t-\t-\t0\t150\t140\t0\t-\t-\n")
    val df = Tsv.readSearchResults(spark, f.toString)
    val rows = df.orderBy("QUERY_NAME").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "read1", "space-cut failed")
    assert(rows(0).getLong(6) == 140)
    assert(rows(1).getString(1) == null && rows(1).getString(8) == null,
      "'-' should decode to null")
  }

  test("bucketed tables: co-located join and agg plan with zero Exchange") {
    val a = (1L to 500L).map(i => (i % 50, i)).toDF("k", "va")
    val b = (1L to 300L).map(i => (i % 50, i * 2)).toDF("k", "vb")
    BucketedTable.write(a, "bt_a", Seq("k"), 8)
    BucketedTable.write(b, "bt_b", Seq("k"), 8)
    assert(BucketedTable.bucketSpec(spark, "bt_a") === ((8, Seq("k"))))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketedTable.colocatedJoin(spark, "bt_a", "bt_b", Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "co-bucketed join must not shuffle either side:\n" + plan)
      // row-identical to the plain join
      val got = j.groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = a.join(b, "k").groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
      // aggregation on the bucket key: also exchange-free
      val agg = BucketedTable.read(spark, "bt_a").groupBy("k").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucket-key agg must not shuffle")
      // loud failures instead of silent shuffles
      BucketedTable.write(b, "bt_c", Seq("k"), 4)
      intercept[IllegalArgumentException] {
        BucketedTable.colocatedJoin(spark, "bt_a", "bt_c", Seq("k"))
      }
      a.write.mode("overwrite").format("parquet").saveAsTable("bt_plain")
      intercept[IllegalArgumentException] {
        BucketedTable.colocatedJoin(spark, "bt_a", "bt_plain", Seq("k"))
      }
      intercept[IllegalArgumentException] {
        BucketedTable.colocatedJoin(spark, "bt_a", "bt_b", Seq("va"))
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("bt_a", "bt_b", "bt_c", "bt_plain")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("taxonomy tsv + path split") {
    val tmp = Files.createTempDirectory("graft-tax")
    val f = tmp.resolve("tax.tsv")
    Files.writeString(f,
      "ACC1\tACC1.1\t562\t561\tE. coli\tk__Bacteria;p__Proteo;s__coli\n")
    val df = Tsv.taxonomyPath(Tsv.readTaxonomy(spark, f.toString))
    val path = df.select(explode(col("path"))).collect()
    assert(path.length == 3)
    assert(path(0).getStruct(0).getString(1) == "k__Bacteria")
    assert(path(2).getStruct(0).getInt(0) == 2)
  }

  test("classify withUnmatched preserves empty queries as null rows") {
    val classified = Seq((1L, "gA", 10L, 20L))
      .toDF("query_id", "group", "match_cnt", "query_n")
    val queries = Seq((1L, "x"), (2L, "y")).toDF("query_id", "text")
    val all = Classify.withUnmatched(classified, queries)
      .orderBy("query_id").collect()
    assert(all.length == 2)
    assert(all(1).getLong(0) == 2L && all(1).isNullAt(1))
  }

  test("cami file writer emits headers and rank-ordered rows") {
    val report = Seq((0, "all", "100.000000"), (1, "left", "50.000000"))
      .toDF("rank", "node", "percentage")
    val tmp = Files.createTempDirectory("graft-cami")
    val path = s"$tmp/profile.cami"
    ProfilePipeline.writeCami(report, path, "sample-1")
    val lines = Files.readAllLines(java.nio.file.Paths.get(path))
    assert(lines.get(0) == "@SampleID:sample-1")
    assert(lines.get(2) == "@@RANK\tNODE\tPERCENTAGE")
    assert(lines.get(3) == "0\tall\t100.000000")
  }

  test("cami sequence-abundance file: @Ranks header, unclassified row, " +
      "6-sig-digit pct (golden)") {
    val report = Seq(
      ("t2", "species", "1;2;t2", "root;g;sp2", 0.5),
      ("t1", "species", "1;2;t1", "root;g;sp1", 1.0 / 3.0),
      ("t9", "genus", "1;t9", "root;g", 5e-9), // below threshold → dropped
      ("t3", "phylum", "1;t3", "root;p", 0.12345678))
      .toDF("taxid", "rank", "taxpath", "taxpathsn", "pct")
    val tmp = Files.createTempDirectory("graft-cami2")
    val path = s"$tmp/seq_abund.cami"
    ProfilePipeline.writeSequenceAbundance(report, path, "s2",
      threshold = 1e-6, unclassifiedPct = Some(0.25))
    val got = Files.readAllLines(java.nio.file.Paths.get(path))
    val want = Seq(
      "@SampleID:s2",
      "@Version:0.10.0",
      "@Ranks:superkingdom|phylum|class|order|family|genus|species",
      "@@TAXID\tRANK\tTAXPATH\tTAXPATHSN\tPERCENTAGE",
      "unclassified\tno rank\t-\t-\t25",
      "t3\tphylum\t1;t3\troot;p\t12.3457", // 6 significant digits
      "t1\tspecies\t1;2;t1\troot;g;sp1\t33.3333", // taxid asc within rank
      "t2\tspecies\t1;2;t2\troot;g;sp2\t50")
    assert(got.toArray.toSeq == want, got)
  }

  test("cami binning file: '-' for unmatched, query order (golden)") {
    val binning = Seq(("read3", "t7"), ("read1", null), ("read2", "t1"))
      .toDF("query_id", "taxid")
    val tmp = Files.createTempDirectory("graft-cami3")
    val path = s"$tmp/binning.cami"
    ProfilePipeline.writeBinning(binning, path, "s3")
    val got = Files.readAllLines(java.nio.file.Paths.get(path))
    val want = Seq(
      "@SampleID:s3", "@Version:0.10.0", "@@SEQUENCEID\tTAXID",
      "read1\t-", "read2\tt1", "read3\tt7")
    assert(got.toArray.toSeq == want, got)
  }

  test("cami binning distributed sink == single-file sink (golden)") {
    val binning = Seq(("read3", "t7"), ("read1", null), ("read2", "t1"))
      .toDF("query_id", "taxid")
    val tmp = Files.createTempDirectory("graft-cami4")
    ProfilePipeline.writeBinning(binning, s"$tmp/single.cami", "s3")
    ProfilePipeline.writeBinningDistributed(binning, s"$tmp/dist", "s3")
    val single = Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/single.cami")).toArray.toSeq
    val dist = ProfilePipeline.readBinningLines(spark, s"$tmp/dist")
    assert(dist == single, s"dist=$dist single=$single")
  }

  test("time-file sink: reference header/precision shape (golden)") {
    val timer = new Timing.PhaseTimer
    timer.add("Index I/O", 1.234)
    timer.add("Reads I/O", 0.5)
    timer.add("Compute", 10.0)
    timer.add("Index I/O", 0.766) // re-entry accumulates
    val tmp = Files.createTempDirectory("graft-time")
    Timing.writeTimeFile(spark, s"$tmp/search_out", timer.phases)
    val got = Files.readAllLines(java.nio.file.Paths.get(s"$tmp/search_out.time"))
    assert(got.get(0) == "Index I/O\tReads I/O\tCompute")
    assert(got.get(1) == "2.00\t0.50\t10.00")
    // contract: positive where the platform exposes them, -1 fallback
    // elsewhere (macOS has no /proc/self/status) — never zero or garbage
    val (cpu, rss) = Timing.cpuAndPeakRss()
    assert(cpu > 0 || cpu == -1.0, s"cpu=$cpu")
    assert(rss > 0 || rss == -1L, s"rss=$rss")
  }

  test("sketch table save/load round-trips data and manifest") {
    val df = Seq(("user", Array[Byte](1, 2, 3))).toDF("role", "hll")
    val tmp = Files.createTempDirectory("graft-st").toString
    SketchTable.save(df, tmp, Map("hll_p" -> "14", "seed" -> "42"))
    val (back, manifest) = SketchTable.load(spark, tmp)
    assert(back.count() == 1)
    assert(manifest.contains("\"hll_p\":\"14\"") &&
      manifest.contains("\"version\":1"))
    assert(SketchTable.params(manifest) ==
      Map("hll_p" -> "14", "seed" -> "42"))
  }

  test("probe-param validation: mismatched probe fails loudly") {
    // the reference's multi-index sanity check (taxor_search.cpp:97-151):
    // probing an index with a different k/seed must error, not mis-answer
    val df = Seq(("user", Array[Byte](1, 2, 3))).toDF("role", "hll")
    val tmp = Files.createTempDirectory("graft-stv").toString
    SketchTable.save(df, tmp, Map("shingle_k" -> "8", "seed" -> "42"))
    // matched probe: unchanged behavior
    val (ok, _) = SketchTable.loadValidated(spark, tmp,
      Map("shingle_k" -> "8", "seed" -> "42"))
    assert(ok.count() == 1)
    // mismatched seed AND a param the manifest never recorded: loud errors
    val e1 = intercept[IllegalArgumentException] {
      SketchTable.loadValidated(spark, tmp, Map("seed" -> "43"))
    }
    assert(e1.getMessage.contains("param mismatch") &&
      e1.getMessage.contains("seed"))
    val e2 = intercept[IllegalArgumentException] {
      SketchTable.loadValidated(spark, tmp, Map("fpp" -> "0.01"))
    }
    assert(e2.getMessage.contains("<absent>"))
  }
}
