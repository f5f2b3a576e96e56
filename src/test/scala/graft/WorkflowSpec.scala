package graft

import graft.functions.Thresholds
import graft.operators.{Classify, ProfilePipeline}
import graft.sources.Tsv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** End-to-end "a reference user could switch" workflow: the taxor
  * build → search → profile CLI flow re-expressed on this engine —
  * classify queries against grouped references under an adaptive CI
  * threshold, persist/re-read the search-results TSV, run the profile
  * cascade + EM, and emit all three CAMI artifacts.
  */
class WorkflowSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("taxor-style end-to-end: search -> TSV -> profile -> CAMI files") {
    val corpus = Seq(
      ("gA", "alpha beta gamma delta epsilon zeta eta theta " * 12),
      ("gB", "one two three four five six seven eight nine ten " * 12),
      ("gC", "red orange yellow green blue indigo violet colors " * 12)
    ).toDF("group", "text")
    val queries = Seq(
      (1L, "one two three four five six seven eight nine ten " * 6),
      (2L, ("alpha beta gamma delta epsilon zeta eta theta " * 6)
        .replace("gamma", "gamXa")), // mutated copy of gA
      (3L, "red orange yellow green blue indigo violet colors " * 6),
      (4L, "zzz qqq xxx www unmatched garbage vvv uuu ttt sss " * 6)
    ).toDF("query_id", "text")

    // -- search under the k-mer CI threshold (SF10 inside the plan) --------
    val classified = Classify.exactCI(corpus, queries,
      Thresholds.KmerCI(8, 0.05))
    val withNulls = Classify.withUnmatched(classified, queries)

    // -- search-results TSV round trip (IO3/IO8) ---------------------------
    val tmp = Files.createTempDirectory("graft-workflow").toString
    val tsv = withNulls.select(
      col("query_id").cast("string").as("QUERY_NAME"),
      col("group").as("ACCESSION"),
      col("group").as("REFERENCE_NAME"),
      col("group").as("TAXID"),
      lit(0L).as("REF_LEN"),
      coalesce(col("query_n"), lit(0L)).as("QUERY_LEN"),
      coalesce(col("query_n"), lit(0L)).as("QHASH_COUNT"),
      coalesce(col("match_cnt"), lit(0L)).as("QHASH_MATCH"),
      col("group").as("TAX_STR"),
      col("group").as("TAX_ID_STR"))
    Tsv.writeSearchResults(tsv, s"$tmp/search_results")
    val back = Tsv.readSearchResults(spark, s"$tmp/search_results")
    assert(back.count() == withNulls.count())
    assert(back.where(col("TAXID").isNull).count() == 1, "garbage query " +
      "must round-trip as the reference's '-' null row")

    // -- profile: cascade + erase-worst EM + abundance + rollup ------------
    val matches = back.where(col("TAXID").isNotNull)
      .select(col("QUERY_NAME").as("query_id"), col("TAXID").as("ref"),
        col("QHASH_MATCH").as("match_cnt"), col("QHASH_COUNT").as("query_n"))
    val assigned = ProfilePipeline.emAssign(
      ProfilePipeline.uniqueMappingFilter(matches), maxIters = 10)
    val got = assigned.select("query_id", "ref").as[(String, String)]
      .collect().toMap
    assert(got == Map("1" -> "gB", "2" -> "gA", "3" -> "gC"), s"$got")

    val taxonomy = matches.select("ref").distinct()
      .withColumn("path", array(
        struct(lit(0).as("rank"), lit("root").as("node")),
        struct(lit(1).as("rank"), col("ref").as("node"))))
    val report = ProfilePipeline.camiReport(
      ProfilePipeline.rollup(ProfilePipeline.abundance(assigned), taxonomy))

    // -- all three CAMI artifacts (IO9) ------------------------------------
    ProfilePipeline.writeCami(report, s"$tmp/profile.cami", "wf")
    val binning = back.select(col("QUERY_NAME").as("query_id"),
      col("TAXID").as("taxid")).distinct()
    ProfilePipeline.writeBinning(binning, s"$tmp/binning.cami", "wf")
    val seqAbund = ProfilePipeline.rollup(
        ProfilePipeline.abundance(assigned), taxonomy)
      .where(col("rank") === 1)
      .select(col("node").as("taxid"), lit("species").as("rank"),
        concat(lit("root;"), col("node")).as("taxpath"),
        concat(lit("root;"), col("node")).as("taxpathsn"), col("pct"))
    ProfilePipeline.writeSequenceAbundance(seqAbund, s"$tmp/seq_abund.cami",
      "wf", unclassifiedPct = Some(0.25))

    val profLines = Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/profile.cami"))
    assert(profLines.get(0) == "@SampleID:wf")
    // rank-0 row is 100% of assigned abundance
    assert(profLines.get(3).startsWith("0\troot\t100.00"))
    val binLines = Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/binning.cami"))
    assert(binLines.size == 3 + 4, s"one row per query: $binLines")
    assert(binLines.contains("4\t-"), "unmatched query must emit '-'")
    val saLines = Files.readAllLines(
      java.nio.file.Paths.get(s"$tmp/seq_abund.cami"))
    assert(saLines.get(4).startsWith("unclassified\tno rank\t-\t-\t25"))
    // the three assigned refs each carry a species row
    assert(saLines.size == 5 + 3, s"$saLines")
  }

  test("curation pipeline: quality -> dedup -> decontaminate -> split -> export") {
    import graft.operators.{Dedup, Sampling, TextStats}
    val prose = "the quick brown fox jumps over the lazy dog and it runs " +
      "to the hills for a while and then it rests in the shade "
    val evalLeak = "EVAL-SET-ITEM-THE-EXACT-QUESTION-TEXT-0123456789-" * 3
    val docs = Seq(
      (1L, prose * 6),                       // good prose
      (2L, prose * 6),                       // exact dup of 1
      (3L, prose.replace("fox", "cat") * 6), // near dup of 1
      (4L, "a b " * 200),                    // degenerate repetition
      (5L, "training article with an original body of words standing " +
        "alone apart from every other document in this corpus " * 4 +
        evalLeak),                           // contaminated by the eval set
      (6L, "entirely different prose on sketching engines and data " +
        "streams merging partial summaries across executors at scale " * 6 +
        " contact admin@example.com or 555-123-4567 ref 987654321012"),
      (7L, ("qzxv wkjq mzzw pqvt zkkw xqwj vbnm grtx plmk juhy bgtr " +
        "cdwq xswz mkop vfrt byhn qazx wsed rfgb tyhj ikol zaqw xcde " +
        "vbgt nhyu mjik pluo qwas erdf tgyh ") * 6) // shape-plausible gibberish
    ).toDF("doc_id", "text")
    val heldout = Seq((900L, "question preamble " + evalLeak))
      .toDF("doc_id", "text")

    // 1. quality gate: token-shape flags drop the degenerate doc
    val quality = TextStats.qualityFlags(docs, "doc_id", "text")
    val good = docs.join(
      quality.where(col("is_quality")).select("doc_id"), "doc_id")
    val goodIds = good.select("doc_id").as[Long].collect().toSet
    assert(!goodIds.contains(4L), "degenerate doc survived the quality gate")
    assert(Set(1L, 2L, 3L, 5L, 6L, 7L).subsetOf(goodIds),
      "the gibberish doc has plausible token shape — only the LM drops it")

    // 1b. LM perplexity filter (CCNet): train a char-trigram model on a
    //     TRUSTED reference corpus covering the domain language, drop docs
    //     whose per-char NLL exceeds the cutoff — catches shape-plausible
    //     gibberish the token-shape gate cannot see. The reference must be
    //     big enough that Laplace smoothing stops dominating seen trigrams
    //     (a 3x-prose reference scored EVERYTHING at ~3000+ milli-nats).
    //     Measured: survivors 1642-2938, rejects 4131/4588 — cutoff 3500.
    val reference = Seq(prose * 20,
      ("training article with an original body of words standing " +
        "alone apart from every other document in this corpus ") * 8,
      ("entirely different prose on sketching engines and data " +
        "streams merging partial summaries across executors at scale ") * 8
    ).toDF("text")
    val model = TextStats.charNgramCounts(reference, "text", 3)
    val lmScored = TextStats.lmScore(good, "doc_id", "text", model, 3)
      .withColumn("nll_milli_per_char",
        round(col("nll") * 1000 / greatest(col("n_pos"), lit(1L))))
    val lmGood = good.join(lmScored.where(col("nll_milli_per_char") < 3500)
      .select("doc_id"), "doc_id")
    val lmIds = lmGood.select("doc_id").as[Long].collect().toSet
    assert(!lmIds.contains(7L), "gibberish survived the LM filter")
    assert(Set(1L, 2L, 3L, 5L, 6L) == lmIds, s"LM mis-filtered: $lmIds")

    // 2. exact + near dedup: keep canonical copies only
    val canon = Dedup.nearDupCanonical(lmGood, "doc_id", "text",
      numBands = 32, rowsPerBand = 4, threshold = 0.6)
    val keep = canon.where(col("is_canonical"))
      .select("doc_id").as[Long].collect().toSet
    assert(!keep.contains(2L), "exact duplicate kept")
    assert(!keep.contains(3L), "near duplicate kept")
    assert(keep.contains(1L))

    // 3. decontamination: drop training docs sharing a span with the eval set
    val deduped = lmGood.join(canon.where(col("is_canonical"))
      .select("doc_id"), "doc_id")
    val leaked = Dedup.crossSpanContamination(deduped, "doc_id",
      heldout, "doc_id", "text")
      .select("train_id").as[Long].collect().toSet
    assert(leaked == Set(5L), s"expected exactly the planted leak: $leaked")
    val clean = deduped.join(leaked.toSeq.toDF("doc_id"), Seq("doc_id"),
      "left_anti")

    // 4. PII scrub: redact sensitive spans from the surviving docs and
    //    carry the redacted text (not the original) into the final split
    val scrubbed = TextStats.piiScrub(clean, "doc_id", "text")
    val row6 = scrubbed.where(col("doc_id") === 6L)
      .select("n_email", "n_phone", "n_digit_run", "redacted")
      .as[(Long, Long, Long, String)].head()
    assert((row6._1, row6._2, row6._3) == (1L, 1L, 1L), s"$row6")
    assert(row6._4.contains("[EMAIL]") && row6._4.contains("[PHONE]") &&
      row6._4.contains("[NUMBER]"))
    assert(!row6._4.contains("admin@") && !row6._4.contains("555-123"))
    assert(scrubbed.where(col("doc_id") === 1L)
      .where(col("n_email") + col("n_secret") + col("n_phone") +
        col("n_digit_run") === 0).count() == 1, "clean doc got redactions")
    val cleanRedacted = clean.drop("text").join(
      scrubbed.select(col("doc_id"), col("redacted").as("text")), "doc_id")

    // 5. deterministic split: assignment is append-stable — re-splitting
    //    the cleaned subset gives the same labels as splitting everything
    val all = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.9,
      "holdout" -> 0.1)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val sub = Sampling.hashSplit(cleanRedacted, "doc_id", Seq("train" -> 0.9,
      "holdout" -> 0.1)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, sp) => all(id) == sp })
    assert(sub.keySet == Set(1L, 6L), s"pipeline survivors: ${sub.keySet}")

    // 6. corpus export: the train split leaves the pipeline as
    //    deterministic dataloader shards — a permutation of exactly the
    //    surviving train docs, reproducible on a re-run of the whole chain
    val trainDocs = cleanRedacted.join(
      sub.filter(_._2 == "train").keys.toSeq.toDF("doc_id"), "doc_id")
    val shards = Sampling.exportShards(trainDocs, "doc_id", nShards = 2)
      .select("doc_id", "shard", "ord")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(shards.map(_._1) == sub.filter(_._2 == "train").keys.toSeq.sorted,
      "export is not a permutation of the train survivors")
    shards.groupBy(_._2).values.foreach(rs =>
      assert(rs.map(_._3).sorted == (1L to rs.size).toSeq))
    val replayed = Sampling.exportShards(trainDocs, "doc_id", nShards = 2)
      .select("doc_id", "shard", "ord")
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    assert(replayed == shards, "export changed across pipeline re-runs")
  }

  test("transcript pipeline: integrity -> conv dedup -> sessionize -> pack") {
    import graft.operators.{Conversations, Sampling}
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    def conv(id: String, base: Long, gaps: Seq[Long]): Seq[(String, Int, String, String, java.sql.Timestamp)] = {
      var t = base
      gaps.zipWithIndex.map { case (g, i) =>
        t += g
        (id, i, if (i % 2 == 0) "user" else "assistant",
          s"$id words of turn number $i in this conversation", ts(t))
      }
    }
    val turns = (
      conv("t00", 1000, Seq(0, 30, 30, 500, 30, 30)) ++   // clean, 2 sessions
      conv("t01", 9000, Seq(0, 40, 40, 40)) ++             // clean, 1 session
      conv("t01-re", 9000, Seq(0, 40, 40, 40))             // re-ingested dup of t01
        .map(r => ("t01-re", r._2, r._3,
          r._4.replace("t01-re", "t01"), r._5)) ++         // same (role, text)!
      conv("t02", 20000, Seq(0, 30, 30)).filter(_._2 != 1) // broken: gap at idx 1
    ).toDF("conv_id", "turn_idx", "role", "text", "ts")

    // 1. structural gate: drop conversations with gaps / duplicate indices
    val ok = Conversations.integrity(turns).where(col("gapless"))
      .select("conv_id")
    val okIds = ok.as[String].collect().toSet
    assert(okIds == Set("t00", "t01", "t01-re"), s"integrity kept: $okIds")
    val intact = turns.join(ok, "conv_id")

    // 2. conversation-level dedup: the re-ingested copy collapses onto t01
    val canon = Conversations.dedup(intact)
    val keep = canon.where(col("is_canonical")).select("conv_id")
    assert(canon.where(!col("is_canonical")).select("conv_id")
      .as[String].collect().toSeq == Seq("t01-re"))
    val deduped = intact.join(keep, "conv_id")

    // 3. sessionize: t00 splits at its 500s gap, t01 stays whole
    val sess = Conversations.sessionize(deduped, gapSeconds = 300)
    val t00Sessions = sess.where(col("conv_id") === "t00")
      .select("turn_idx", "session_idx").orderBy("turn_idx")
      .as[(Int, Long)].collect().toSeq
    assert(t00Sessions.map(_._2) == Seq(0L, 0L, 0L, 1L, 1L, 1L))
    assert(sess.where(col("conv_id") === "t01")
      .where(col("session_idx") =!= 0).count() == 0)

    // 4. assemble one training document per (conv, session) — ordered turn
    //    concat, the same fingerprint ordering contract — and pack into
    //    fixed context windows for the dataloader
    val sessionDocs = sess
      .groupBy(col("conv_id"), col("session_idx"))
      .agg(array_join(transform(
          sort_array(collect_list(struct(col("turn_idx"), col("role"),
            col("text")))),
          x => concat(x("role"), lit(": "), x("text"))), "\n").as("text"))
      .select(concat(col("conv_id"), lit("#"),
        col("session_idx").cast("string")).as("doc_id"), col("text"))
    assert(sessionDocs.count() == 3) // t00#0, t00#1, t01#0
    val withTokens = sessionDocs
      .withColumn("stratum", lit("all"))
      .withColumn("n_tokens",
        size(split(trim(col("text")), "[ \n]+")).cast("long"))
    val packed = Sampling.packWindows(
      withTokens, Seq("stratum"), "doc_id", "n_tokens", ctxTokens = 32)
    // every session-document lands exactly once; the window stream is
    // gapless (last pack_start + its tokens == total token count)
    assert(packed.count() == 3)
    val total = withTokens.agg(sum(col("n_tokens"))).as[Long].head()
    val end = packed.agg(max(col("pack_start") + col("n_tokens")))
      .as[Long].head()
    assert(end == total, s"packing lost tokens: end=$end total=$total")
    // and replaying the whole chain is byte-identical (determinism
    // end-to-end: integrity -> dedup -> sessionize -> pack)
    val again = Sampling.packWindows(
      withTokens, Seq("stratum"), "doc_id", "n_tokens", ctxTokens = 32)
      .orderBy("doc_id").collect().toSeq
    assert(packed.orderBy("doc_id").collect().toSeq == again)

    // 5. SFT alternative: pack the TURNS directly with a loss mask —
    //    assistant tokens train, user tokens are context; stream gapless
    val masked = graft.operators.Conversations.packWithLossMask(
      deduped.withColumn("tok",
        size(split(trim(col("text")), "[ ]+")).cast("long")),
      "tok", ctxTokens = 32)
    assert(masked.where(col("trainable")).select("role").distinct()
      .as[String].collect().toSeq == Seq("assistant"))
    val mTotal = masked.agg(sum(col("tok"))).as[Long].head()
    val mEnd = masked.agg(max(col("pack_start") + col("tok")))
      .as[Long].head()
    assert(mEnd == mTotal, "loss-mask packing lost tokens")

    // 6. drift gate between corpus versions: dedup must NOT move the
    //    turn-length distribution (the removed copy's texts are identical
    //    to its canonical's), while a planted truncation bug must alarm
    import graft.operators.Drift
    val v1 = intact.select(length(col("text")).cast("double").as("len"))
    val v2 = deduped.select(length(col("text")).cast("double").as("len"))
    val clean = Drift.ksDistance(v1, "len", v2, "len")
    assert(clean.estimate <= clean.slack,
      s"dedup moved the length distribution: ${clean.estimate}")
    val buggy = deduped
      .select(least(length(col("text")), lit(8)).cast("double").as("len"))
    val alarm = Drift.ksDistance(v2, "len", buggy, "len")
    assert(alarm.estimate >= 0.9, s"truncation bug not flagged: $alarm")
  }
}
