package graft.operators

import graft.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  * Everything is built from codegen'd expressions (no UDF objects in the
  * hot path); all outputs are integral/string so the DuckDB oracle can
  * reproduce them byte-for-byte.
  */
object TextStats {
  /** Number of occurrences of `sub` in `c` (classic length-difference
    * trick — mirrors 1:1 into ANSI SQL). */
  def occurrences(c: Column, sub: String): Column =
    (length(c) - length(replace(c, lit(sub), lit("")))) / sub.length

  /** Marker-word scores per language. Integer counts — deterministic. */
  private val markers = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " la ", " et "),
    "zh" -> Seq(" de ", " shi ", " le "))

  def langScores(text: Column): Seq[(String, Column)] =
    markers.map { case (lang, ws) =>
      lang -> ws.map(w => occurrences(text, w)).reduce(_ + _)
    }

  /** Argmax language with fixed tie order (markers order wins ties). */
  def langGuess(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Per-document stats: all integral columns, oracle-mirrorable.
    * avg word length is stored as floor(chars_no_space * 100 / tokens). */
  def docStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(idCol),
      token_count(t).as("n_tokens"),
      length(t).cast("long").as("n_chars"),
      length(regexp_replace(t, lit("\\s"), lit(""))).cast("long")
        .as("n_chars_nospace"),
      floor(length(regexp_replace(t, lit("\\s"), lit(""))) * 100 /
        greatest(token_count(t), lit(1L))).cast("long").as("avg_wordlen_x100"),
      langGuess(t).as("lang_guess"),
      fingerprint(t).as("fingerprint"))
  }

  /** Context-window chunking: split each document into `size`-char chunks
    * every `size - overlap` chars (the standard training-data prep before
    * tokenization). Chunk starts are 0, stride, 2·stride, …, with the count
    * chosen so the final chunk reaches the end of the text (it may be
    * shorter than `size`); a doc shorter than `size` yields one chunk.
    * Pure Catalyst (sequence + substr) — mirrors 1:1 into the SQL oracle.
    * Output: (id, chunk_idx, chunk). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int = 0): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0")
    val stride = size - overlap
    val t = col(textCol)
    val lastIdx = greatest(lit(0L),
      ceil((length(t) - lit(size)).cast("double") / stride))
    df.select(col(idCol),
      posexplode(transform(sequence(lit(0L), lastIdx),
        i => t.substr((i * stride + 1).cast("int"), lit(size))))
        .as(Seq("chunk_idx", "chunk")))
  }

  /** Small fixed English stopword set (public, Fox 1989-style shortlist);
    * occurrences counted with the same length-difference trick so the
    * ratio mirrors 1:1 into the SQL oracle. */
  val Stopwords: Seq[String] = Seq(
    " the ", " and ", " of ", " to ", " a ", " in ", " is ", " that ",
    " it ", " for ")

  /** floor(100 × stopword occurrences / tokens) — a classic quality
    * signal: near-0 for code/boilerplate/non-English, 20-50 for prose. */
  def stopwordRatioX100(text: Column): Column = {
    val hits = Stopwords.map(w => occurrences(text, w)).reduce(_ + _)
    floor(hits * 100 / greatest(token_count(text), lit(1L))).cast("long")
  }

  /** Explicit punctuation class shared with the SQL oracle — engine regex
    * character-class dialects differ, so keep it to literal ASCII marks. */
  val PunctClass = "[.,!?;:]"

  /** floor(100 × punctuation chars / chars) — prose sits in low single
    * digits; tables/code/boilerplate spike. Counts widen to long BEFORE
    * the ×100 (an int would wrap past ~21M chars). */
  def punctRatioX100(text: Column): Column =
    floor((length(text).cast("long") -
      length(regexp_replace(text, lit(PunctClass), lit(""))).cast("long"))
      * 100 / greatest(length(text).cast("long"), lit(1L))).cast("long")

  /** floor(100 × duplicated elements / elements) for a text split on
    * `sep` — the Gopher-style (Rae et al. 2021, §A1.1, public filters)
    * duplicate-line / duplicate-paragraph fraction: an element is
    * "duplicated" when an identical element appeared earlier in the same
    * document. Pure integer arithmetic over split + array_distinct, so
    * the ratio mirrors 1:1 into the SQL oracle. */
  def dupSplitRatioX100(text: Column, sep: String): Column = {
    val parts = split(text, sep)
    floor((size(parts) - size(array_distinct(parts))) * 100 /
      greatest(size(parts), lit(1))).cast("long")
  }

  /** Duplicate-line fraction (split on '\n'), x100. */
  def dupLineRatioX100(text: Column): Column = dupSplitRatioX100(text, "\n")
  /** Duplicate-paragraph fraction (split on blank line '\n\n'), x100. */
  def dupParaRatioX100(text: Column): Column = dupSplitRatioX100(text, "\n\n")

  /** Gopher-style intra-document repetition signals: duplicate-line and
    * duplicate-paragraph fractions plus the fraction of characters covered
    * by the most frequent word 2-gram (count × 2-gram length / chars) —
    * the repetition family every LLM curation pipeline runs
    * document-locally before training.
    *
    * Scale shape: the line/paragraph ratios are row-local codegen'd
    * expressions; the top-2-gram signal explodes word 2-grams and
    * aggregates per (id, gram) — ONE shuffle on short (id, gram) keys,
    * never on document text, with the per-id top-1 pruned by
    * WindowGroupLimit. All outputs integer-derived (floor(x*100/denom)),
    * so the DuckDB oracle gates byte-exact.
    *
    * Output: (id, n_lines, dup_line_ratio_x100, dup_para_ratio_x100,
    * top_bigram_ratio_x100). */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val base = df.select(
      col(idCol),
      size(split(t, "\n")).cast("long").as("n_lines"),
      dupLineRatioX100(t).as("dup_line_ratio_x100"),
      dupParaRatioX100(t).as("dup_para_ratio_x100"),
      length(t).cast("long").as("__n_chars"))
    val grams = df
      .select(col(idCol), split(trim(t), "\\s+").as("__ws"))
      .where(size(col("__ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__ws")) - 1),
          i => concat(element_at(col("__ws"), i), lit(" "),
            element_at(col("__ws"), i + 1)))).as("g"))
    val counts = grams.groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("c"))
    // deterministic top-1: count desc, then lexicographically smallest gram
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("c").desc, col("g").asc)
    val top1 = counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).select(col(idCol), col("g"), col("c"))
    base.join(top1, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"), col("dup_line_ratio_x100"),
        col("dup_para_ratio_x100"),
        coalesce(
          floor(col("c") * length(col("g")) * 100 /
            greatest(col("__n_chars"), lit(1L))).cast("long"),
          lit(0L)).as("top_bigram_ratio_x100"))
  }

  /** Per-document top-k salient terms — a tf-idf-flavored keyword extractor
    * with an ENGINE-PORTABLE, integer-only ranking: terms (lowercased
    * maximal [a-z] runs of length ≥ `minLen`) rank by (tf DESC, df ASC,
    * term ASC) — term frequency first, corpus rarity breaking ties. This is
    * the exact discrete skeleton of tf·idf (idf is strictly decreasing in
    * df), WITHOUT a floating-point log whose IEEE ordering could diverge
    * between engines — so the whole output gates byte-exact.
    *
    * Scale shape: explode words → ONE (id, term) shuffle for tf; df reuses
    * the tf table (ONE term shuffle over doc-distinct terms — never a
    * second pass over text); join back on term; per-doc top-k pruned by
    * WindowGroupLimit inside the exchange. Document text never shuffles.
    * The regex contains no backslash escapes (PunctClass discipline), so
    * Spark and DuckDB read byte-identical pattern strings.
    *
    * Output: (id, term, tf, df, rk), rk = 1..k per id. */
  def topTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minLen: Int = 3): DataFrame = {
    val tf = df
      .select(col(idCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("term"))
      .where(length(col("term")) >= minLen)
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, term) — df is a count over it
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rk"))
  }

  /** PII / sensitive-pattern classes for scrubbing (public regex classes
    * only — emails, phone shapes, long digit runs, key-shaped tokens), in
    * REDACTION ORDER: email first (its local part contains digit runs),
    * then key-shaped secrets (their tails contain digit runs), then phones,
    * then bare digit runs — so a broader class is never partially eaten by
    * a narrower one replaced earlier. Engine portability discipline (same
    * posture as [[PunctClass]]): the patterns contain NO backslash escapes
    * at all — `[0-9]` not `\d`, `[.]` not `\.` — so Java regex (Spark) and
    * RE2 (DuckDB) read byte-identical pattern strings through every
    * string-escaping layer, and both use leftmost greedy matching on this
    * subset (no backrefs, no lookaround).
    *
    * The secret pattern must NOT fire inside longer identifiers ("task_…"
    * contains "sk_", "monkey_…" contains "key_"); RE2 has no lookbehind, so
    * the guard is a consumed group-1 prefix (start-of-string or one
    * non-identifier char) restored by the replacement — the ONE place the
    * engines' replacement syntax differs (Java `$1` vs RE2 `\1`), hence
    * per-engine replacement strings; the pattern strings themselves stay
    * byte-identical. (class, pattern, sparkRepl, duckRepl). */
  val PiiPatterns: Seq[(String, String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
      "[EMAIL]", "[EMAIL]"),
    ("secret", "(^|[^A-Za-z0-9_])(sk|key|tok)_[A-Za-z0-9]{16,}",
      "$1[SECRET]", "\\1[SECRET]"),
    ("phone", "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]", "[PHONE]"),
    ("digit_run", "[0-9]{9,}", "[NUMBER]", "[NUMBER]"))

  /** PII scrub: per-class match COUNTS on the original text (independent
    * per class — a digit run inside a phone number counts in both) plus
    * the redacted text (the [[PiiPatterns]] chain applied in order, every
    * occurrence replaced). Row-local chained regexp_replace — codegen'd,
    * zero shuffle, and the `text_redaction` oracle reproduces it
    * byte-exactly in DuckDB from the same pattern constants (single
    * source: [[piiScrubOracleSelect]]).
    * Output: (id, n_email, n_secret, n_phone, n_digit_run, redacted). */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = PiiPatterns.map { case (cls, pat, _, _) =>
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")
        .as(s"n_$cls")
    }
    val redacted = PiiPatterns.foldLeft(t) { case (acc, (_, pat, repl, _)) =>
      regexp_replace(acc, lit(pat), lit(repl))
    }
    df.select(col(idCol) +: counts :+ redacted.as("redacted"): _*)
  }

  /** The SELECT-list half of the piiScrub oracle, generated from the SAME
    * [[PiiPatterns]] constants so the SQL can never de-synchronize from
    * the Column chain (`textExpr` is the oracle-side text expression). */
  def piiScrubOracleSelect(textExpr: String): String = {
    val counts = PiiPatterns.map { case (cls, pat, _, _) =>
      s"CAST(len(regexp_extract_all($textExpr, '$pat')) AS BIGINT) AS n_$cls"
    }
    val redacted = PiiPatterns.foldLeft(textExpr) {
      case (acc, (_, pat, _, repl)) =>
        s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }
    (counts :+ s"$redacted AS redacted").mkString(",\n           ")
  }

  /** Heuristic quality gate for training data: bounded length, plausible
    * word shape, limited repetition (distinct-token ratio + Gopher-style
    * duplicate-line/paragraph fractions); plus the stopword ratio as a
    * reported signal. */
  def qualityFlags(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val tokens = token_count(t)
    val distinctRatioX100 =
      floor(size(array_distinct(split(trim(t), "\\s+"))) * 100 /
        greatest(tokens, lit(1L))).cast("long")
    val dupLine = dupLineRatioX100(t)
    val dupPara = dupParaRatioX100(t)
    df.select(
      col(idCol),
      tokens.as("n_tokens"),
      distinctRatioX100.as("distinct_ratio_x100"),
      stopwordRatioX100(t).as("stopword_ratio_x100"),
      punctRatioX100(t).as("punct_ratio_x100"),
      dupLine.as("dup_line_ratio_x100"),
      dupPara.as("dup_para_ratio_x100"),
      (tokens.between(5, 100000) &&
        floor(length(regexp_replace(t, lit("\\s"), lit(""))) * 100 /
          greatest(tokens, lit(1L))).between(150, 1500) &&
        distinctRatioX100 >= 5 &&
        dupLine <= 30 && dupPara <= 30).as("is_quality"))
  }

  // ---- character n-gram LM quality scoring (CCNet-style) -------------------

  /** All n-grams of `t` as an array — empty for texts shorter than n
    * (Spark's `sequence(1, 0)` counts DOWN, so the start index must be
    * guarded, not just the stop). */
  private def gramArray(t: Column, n: Int): Column =
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Train a character n-gram language model: counts of every n-byte gram
    * in the training corpus. The table is VOCABULARY-bounded — at most
    * |alphabet|^n rows regardless of corpus size (96^3 ≈ 885k for
    * printable-ASCII trigrams) — so it broadcasts at any corpus scale; the
    * one shuffle here is the (gram) count aggregation with map-side
    * partials. Context counts derive from this table by prefix (sum over
    * the last char), guaranteeing Σ_c cnt(ctx·c) = cnt(ctx) exactly. */
  def charNgramCounts(
      train: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"n=$n: need at least bigram for a conditional model")
    val t = coalesce(col(textCol), lit(""))
    train
      .select(explode(gramArray(t, n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
  }

  /** One-pass twin of calling [[charNgramCounts]] on a corpus AND on a
    * flagged sub-corpus: (gram, cnt, cnt_flagged), where cnt is the whole-
    * corpus gram count and cnt_flagged counts only rows where `flag` is
    * true. Restricting to cnt_flagged > 0 yields exactly
    * charNgramCounts(train.where(flag)) — a gram absent from the
    * sub-corpus has cnt_flagged = 0 — so a caller needing both models
    * (DSIR target + raw) pays ONE gram-explode scan instead of two; the
    * explode is the dominant per-row cost of model building. */
  def charNgramCountsWithFlag(
      train: DataFrame, textCol: String, n: Int, flag: Column): DataFrame = {
    require(n >= 2, s"n=$n: need at least bigram for a conditional model")
    val t = coalesce(col(textCol), lit(""))
    train
      .select(flag.as("__flag"), explode(gramArray(t, n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("__flag"), 1L).otherwise(0L)).as("cnt_flagged"))
  }

  /** Score documents against a trained [[charNgramCounts]] model with
    * add-one (Laplace) smoothing over a fixed `vocab`-sized alphabet:
    * P(c | ctx) = (cnt(ctx·c) + 1) / (cnt(ctx) + vocab).
    *
    * Two scores per document, following the repo's determinism split:
    *  - `sum_p_x1e9` (BIGINT, ORACLE-SAFE): Σ_positions
    *    round((cnt+1)·1e9 / (ctx+vocab)) — the numerator product is exact
    *    in a double below 2^53, so each term is ONE correctly-rounded IEEE
    *    division of integer-derived operands, then an integer sum
    *    (order-independent). Gates byte-exact, same precedent as the KMV
    *    estimate and the cents discipline.
    *  - `nll` (DOUBLE): Σ ln((ctx+vocab)/(cnt+1)), the standard negative
    *    log-likelihood. A float SUM (IEEE order) — NEVER gate its bytes;
    *    gate margin booleans on per-char differences (the
    *    `text_lm_perplexity` gate uses milli-nat margins far above
    *    cross-engine log jitter).
    *
    * The model joins in BROADCAST (vocabulary-bounded, see
    * [[charNgramCounts]]); the per-position explode never shuffles — the
    * only exchange is the final groupBy(id). Documents shorter than n
    * keep a row with n_pos = 0 (F4 posture). */
  def lmScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      grams: DataFrame,
      n: Int,
      vocab: Int = 96): DataFrame = {
    require(n >= 2, s"n=$n")
    require(vocab >= 2, s"vocab=$vocab")
    val t = coalesce(col(textCol), lit(""))
    val ctx = grams
      .groupBy(expr("substring(gram, 1, " + (n - 1) + ")").as("ctx"))
      .agg(sum(col("cnt")).as("ctx_cnt"))
    val pos = docs.select(col(idCol),
      explode(gramArray(t, n)).as("gram"))
    val p = pos
      .join(broadcast(grams), Seq("gram"), "left")
      .join(broadcast(ctx),
        expr("substring(gram, 1, " + (n - 1) + ")") === col("ctx"), "left")
      .select(col(idCol),
        (coalesce(col("cnt"), lit(0L)) + 1L).as("g1"),
        (coalesce(col("ctx_cnt"), lit(0L)) + vocab.toLong).as("c1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_pos"),
        sum(round(col("g1") * 1000000000.0 / col("c1")).cast("long"))
          .as("sum_p_x1e9"),
        sum(log(col("c1").cast("double") / col("g1"))).as("nll"))
    docs.select(col(idCol)).join(p, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("sum_p_x1e9"), lit(0L)).as("sum_p_x1e9"),
        coalesce(col("nll"), lit(0.0)).as("nll"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw document by how much more likely its n-gram features
    * are under a TARGET distribution than under the RAW distribution, so a
    * curation pipeline can upsample web data that "looks like" a trusted
    * high-quality corpus. Models are [[charNgramCounts]] tables (DSIR's
    * hashed bag-of-ngrams, with the char-n-gram feature map this repo's LM
    * already uses); both are smoothed unconditionally over the vocab^n
    * gram space.
    *
    * Two scores per document, the repo's determinism split (same posture
    * as [[lmScore]]):
    *  - `sum_lr_x1e9` (BIGINT, ORACLE-SAFE): Σ_positions
    *    round(((ct_t+1)/(tot_t+V)) / ((ct_r+1)/(tot_r+V)) · 1e9) — every
    *    operand is integer-derived and exact below 2^53, and each term is
    *    a fixed composition of correctly-rounded IEEE divisions/products,
    *    so the integer sum gates BYTE-EXACT cross-engine. A linear-domain
    *    fixed-point importance statistic (mean likelihood ratio per
    *    position after dividing by n_pos).
    *  - `log_weight` (DOUBLE): Σ (ln p_target - ln p_raw), DSIR's actual
    *    log importance weight. A float sum through libm logs — NEVER gate
    *    its bytes; per engine it is deterministic and is what a production
    *    selection would feed Gumbel-top-k.
    *
    * Exactness ceiling, stated like the BPE/chunk caps: the x1e9 terms
    * stay exact while (cnt+1) and (tot+V) are below 2^53 — beyond ~10^15
    * observed grams the byte-exact column degrades to a per-engine
    * deterministic statistic (the log_weight column is unaffected).
    *
    * Scale shape: both model tables are VOCABULARY-bounded (≤ vocab^n rows
    * at any corpus size) and join in BROADCAST; the per-position explode
    * is shuffle-free and the only exchange is the final groupBy(id).
    * Documents shorter than n keep a (0, 0, 0.0) row (F4 posture). */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetModel: DataFrame,
      rawModel: DataFrame,
      n: Int,
      vocab: Int = 96): DataFrame = {
    require(n >= 2, s"n=$n")
    require(vocab >= 2, s"vocab=$vocab")
    val v = (0 until n).foldLeft(1L)((a, _) => a * vocab) // |alphabet|^n
    val t = coalesce(col(textCol), lit(""))
    def total(m: DataFrame, name: String) =
      m.agg(coalesce(sum(col("cnt")), lit(0L)).as(name))
    val pos = docs.select(col(idCol), explode(gramArray(t, n)).as("gram"))
    val p = pos
      .join(broadcast(targetModel.select(col("gram"),
        col("cnt").as("ct_t"))), Seq("gram"), "left")
      .join(broadcast(rawModel.select(col("gram"),
        col("cnt").as("ct_r"))), Seq("gram"), "left")
      .crossJoin(broadcast(total(targetModel, "tot_t")))
      .crossJoin(broadcast(total(rawModel, "tot_r")))
      .select(col(idCol),
        ((coalesce(col("ct_t"), lit(0L)) + 1L).cast("double") /
          (col("tot_t") + v).cast("double")).as("p_t"),
        ((coalesce(col("ct_r"), lit(0L)) + 1L).cast("double") /
          (col("tot_r") + v).cast("double")).as("p_r"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_pos"),
        sum(round(col("p_t") / col("p_r") * 1000000000.0).cast("long"))
          .as("sum_lr_x1e9"),
        sum(log(col("p_t")) - log(col("p_r"))).as("log_weight"))
    docs.select(col(idCol)).join(p, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("sum_lr_x1e9"), lit(0L)).as("sum_lr_x1e9"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  // ---- BPE tokenizer training ----------------------------------------------

  /** Train `steps` BPE merges over a corpus (Sennrich et al. 2016 —
    * byte-pair encoding): start from characters, repeatedly merge the
    * most-frequent adjacent symbol pair (frequency-weighted over the
    * word-vocabulary, lexicographically-smallest pair on ties, so the
    * result is byte-deterministic under any partitioning).
    *
    * Scale posture: the corpus is read ONCE for the word-frequency table;
    * every merge iteration then shuffles only the VOCABULARY's pair counts
    * (distinct words × symbols-per-word, corpus-size-independent), and the
    * driver holds one row per step. Iterative caching follows the repo
    * convention: each iteration's table is persisted and its predecessor
    * unpersisted only after the successor materializes.
    *
    * Merge application is two chained `replace` passes per step: a
    * leftmost match consumes the shared boundary space of a back-to-back
    * occurrence (" a b a b " matches once), and since missed occurrences
    * are never adjacent — a missed occurrence keeps its trailing space, so
    * the next occurrence would have matched — the second pass is
    * exhaustive. The oracle mirrors both passes.
    *
    * @return (step INT, pair STRING, merged STRING), one row per merge, in
    *         step order; fewer than `steps` rows when the vocabulary runs
    *         out of adjacent pairs. */
  def bpeTrain(
      df: DataFrame,
      textCol: String,
      steps: Int,
      maxWordLen: Int = 30): DataFrame = {
    require(steps >= 1 && steps <= 64, s"steps=$steps")
    require(maxWordLen >= 2, s"maxWordLen=$maxWordLen")
    val spark = df.sparkSession
    val t = coalesce(col(textCol), lit(""))
    val words = df
      .select(explode(split(trim(t), "\\s+")).as("w"))
      .where(length(col("w")).between(1, maxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var syms = words.select(
      concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" "))
        .as("sym"),
      col("freq")).persist()
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String)]()
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val arr = split(trim(col("sym")), " ")
      val top = syms.select(
        explode(when(size(arr) >= 2,
          transform(sequence(lit(1), size(arr) - 1),
            i => concat(element_at(arr, i), lit(" "),
              element_at(arr, i + 1))))
          .otherwise(array().cast("array<string>"))).as("pair"),
        col("freq"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect() // also materializes this iteration's cache
      if (prev != null) { prev.unpersist(); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val merged = pair.replace(" ", "")
        merges += ((step, pair, merged))
        if (step < steps) {
          def pass(c: Column) =
            replace(c, lit(s" $pair "), lit(s" $merged "))
          val next = syms
            .select(pass(pass(col("sym"))).as("sym"), col("freq"))
            .persist()
          prev = syms
          syms = next
        }
      }
      step += 1
    }
    if (prev != null) prev.unpersist()
    syms.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("step", "pair", "merged")
  }

  /** Apply learned [[bpeTrain]] merges and count BPE tokens per document —
    * the encode half of the tokenizer. Entirely ROW-LOCAL codegen'd string
    * ops (zero shuffle, zero joins): the document expands to per-word
    * char-symbol strings (words separated by TWO spaces so no merge pair
    * can span a word boundary), then each merge applies in learned order
    * as the same two replace passes as training. `merges` is the tiny
    * learned table (driver-side, O(steps)); at 100 TB the encode cost is
    * one scan. Output: (id, n_words, n_tokens). */
  def bpeTokenCount(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val words = split(trim(t), "\\s+")
    val sym0 = concat(lit(" "),
      array_join(transform(words, w => array_join(split(w, ""), " ")),
        "  "),
      lit(" "))
    val symN = merges.foldLeft(sym0) { case (acc, (pair, merged)) =>
      replace(replace(acc, lit(s" $pair "), lit(s" $merged ")),
        lit(s" $pair "), lit(s" $merged "))
    }
    val empty = length(trim(t)) === 0
    df.select(col(idCol),
      when(empty, 0L).otherwise(size(words)).cast("long").as("n_words"),
      when(empty, 0L)
        .otherwise(size(split(trim(symN), " +"))).cast("long")
        .as("n_tokens"))
  }
}
