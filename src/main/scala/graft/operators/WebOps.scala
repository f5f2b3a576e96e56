package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-curation operators: URL canonicalization, registered-domain
  * extraction, canonical-URL dedup, and per-domain corpus stats — the
  * stage every web-scale training-data pipeline runs before text-level
  * dedup (CCNet, RefinedWeb, Gopher all dedup by canonical URL / filter
  * by domain before looking at a single byte of text).
  *
  * Everything here is ROW-LOCAL string work (codegen'd built-ins, zero
  * shuffle) except the explicitly aggregating helpers, so it runs at scan
  * speed on 100 TB; the only shuffles are the groupBys in [[domainStats]]
  * / [[urlDedup]], keyed on short strings.
  *
  * Engine portability (the `text_redaction` discipline, see
  * [[TextStats.PiiPatterns]]): every regex used here contains NO
  * backslash escapes (`[0-9]` not `\d`, `[.]` not `\.`), so Java regex
  * (Spark) and RE2 (DuckDB) read byte-identical pattern strings, and the
  * oracle SQL for the whole canonicalization chain is GENERATED from the
  * same constants ([[canonicalPartsSql]]) so the two sides cannot
  * de-synchronize. All comparisons are on ASCII strings, where Spark's
  * `array_sort` and DuckDB's `list_sort` agree byte-for-byte.
  *
  * Canonicalization rules (deliberately conservative — only transforms
  * that preserve the resource identity under RFC 3986 §6):
  *   1. strip the fragment (`#...` — never sent to the server);
  *   2. lowercase the scheme and host (case-insensitive per RFC);
  *   3. drop the DEFAULT port only (`:80` for http, `:443` for https —
  *      a non-default port is identity-bearing and kept);
  *   4. strip one trailing `/` from the path (`/a/` ≡ `/a`; the bare
  *      root `/` canonicalizes to the empty path);
  *   5. drop known tracking query params ([[TrackingParams]]) and sort
  *      the survivors byte-wise (param order is non-semantic for every
  *      mainstream server framework; sorting makes equal resource ↔
  *      equal string).
  */
object WebOps {

  /** Query params that never change the resource: analytics/click IDs.
    * Matched by exact `name=` prefix on each `&`-separated pair (substr
    * compare, not LIKE — `_` is a LIKE wildcard and would over-match). */
  val TrackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_eid")

  /** Second-level labels that act as public suffixes under a 2-letter
    * ccTLD (`example.co.uk` → registered domain `example.co.uk`, not
    * `co.uk`). A pragmatic subset of the public-suffix list — the full
    * PSL is an external artifact this sandbox can't fetch; the rule and
    * its limits are documented rather than hidden. */
  val CommonSlds: Seq[String] = Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** scheme://  (group 1 = scheme). RFC 3986 scheme charset, no escapes. */
  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  /** group 1 = authority (host[:port]) — everything up to the first `/`. */
  private val HostPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)"

  /** The canonicalization chain as Columns:
    * (scheme, host, path, sorted_query) — see object doc for the rules.
    * `url` must be an absolute URL (scheme://...); rows that aren't
    * yield empty scheme/host and pass through mostly unchanged. */
  def canonicalParts(url: Column): (Column, Column, Column, Column) = {
    val noFrag = regexp_replace(url, "#.*", "")
    val base = regexp_replace(noFrag, "[?].*", "")
    val query = coalesce(regexp_extract(noFrag, "[?](.*)", 1), lit(""))
    val scheme = lower(regexp_extract(base, SchemePat, 1))
    val host0 = lower(regexp_extract(base, HostPat, 1))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path = regexp_replace(
      regexp_replace(base, HostPat.stripSuffix("([^/]*)") + "[^/]*", ""),
      "/$", "")
    val kept = filter(split(query, "&"), p =>
      (length(p) > 0) && TrackingParams.map { tp =>
        !(p.substr(lit(1), lit(tp.length + 1)) === lit(tp + "="))
      }.reduce(_ && _))
    val sortedQ = array_join(array_sort(kept), "&")
    (scheme, host, path, sortedQ)
  }

  /** Canonical URL string from [[canonicalParts]]. */
  def canonicalUrl(url: Column): Column = {
    val (scheme, host, path, q) = canonicalParts(url)
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Registered domain of a canonical HOST (already lowercased; a port
    * suffix is stripped here): last two labels, or last THREE when the
    * TLD is 2 letters and the second-level label is a [[CommonSlds]]
    * public-suffix label. Hosts with one label pass through. */
  def registeredDomain(host: Column): Column = {
    val h = regexp_replace(host, ":[0-9]+$", "")
    val rev = reverse(split(h, "[.]"))
    val n = size(rev)
    val tld = try_element_at(rev, lit(1))
    val sld = try_element_at(rev, lit(2))
    val third = try_element_at(rev, lit(3))
    when(n >= 3 && length(tld) === 2 && sld.isin(CommonSlds: _*),
        concat_ws(".", third, sld, tld))
      .when(n >= 2, concat_ws(".", sld, tld))
      .otherwise(h)
  }

  /** Per-URL curation columns: (idCol, canonical_url, registered_domain).
    * Row-local — zero shuffle. */
  def urlParts(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val (_, host, _, _) = canonicalParts(col(urlCol))
    df.select(col(idCol),
      canonicalUrl(col(urlCol)).as("canonical_url"),
      registeredDomain(host).as("registered_domain"))
  }

  /** Canonical-URL dedup: (id, canonical_id, is_canonical) with the
    * min-id-per-canonical-URL rule ([[Dedup.exactCanonical]]'s contract,
    * keyed on the canonical URL instead of a content hash). ONE shuffle
    * on the canonical-URL string. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val withCanon = df.select(col(idCol).cast("long").as("id"),
      canonicalUrl(col(urlCol)).as("canonical_url"))
    val canonical = withCanon.groupBy("canonical_url")
      .agg(min(col("id")).as("canonical_id"))
    withCanon.join(canonical, Seq("canonical_url"))
      .select(col("id"), col("canonical_id"),
        (col("id") === col("canonical_id")).as("is_canonical"))
  }

  /** Per-registered-domain corpus stats: document count and DISTINCT
    * canonical-URL count (the gap between the two = URL-level duplicate
    * mass per domain — the first number a web-curation run looks at). */
  def domainStats(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val (_, host, _, _) = canonicalParts(col(urlCol))
    df.select(registeredDomain(host).as("registered_domain"),
        canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy("registered_domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_canonical_urls"))
  }

  /** Drop rows whose registered domain is on a blocklist — broadcast
    * anti-join (the blocklist is human-curated, i.e. small; at 100 TB the
    * corpus side streams through unshuffled). `blocked` must have a
    * `registered_domain` column. */
  def filterBlockedDomains(
      df: DataFrame, urlCol: String, blocked: DataFrame): DataFrame = {
    require(blocked.columns.contains("registered_domain"),
      "blocklist needs a registered_domain column")
    val (_, host, _, _) = canonicalParts(col(urlCol))
    df.withColumn("__rd", registeredDomain(host))
      .join(broadcast(blocked.select(col("registered_domain").as("__rd"))
        .distinct()), Seq("__rd"), "left_anti")
      .drop("__rd")
  }

  // ---- oracle SQL generation (single source with the Column chain) --------

  /** DuckDB SQL for [[canonicalParts]] over a url expression, as a
    * SELECT-list fragment producing (scheme, host, path, sorted_query).
    * Generated from the SAME pattern/param constants as the Column code.
    * DuckDB notes: `regexp_replace` needs the explicit 'g' flag for
    * global semantics (Spark is global by default — the patterns here
    * match at most once, but the flag keeps semantics aligned);
    * `regexp_extract` yields NULL on no-match where Spark yields '',
    * hence the coalesce on both sides. */
  def canonicalPartsSql(urlExpr: String): String = {
    val noFrag = s"regexp_replace($urlExpr, '#.*', '', 'g')"
    val base = s"regexp_replace($noFrag, '[?].*', '', 'g')"
    val query = s"coalesce(regexp_extract($noFrag, '[?](.*)', 1), '')"
    val scheme = s"lower(coalesce(regexp_extract($base, '$SchemePat', 1), ''))"
    val host0 = s"lower(coalesce(regexp_extract($base, '$HostPat', 1), ''))"
    val host =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($host0, ':80$$', '')
         WHEN $scheme = 'https' THEN regexp_replace($host0, ':443$$', '')
         ELSE $host0 END"""
    val hostPrefix = SchemePat.stripSuffix("([^/]*)").stripPrefix("^")
    val path = s"regexp_replace(regexp_replace($base, " +
      s"'^$hostPrefix[^/]*', ''), '/$$', '')"
    val keepCond = TrackingParams
      .map(tp => s"substr(p, 1, ${tp.length + 1}) <> '$tp='")
      .mkString("length(p) > 0 AND ", " AND ", "")
    val sortedQ = s"array_to_string(list_sort(list_filter(" +
      s"string_split($query, '&'), p -> $keepCond)), '&')"
    s"""$scheme AS scheme, $host AS host, $path AS path,
       $sortedQ AS sorted_query"""
  }

  /** DuckDB SQL assembling the canonical URL from the
    * [[canonicalPartsSql]] column names. */
  val CanonicalUrlFromPartsSql: String =
    """concat(scheme, '://', host, path,
       CASE WHEN sorted_query = '' THEN ''
            ELSE concat('?', sorted_query) END)"""

  /** DuckDB SQL for [[registeredDomain]] over a host expression (single
    * source: same [[CommonSlds]] list, same 2-letter-TLD rule). */
  def registeredDomainSql(hostExpr: String): String = {
    val slds = CommonSlds.map(s => s"'$s'").mkString(", ")
    s"""CASE
       WHEN len(string_split(regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')) >= 3
            AND length(list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 1)) = 2
            AND list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 2) IN ($slds)
       THEN concat_ws('.',
            list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 3),
            list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 2),
            list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 1))
       WHEN len(string_split(regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')) >= 2
       THEN concat_ws('.',
            list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 2),
            list_extract(list_reverse(string_split(
              regexp_replace($hostExpr, ':[0-9]+$$', ''), '.')), 1))
       ELSE regexp_replace($hostExpr, ':[0-9]+$$', '') END"""
  }

  // ---- deterministic messy-URL generator (gate fixture) -------------------

  /** Deterministic synthetic URLs for the gate: one messy absolute URL per
    * doc_id. Identity-bearing choices (scheme, site, TLD family, www
    * presence, non-default port, real query params, path) are keyed on a
    * CANONICAL id `cid` — doc_ids with `doc_id % 10 == 3` borrow the cid
    * of `doc_id - 3`, planting genuine URL-level duplicates — while pure
    * MESS (case mangling, default ports, tracking params, param order,
    * trailing slash, fragments) is keyed on md5(doc_id), so the mess
    * varies per row but canonicalization provably collapses each cid
    * class to ONE string. Spark-only (the oracle reads the dumped rows,
    * not the generator). */
  def syntheticUrls(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val cid = when(pmod(id, lit(10)) === 3, id - 3).otherwise(id)
    val h = md5(concat(lit("url:"), id.cast("string")))
    def hd(i: Int): Column = conv(substring(h, i, 1), 16, 10).cast("long")
    val schemeBase = when(pmod(cid, lit(2)) === 0, lit("http")).otherwise(lit("https"))
    val scheme = when(hd(1) < 8, schemeBase).otherwise(upper(schemeBase))
    val tld = when(pmod(cid, lit(4)) === 0, lit("com"))
      .when(pmod(cid, lit(4)) === 1, lit("org"))
      .when(pmod(cid, lit(4)) === 2, lit("co.uk"))
      .otherwise(lit("net"))
    val hostBase = concat(
      when(pmod(cid, lit(3)) === 0, lit("www.")).otherwise(lit("")),
      lit("site"), pmod(cid, lit(50)).cast("string"), lit("."), tld)
    val host = when(hd(2) < 8, hostBase).otherwise(upper(hostBase))
    val defPort = when(schemeBase === "http", lit(":80")).otherwise(lit(":443"))
    val port = when(pmod(cid, lit(17)) === 0, lit(":8080"))
      .when(hd(3) < 4, defPort).otherwise(lit(""))
    val path = concat(lit("/a"), pmod(cid, lit(7)).cast("string"),
      lit("/b"), pmod(cid, lit(3)).cast("string"))
    val pathMess = when(hd(4) < 6, concat(path, lit("/"))).otherwise(path)
    val real1 = concat(lit("id="), cid.cast("string"))
    val real2 = when(pmod(cid, lit(3)) === 0,
      concat(lit("page="), pmod(cid, lit(5)).cast("string")))
    val trk1 = when(hd(5) < 8, lit("utm_source=feed"))
    val trk2 = when(hd(6) < 8, concat(lit("fbclid="), substring(h, 7, 6)))
    val qs = when(hd(7) < 8, concat_ws("&", real1, real2, trk1, trk2))
      .otherwise(concat_ws("&", trk1, trk2, real1, real2))
    val query = when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit(""))
    val frag = when(hd(8) < 8, concat(lit("#sec"), pmod(id, lit(13)).cast("string")))
      .otherwise(lit(""))
    docs.select(id.as("doc_id"),
      concat(scheme, lit("://"), host, port, pathMess, query, frag).as("url"))
  }
}
