package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** URL hygiene for web-crawl curation: normalization, host/registrable-
  * domain extraction, and domain-level filtering — the steps that run
  * before any per-domain quality policy (crawl frontier dedup, domain
  * blocklists, per-domain mixing weights) can key on a stable domain.
  *
  * Everything here is a narrow, whole-stage-codegen `regexp_replace` /
  * `regexp_extract` chain — no shuffle, linear in corpus bytes, and
  * every regex construct (anchors, alternation, optional capture
  * groups, character classes) behaves identically in Java regex and
  * RE2 so a DuckDB oracle replays the normalization byte-for-byte.
  * Deliberately NO lookarounds: RE2 has none.
  *
  * Scale note: at 100 TB these are projection columns computed inside
  * the scan stage; the only wide operation in this family is the
  * per-domain aggregate in [[domainStats]], which shuffles one narrow
  * (domain, count) pair per input row with map-side combine.
  */
object Web {

  private val SchemeAuthority = "[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Canonical URL form:
    *  1. scheme + authority lowercased (path/query stay case-sensitive
    *     per RFC 3986);
    *  2. default ports stripped (`http…:80`, `https…:443`);
    *  3. fragment dropped;
    *  4. a leading `www.` host label dropped;
    *  5. tracking query params removed (`utm_*`, `fbclid`, `gclid`)
    *     with delimiters re-collapsed and a dangling `?`/`&` trimmed.
    * Idempotent; a string with no `scheme://` prefix is not a URL the
    * crawler emitted and passes through VERBATIM (the whole chain is
    * gated on the scheme match — steps 2-4 are anchored through it
    * anyway, but the tracking-param strip is not and must not rewrite
    * arbitrary text that happens to contain `?utm_…`). */
  def normalizeUrl(url: Column): Column =
    F.when(url.rlike(s"^$SchemeAuthority"), normalizeUrlChain(url))
      .otherwise(url)

  private def normalizeUrlChain(url: Column): Column = {
    // 1. lowercase scheme://authority, keep the rest as-is
    val lowered = F.concat(
      F.lower(F.regexp_extract(url, s"^($SchemeAuthority)", 1)),
      F.regexp_replace(url, s"^$SchemeAuthority", ""))
    // 2. default ports (after lowering, so patterns are lowercase-only);
    //    optional group 2 is empty when the URL ends at the port
    val noPort0 = F.regexp_replace(lowered,
      "^(http://[^/?#]*):80([/?#].*)?$", "$1$2")
    val noPort = F.regexp_replace(noPort0,
      "^(https://[^/?#]*):443([/?#].*)?$", "$1$2")
    // 3. fragment
    val noFrag = F.regexp_replace(noPort, "#.*$", "")
    // 4. www. prefix of the host only (anchored through the scheme)
    val noWww = F.regexp_replace(noFrag, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    // 5. tracking params: each `?utm_x=v` / `&fbclid=v` collapses to its
    //    delimiter, then `?&&…` runs re-collapse and a trailing `?`/`&`
    //    (param list emptied) is trimmed
    val noTrack = F.regexp_replace(noWww,
      "([?&])(?:utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*", "$1")
    val q1 = F.regexp_replace(noTrack, "\\?&+", "?")
    val q2 = F.regexp_replace(q1, "&&+", "&")
    F.regexp_replace(q2, "[?&]+$", "")
  }

  /** Host of a normalized URL ('' when there is no scheme). Port is
    * excluded; call after [[normalizeUrl]] so the case is canonical. */
  def host(url: Column): Column =
    F.regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** TLD pairs that act as a public suffix, so the registrable domain
    * keeps three labels (`bbc.co.uk`), not two (`co.uk`). A documented
    * heuristic subset of the public-suffix list — the full list is a
    * data file a deployment would broadcast-join instead. */
  val SecondLevelSuffixRe: String =
    "\\.(?:co|com|org|net|ac|gov|edu)\\.(?:uk|au|jp|nz|in|za|br)$"

  /** Registrable domain of a host: last two labels, or last three when
    * the host ends in a [[SecondLevelSuffixRe]] pair; a dot-less host
    * (e.g. `localhost`) is its own domain. */
  def registrableDomain(hostCol: Column): Column = {
    val three = F.regexp_extract(hostCol, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val two = F.regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
    F.when(hostCol.rlike(SecondLevelSuffixRe), three)
      .otherwise(F.when(F.length(two) > 0, two).otherwise(hostCol))
  }

  /** Visible text out of an HTML page — the extraction step between
    * WARC ingestion ([[graft.sources.Warc]]) and every text-quality
    * operator: script/style blocks and comments drop ENTIRELY (their
    * content is never prose), remaining tags become spaces, the six
    * ubiquitous named entities decode (`&amp;` LAST, so double-escaped
    * text like `&amp;lt;` correctly lands as the literal `&lt;`), and
    * whitespace collapses. The same narrow RE2-safe regexp_replace
    * chain discipline as [[normalizeUrl]] — codegen'd, no UDF, oracle-
    * replayable byte-for-byte. Numeric character references pass
    * through (decoding them needs computed code points — a table-driven
    * pass a deployment adds where its corpora need it). */
  def htmlToText(html: Column): Column = {
    val noScript = F.regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = F.regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = F.regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = F.regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val e1 = F.regexp_replace(noTags, "&nbsp;", " ")
    val e2 = F.regexp_replace(e1, "&lt;", "<")
    val e3 = F.regexp_replace(e2, "&gt;", ">")
    val e4 = F.regexp_replace(e3, "&quot;", "\"")
    val e5 = F.regexp_replace(e4, "&#39;", "'")
    val e6 = F.regexp_replace(e5, "&amp;", "&")
    F.trim(F.regexp_replace(e6, "\\s+", " "))
  }

  /** Per-registrable-domain document counts over a URL column —
    * normalize → host → domain inside the scan, then one keyed agg
    * (map-side combine; the output is one row per domain). */
  def domainStats(df: DataFrame, urlCol: String): DataFrame = {
    val norm = normalizeUrl(F.col(urlCol))
    df.select(registrableDomain(host(norm)).as("domain"))
      .groupBy("domain")
      .agg(F.count(F.lit(1)).as("n_docs"))
  }

  /** Drop every row whose registrable domain is on the blocklist. The
    * blocklist is a DataFrame (domains column named `domain`) joined
    * LEFT ANTI on the derived domain — real blocklists are millions of
    * rows, so this must stay a join (AQE broadcasts it when it IS
    * small), never a collected driver-side set. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocklist: DataFrame): DataFrame = {
    val withDomain = df.withColumn("__graft_domain",
      registrableDomain(host(normalizeUrl(F.col(urlCol)))))
    withDomain.join(blocklist.select(F.col("domain").as("__graft_domain")),
        Seq("__graft_domain"), "left_anti")
      .drop("__graft_domain")
  }
}
