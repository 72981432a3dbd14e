package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the upstream hygiene the dedup family assumes
  * a crawl pipeline provides: distinct raw spellings of the same resource
  * must collapse BEFORE exact/near dedup, or every variant survives as a
  * "unique" document. Reference scope: the reference's corpus carries
  * source URLs it never normalizes; this closes that gap Spark-first.
  *
  * Contract (absolute http(s) URLs `scheme://host[:port][/path][?query]
  * [#fragment]`):
  *  - scheme and host lowercase (RFC 3986 §6.2.2.1); path/query case kept;
  *  - default ports dropped (http:80, https:443); other ports kept;
  *  - fragment dropped (never sent to the server);
  *  - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`);
  *  - surviving params sorted bytewise (param order is almost never
  *    semantic; sorting makes `?a=1&b=2` ≡ `?b=2&a=1`);
  *  - empty path becomes "/".
  *
  * Everything is string/array expressions (split, substring, filter,
  * array_sort) — scan-fused, no shuffle, and each step has an exact
  * DuckDB mirror (string_split / list_filter / list_sort), so
  * `q_url_canonical`'s oracle re-derives the whole operator (the
  * Projection-oracle convention).
  */
object UrlTools {

  /** Query-param names to strip: exact names, plus any `utm_` prefix. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref")

  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    // rest = after "://" (instr is 1-based; +3 skips the marker).
    // Column.substr handles column positions; the huge fixed length means
    // "to the end" (both engines clamp).
    val big = lit(1 << 20)
    val rest = noFrag.substr(instr(noFrag, "://") + lit(3), big)
    // query first: RFC 3986 allows `scheme://host?query` with no path, so
    // the '?' split must happen before the host/path split
    val restNoQ = substring_index(rest, "?", 1)
    val query = when(instr(rest, "?") > 0,
      rest.substr(length(restNoQ) + lit(2), big)).otherwise(lit(""))
    val hostport = substring_index(restNoQ, "/", 1)
    val path = restNoQ.substr(length(hostport) + lit(1), big)
    val host = lower(substring_index(hostport, ":", 1))
    val port = when(instr(hostport, ":") > 0,
      hostport.substr(instr(hostport, ":") + lit(1), big)).otherwise(lit(""))
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p === "" || startswith(p, lit("utm_")) ||
        substring_index(p, "=", 1).isInCollection(TrackingParams))))
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(path === "", lit("/")).otherwise(path),
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&"))).otherwise(lit("")))
  }

  /** Lowercased host of an absolute URL — the grouping key for
    * host-level corpus statistics (CCNet-style domain filtering). Takes
    * everything after the FIRST "://" (the canonicalize rule — redirect
    * /share URLs embed absolute URLs in their query, and an
    * after-the-LAST split would attribute the doc to the EMBEDDED
    * host), then splits '?' before '/' (path-less `host?query` URLs —
    * the canonicalize lesson); ports and userinfo-free http(s) URLs
    * assumed, like [[canonicalize]].
    */
  def host(url: Column): Column = {
    val rest = url.substr(instr(url, "://") + lit(3), lit(1 << 20))
    val afterScheme = substring_index(rest, "?", 1)
    // scheme-less input has NO host: instr = 0 would make the substring
    // start at char 3 and return garbage where the oracle's
    // string_split(url, '://')[2] yields NULL — mirror that NULL
    when(instr(url, "://") > 0,
      lower(substring_index(substring_index(afterScheme, "/", 1), ":", 1)))
  }

  /** Per-URL count of tracking parameters — a param is tracking when
    * the PARAM STRING starts with `utm_` or its key is in
    * [[TrackingParams]] (exactly [[canonicalize]]'s drop rule, so the
    * audit counts what canonicalization would strip). Query extraction
    * follows canonicalize: fragment off first, '?' split before any
    * host/path split. Scheme-less or query-less URLs count 0.
    */
  def trackingParamCount(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val big = lit(1 << 20)
    val rest = noFrag.substr(instr(noFrag, "://") + lit(3), big)
    val restNoQ = substring_index(rest, "?", 1)
    val query = when(instr(rest, "?") > 0,
      rest.substr(length(restNoQ) + lit(2), big)).otherwise(lit(""))
    // scheme-less input has no URL structure to parse — count 0 rather
    // than params of a garbage substring (the host() NULL rule's
    // counting sibling; r14 review finding)
    when(instr(url, "://") > 0,
      size(filter(split(query, "&"), p =>
        p =!= "" && (startswith(p, lit("utm_")) ||
          substring_index(p, "=", 1).isInCollection(TrackingParams)))))
      .otherwise(lit(0))
  }

  /** Host-level tracking-parameter prevalence (C79) — which domains
    * ship link-decorated URLs, the crawl-frontier hygiene table next to
    * [[dedupByCanonical]] (how much would canonicalization collapse?).
    * One slim (host, count) pass; n_urls/n_tracked/n_tracking_params
    * are exact BIGINTs and tracked_share ONE exact division (the B56
    * rule) ⇒ everything hashes unrounded. NULL-url and scheme-less
    * (NULL-host) rows drop.
    */
  def trackingAudit(df: DataFrame, urlCol: String): DataFrame =
    df.where(col(urlCol).isNotNull)
      .select(host(col(urlCol)).as("host"),
        trackingParamCount(col(urlCol)).cast("long").as("__tp"))
      .where(col("host").isNotNull)
      .groupBy("host")
      .agg(
        count(lit(1)).as("n_urls"),
        sum(when(col("__tp") > 0L, 1L).otherwise(0L)).as("n_tracked"),
        sum(col("__tp")).as("n_tracking_params"))
      .select(col("host"), col("n_urls"), col("n_tracked"),
        col("n_tracking_params"),
        (col("n_tracked").cast("double") / col("n_urls").cast("double"))
          .as("tracked_share"))

  /** Canonical-URL dedup report: one row per canonical URL with how many
    * raw variants and rows collapsed into it — the crawl-frontier /
    * refetch-suppression primitive. One hash shuffle on the canonical
    * string; at 100 TB this is the same shape as exact text dedup (C1).
    */
  def dedupByCanonical(df: DataFrame, urlCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("canonical_url"), col(urlCol).as("__raw"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("__raw")).as("n_variants"))

  /** Canonical-URL dedup that KEEPS the best document per canonical form
    * (C71) — the crawl-curation step after [[canonicalize]]: pages
    * fetched under tracking-param/port/case/fragment variants collapse
    * to ONE kept document, chosen by (score DESC, id ASC). The pick is
    * an exact struct-max SELECTION (no window, no sort — one
    * partial-aggregated groupBy whose shuffle carries only
    * (canonical, score, id), never document text; equal scores are an
    * exact-IEEE tie owned by the id). Rows with NULL url or score are
    * out of contract and dropped. `idCol` must be a non-negative
    * numeric id (the tiebreak negates it inside the struct).
    */
  def dedupKeepBest(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      scoreCol: String): DataFrame =
    df.where(col(urlCol).isNotNull && col(scoreCol).isNotNull)
      .select(canonicalize(col(urlCol)).as("canonical_url"),
        col(idCol).as("__id"), col(scoreCol).as("__s"))
      .groupBy("canonical_url")
      .agg(
        count(lit(1)).as("n_docs"),
        max(struct(col("__s").as("q"), (lit(-1L) * col("__id")).as("nd")))
          .as("__top"))
      .select(col("canonical_url"), col("n_docs"),
        (lit(-1L) * col("__top").getField("nd")).as("kept_doc_id"),
        col("__top").getField("q").as("kept_score"))
}
