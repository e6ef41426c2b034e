package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the stage every web-corpus
  * pipeline runs BEFORE content dedup: two crawls of the same page under
  * cosmetically different URLs (tracking params, default ports, casing,
  * fragments) must collapse to one key so the cheap exact-dedup catches
  * them without ever touching document text.
  *
  * Extension beyond the reference's URL handling (it only extracts the
  * domain — views/pioneer/package.scala:19-31, our
  * [[graft.functions.Strings.domainOf]]); the canonical-key form is the
  * standard web-pipeline normalization (WHATWG-ish subset, restricted to
  * rules that are deterministic pure string rewrites).
  *
  * Everything here is built-in-function composition (regexp_extract /
  * array ops) — whole-stage-codegen'd, no UDF, and replayable in ANSI
  * SQL for the oracle. Scale shape: a narrow per-row projection (no
  * shuffle); [[urlDedupe]] adds ONE hash aggregate on the canonical key.
  */
object UrlOps {

  /** Query parameters dropped during canonicalization: click/campaign
    * trackers that never affect page content. Prefix match for `utm_`. */
  val trackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "ref", "igshid")

  private val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  // host[:port] = everything between :// and the first /?#
  private val hostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  // path = from the first / after authority up to ? or #
  private val pathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  // query = between ? and # (without the ?)
  private val queryRe = "\\?([^#]*)"

  /** Canonical form of an absolute http(s) URL:
    *   1. strip the fragment (`#…` never reaches the server);
    *   2. lowercase scheme and host (case-insensitive per RFC 3986);
    *   3. drop a `www.` host prefix and the scheme's default port
    *      (`:80` http / `:443` https);
    *   4. drop tracking query params ([[trackingParams]] + `utm_*`),
    *      sort the survivors bytewise (param order is almost never
    *      semantic), keep duplicates;
    *   5. drop a trailing `/` on a non-root path and an empty `?`.
    * Non-URLs (no `scheme://`) pass through trimmed — the caller decides
    * whether to treat them as keys or discard. */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, schemeRe, 1))
    val hostPort = lower(regexp_extract(noFrag, hostRe, 1))
    val host0 = regexp_replace(hostPort, ":(80|443)$", "")
    // only strip the port when it IS the scheme default
    val hostNoDefault = when(
        (scheme === "http" && hostPort.endsWith(":80")) ||
          (scheme === "https" && hostPort.endsWith(":443")),
        host0)
      .otherwise(hostPort)
    val host = regexp_replace(hostNoDefault, "^www\\.", "")
    val path0 = regexp_extract(noFrag, pathRe, 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query0 = regexp_extract(noFrag, queryRe, 1)
    val kept = filter(split(query0, "&"), p =>
      !(p.startsWith("utm_") || p === "" ||
        trackingParams.map(t => p === t || p.startsWith(t + "="))
          .reduce(_ || _)))
    val query = array_join(array_sort(kept), "&")
    when(scheme === "", u).otherwise(
      concat(scheme, lit("://"), host, path,
        when(query === "", "").otherwise(concat(lit("?"), query))))
  }

  /** URL-level exact dedup: one row per canonical URL with the keeper
    * (min id — first-crawled wins under monotone ids) and the collapse
    * count. ONE hash aggregate on the canonical key (map-side partial
    * combine; the key is computed in the scan projection, so nothing
    * wide shuffles). */
  def urlDedupe(docs: DataFrame, urlCol: String, idCol: String): DataFrame =
    docs.select(canonicalizeUrl(col(urlCol)).as("url_canon"), col(idCol))
      .groupBy(col("url_canon"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).cast("long").as("n_urls"))

  /** Lowercased host of an absolute URL with userinfo, any port, and
    * trailing dots stripped — the domain-blocklist key. A compliance
    * gate must not be evadable by trivially equivalent authority forms:
    * `http://user@evil.com/` and the FQDN `http://evil.com./` both
    * resolve to evil.com, so both must yield the same key (an
    * unstripped `user@evil.com` has no `evil.com` label suffix and
    * would walk straight through the gate). Userinfo strips GREEDILY to
    * the LAST `@` — WHATWG URL parsing takes the host from after the
    * last `@` of the authority, so `http://a@b@evil.com/` is evil.com
    * too; a first-`@` strip would leave `b@evil.com` and reopen the
    * evasion. `www.` is KEPT (unlike
    * [[canonicalizeUrl]]): blocklist patterns decide their own depth,
    * and a pattern for `example.com` reaches the `www.` form through
    * suffix matching anyway. Non-URLs (no `scheme://`) yield the empty
    * string. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(regexp_extract(trim(url), hostRe, 1)),
          "^.*@", ""),
        ":[0-9]+$", ""),
      "\\.+$", "")

  /** Domain blocklist flagging — the robots/opt-out compliance gate a
    * crawl pipeline runs before anything else touches a page. A doc is
    * blocked when ANY dot-boundary suffix of its URL's host equals a
    * blocklist pattern: `example.com` blocks `a.b.example.com` and
    * `example.com` itself, but never `notexample.com` (label
    * boundaries, not string suffixes). Patterns are matched lowercased
    * and port-blind. Output is every input row plus a `blocked` flag —
    * the audit-friendly form; filter `!blocked` for the gate itself.
    *
    * Scale shape: the host's label-suffix chain is generated scan-side
    * (≤ label-count entries per URL — single digits) and equi-joined
    * against the blocklist, which is broadcast-sized by nature (opt-out
    * lists are rows of domains, not corpora) — so the only data-sized
    * work is one scan plus a blocked-id set that is small by
    * construction. Never a `LIKE '%…'` theta-join, which would be a
    * broadcast NESTED-LOOP over patterns (the DuckDB oracle replays the
    * semantics that way precisely because it is a different mechanism).
    * Blank patterns are dropped (a non-URL row's empty host must not
    * match anything). */
  def domainBlocklistFilter(docs: DataFrame, urlCol: String, idCol: String,
                            blocklist: DataFrame,
                            patternCol: String): DataFrame = {
    require(!docs.columns.contains("blocked"),
      "input already has the reserved output column 'blocked'")
    val labels = split(urlHost(col(urlCol)), "\\.")
    val suffixes = transform(sequence(lit(0), size(col("__lbl")) - 1),
      i => array_join(slice(col("__lbl"), i + 1, size(col("__lbl")) - i), "."))
    val patterns = blocklist
      .select(lower(trim(col(patternCol))).as("__sfx"))
      .where(length(col("__sfx")) > 0).distinct()
    val blockedIds = docs
      .select(col(idCol), labels.as("__lbl"))
      .select(col(idCol), explode(suffixes).as("__sfx"))
      .join(broadcast(patterns), "__sfx")
      .select(col(idCol)).distinct()
    docs.join(blockedIds.withColumn("__b", lit(true)), Seq(idCol), "left")
      .withColumn("blocked", coalesce(col("__b"), lit(false)))
      .drop("__b")
  }
}
