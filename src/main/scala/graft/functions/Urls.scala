package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first dedup pass of a crawl
  * pipeline (the same page is fetched as `HTTP://Site.com/a?b=2&a=1#frag`,
  * `http://site.com:80/a/?a=1&b=2&utm_source=feed`, … and must collapse
  * BEFORE content dedup ever sees the bytes).
  *
  * Canonical form (documented so the q109 oracle restates it step-for-step):
  *   1. scheme and host lowercased;
  *   2. an explicit default port dropped (`:80` for http, `:443` for https);
  *   3. trailing `/`s stripped from the path (`/a/` ≡ `/a`, `/` ≡ ``);
  *   4. the query string split on `&`, tracking params dropped (`utm_*`,
  *      `gclid`, `fbclid`, `ref`), the rest sorted bytewise and rejoined —
  *      param ORDER never distinguishes two URLs, tracking params never do;
  *   5. the fragment dropped (never sent to the server).
  *
  * Deliberately NOT done: `www.` stripping and percent-decoding — both can
  * merge genuinely different resources; this pass only erases differences
  * that provably cannot change the response.
  *
  * Everything is regexp/array built-ins (codegen'd or native), no UDF; the
  * identical algorithm restates in DuckDB (regexp_extract / list_filter /
  * list_sort), so canonical equality is oracle-checkable cross-engine.
  */
object Urls {

  private val TrackingParams = Seq("gclid", "fbclid", "ref")

  /** The canonical form of a URL column (see object doc for the rules).
    * Null-safe (null → null); a string with no `scheme://` prefix
    * canonicalizes to null rather than a half-parsed guess. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    // the query must come from the PRE-FRAGMENT part: a bare "\?([^#]*)"
    // would also match a '?' sitting inside the fragment and resurrect
    // fragment text as a query string
    val query = regexp_extract(regexp_replace(url, "#.*$", ""),
      "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !TrackingParams.map(t => p === t || p.startsWith(t + "="))
          .reduce(_ || _)))
    val qs = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme === "" || hostRaw === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, qs))
  }

  /** URL-level dedup report: one row per canonical URL with the kept
    * representative (lowest id — deterministic) and the collapse count.
    * URLs that fail to canonicalize (null) are excluded — route them to a
    * quarantine branch, don't silently merge them under one null key.
    *
    * Scale shape: one partially-aggregating shuffle on the canonical URL
    * (min/count combine map-side; the heaviest canonical key is a
    * hot URL, bounded by its fetch count). No window, no join. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol),
        count(lit(1)).as("n_dupes"))
      .select(col("canonical_url"), col(idCol), col("n_dupes"))
}
