package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-pipeline normalization step that runs
  * before dedup-by-URL (CCNet / RefinedWeb style: the same page is
  * crawled under `HTTP://WWW.Host.com:80/a/?utm_source=x#frag` and
  * `http://host.com/a` and must collapse to one key).
  *
  * Rules (the common core of the published pipelines):
  *   1. drop the fragment (`#...`),
  *   2. lowercase the scheme and the host:port authority,
  *   3. strip a leading `www.`,
  *   4. strip the scheme's default port (`:80` for http, `:443` https),
  *   5. drop tracking query params (`utm_*`, `fbclid`), sort the rest,
  *   6. strip one trailing `/` from a non-root path.
  *
  * Everything is a codegen'd column expression (regexp / split /
  * array_sort / concat) — scan-only, zero shuffles; the dedup that
  * follows is one groupBy on the canonical key. The exact same rules
  * are expressible in DuckDB SQL, which is how q74 oracles this
  * byte-for-byte.
  */
object Urls {

  /** Canonical form of a `scheme://authority/path?query#frag` URL. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    // path = from the first '/' after the authority up to '?' (exclusive)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(length(path0) > 1, regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    val query0 = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(
      split(query0, "&"),
      p => !(p.rlike("^utm_") || p.rlike("^fbclid=") || p === lit("")))
    val query = concat_ws("&", array_sort(params))
    concat(
      scheme, lit("://"), auth, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Host (no port) of the canonical URL. */
  def canonicalHost(canon: Column): Column =
    regexp_replace(
      regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1),
      ":\\d+$", "")
}
