package graft.web

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-maintenance operators: snapshot diffing between crawls and
  * robots-style URL rule gating — the two batch primitives a continuous
  * web-corpus pipeline runs before anything else touches a new crawl.
  */
object Crawl {

  /** Cross-snapshot diff: classify every key across two crawl snapshots
    * as added / deleted / changed / unchanged by comparing a content
    * fingerprint column. One full-outer equi-join on the key — the
    * canonical diff shape: both sides shuffle-partition on the (unique)
    * key, so there is no skew and no driver state; output carries both
    * fingerprints for downstream incremental processing (only `added` +
    * `changed` rows need re-ingestion, `deleted` rows need tombstones).
    */
  def snapshotDiff(
      prev: DataFrame, next: DataFrame, key: String, fp: String): DataFrame =
    prev.select(col(key), col(fp).as("old_fp"))
      .join(next.select(col(key), col(fp).as("new_fp")), Seq(key),
        "full_outer")
      .select(col(key),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("deleted"))
          .when(col("old_fp") === col("new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_fp"), col("new_fp"))

  /** Longest-prefix URL rule gate (robots.txt semantics, RFC 9309 /
    * Google's documented rule: the most specific — longest — matching
    * path rule wins; between equivalent rules the least restrictive
    * wins, i.e. allow beats deny on an equal-length tie; no matching
    * rule means allow). Note an equal-length prefix of the same path is
    * necessarily the same string, so the tie only arises for duplicate
    * (host, prefix) rows with conflicting allow values.
    *
    * `rules` is (host, path-prefix, allow 0/1) — O(rule-table) small by
    * construction (robots rules, not data), so it BROADCASTS; the
    * per-URL winner is one partial-aggregable `max(struct(...))` groupBy
    * on the key — no per-URL window, no rule explosion beyond the
    * broadcast join's matches. Unmatched URLs re-enter via a left join
    * with a default-allow. `key` must be unique per URL row (it is the
    * groupBy identity of the winner selection).
    */
  def ruleGate(
      urls: DataFrame, key: String, hostCol: String, pathCol: String,
      rules: Seq[(String, String, Long)], spark: SparkSession): DataFrame = {
    import spark.implicits._
    val r = broadcast(rules.toDF("__rhost", "__rprefix", "__rallow"))
    val winners = urls
      .select(col(key), col(hostCol).as("__h"), col(pathCol).as("__p"))
      .join(r, col("__h") === col("__rhost") &&
        col("__p").startsWith(col("__rprefix")))
      .groupBy(key)
      .agg(max(struct(
        length(col("__rprefix")).as("plen"),
        col("__rallow").as("allow_pref"),
        col("__rprefix").as("prefix"),
        col("__rallow").as("allow"))).as("w"))
      .select(col(key), col("w.prefix").as("matched_prefix"),
        col("w.allow").as("__wallow"))
    urls.select(col(key), col(hostCol), col(pathCol))
      .join(winners, Seq(key), "left")
      .select(col(key), col(hostCol), col(pathCol), col("matched_prefix"),
        coalesce(col("__wallow"), lit(1L)).as("allowed"))
  }
}
