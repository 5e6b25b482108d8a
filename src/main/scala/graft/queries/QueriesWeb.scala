package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.web.Pages
import Derived._

/** Graft web-pages suite: synthesize the input_hint table, geocode from
  * html, kNN-join to the derived way graph, and verify the text
  * byte-identity invariant — all DuckDB-oracled.
  */
object QueriesWeb {

  val KnnRes = 7

  private def mmSql(e: String) = s"CAST(FLOOR(($e) * 1000 + 0.5) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pages → geocode → exact kNN to way nodes, text checksum carried
    "q36_pages_knn" -> ((s, d) => {
      val pages = Pages.synthesizeFromDocuments(s, d)
      Pages.nearestWayNode(pages, nodesDF(s, d), KnnRes,
        nodesCellOpt = Some(Derived.nodesCellMemo(s, d, KnnRes)))
        .select(col("url"), col("nn_nid"),
          expr(mmSql("dist_m")).as("dist_mm"),
          md5(col("text")).as("text_md5"))
    }),

    // byte-identity invariant: checksums after a full synth+geocode pass
    // equal checksums of the source documents
    "q37_pages_text_identity" -> ((s, d) => {
      val pages = Pages.geocode(Pages.synthesizeFromDocuments(s, d))
      Pages.textChecksums(pages)
    }),

    // URL canonicalization + dedup-by-URL — messy crawl URLs synthesized
    // deterministically from doc_id (scheme/WWW/port/tracking-param/
    // fragment variants), canonicalized by graft.web.Urls (scan-only
    // codegen'd regex/split/sort columns), then first-occurrence keeper
    // per canonical key via one min-window shuffle. The residue classes
    // guarantee collisions at every SF, so is_keeper is non-trivial.
    "q74_url_canon" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val canon = s.read.parquet(s"$d/documents.parquet")
        .selectExpr("doc_id", s"${rawUrlSql("STRING")} AS raw_url")
        .select(col("doc_id"),
          graft.web.Urls.canonicalize(col("raw_url")).as("canon_url"))
        .withColumn("host", graft.web.Urls.canonicalHost(col("canon_url")))
      canon.select(col("doc_id"), col("canon_url"), col("host"),
        (col("doc_id") ===
          min("doc_id").over(Window.partitionBy("canon_url")))
          .cast("long").as("is_keeper"))
    }),

    // cross-snapshot crawl diff — the first batch op of every crawl
    // cycle: ONE full-outer equi-join on the (unique) doc key classifies
    // added / deleted / changed / unchanged via md5 fingerprints.
    // Snapshots are deterministic slices: prev = doc_id % 7 != 0,
    // next = doc_id % 11 != 0 with text revised when doc_id % 5 == 0.
    "q117_snapshot_diff" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      val prev = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val next = docs.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("fp"))
      graft.web.Crawl.snapshotDiff(prev, next, "doc_id", "fp")
    }),

    // robots-style longest-prefix URL rule gate over CANONICAL urls —
    // raw URL synth → Urls.canonicalize → host/path split → broadcast
    // rule join + one partial-agg max(struct) winner per doc; ties
    // break toward allow (RFC 9309); no matching rule = allow
    "q118_url_rule_gate" -> ((s, d) => {
      val canon = s.read.parquet(s"$d/documents.parquet")
        .selectExpr("doc_id", s"${rawUrlSql("STRING")} AS raw_url")
        .select(col("doc_id"),
          graft.web.Urls.canonicalize(col("raw_url")).as("canon_url"))
        .select(col("doc_id"),
          graft.web.Urls.canonicalHost(col("canon_url")).as("host"),
          regexp_extract(col("canon_url"),
            "^[a-z][a-z0-9+.-]*://[^/?#]*([^?]*)", 1).as("path"))
      graft.web.Crawl.ruleGate(canon, "doc_id", "host", "path",
        GateRules, s)
    }),

    // link-graph centrality for crawl prioritization — 5 exact-integer
    // PageRank rounds (ppb ranks, floor divisions, damping as
    // (85·s) div 100) over a deterministic synthetic link set; the
    // oracle replays every round as an unrolled CTE chain bit-for-bit
    "q76_pagerank" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      val n = docs.count()
      graft.web.LinkGraph.pagerank(
        docs, graft.web.LinkGraph.syntheticEdges(docs, n), n)
    }),

    // link-graph triangle counts + clustering coefficient — the
    // link-spam/community-density signal beside q76's centrality;
    // degree-ordered orientation bounds wedge volume at O(E^1.5)
    "q93_triangles" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      val n = docs.count()
      graft.web.LinkGraph.triangleCounts(
        docs, graft.web.LinkGraph.syntheticEdges(docs, n))
    }),

    // page→host graph collapse: the Common-Crawl host-level webgraph
    // product — intra-host links dropped, link count + distinct source
    // pages per host pair
    "q99_host_graph" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "source")
      val n = docs.count()
      graft.web.LinkGraph.hostGraph(
        docs, graft.web.LinkGraph.syntheticEdges(docs.select("doc_id"), n))
    }),

    // bounded k-core peel (k=3, 4 rounds) — the spam-farm / link-ring
    // robustness signal; hierarchy-shaped div-edges so the peel cascade
    // is non-trivial (round 1 removes half the leaves, each later round
    // peels the newly exposed layer). Frontier-sized decremental rounds.
    "q101_kcore" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      graft.web.LinkGraph.kcorePeel(
        docs, graft.web.LinkGraph.divEdges(docs))
    }),

    // synchronous label propagation (3 rounds) — the cheap
    // community-detection pass (link farms / mirror clusters); mode-of-
    // neighbour labels with min tie-break, argmax as a max-count join
    // (no per-node window)
    "q107_label_prop" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      graft.web.LinkGraph.labelPropagation(
        docs, graft.web.LinkGraph.divEdges(docs))
    }),

    // anchor-text aggregation: the webgraph-derived corpus — per-target
    // (anchor, inbound-link count, distinct source hosts) from a
    // deterministic anchor token of each source page
    "q103_anchor_text" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      val n = docs.count()
      graft.web.LinkGraph.anchorText(docs,
        graft.web.LinkGraph.syntheticEdges(docs.select("doc_id"), n),
        "doc_id", "text", "source")
    }),

    // multi-source BFS crawl depth (3 frontier rounds): hops from the
    // deterministic seed set doc_id % 97 == 0 along directed div-edges —
    // the TrustRank-style seed-distance quality feature; unreached = -1
    "q108_bfs_depth" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      graft.web.LinkGraph.bfsDepth(
        docs, graft.web.LinkGraph.divEdges(docs))
    }),

    // HyperBall neighbourhood-function sketch (2 merge rounds): exact
    // integer HLL registers per node — the harmonic-centrality scale
    // path where exact balls are impossible; gate compares packed
    // registers, zero count and register sum bit-for-bit
    "q100_hyperball" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id")
      val n = docs.count()
      graft.web.LinkGraph.hyperBallRegisters(
        docs, graft.web.LinkGraph.syntheticEdges(docs, n))
    }))

  /** Deterministic messy-URL synthesis, identical modulo the cast type
    * (`STRING` for Spark, `VARCHAR` for DuckDB). The variants exercise
    * every canonicalization rule: upper-cased scheme/host, `www.`,
    * default vs non-default ports, trailing slash, tracking params,
    * unsorted params, fragments.
    */
  /** q118's rule table — (canonical host, path prefix, allow): host1
    * deny-overrides /p/1 inside a general allow, host2 is all-deny,
    * host3 is default-deny with a /p/3 carve-out, other hosts have no
    * rules (default allow). Inlined verbatim into the oracle SQL.
    */
  private val GateRules = Seq(
    ("host1.example.com", "/p/1", 0L),
    ("host1.example.com", "/p/", 1L),
    ("host2.example.com", "/p", 0L),
    ("host3.example.com", "/p/3", 1L),
    ("host3.example.com", "", 0L))

  private def rawUrlSql(strTy: String): String =
    s"""concat(
       |  CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END, '://',
       |  CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END,
       |  'Host', CAST(doc_id % 7 AS $strTy), '.Example.COM',
       |  CASE WHEN doc_id % 5 = 0 THEN
       |      CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE ':80' END
       |    WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END,
       |  '/p/', CAST(doc_id % 10 AS $strTy),
       |  CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END,
       |  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&b=2&a=1'
       |    WHEN doc_id % 4 = 1 THEN '?b=2&a=1'
       |    WHEN doc_id % 4 = 2 THEN '?fbclid=XYZ' ELSE '' END,
       |  CASE WHEN doc_id % 6 = 0 THEN '#Sec2' ELSE '' END)"""
      .stripMargin.replace("\n", " ")

  /** The DuckDB replay of `Urls.canonicalize` over the synthesized raw
    * URLs — CTE chain ending in `c(doc_id, canon_url, host)`; shared by
    * the q74 and q118 oracles.
    */
  private def canonCte: String =
    s"""raw AS (
       |  SELECT doc_id, ${rawUrlSql("VARCHAR")} AS raw_url FROM documents),
       |nf AS (
       |  SELECT doc_id, regexp_replace(raw_url, '#.*$$', '') AS u FROM raw),
       |p AS (SELECT doc_id,
       |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    regexp_replace(lower(regexp_extract(u,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\\.', '')
       |      AS auth1,
       |    regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
       |      AS rest
       |  FROM nf),
       |q AS (SELECT doc_id, scheme,
       |    CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$$', '')
       |         WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$$', '')
       |         ELSE auth1 END AS auth,
       |    regexp_extract(rest, '^([^?]*)', 1) AS path0,
       |    regexp_extract(rest, '\\?(.*)$$', 1) AS query0
       |  FROM p),
       |r AS (SELECT doc_id, scheme, auth,
       |    CASE WHEN length(path0) > 1
       |      THEN regexp_replace(path0, '/$$', '') ELSE path0 END AS pth,
       |    COALESCE(array_to_string(
       |      list_sort(list_filter(string_split(query0, '&'),
       |        x -> x <> '' AND NOT regexp_matches(x, '^utm_')
       |          AND NOT regexp_matches(x, '^fbclid='))), '&'), '') AS qry
       |  FROM q),
       |c AS (SELECT doc_id,
       |    concat(scheme, '://', auth, pth,
       |      CASE WHEN qry = '' THEN '' ELSE concat('?', qry) END)
       |      AS canon_url,
       |    regexp_replace(auth, ':[0-9]+$$', '') AS host
       |  FROM r)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q36_pages_knn" ->
      s"""WITH $oracleWaysCte,
         |pages AS (
         |  SELECT concat('doc://', CAST(doc_id AS VARCHAR)) AS url,
         |    ((doc_id * 7919123) % 1700000 - 850000) / 10000.0 AS plat,
         |    ((doc_id * 104729177) % 3600000 - 1800000) / 10000.0 AS plon,
         |    md5(text) AS text_md5
         |  FROM documents WHERE doc_id % 10 <> 0),
         |d AS (
         |  SELECT url, nid, text_md5,
         |    ${haversineSql("plat", "plon", "lat", "lon")} AS dist,
         |    ROW_NUMBER() OVER (PARTITION BY url ORDER BY
         |      ${haversineSql("plat", "plon", "lat", "lon")} ASC, nid ASC) AS rn
         |  FROM pages CROSS JOIN nodes)
         |SELECT url, nid AS nn_nid, ${mmSql("dist")} AS dist_mm, text_md5
         |FROM d WHERE rn = 1""".stripMargin,

    "q37_pages_text_identity" ->
      """SELECT concat('doc://', CAST(doc_id AS VARCHAR)) AS url,
        |  md5(text) AS text_md5
        |FROM documents""".stripMargin,

    // q74: the same synthesis (VARCHAR cast) and the same six
    // canonicalization rules replayed in DuckDB SQL — every regex is
    // anchored or unique-match, so replace-first (DuckDB) ≡ replace-all
    // (Spark); param sort is binary-collation on ASCII on both sides
    "q74_url_canon" ->
      s"""WITH $canonCte
         |SELECT doc_id, canon_url, host,
         |  CAST(CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY canon_url)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
         |FROM c""".stripMargin,

    // q117: the identical full-outer diff in SQL; snapshot slices and
    // the revision rule are inlined on both sides
    "q117_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT doc_id, md5(text) AS old_fp FROM documents
        |  WHERE doc_id % 7 <> 0),
        |nxt AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END)
        |      AS new_fp
        |  FROM documents WHERE doc_id % 11 <> 0)
        |SELECT COALESCE(prev.doc_id, nxt.doc_id) AS doc_id,
        |  CASE WHEN prev.doc_id IS NULL THEN 'added'
        |       WHEN nxt.doc_id IS NULL THEN 'deleted'
        |       WHEN old_fp = new_fp THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_fp, new_fp
        |FROM prev FULL OUTER JOIN nxt ON prev.doc_id = nxt.doc_id"""
        .stripMargin,

    // q118: canonicalization CTE shared with q74, rules inlined, winner
    // = first rule under (prefix length DESC, allow-first, prefix DESC)
    // per doc — the same total order Spark's max(struct) picks
    "q118_url_rule_gate" -> {
      val ruleRows = GateRules.map { case (h, p, a) =>
        s"('$h', '$p', CAST($a AS BIGINT))"
      }.mkString(", ")
      s"""WITH $canonCte,
         |u AS (SELECT doc_id, host,
         |    regexp_extract(canon_url,
         |      '^[a-z][a-z0-9+.-]*://[^/?#]*([^?]*)', 1) AS path
         |  FROM c),
         |rules(rhost, rprefix, rallow) AS (VALUES $ruleRows),
         |m AS (
         |  SELECT u.doc_id, rprefix, rallow,
         |    ROW_NUMBER() OVER (PARTITION BY u.doc_id
         |      ORDER BY length(rprefix) DESC, rallow DESC, rprefix DESC)
         |      AS rn
         |  FROM u JOIN rules ON u.host = rules.rhost
         |    AND starts_with(u.path, rules.rprefix))
         |SELECT u.doc_id, u.host, u.path,
         |  m.rprefix AS matched_prefix,
         |  COALESCE(m.rallow, CAST(1 AS BIGINT)) AS allowed
         |FROM u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
         |  ON u.doc_id = m.doc_id""".stripMargin
    },


    "q76_pagerank" -> pagerankOracle(5),

    // q93: the same synthetic edge rule as q76, then the identical
    // orientation key (deg·2³² + id) and wedge/closing joins in SQL;
    // cc_ppm uses the same integer floor division.
    "q93_triangles" ->
      """WITH nodes AS (SELECT doc_id FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src,
        |    (doc_id*31 + 17*i.i + 7) % (SELECT n FROM nn) AS dst
        |  FROM documents, LATERAL unnest([0,1,2]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |  FROM e),
        |deg AS (
        |  SELECT x, COUNT(*) AS deg FROM (
        |    SELECT u AS x FROM und UNION ALL SELECT v FROM und)
        |  GROUP BY 1),
        |k AS (SELECT x, deg * 4294967296 + x AS k FROM deg),
        |o AS (
        |  SELECT CASE WHEN ku.k < kv.k THEN u ELSE v END AS f,
        |         CASE WHEN ku.k < kv.k THEN v ELSE u END AS t,
        |         CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS kt
        |  FROM und JOIN k ku ON ku.x = und.u JOIN k kv ON kv.x = und.v),
        |tri AS (
        |  SELECT e1.f AS a, e1.t AS b, e2.t AS c
        |  FROM o e1
        |  JOIN o e2 ON e1.f = e2.f AND e1.kt < e2.kt
        |  JOIN o e3 ON e3.f = e1.t AND e3.t = e2.t),
        |pn AS (
        |  SELECT x, COUNT(*) AS n_tri FROM (
        |    SELECT a AS x FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT nodes.doc_id,
        |  CAST(COALESCE(deg.deg, 0) AS BIGINT) AS deg,
        |  CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN COALESCE(deg.deg, 0) >= 2
        |    THEN (2 * COALESCE(pn.n_tri, 0) * 1000000)
        |      // (deg.deg * (deg.deg - 1))
        |    ELSE 0 END AS BIGINT) AS cc_ppm
        |FROM nodes
        |LEFT JOIN deg ON deg.x = nodes.doc_id
        |LEFT JOIN pn ON pn.x = nodes.doc_id""".stripMargin,

    // q99: same synthetic edge rule, endpoint hosts from documents,
    // intra-host edges dropped
    "q99_host_graph" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src,
        |    (doc_id*31 + 17*i.i + 7) % (SELECT n FROM nn) AS dst
        |  FROM documents, LATERAL unnest([0,1,2]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |hm AS (SELECT doc_id, source AS host FROM documents)
        |SELECT a.host AS src_host, b.host AS dst_host,
        |  CAST(COUNT(*) AS BIGINT) AS n_links,
        |  CAST(COUNT(DISTINCT e.src) AS BIGINT) AS n_src_pages
        |FROM e
        |JOIN hm a ON a.doc_id = e.src
        |JOIN hm b ON b.doc_id = e.dst
        |WHERE a.host <> b.host
        |GROUP BY 1, 2""".stripMargin,

    "q100_hyperball" -> hyperballOracle(2),

    "q101_kcore" -> kcoreOracle(3, 4),

    "q107_label_prop" -> lpaOracle(3),

    "q108_bfs_depth" -> bfsOracle(97L, 3),

    // q103: same synthetic edge rule, anchor = source token at
    // 1 + dst mod n_tokens (DuckDB lists are 1-based like Spark
    // element_at, so the index expressions match literally)
    "q103_anchor_text" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src,
        |    (doc_id*31 + 17*i.i + 7) % (SELECT n FROM nn) AS dst
        |  FROM documents, LATERAL unnest([0,1,2]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |s2 AS (
        |  SELECT doc_id, source AS src_host,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |s3 AS (SELECT * FROM s2 WHERE len(toks) > 0),
        |a AS (
        |  SELECT e.dst AS doc_id, s3.src_host,
        |    toks[CAST(1 + e.dst % len(toks) AS INT)] AS anchor
        |  FROM e JOIN s3 ON s3.doc_id = e.src)
        |SELECT doc_id, anchor,
        |  CAST(COUNT(*) AS BIGINT) AS n_links,
        |  CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_src_hosts
        |FROM a GROUP BY 1, 2""".stripMargin)

  /** q107: every synchronous LPA round unrolled — votes from the
    * previous round's labels, argmax by (max count, min label), nodes
    * with no neighbours keep their label.
    */
  private def lpaOracle(rounds: Int): String = {
    val head =
      """WITH nodes AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src, doc_id // i.i AS dst
        |  FROM documents, LATERAL unnest([2,3]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |  FROM e),
        |adj AS (SELECT u AS x, v AS y FROM und
        |        UNION ALL SELECT v, u FROM und),
        |l0 AS (SELECT doc_id AS x, doc_id AS lbl FROM nodes)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""v$r AS (
         |  SELECT adj.x, l.lbl, COUNT(*) AS c
         |  FROM adj JOIN l${r - 1} l ON l.x = adj.y
         |  GROUP BY 1, 2),
         |m$r AS (SELECT x, MAX(c) AS mx FROM v$r GROUP BY 1),
         |b$r AS (
         |  SELECT v.x, MIN(v.lbl) AS nl
         |  FROM v$r v JOIN m$r m ON m.x = v.x AND v.c = m.mx
         |  GROUP BY 1),
         |l$r AS (
         |  SELECT l.x, COALESCE(b.nl, l.lbl) AS lbl
         |  FROM l${r - 1} l LEFT JOIN b$r b ON b.x = l.x)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rs
       |SELECT x AS doc_id, CAST(lbl AS BIGINT) AS label FROM l$rounds"""
      .stripMargin
  }

  /** q108: every BFS frontier round unrolled — round r reaches the
    * distinct out-neighbours of round r−1's frontier that no earlier
    * round visited; the epilogue left-joins the delta union back onto
    * nodes (unreached → −1). Directed div-edges, seeds doc_id % m = 0.
    */
  private def bfsOracle(seedMod: Long, rounds: Int): String = {
    val head =
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, doc_id // i.i AS dst
         |  FROM documents, LATERAL unnest([2,3]) i(i)),
         |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         |f0 AS (SELECT doc_id AS x FROM nodes WHERE doc_id % $seedMod = 0),
         |s0 AS (SELECT x FROM f0)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""f$r AS (
         |  SELECT DISTINCT e.dst AS x
         |  FROM e JOIN f${r - 1} f ON f.x = e.src
         |  WHERE e.dst NOT IN (SELECT x FROM s${r - 1})),
         |s$r AS (SELECT x FROM s${r - 1} UNION ALL SELECT x FROM f$r)"""
        .stripMargin
    }.mkString(",\n")
    val dall = (0 to rounds)
      .map(r => s"SELECT x, $r AS depth FROM f$r").mkString(" UNION ALL ")
    s"""$head,
       |$rs,
       |dall AS ($dall)
       |SELECT nodes.doc_id,
       |  CAST(COALESCE(dall.depth, -1) AS BIGINT) AS depth
       |FROM nodes LEFT JOIN dall ON dall.x = nodes.doc_id""".stripMargin
  }

  /** q101: every peel round unrolled — round r recomputes each active
    * node's degree AMONG active nodes (bit-equal to the engine's
    * frontier decrement: deg0 minus removed neighbours = surviving
    * neighbours), removes `deg < k`, and the epilogue recomputes the
    * survivors' final degree the same way.
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val head =
      """WITH nodes AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src, doc_id // i.i AS dst
        |  FROM documents, LATERAL unnest([2,3]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |und AS (
        |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |  FROM e),
        |adj AS (SELECT u AS x, v AS y FROM und
        |        UNION ALL SELECT v, u FROM und),
        |a0 AS (SELECT doc_id AS x FROM nodes)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""d$r AS (
         |  SELECT a.x, COALESCE(g.cnt, 0) AS deg
         |  FROM a${r - 1} a LEFT JOIN (
         |    SELECT adj.x, COUNT(*) AS cnt
         |    FROM adj
         |    JOIN a${r - 1} ax ON ax.x = adj.x
         |    JOIN a${r - 1} ay ON ay.x = adj.y
         |    GROUP BY adj.x) g ON g.x = a.x),
         |rm$r AS (SELECT x FROM d$r WHERE deg < $k),
         |a$r AS (SELECT x FROM d$r WHERE deg >= $k)""".stripMargin
    }.mkString(",\n")
    val rmall = (1 to rounds)
      .map(r => s"SELECT x, $r AS rr FROM rm$r").mkString(" UNION ALL ")
    s"""$head,
       |$rs,
       |rmall AS ($rmall),
       |degf AS (
       |  SELECT adj.x, COUNT(*) AS cnt
       |  FROM adj JOIN a$rounds ay ON ay.x = adj.y
       |  GROUP BY adj.x)
       |SELECT nodes.doc_id,
       |  CAST(COALESCE(rmall.rr, 0) AS BIGINT) AS removed_round,
       |  CAST(CASE WHEN rmall.rr IS NULL THEN COALESCE(degf.cnt, 0)
       |       ELSE 0 END AS BIGINT) AS deg_final
       |FROM nodes
       |LEFT JOIN rmall ON rmall.x = nodes.doc_id
       |LEFT JOIN degf ON degf.x = nodes.doc_id""".stripMargin
  }

  /** q100: both HyperBall merge rounds unrolled as CTEs — md5h63
    * element hashes, register index h % 16, rank 60 − bitlen(h // 16)
    * (60 for a zero tail; `length(bin(x))` is the exact bitlen in both
    * engines for x ≥ 1), elementwise max over self ∪ out-neighbours,
    * then the same 6-bit register packing and zero/sum stats.
    */
  private def hyperballOracle(rounds: Int): String = {
    val mh = graft.dedup.Dedup.md5h63Sql("CAST(doc_id AS VARCHAR)")
    val head =
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src,
         |    (doc_id*31 + 17*i.i + 7) % (SELECT n FROM nn) AS dst
         |  FROM documents, LATERAL unnest([0,1,2]) i(i)),
         |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         |h0 AS (SELECT doc_id, $mh AS h FROM nodes),
         |r0 AS (
         |  SELECT doc_id, list_transform(range(16), i ->
         |    CASE WHEN i = h % 16 THEN
         |      CASE WHEN h // 16 = 0 THEN 60
         |           ELSE 60 - length(bin(h // 16)) END
         |    ELSE 0 END) AS regs
         |  FROM h0)""".stripMargin
    val merges = (1 to rounds).map { k =>
      s"""c$k AS (
         |  SELECT e.src AS doc_id, s.regs
         |  FROM e JOIN r${k - 1} s ON s.doc_id = e.dst
         |  UNION ALL SELECT doc_id, regs FROM r${k - 1}),
         |x$k AS (
         |  SELECT doc_id, t.i AS j, regs[t.i + 1] AS mj
         |  FROM c$k, LATERAL unnest(range(16)) t(i)),
         |g$k AS (SELECT doc_id, j, MAX(mj) AS mj FROM x$k GROUP BY 1, 2),
         |r$k AS (
         |  SELECT doc_id, list(mj ORDER BY j) AS regs FROM g$k GROUP BY 1)"""
        .stripMargin
    }.mkString(",\n")
    val lo = (0 until 8).map(i => s"regs[${i + 1}] * ${1L << (6 * i)}")
      .mkString(" + ")
    val hi = (8 until 16).map(i => s"regs[${i + 1}] * ${1L << (6 * (i - 8))}")
      .mkString(" + ")
    s"""$head,
       |$merges
       |SELECT doc_id,
       |  CAST($lo AS BIGINT) AS regs_lo,
       |  CAST($hi AS BIGINT) AS regs_hi,
       |  CAST(len(list_filter(regs, x -> x = 0)) AS BIGINT) AS v_zero,
       |  CAST(list_sum(regs) AS BIGINT) AS sum_m
       |FROM r$rounds""".stripMargin
  }

  /** q76: the 5 PageRank rounds unrolled as CTEs — same integer floor
    * divisions (`//`), same synthetic edge rule, same teleport/damping
    * integerisation as [[graft.web.LinkGraph]]. DuckDB SUM yields
    * HUGEINT, so the final rank is CAST back to BIGINT.
    */
  private def pagerankOracle(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT doc_id FROM documents),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src,
        |    (doc_id*31 + 17*i.i + 7) % (SELECT n FROM nn) AS dst
        |  FROM documents, LATERAL unnest([0,1,2]) i(i)),
        |e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
        |od AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
        |r0 AS (
        |  SELECT doc_id, 1000000000 // (SELECT n FROM nn) AS r
        |  FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (
         |  SELECT e.dst, SUM(r.r // od.outdeg) AS s
         |  FROM e JOIN od USING (src) JOIN r${k - 1} r ON r.doc_id = e.src
         |  GROUP BY 1),
         |r$k AS (
         |  SELECT nodes.doc_id,
         |    150000000 // (SELECT n FROM nn)
         |      + (85 * COALESCE(c$k.s, 0)) // 100 AS r
         |  FROM nodes LEFT JOIN c$k ON c$k.dst = nodes.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""$head,
       |$rounds
       |SELECT doc_id, CAST(r AS BIGINT) AS rank_ppb FROM r$iters"""
      .stripMargin
  }
}
