package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.UrlCanon

/** Web-corpus stage 0: URL canonicalization, host-level rollups, and
  * per-host document caps — the first pass of every production crawl
  * pipeline (CCNet §3.1's URL-based dedup/filtering, RefinedWeb's URL
  * filtering and per-host treatment, Gopher/FineWeb host blocklists all
  * start from a canonical URL and a host key).
  *
  * Reference scope: the reference (a covid-stream ETL) has no web-corpus
  * stage at all — this module is part of the LLM-pipeline tier the
  * builder prompt makes first-class.
  *
  * The fixtures carry no URL column, so both engines derive a
  * deterministic synthetic `raw_url` from doc_id — adversarial by
  * construction (mixed-case schemes and hosts, userinfo, default and
  * non-default ports, tracking parameters, fragments, %-escaped and
  * trailing-slash path variants) and string-exact to replay in DuckDB.
  * The Spark side then canonicalizes with the native [[UrlCanon]]
  * expression (ONE string pass per row inside whole-stage codegen); the
  * oracle replays the same canonicalization as a regex chain. Hash
  * equality of the two implementations over every generated shape is
  * exactly what the gate checks.
  *
  * Shape at 100 TB: canonicalization is a narrow projection (no shuffle,
  * no join, no regex on the Spark side); the host rollup is one hash
  * aggregation keyed by host (bounded by the web's host count, ~10^8 —
  * comfortably shuffle-able); the per-host cap is one repartition-by-host
  * + bounded per-host ordering. Nothing here scans `text`.
  */
object WebCorpus {

  /** Documents per host kept by the q160 cap (tiny so the cap BITES at
    * sf0.01's ~8 docs/host — production uses thousands). */
  val HostCapK = 5

  // ---------------------------------------------------------------------
  // deterministic raw-URL generator (Spark + DuckDB twins)
  // ---------------------------------------------------------------------

  /** Synthetic raw URL from doc_id, split into CONTENT (c = doc_id div
    * 16 — decides the canonical URL: scheme, host, real port, path,
    * query id) and DECORATION (b = doc_id % 16 — canon-invariant
    * cosmetics: host/scheme case, `www.`, userinfo, scheme-DEFAULT port,
    * trailing slash, utm params, fragment). The four low bits of b alone
    * are four independent decorations, so each content key yields 16
    * DISTINCT raw URLs that all canonicalize to ONE URL — the collapse a
    * crawl actually exhibits, present at every SF. Interactions are
    * adversarial by construction: a non-default `:8080` must survive
    * while `:443`-on-https drops; an uppercased host keeps its `WWW.`
    * foldable; an empty path still carries a query; `%20` escapes pass
    * through byte-for-byte. */
  private def rawUrl: Column = {
    val b = col("doc_id") % 16
    val c = expr("doc_id div 16")
    val bit0 = b % 2 // host case
    val bit1 = expr("((doc_id % 16) div 2) % 2") // www. prefix
    val bit2 = expr("((doc_id % 16) div 4) % 2") // scheme case
    val bit3 = expr("((doc_id % 16) div 8) % 2") // userinfo
    val schemeBase = when(c % 2 === 0, lit("https")).otherwise(lit("http"))
    val scheme = when(bit2 === 1, upper(schemeBase)).otherwise(schemeBase)
    // userinfo may itself contain '@' (RFC 3986 allows it) — every 9th
    // content key emits one, so the last-'@' strip rule is gate-pinned
    val userinfo = when(bit3 === 1,
        when(c % 9 === 0, lit("u@v:pw@")).otherwise(lit("user:pw@")))
      .otherwise(lit(""))
    val host0 = concat(lit("h"), (c % 60).cast("string"), lit(".example.com"))
    // every 11th content key doubles the www. so the strip-ALL loop
    // (canon idempotence) is gate-pinned, not just fuzzer-pinned
    val www = when(c % 11 === 0, lit("www.www.")).otherwise(lit("www."))
    val hostW = when(bit1 === 1, concat(www, host0)).otherwise(host0)
    val host = when(bit0 === 1, upper(hostW)).otherwise(hostW)
    val port = when(c % 7 === 0, lit(":8080"))
      .when(b % 3 === 0,
        when(c % 2 === 0, lit(":443")).otherwise(lit(":80")))
      .otherwise(lit(""))
    val pa = (c % 6).cast("string")
    val path0 = when(c % 17 === 0, lit(""))
      .when(c % 13 === 0, concat(lit("/p%20q/a"), pa))
      .otherwise(concat(lit("/a"), pa))
    val path = when(b % 5 === 0, concat(path0, lit("/"))).otherwise(path0)
    val idv = (c % 10).cast("string")
    val query = when(c % 4 === 3,
        when(b % 7 === 0, lit("?utm_medium=a")).otherwise(lit("")))
      .otherwise(
        when(b % 7 === 0, concat(lit("?utm_source=feed&id="), idv))
          .when(b % 7 === 1, concat(lit("?id="), idv, lit("&utm_campaign=x")))
          .otherwise(concat(lit("?id="), idv)))
    val frag = when(b % 11 === 0, lit("#frag")).otherwise(lit(""))
    concat(scheme, lit("://"), userinfo, host, port, path, query, frag)
  }

  /** DuckDB twin of [[rawUrl]] (CTE `u`): the exact same strings. NOTE —
    * fragments embedded into other `.stripMargin` strings must never
    * start a line with blanks + `|`, so every `||` sits at line END. */
  private val sqlRawUrl: String =
    """u AS (
      |  SELECT doc_id, source, n_chars,
      |    (CASE WHEN ((b // 4) % 2) = 1 THEN upper(sch) ELSE sch END) ||
      |    '://' ||
      |    (CASE WHEN ((b // 8) % 2) = 1 THEN
      |      (CASE WHEN c % 9 = 0 THEN 'u@v:pw@' ELSE 'user:pw@' END)
      |     ELSE '' END) ||
      |    (CASE WHEN (b % 2) = 1 THEN upper(hw) ELSE hw END) ||
      |    (CASE WHEN c % 7 = 0 THEN ':8080'
      |          WHEN b % 3 = 0 THEN
      |            (CASE WHEN c % 2 = 0 THEN ':443' ELSE ':80' END)
      |          ELSE '' END) ||
      |    (CASE WHEN b % 5 = 0 THEN p0 || '/' ELSE p0 END) ||
      |    (CASE WHEN c % 4 = 3 THEN
      |            (CASE WHEN b % 7 = 0 THEN '?utm_medium=a' ELSE '' END)
      |          WHEN b % 7 = 0 THEN
      |            '?utm_source=feed&id=' || CAST(c % 10 AS VARCHAR)
      |          WHEN b % 7 = 1 THEN
      |            '?id=' || CAST(c % 10 AS VARCHAR) || '&utm_campaign=x'
      |          ELSE '?id=' || CAST(c % 10 AS VARCHAR) END) ||
      |    (CASE WHEN b % 11 = 0 THEN '#frag' ELSE '' END)
      |    AS raw_url
      |  FROM (
      |    SELECT *,
      |      CASE WHEN ((b // 2) % 2) = 1 THEN
        (CASE WHEN c % 11 = 0 THEN 'www.www.' ELSE 'www.' END) || h0
      ELSE h0 END AS hw,
      |      CASE WHEN c % 17 = 0 THEN ''
      |           WHEN c % 13 = 0 THEN '/p%20q/a' || CAST(c % 6 AS VARCHAR)
      |           ELSE '/a' || CAST(c % 6 AS VARCHAR) END AS p0
      |    FROM (
      |      SELECT doc_id, source, n_chars,
      |        doc_id % 16 AS b, doc_id // 16 AS c,
      |        CASE WHEN (doc_id // 16) % 2 = 0 THEN 'https' ELSE 'http' END
      |          AS sch,
      |        'h' || CAST((doc_id // 16) % 60 AS VARCHAR) || '.example.com'
      |          AS h0
      |      FROM documents)))""".stripMargin

  /** DuckDB regex-chain replay of [[UrlCanon]] over CTE `u` — ends in CTE
    * `c` with (doc_id, source, n_chars, raw_url, host, url). Mirrors the
    * one-pass parser SEMANTICALLY (the gate proves value equality); the
    * regex formulation is the spec, the Scala parser is the plan. */
  private val sqlCanon: String =
    s"""$sqlRawUrl,
       |pp AS (
       |  SELECT *,
       |    lower(regexp_extract(raw_url, '^([A-Za-z]+)://', 1)) AS scheme,
       |    regexp_replace(
       |      split_part(regexp_replace(raw_url, '^[A-Za-z]+://', ''), '#', 1),
       |      '^[^/?#]*@', '') AS rest
       |  FROM u),
       |p2 AS (
       |  SELECT *,
       |    regexp_replace(lower(regexp_extract(rest, '^([^/:?#]+)', 1)),
       |      '^(www\\.)+', '') AS host,
       |    regexp_extract(rest, '^[^/:?#]+:([0-9]+)', 1) AS port,
       |    regexp_replace(rest, '^[^/?#]*', '') AS pathq
       |  FROM pp),
       |p3 AS (
       |  SELECT *,
       |    regexp_replace(split_part(pathq, '?', 1), '/+$$', '') AS cpath0,
       |    regexp_replace(
       |      regexp_replace(regexp_extract(pathq, '\\?(.*)$$', 1),
       |        '&utm_[A-Za-z0-9_]*=[^&]*', '', 'g'),
       |      '^utm_[A-Za-z0-9_]*=[^&]*&?', '') AS cq
       |  FROM p2),
       |c AS (
       |  SELECT doc_id, source, n_chars, raw_url, host,
       |    scheme || '://' || host ||
       |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
       |          OR (scheme = 'https' AND port = '443')
       |        THEN '' ELSE ':' || port END) ||
       |    (CASE WHEN cpath0 = '' THEN '/' ELSE cpath0 END) ||
       |    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS url
       |  FROM p3)""".stripMargin

  /** (doc_id, source, n_chars, raw_url, url, host) — the canonicalized
    * view both queries (and the streaming twin) start from. Narrow: two
    * native-expression evaluations per row, no shuffle. */
  private[graft] def canonicalized(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        rawUrl.as("raw_url"))
      .withColumn("url", UrlCanon.canon(col("raw_url")))
      .withColumn("host", UrlCanon.host(col("raw_url")))

  /** q159: URL canonicalization + per-host rollup — the stage-0 crawl
    * profile. Per canonical host: document count, DISTINCT canonical
    * URLs, DISTINCT raw URLs (n_raw_urls > n_urls is the collapse the
    * canonicalizer buys), and total characters.
    *
    * Shape at scale: narrow canonicalization, then ONE hash aggregation
    * keyed by host (two distinct-counts expand the aggregate but stay on
    * the same key — no extra wide exchange of the corpus). */
  val q159UrlCanon = QueryDef(
    "q159_url_canon",
    s"""WITH $sqlCanon
       |SELECT host,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
       |  CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_urls,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM c GROUP BY host ORDER BY host""".stripMargin) { (spark, dir) =>
    hostRollup(canonicalized(Tables(spark, dir, "documents")))
  }

  /** q159 body over a canonicalized table — shared with the streaming
    * ingest twin ([[graft.streaming.WebCorpusStream]]). */
  def hostRollup(canon: DataFrame): DataFrame =
    canon
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_urls"),
        countDistinct(col("raw_url")).as("n_raw_urls"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("host"))

  /** q160: per-host document-cap enforcement with kept/dropped attrition
    * — the q156-style funnel for host skew (CCNet/RefinedWeb cap what any
    * one host may contribute so megasites don't dominate the mixture).
    * Keep the top [[HostCapK]] docs per host by the deterministic key
    * (n_chars DESC, doc_id ASC); report per host the doc and character
    * attrition.
    *
    * Shape at scale: ONE repartition by host + per-host ordering (the
    * window carries only (host, n_chars, doc_id) — never text), then a
    * map-side-combinable rollup on the same key, so the second aggregate
    * needs no additional exchange. The keep side alone would be the
    * native TopKPerKey plan; the ATTRITION requires ranking every row
    * once, which is exactly what this formulation pays and no more. */
  val q160HostCap = QueryDef(
    "q160_host_cap",
    s"""WITH $sqlCanon,
       |r AS (
       |  SELECT host, doc_id, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY host
       |      ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM c)
       |SELECT host,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rk <= $HostCapK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(SUM(CASE WHEN rk > $HostCapK THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(SUM(CASE WHEN rk <= $HostCapK THEN n_chars ELSE 0 END)
       |    AS BIGINT) AS chars_kept,
       |  CAST(SUM(CASE WHEN rk > $HostCapK THEN n_chars ELSE 0 END)
       |    AS BIGINT) AS chars_dropped
       |FROM r GROUP BY host ORDER BY host""".stripMargin) { (spark, dir) =>
    hostCap(canonicalized(Tables(spark, dir, "documents")))
  }

  /** q160 body over a canonicalized table — shared with the streaming
    * ingest twin. The cap decision is a function of the accumulated ROW
    * SET (rank by n_chars desc, doc_id), so recomputing it at read time
    * over a streamed table gives exactly the batch answer — kept rows
    * may legitimately change as better docs arrive, which is why the
    * stream accumulates DOCS and derives the verdict, never the other
    * way around. */
  def hostCap(canon: DataFrame): DataFrame = {
    val ranked = canon
      .select(col("host"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("host"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
    val k = lit(HostCapK)
    ranked.groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= k, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > k, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rk") <= k, col("n_chars")).otherwise(0L))
          .as("chars_kept"),
        sum(when(col("rk") > k, col("n_chars")).otherwise(0L))
          .as("chars_dropped"))
      .orderBy(col("host"))
  }

  /** q165: URL-level exact dedup — CCNet's literal stage 1 (dedup BY
    * URL before any content hashing): one document survives per
    * CANONICAL URL (min doc_id — crawl order's "first fetch wins"), and
    * the report is the per-source keep/drop funnel of that decision
    * (the q156/q160 shape at URL granularity). Raw-URL dedup would keep
    * all 16 cosmetic variants; canonical dedup collapses them — the
    * measurable value of q159's canonicalizer.
    *
    * Shape at scale: one window min over hash-partitioned canonical
    * URLs (per-group state is one long; no sort — min over the whole
    * partition frame), then a map-side-combinable per-source rollup.
    * Nothing is O(corpus) twice. */
  val q165UrlDedup = QueryDef(
    "q165_url_dedup",
    s"""WITH $sqlCanon,
       |r AS (
       |  SELECT source, n_chars,
       |    (doc_id = MIN(doc_id) OVER (PARTITION BY url)) AS keep
       |  FROM c)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT)
       |    AS chars_kept,
       |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_chars END) AS BIGINT)
       |    AS chars_dropped
       |FROM r GROUP BY source ORDER BY source""".stripMargin) {
    (spark, dir) =>
    urlDedup(canonicalized(Tables(spark, dir, "documents")))
  }

  /** q165 body over a canonicalized table — shared with the streaming
    * twin's read side (the accumulated URL table supports it directly). */
  def urlDedup(canon: DataFrame): DataFrame = {
    val keep = col("doc_id") ===
      min(col("doc_id")).over(Window.partitionBy(col("url")))
    canon
      .select(col("source"), col("n_chars"), keep.as("keep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L))
          .as("chars_kept"),
        sum(when(col("keep"), 0L).otherwise(col("n_chars")))
          .as("chars_dropped"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------------
  // q167: percent-encoding normalization (RFC 3986 §6.2.2, opt-in)
  // ---------------------------------------------------------------------

  /** Synthetic raw URL exercising every §6.2.2 rule class, one per
    * content key (c = doc_id div 4): lowercase-hex unreserved (%7e →
    * `~`), uppercase-hex unreserved (%41 → `A`), reserved kept-but-
    * uppercased (%2f → %2F), already-canonical reserved (%20 stays),
    * malformed two ways (%g7, trailing lone %), plus query escapes
    * (%6a → `j`; %2B stays) and the www/trailing-slash decorations so
    * the rule composes with the base canon steps. */
  private def rawUrlPct: Column = {
    val c = expr("doc_id div 4")
    val www = when(expr("((doc_id % 4) div 2) % 2") === 1,
        when(c % 11 === 0, lit("www.www.")).otherwise(lit("www.")))
      .otherwise(lit(""))
    val host = concat(lit("h"), (c % 40).cast("string"), lit(".example.com"))
    val esc = when(c % 6 === 0, lit("%7e"))
      .when(c % 6 === 1, lit("%41bc"))
      .when(c % 6 === 2, lit("%2fq"))
      .when(c % 6 === 3, lit("%20x"))
      .when(c % 6 === 4, lit("%g7"))
      .otherwise(lit("x%"))
    val slash = when(col("doc_id") % 2 === 1, lit("/")).otherwise(lit(""))
    val query = when(c % 3 === 0, lit("?id=%6a"))
      .when(c % 3 === 1, lit("?id=%2B"))
      .otherwise(lit(""))
    concat(lit("http://"), www, host, lit("/e"), esc, slash, query)
  }

  /** DuckDB §6.2.2 replay over a split-on-'%' list column `l`: prepend
    * the head, transform each tail element by its leading two chars —
    * a GENERIC normalizer (any escape value, not just the generated
    * shapes), so the oracle and [[UrlCanonUtil.pctNormalize]] agree on
    * the whole input domain, not merely the fixture (the round-14
    * canon-oracle lesson). */
  private def sqlPctList(l: String): String = {
    val h1 = s"(strpos('0123456789abcdef', lower(e[1])) - 1)"
    val h2 = s"(strpos('0123456789abcdef', lower(e[2])) - 1)"
    val v = s"($h1 * 16 + $h2)"
    s"""array_to_string(list_prepend($l[1], list_transform($l[2:], e ->
       |  CASE WHEN len(e) >= 2 AND
       |      strpos('0123456789abcdef', lower(e[1])) > 0 AND
       |      strpos('0123456789abcdef', lower(e[2])) > 0
       |  THEN (CASE WHEN ($v BETWEEN 65 AND 90) OR ($v BETWEEN 97 AND 122) OR
       |          ($v BETWEEN 48 AND 57) OR $v IN (45, 46, 95, 126)
       |        THEN chr(CAST($v AS INTEGER)) || e[3:]
       |        ELSE '%' || upper(e[1:2]) || e[3:] END)
       |  ELSE '%' || e END)), '')""".stripMargin
  }

  /** q167: URL canonicalization WITH percent-encoding normalization —
    * the opt-in `url_canon_pct` form. Emits (doc_id, raw_url, url) per
    * document so the gate pins every rule-class output string exactly.
    * Without §6.2.2, `%7euser` and `~user` count as distinct URLs in
    * every dedup/cap stage — under-collapsing the corpus; with blind
    * full decoding, `%2F` turns into a path separator and CHANGES which
    * resource is named. The rule is exactly RFC 3986's safe middle.
    *
    * Shape at scale: one narrow codegen expression per row, no shuffle
    * but the final presentation sort.
    *
    * Oracle scope, stated honestly: the escape normalizer is GENERIC
    * (any %xx value); the surrounding canon steps replay the rules this
    * generator composes with it (lowercase scheme/host, www strip,
    * trailing-slash strip) — the full rule set is pinned by q159/q160/
    * q165's richer generator, and full-domain safety (never-throw,
    * idempotence over byte soup) by PropertySpec's fuzzer. */
  val q167UrlCanonPct = QueryDef(
    "q167_url_canon_pct",
    s"""WITH u AS (SELECT doc_id,
       |    'http://' ||
       |    (CASE WHEN ((doc_id % 4) // 2) % 2 = 1 THEN
       |       (CASE WHEN (doc_id // 4) % 11 = 0
       |             THEN 'www.www.' ELSE 'www.' END)
       |     ELSE '' END) ||
       |    'h' || CAST((doc_id // 4) % 40 AS VARCHAR) || '.example.com' ||
       |    '/e' ||
       |    (CASE WHEN (doc_id // 4) % 6 = 0 THEN '%7e'
       |          WHEN (doc_id // 4) % 6 = 1 THEN '%41bc'
       |          WHEN (doc_id // 4) % 6 = 2 THEN '%2fq'
       |          WHEN (doc_id // 4) % 6 = 3 THEN '%20x'
       |          WHEN (doc_id // 4) % 6 = 4 THEN '%g7'
       |          ELSE 'x%' END) ||
       |    (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
       |    (CASE WHEN (doc_id // 4) % 3 = 0 THEN '?id=%6a'
       |          WHEN (doc_id // 4) % 3 = 1 THEN '?id=%2B'
       |          ELSE '' END) AS raw_url
       |  FROM documents),
       |pr AS (SELECT doc_id, raw_url,
       |    regexp_replace(
       |      lower(regexp_extract(raw_url, '^http://([^/?#]+)', 1)),
       |      '^(www\\.)+', '') AS host,
       |    regexp_replace(
       |      split_part(regexp_replace(raw_url, '^http://[^/?#]*', ''),
       |        '?', 1), '/+$$', '') AS cpath0,
       |    regexp_extract(regexp_replace(raw_url, '^http://[^/?#]*', ''),
       |      '\\?(.*)$$', 1) AS cq0
       |  FROM u),
       |sp AS (SELECT doc_id, raw_url, host,
       |    string_split(cpath0, '%') AS pl,
       |    string_split(cq0, '%') AS ql
       |  FROM pr),
       |pc AS (SELECT doc_id, raw_url, host,
       |    ${sqlPctList("pl")} AS cpath,
       |    ${sqlPctList("ql")} AS cqn
       |  FROM sp)
       |SELECT doc_id, raw_url,
       |  'http://' || host ||
       |  (CASE WHEN cpath = '' THEN '/' ELSE cpath END) ||
       |  (CASE WHEN cqn = '' THEN '' ELSE '?' || cqn END) AS url
       |FROM pc ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), rawUrlPct.as("raw_url"))
      .withColumn("url", UrlCanon.canonPct(col("raw_url")))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] =
    Seq(q159UrlCanon, q160HostCap, q165UrlDedup, q167UrlCanonPct)
}
