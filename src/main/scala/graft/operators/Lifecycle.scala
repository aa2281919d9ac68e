package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Corpus-lifecycle operators: the bookkeeping a continuously-recrawled
  * training corpus needs BETWEEN builds — diffing two snapshots into
  * added/removed/changed/unchanged sets so downstream stages (dedup indexes,
  * shard manifests, the streaming monitors) can process the delta instead of
  * the world.
  *
  * Reference scope: the reference reprocesses its whole CSV every run
  * (covid_streaming.py:200-226 re-reads the topic from scratch via the
  * checkpoint); it has no notion of a snapshot delta. At 100 TB a rebuild
  * is the single most expensive operation a pipeline can run, so CDC-style
  * diffing is first-class here.
  *
  * Determinism: snapshot membership and the "edited in the new crawl"
  * subset are pure functions of `doc_id` via the two independent 60-bit
  * md5 hashes ([[Mirror.hash60]]/[[Mirror.hash60b]] — the q53/q63
  * convention), and content comparison is on md5 fingerprints, so both
  * engines derive bit-identical snapshots from the same parquet.
  */
object Lifecycle {

  import Mirror._

  /** q126: snapshot diff. Two simulated crawl snapshots of `documents`
    * (OLD = 80% of ids by hash, NEW = an overlapping 80% where a quarter
    * of carried-over docs changed content), classified per doc_id into
    * added / removed / changed / unchanged and rolled up per source.
    *
    * Shape at scale: content fingerprints are computed BEFORE the join, so
    * the full-outer join shuffles only (doc_id, source, 32-byte fp) — never
    * document text. The join key is the primary key, so both sides hash-
    * partition evenly (no skew), AQE picks the join strategy, and the
    * rollup is a map-side-partial count on a tiny (source × 4) result. In
    * production the two sides are two parquet snapshot scans; writing both
    * bucketed by doc_id makes the diff shuffle-free. */
  val q126SnapshotDiff = QueryDef(
    "q126_snapshot_diff",
    s"""WITH fp AS (
       |  SELECT doc_id, source,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} AS hid,
       |    ${sqlHash60b("CAST(doc_id AS VARCHAR)")} AS hid2,
       |    md5(text) AS fp
       |  FROM documents),
       |old AS (
       |  SELECT doc_id, source, fp FROM fp WHERE hid % 10 < 8),
       |new AS (
       |  SELECT doc_id, source,
       |    CASE WHEN hid2 % 4 = 0 THEN md5(fp || ':rev2') ELSE fp END AS fp
       |  FROM fp WHERE hid % 10 >= 2),
       |d AS (
       |  SELECT COALESCE(o.source, n.source) AS source,
       |    CASE WHEN o.doc_id IS NULL THEN 'added'
       |         WHEN n.doc_id IS NULL THEN 'removed'
       |         WHEN o.fp <> n.fp THEN 'changed'
       |         ELSE 'unchanged' END AS change
       |  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
       |SELECT source,
       |  CAST(SUM(CASE WHEN change = 'added' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_added,
       |  CAST(SUM(CASE WHEN change = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_removed,
       |  CAST(SUM(CASE WHEN change = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_changed,
       |  CAST(SUM(CASE WHEN change = 'unchanged' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_unchanged
       |FROM d GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val base = Tables(spark, dir, "documents").select(
      col("doc_id"), col("source"),
      hash60(col("doc_id").cast(StringType)).as("hid"),
      hash60b(col("doc_id").cast(StringType)).as("hid2"),
      md5(col("text").cast("binary")).as("fp"))
    val old = base.filter(col("hid") % 10 < 8)
      .select(col("doc_id"), col("source").as("o_source"),
        col("fp").as("o_fp"))
    val neu = base.filter(col("hid") % 10 >= 2)
      .select(col("doc_id"), col("source").as("n_source"),
        when(col("hid2") % 4 === 0,
          md5(concat(col("fp"), lit(":rev2")).cast("binary")))
          .otherwise(col("fp")).as("n_fp"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(coalesce(col("o_source"), col("n_source")).as("source"),
        when(col("o_fp").isNull, "added")
          .when(col("n_fp").isNull, "removed")
          .when(col("o_fp") =!= col("n_fp"), "changed")
          .otherwise("unchanged").as("change"))
      .groupBy(col("source"))
      .agg(
        sum(when(col("change") === "added", 1L).otherwise(0L))
          .as("n_added"),
        sum(when(col("change") === "removed", 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("change") === "changed", 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("change") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .orderBy(col("source"))
  }

  /** Shared SCD2 derivation for q130/q131: four simulated crawl snapshots
    * (s = 0..3) of `documents`, collapsed into validity segments.
    *
    * Simulation (pure functions of doc_id, so both engines derive identical
    * snapshots): doc d is PRESENT in snapshot s iff
    * hash60(d:'mem':s) % 10 < 8 (independent ~80% membership per snapshot,
    * so some docs have gaps), and d's content is EDITED at snapshot s ≥ 1
    * iff hash60b(d:'rev':s) % 3 = 0. The content version v(d,s) = number of
    * edits at t ≤ s (edits happen in the source system whether or not the
    * crawl saw the doc), and the fingerprint at version v is md5 chained v
    * times from md5(text).
    *
    * SCD2 collapse: per doc, order the PRESENT observations by s; a new
    * validity segment starts when the fingerprint changed or the membership
    * has a gap (s > prev_s + 1 — the doc left and came back, which must not
    * fuse with the earlier segment even if content is unchanged). Segment id
    * is the running count of starts; segments aggregate to
    * [valid_from, valid_to] + fp.
    *
    * Shape at scale: the ×4 snapshot explode happens AFTER text collapses
    * to a 32-byte md5, so the exploded relation is (doc_id, source, fp,
    * hashes) — never text. Both window passes partition by doc_id (primary
    * key: even hash distribution, ≤4 rows per key, constant state), so this
    * is one shuffle by doc_id end-to-end and the window never needs a
    * global sort. At 100 TB the same plan holds: snapshot count is a small
    * constant and per-key work is O(snapshots).
    */
  private[operators] def scd2Segments(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    collapse(scd2Observations(spark, dir))

  /** The q130 simulation's PRESENT observations (doc_id, source, s, fp) —
    * the observation stream [[scd2Segments]] collapses, factored out so
    * the streaming replay gate ([[ReplayedStreams]]) can feed the
    * identical rows through [[graft.streaming.Scd2Stream]] snapshot by
    * snapshot and compare against the same q130 oracle. */
  private[graft] def scd2Observations(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val obs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(col("text").cast("binary")).as("fp0"))
      .select(col("*"), explode(sequence(lit(0), lit(3))).as("s"))
      .withColumn("present",
        hash60(concat(col("doc_id").cast(StringType), lit(":mem:"),
          col("s").cast(StringType))) % 10 < 8)
      .withColumn("edited",
        col("s") >= 1 &&
          hash60b(concat(col("doc_id").cast(StringType), lit(":rev:"),
            col("s").cast(StringType))) % 3 === 0)
    val wAll = Window.partitionBy("doc_id").orderBy("s")
    val versioned = obs
      .withColumn("v",
        sum(when(col("edited"), 1L).otherwise(0L)).over(wAll))
      // fp at version v = md5 chained v times from fp0 (v ≤ 3, so the
      // chain unrolls to a constant expression — no recursion needed)
      .withColumn("fp",
        when(col("v") === 0, col("fp0"))
          .when(col("v") === 1, md5(concat(col("fp0"), lit(":r")).cast("binary")))
          .when(col("v") === 2,
            md5(concat(md5(concat(col("fp0"), lit(":r")).cast("binary")),
              lit(":r")).cast("binary")))
          .otherwise(
            md5(concat(md5(concat(md5(concat(col("fp0"), lit(":r"))
              .cast("binary")), lit(":r")).cast("binary")), lit(":r"))
              .cast("binary"))))
      .filter(col("present"))
    versioned.select(col("doc_id"), col("source"), col("s"), col("fp"))
  }

  /** The SCD2 collapse alone: observations (doc_id, source, s, fp) →
    * validity segments (doc_id, source, seg, fp, valid_from, valid_to).
    * Factored out of [[scd2Segments]] so the streaming maintenance twin
    * ([[graft.streaming.Scd2Stream]]) can be proven equivalent to the
    * batch build over arbitrary observation sets, not just the q130
    * simulation. One shuffle by doc_id; per-key window state is bounded
    * by the doc's observation count. */
  private[graft] def collapse(obs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeen = Window.partitionBy("doc_id").orderBy("s")
    obs
      .withColumn("new_seg",
        when(lag(col("fp"), 1).over(wSeen).isNull, 1L)
          .when(col("fp") =!= lag(col("fp"), 1).over(wSeen), 1L)
          .when(col("s") =!= lag(col("s"), 1).over(wSeen) + 1, 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("new_seg")).over(wSeen))
      .groupBy(col("doc_id"), col("source"), col("seg"), col("fp"))
      .agg(min(col("s")).as("valid_from"), max(col("s")).as("valid_to"))
  }

  /** DuckDB mirror of [[scd2Segments]] as a WITH-clause body producing
    * the same (doc_id, source, seg, fp, valid_from, valid_to) relation. */
  private val sqlScd2Segments: String = {
    val id = "CAST(o.doc_id AS VARCHAR)"
    s"""obs AS (
       |  SELECT o.doc_id, o.source, md5(o.text) AS fp0, s.s,
       |    ${sqlHash60(s"concat($id, ':mem:', CAST(s.s AS VARCHAR))")} % 10 < 8
       |      AS present,
       |    s.s >= 1 AND
       |      ${sqlHash60b(s"concat($id, ':rev:', CAST(s.s AS VARCHAR))")} % 3 = 0
       |      AS edited
       |  FROM documents o CROSS JOIN (SELECT unnest(range(4)) AS s) s),
       |ver AS (
       |  SELECT doc_id, source, s, present,
       |    SUM(CASE WHEN edited THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s) AS v, fp0
       |  FROM obs),
       |fps AS (
       |  SELECT doc_id, source, s,
       |    CASE WHEN v = 0 THEN fp0
       |         WHEN v = 1 THEN md5(fp0 || ':r')
       |         WHEN v = 2 THEN md5(md5(fp0 || ':r') || ':r')
       |         ELSE md5(md5(md5(fp0 || ':r') || ':r') || ':r') END AS fp
       |  FROM ver WHERE present),
       |marked AS (
       |  SELECT doc_id, source, s, fp,
       |    CASE WHEN lag(fp) OVER w IS NULL THEN 1
       |         WHEN fp <> lag(fp) OVER w THEN 1
       |         WHEN s <> lag(s) OVER w + 1 THEN 1
       |         ELSE 0 END AS new_seg
       |  FROM fps WINDOW w AS (PARTITION BY doc_id ORDER BY s)),
       |segs AS (
       |  SELECT doc_id, source, fp,
       |    SUM(new_seg) OVER (PARTITION BY doc_id ORDER BY s) AS seg, s
       |  FROM marked),
       |scd2 AS (
       |  SELECT doc_id, source, seg, fp,
       |    MIN(s) AS valid_from, MAX(s) AS valid_to
       |  FROM segs GROUP BY doc_id, source, seg, fp)""".stripMargin
  }

  /** q130: SCD2 history build. Collapses the 4-snapshot observation stream
    * into validity segments ([[scd2Segments]]) and reports, per source, the
    * corpus's version-churn profile: docs observed, total segments, docs
    * whose history has more than one segment, and the longest per-doc
    * segment chain. This is the slowly-changing-dimension build step a
    * recrawled corpus needs before any point-in-time query can be answered.
    */
  val q130Scd2History = QueryDef(
    "q130_scd2_history",
    s"""WITH $sqlScd2Segments,
       |per_doc AS (
       |  SELECT doc_id, source, COUNT(*) AS n_segs
       |  FROM scd2 GROUP BY doc_id, source)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_segs) AS BIGINT) AS n_segments,
       |  CAST(SUM(CASE WHEN n_segs > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_multiseg_docs,
       |  CAST(MAX(n_segs) AS BIGINT) AS max_segments
       |FROM per_doc GROUP BY source ORDER BY source""".stripMargin) {
    (spark, dir) => historyRollup(scd2Segments(spark, dir))
  }

  /** q130's per-source report over any segment table (doc_id, source,
    * …) — shared with the streaming replay gate ([[ReplayedStreams]]),
    * whose segments come from [[graft.streaming.Scd2Stream.resolve]]. */
  private[graft] def historyRollup(
      segs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    segs
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_segs"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_segs")).as("n_segments"),
        sum(when(col("n_segs") > 1, 1L).otherwise(0L))
          .as("n_multiseg_docs"),
        max(col("n_segs")).as("max_segments"))
      .orderBy(col("source"))

  /** q131: point-in-time lookup against the SCD2 segments. A deterministic
    * probe set (every doc with hash60(doc_id:'pit') % 7 = 0, asking about
    * snapshot t = hash60b(doc_id:'pit') % 4) joins the segment table on
    * doc_id with the containment predicate valid_from ≤ t ≤ valid_to; a
    * miss means the doc was not in the crawl at t. Per source: probes,
    * hits, misses, and an order-free checksum over the fingerprints the
    * lookup returned (sum of hash60(fp) mod 1e6 — proves the VALUES
    * resolved, not just the counts).
    *
    * Shape at scale: the join key is the primary key (even distribution,
    * ≤4 segments per doc, so fan-out is bounded); the range predicate
    * prunes post-join without a second shuffle. Both sides partition by
    * doc_id — at production scale with both tables bucketed by doc_id the
    * lookup is shuffle-free. */
  val q131PitLookup = QueryDef(
    "q131_pit_lookup",
    s"""WITH $sqlScd2Segments,
       |probes AS (
       |  SELECT doc_id, source,
       |    ${sqlHash60b("concat(CAST(doc_id AS VARCHAR), ':pit')")} % 4 AS t
       |  FROM documents
       |  WHERE ${sqlHash60("concat(CAST(doc_id AS VARCHAR), ':pit')")} % 7 = 0),
       |looked AS (
       |  SELECT p.source, p.doc_id,
       |    s.fp AS fp
       |  FROM probes p LEFT JOIN scd2 s
       |    ON p.doc_id = s.doc_id
       |   AND s.valid_from <= p.t AND p.t <= s.valid_to)
       |SELECT source,
       |  COUNT(*) AS n_probes,
       |  CAST(SUM(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hits,
       |  CAST(SUM(CASE WHEN fp IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_misses,
       |  CAST(SUM(CASE WHEN fp IS NULL THEN 0
       |    ELSE ${sqlHash60("fp")} % 1000000 END) AS BIGINT) AS fp_checksum
       |FROM looked GROUP BY source ORDER BY source""".stripMargin) {
    (spark, dir) =>
      // Rename the segment side's key before joining: both inputs derive
      // from the same documents scan, and distinct names keep the join
      // condition unambiguous under Spark's self-join resolution.
      val segs = scd2Segments(spark, dir)
        .select(col("doc_id").as("s_doc_id"), col("fp"),
          col("valid_from"), col("valid_to"))
      val probes = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          hash60(concat(col("doc_id").cast(StringType), lit(":pit")))
            .as("hp"),
          hash60b(concat(col("doc_id").cast(StringType), lit(":pit")))
            .as("hp2"))
        .filter(col("hp") % 7 === 0)
        .select(col("doc_id"), col("source"), (col("hp2") % 4).as("t"))
      probes.join(segs,
          col("doc_id") === col("s_doc_id") &&
            col("valid_from") <= col("t") && col("t") <= col("valid_to"),
          "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("fp").isNotNull, 1L).otherwise(0L)).as("n_hits"),
          sum(when(col("fp").isNull, 1L).otherwise(0L)).as("n_misses"),
          sum(when(col("fp").isNull, 0L)
            .otherwise(hash60(col("fp")) % 1000000)).as("fp_checksum"))
        .orderBy(col("source"))
  }

  /** q133: incremental corpus build — the batch twin of the
    * RecrawlStream→StreamingDedup ingest path, composing three standalone
    * operators into the one report an incremental materialization runs
    * from ("process the delta, not the world"):
    *
    *   1. DELTA (q126's classifier): the recrawl's added / changed /
    *      carried sets, from the same membership hashes (hid = old iff
    *      hid%10<8, new iff ≥2 → carried 2-7, added ≥8, removed <2; a
    *      carried doc is `changed` iff hid2%4=0);
    *   2. DEDUP GATE (q72's one-sided probe): only genuinely NEW docs
    *      (added) probe the retained corpus's LSH index — an added doc
    *      whose best verified Jaccard ≥ threshold is a near-dup of an
    *      existing doc and is dropped. Changed docs bypass the probe:
    *      they REPLACE their own prior version in place (this simulation's
    *      edits preserve token counts, so their inventory contribution is
    *      already the base's);
    *   3. MANIFEST UPDATE (q121's inventory + q118's waterfill): the
    *      after-update funnel-kept token inventory per source =
    *      base (carried) + surviving added, and the single-round
    *      equal-quota allocation over it.
    *
    * Output per source: delta accounting (n_added / n_changed / n_dup /
    * n_added_kept), the before/after token inventories, and the refreshed
    * allocation — integer-exact end to end, so the oracle checks the
    * COMPOSITION, not just each stage.
    *
    * Shape at scale: the probe is linear in the DELTA (band signatures of
    * added docs equi-join the persisted capped index — q72's shape); the
    * per-doc funnel metrics are needed only for the delta in production
    * (the base inventory is additive state carried in the previous
    * manifest — recomputed here solely so DuckDB can check it from cold
    * parquet); the waterfill windows run on a sources-sized relation.
    * Nothing in the composition rescans retained text at delta time. */
  val q133IncrementalBuild = QueryDef(
    "q133_incremental_build",
    s"""WITH ${Dedup.sqlSigBands},
       |${Quality.sqlFunnelMetrics},
       |mem AS (SELECT doc_id, source,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 10 AS hid,
       |    ${sqlHash60b("CAST(doc_id AS VARCHAR)")} % 4 AS hid2
       |  FROM documents),
       |ibase AS (SELECT b.doc_id, b.band_idx, b.band_hash,
       |    row_number() OVER (PARTITION BY b.band_idx, b.band_hash
       |                       ORDER BY b.doc_id) AS rn
       |  FROM bands b JOIN mem USING (doc_id)
       |  WHERE mem.hid BETWEEN 2 AND 7),
       |inewb AS (SELECT b.doc_id, b.band_idx, b.band_hash
       |  FROM bands b JOIN mem USING (doc_id) WHERE mem.hid >= 8),
       |icand AS (SELECT DISTINCT n.doc_id AS new_id, s.doc_id AS base_id
       |  FROM inewb n JOIN ibase s
       |    ON s.band_idx = n.band_idx AND s.band_hash = n.band_hash
       |   AND s.rn <= ${Buckets.MaxBucket}),
       |ijc AS (SELECT c.new_id,
       |    CAST(len(list_filter(sa.sh, s -> list_contains(sb.sh, s)))
       |      AS DOUBLE) AS inter,
       |    CAST(len(sa.sh) + len(sb.sh) AS DOUBLE) AS tot
       |  FROM icand c
       |  JOIN sh sa ON sa.doc_id = c.new_id
       |  JOIN sh sb ON sb.doc_id = c.base_id),
       |idup AS (SELECT DISTINCT new_id FROM ijc
       |  WHERE inter / (tot - inter) >= ${Dedup.JaccardThreshold}),
       |keepm AS (SELECT m.doc_id, m.source, m.n_words, mem.hid, mem.hid2,
       |    (${Quality.sqlKeepExpr}) AS keep
       |  FROM m JOIN mem USING (doc_id)),
       |binv AS (SELECT source,
       |    CAST(SUM(CASE WHEN keep THEN n_words ELSE 0 END) AS BIGINT)
       |      AS base_tokens,
       |    CAST(SUM(CASE WHEN hid2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_changed
       |  FROM keepm WHERE hid BETWEEN 2 AND 7 GROUP BY source),
       |aadd AS (SELECT k.source,
       |    COUNT(*) AS n_added,
       |    CAST(SUM(CASE WHEN d.new_id IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_dup,
       |    CAST(SUM(CASE WHEN d.new_id IS NULL AND k.keep THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_added_kept,
       |    CAST(SUM(CASE WHEN d.new_id IS NULL AND k.keep THEN k.n_words
       |      ELSE 0 END) AS BIGINT) AS added_tokens
       |  FROM keepm k LEFT JOIN idup d ON k.doc_id = d.new_id
       |  WHERE k.hid >= 8 GROUP BY k.source),
       |tot AS (SELECT s.source,
       |    COALESCE(a.n_added, 0) AS n_added,
       |    COALESCE(b.n_changed, 0) AS n_changed,
       |    COALESCE(a.n_dup, 0) AS n_dup,
       |    COALESCE(a.n_added_kept, 0) AS n_added_kept,
       |    COALESCE(b.base_tokens, 0) AS base_tokens,
       |    COALESCE(a.added_tokens, 0) AS added_tokens,
       |    COALESCE(b.base_tokens, 0) + COALESCE(a.added_tokens, 0)
       |      AS total_tokens
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  LEFT JOIN binv b ON s.source = b.source
       |  LEFT JOIN aadd a ON s.source = a.source)
       |SELECT source, n_added, n_changed, n_dup, n_added_kept,
       |  base_tokens, added_tokens, total_tokens,
       |  LEAST(total_tokens,
       |    (CAST(SUM(total_tokens) OVER () AS BIGINT) // 2)
       |      // CAST(COUNT(*) OVER () AS BIGINT)) AS alloc_tokens
       |FROM tot ORDER BY source""".stripMargin) { (spark, dir) =>
    val withHid = Tables(spark, dir, "documents")
      .withColumn("hid", hash60(col("doc_id").cast(StringType)) % 10)
    // removed docs (hid < 2) take no part in the after-update corpus:
    // filter them before any per-doc work
    val live = withHid.filter(col("hid") >= 2)
    val dups = Dedup.incrementalMatches(
        live.filter(col("hid") >= 8), live.filter(col("hid") <= 7))
      .select(col("doc_id"), lit(true).as("is_dup"))
    val m = Quality.funnelMetrics(live)
      .withColumn("hid", hash60(col("doc_id").cast(StringType)) % 10)
      .withColumn("hid2", hash60b(col("doc_id").cast(StringType)) % 4)
      .withColumn("keep", Quality.keepAll)
    val binv = m.filter(col("hid") <= 7)
      .groupBy(col("source"))
      .agg(sum(when(col("keep"), col("n_words")).otherwise(0L))
          .as("base_tokens"),
        sum(when(col("hid2") === 0, 1L).otherwise(0L)).as("n_changed"))
    val aadd = m.filter(col("hid") >= 8)
      .join(dups, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_added"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("is_dup").isNull && col("keep"), 1L).otherwise(0L))
          .as("n_added_kept"),
        sum(when(col("is_dup").isNull && col("keep"), col("n_words"))
          .otherwise(0L)).as("added_tokens"))
    Tables(spark, dir, "documents").select(col("source")).distinct()
      .join(binv, Seq("source"), "left")
      .join(aadd, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_changed"), lit(0L)).as("n_changed"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_added_kept"), lit(0L)).as("n_added_kept"),
        coalesce(col("base_tokens"), lit(0L)).as("base_tokens"),
        coalesce(col("added_tokens"), lit(0L)).as("added_tokens"))
      .withColumn("total_tokens", col("base_tokens") + col("added_tokens"))
      .withColumn("alloc_tokens",
        least(col("total_tokens"),
          expr("((sum(total_tokens) over ()) div 2L)" +
            " div (count(1) over ())")))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] =
    Seq(q126SnapshotDiff, q130Scd2History, q131PitLookup,
      q133IncrementalBuild)
}
