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

  val all: Seq[QueryDef] = Seq(q126SnapshotDiff)
}
