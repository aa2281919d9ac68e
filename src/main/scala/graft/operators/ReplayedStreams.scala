package graft.operators

import graft.QueryDef
import graft.streaming.Replay
import org.apache.spark.sql.functions._

/** Oracle rows for the streaming twins (round-17 verdict item 6): each
  * query reads the READ-SIDE relation a twin maintains after a real
  * multi-epoch replay ([[graft.streaming.Replay]]) and is hash-checked
  * against the BATCH semantics' DuckDB oracle — so "stream ≡ batch",
  * previously proven only in ScalaTest (ManifestStreamSpec,
  * Scd2StreamSpec, StreamingDedupSpec), is now a per-round CORRECTNESS
  * gate signal for three representative twins:
  *
  *  - q168: [[graft.streaming.ManifestStream]] — the 9-stage corpus
  *    funnel over replayed state vs q161's oracle (split-invariant);
  *  - q169: [[graft.streaming.Scd2Stream]] — the resolved SCD2 segment
  *    table's per-source history rollup vs q130's oracle;
  *  - q170: [[graft.streaming.StreamingDedup.startIncremental]] — the
  *    per-epoch frozen probe matches vs a q72 oracle EXTENDED with
  *    arrival order (each probe batch sees base + every earlier batch's
  *    appended index, capped at probe time).
  *
  * Scale shape: the replay itself is the twins' own epoch machinery (no
  * new operators); the read sides are one global aggregate (q168), one
  * primary-key fold + rollup (q169), and a partition-pruned union of
  * per-epoch match tables (q170). The q170 oracle's ×[[Replay.DedupBatches]]
  * index blowup is id+band-hash rows only — text never re-enters. */
object ReplayedStreams {

  /** q168: the streaming manifest maintainer's funnel — the identical
    * funnel algebra ([[CorpusBuild.funnelOf]]) over the replayed flags,
    * checked against q161's full recursive oracle. */
  val q168StreamManifestReplay = QueryDef(
    "q168_stream_manifest_replay",
    CorpusBuild.q161CorpusManifest.oracle.get) { (spark, dir) =>
    CorpusBuild.funnelOf(Replay.manifestFlags(spark, dir))
  }

  /** q169: the streaming SCD2 maintainer's resolved segments, rolled up
    * per source exactly like q130 and checked against q130's oracle. */
  val q169StreamScd2Replay = QueryDef(
    "q169_stream_scd2_replay",
    Lifecycle.q130Scd2History.oracle.get) { (spark, dir) =>
    Lifecycle.historyRollup(Replay.scd2Segments(spark, dir))
  }

  /** q170: the incremental-dedup stream's frozen per-epoch matches.
    * Oracle = q72's pipeline with the index side widened per probe
    * batch b to base ∪ {new docs with arrival batch < b}, the capped
    * window re-ranked per (b, band) — the exact relation
    * [[graft.streaming.StreamingDedup.startIncremental]] probes. */
  val q170StreamDedupReplay = QueryDef(
    "q170_stream_dedup_replay",
    s"""WITH ${Dedup.sqlSigBands},
       |bk AS (SELECT doc_id,
       |    ${Mirror.sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents),
       |arr AS (SELECT doc_id, doc_id % ${Replay.DedupBatches} AS b
       |  FROM documents JOIN bk USING (doc_id) WHERE bk.bucket >= 90),
       |probes AS (SELECT unnest(range(${Replay.DedupBatches})) AS pb),
       |idx AS (SELECT p.pb, bd.doc_id, bd.band_idx, bd.band_hash
       |  FROM probes p
       |  CROSS JOIN bands bd
       |  JOIN bk ON bk.doc_id = bd.doc_id
       |  LEFT JOIN arr a ON a.doc_id = bd.doc_id
       |  WHERE bk.bucket < 90 OR a.b < p.pb),
       |capped AS (SELECT pb, doc_id, band_idx, band_hash,
       |    row_number() OVER (PARTITION BY pb, band_idx, band_hash
       |                       ORDER BY doc_id) AS rn
       |  FROM idx),
       |newb AS (SELECT a.b AS pb, bd.doc_id, bd.band_idx, bd.band_hash
       |  FROM bands bd JOIN arr a USING (doc_id)),
       |cand AS (SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS base_id
       |  FROM newb n JOIN capped c
       |    ON c.pb = n.pb AND c.band_idx = n.band_idx
       |   AND c.band_hash = n.band_hash
       |   AND c.rn <= ${Buckets.MaxBucket}),
       |jc AS (SELECT c.new_id, c.base_id,
       |    CAST(len(list_filter(sa.sh, s -> list_contains(sb.sh, s))) AS DOUBLE)
       |      AS inter,
       |    CAST(len(sa.sh) + len(sb.sh) AS DOUBLE) AS tot
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.new_id
       |  JOIN sh sb ON sb.doc_id = c.base_id),
       |scored AS (SELECT new_id, base_id, inter / (tot - inter) AS jaccard
       |  FROM jc WHERE inter / (tot - inter) >= ${Dedup.JaccardThreshold}),
       |best AS (SELECT new_id, base_id, jaccard,
       |    row_number() OVER (PARTITION BY new_id
       |                       ORDER BY jaccard DESC, base_id) AS rn
       |  FROM scored)
       |SELECT new_id AS doc_id, base_id AS matched_id, jaccard
       |FROM best WHERE rn = 1
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Replay.dedupMatches(spark, dir)
      .select(col("doc_id"), col("matched_id"), col("jaccard"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(q168StreamManifestReplay,
    q169StreamScd2Replay, q170StreamDedupReplay)
}
