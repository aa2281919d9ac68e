package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** A document arriving on the ingest stream. */
final case class Doc(doc_id: Long, text: String)

/** Streaming incremental near-duplicate detection: every micro-batch of
  * incoming documents is probed one-sidedly against a STATIC base-corpus
  * LSH index ([[graft.operators.Dedup.incrementalMatches]], the q72
  * operator) inside `foreachBatch` — the production ingest topology, where
  * the corpus index is rebuilt offline (daily) and the stream only pays
  * for its own batch.
  *
  * Why `foreachBatch` and not a stream-static join: the probe is a
  * multi-step DAG (signature → band join → Jaccard verify → per-doc best
  * match with a window), and windows over a streaming Dataset in append
  * mode are unsupported — inside `foreachBatch` the batch is a plain
  * DataFrame, so the WHOLE batch operator library applies unchanged. This
  * is exactly the reference's posture (SURVEY §2.9: all analytics inside
  * `foreachBatch`), applied to the dedup extension tier.
  *
  * State story at scale: NO streaming state at all — the index is static
  * per run, each batch is independent, and exactly-once lands on the sink's
  * idempotence per epoch (the same contract as
  * [[graft.sources.AuditSink]]). Restarts re-run at most the uncommitted
  * batch.
  */
object StreamingDedup {

  /** Starts the probe query. `publish` receives (matches, epochId) per
    * micro-batch — matches carry (doc_id, matched_id, jaccard), one row
    * per matched new document. */
  def start(newDocs: DataFrame, baseDocs: DataFrame, checkpoint: String)(
      publish: (DataFrame, Long) => Unit): StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        publish(Dedup.incrementalMatches(batch.toDF(), baseDocs), epochId)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
