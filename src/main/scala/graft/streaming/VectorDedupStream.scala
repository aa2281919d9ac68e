package graft.streaming

import graft.operators.Similarity
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming semantic near-dup detection for EMBEDDINGS — the vector
  * analog of [[StreamingDedup.startIncremental]]: each micro-batch of
  * arriving vectors probes a persisted banded-LSH signature index of
  * everything ingested before it, publishes exact-cosine matches above
  * `tau`, then appends its own entries to the index. The ingest-time
  * "have we already got this content" check a training pipeline runs on
  * embedded documents before they reach the corpus, without retraining
  * anything (hyperplane signatures are fixed, unlike the trained k-means
  * cells of the batch semantic dedup q73). (Reference scope: dedup there
  * is per-batch exact dropDuplicates only,
  * /root/reference/spark/covid_streaming.py:153 — no cross-batch or
  * similarity-based path.)
  *
  * Probe semantics are ONE-SIDED: a batch matches only EARLIER epochs —
  * in-batch duplicates are the batch dedup operators' job, and the spec's
  * batch twin (all cross-epoch banded pairs) reproduces the streamed
  * matches exactly.
  *
  * Index + replay story at scale (the [[StreamingDedup]] layout): NO
  * streaming state — the index is parquet partitioned by epoch under
  * `indexDir/sigs/epoch=N`; a replayed epoch OVERWRITES its own partition
  * and probes only the index that exists before it, so at-least-once
  * foreachBatch keeps both matches and index exactly-once. Entries carry
  * (vec_id, embedding, nrm, band_hi, band_lo): only (band, id) rows fan
  * out in the candidate join, and the stored embedding serves the exact
  * verification — at 100 TB the embedding column would be a PQ code
  * (q68's layout) with exact re-rank against the raw store.
  */
object VectorDedupStream {

  /** Starts the probe. `publish` receives per micro-batch the matches —
    * (probe_id, index_id, score), score = exact cosine ≥ tau — and the
    * epoch id; it must materialize before returning (it runs before the
    * batch's own entries are appended). */
  def start(newVecs: DataFrame, indexDir: String, checkpoint: String,
      tau: Double)(publish: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = newVecs.sparkSession
    val root = s"$indexDir/sigs"
    newVecs.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val entries = Similarity.bandedEntries(batch.toDF())
        entries.persist() // probe + index append both scan the batch
        try {
          val fs = org.apache.hadoop.fs.FileSystem.get(
            new java.net.URI(indexDir), spark.sessionState.newHadoopConf())
          val hasIndex = fs.exists(new Path(root)) &&
            fs.listStatus(new Path(root)).nonEmpty
          if (hasIndex) {
            // epoch filter: a replayed epoch must not probe its own rows
            val idx = spark.read.parquet(root)
              .filter(org.apache.spark.sql.functions.col("epoch") =!= epochId)
              .drop("epoch")
            publish(Similarity.bandedMatches(entries, idx, tau), epochId)
          } else publish(
            Similarity.bandedMatches(entries, entries.limit(0), tau), epochId)
          entries.write.mode("overwrite").parquet(s"$root/epoch=$epochId")
        } finally { entries.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Offline small-files maintenance: fold the per-epoch signature
    * partitions into one compacted generation
    * ([[StreamingDedup.compactEpochs]] — same contract: run while the
    * stream is stopped). */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Unit =
    StreamingDedup.compactEpochs(spark, s"$indexDir/sigs")
}
