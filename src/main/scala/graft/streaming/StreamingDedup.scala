package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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

  /** Incremental-index variant (round-7 verdict item 5): each micro-batch
    * probes the PERSISTED band/shingle index built from the base corpus
    * plus every PRIOR batch, then appends its own bands and shingles — so
    * a new document also matches documents that arrived on the stream
    * after the offline index build, not only the daily base.
    *
    * Index layout under `indexDir`: `bands/epoch=N/` and
    * `shingles/epoch=N/` parquet (the base corpus loads as `epoch=-1`).
    * Per-epoch subdirectories make the append IDEMPOTENT: a replayed
    * micro-batch overwrites its own epoch directory rather than
    * duplicating rows, so the at-least-once replay contract of
    * `foreachBatch` keeps the index exactly-once. At 100 TB this is the
    * production shape — the index is a partitioned table appended per
    * ingest window, compacted offline; the capped-bucket window is
    * applied at probe time ([[Dedup.incrementalMatchesPre]]), which makes
    * the appended index equal a from-scratch rebuild row for row
    * (StreamingDedupSpec proves it after N batches).
    *
    * `publish` must MATERIALIZE its matches (write/collect) before
    * returning — it runs before the batch's own bands are appended, which
    * keeps the probe one-sided (a batch never matches itself; in-batch
    * duplicates are the batch dedup operators' job). */
  def startIncremental(newDocs: DataFrame, baseDocs: DataFrame,
      indexDir: String, checkpoint: String)(
      publish: (DataFrame, Long) => Unit): StreamingQuery = {
    val spark = baseDocs.sparkSession
    val bandsRoot = s"$indexDir/bands"
    val shRoot = s"$indexDir/shingles"
    def epochDir(root: String, epoch: Long) = s"$root/epoch=$epoch"
    // seed the persisted index from the offline base corpus exactly once
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sessionState.newHadoopConf())
    if (!fs.exists(new org.apache.hadoop.fs.Path(
        epochDir(bandsRoot, -1L), "_SUCCESS"))) {
      Dedup.minhashBandsOf(baseDocs)
        .write.mode("overwrite").parquet(epochDir(bandsRoot, -1L))
      Dedup.shingleSetsOf(baseDocs)
        .write.mode("overwrite").parquet(epochDir(shRoot, -1L))
    }
    newDocs.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val b = batch.toDF()
        b.persist() // probe + two index appends all scan the batch
        try {
          val idxBands = spark.read.parquet(bandsRoot).drop("epoch")
          val idxSh = spark.read.parquet(shRoot).drop("epoch")
          publish(Dedup.incrementalMatchesPre(b, idxBands, idxSh), epochId)
          Dedup.minhashBandsOf(b)
            .write.mode("overwrite").parquet(epochDir(bandsRoot, epochId))
          Dedup.shingleSetsOf(b)
            .write.mode("overwrite").parquet(epochDir(shRoot, epochId))
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** Offline index maintenance: fold every per-epoch partition of the
    * incremental index into ONE compacted generation — the compaction a
    * production table needs once thousands of micro-batch partitions
    * accumulate (small-files problem). The compacted generation is
    * written as a NEW epoch directory numbered below every existing one
    * (readers scan all epochs, so numbering is free), and only then are
    * the source partitions deleted — a crash in between leaves duplicate
    * rows, which `.distinct()` here removes on the next compaction and
    * which the probe tolerates meanwhile (candidates are
    * de-duplicated, best-match picks one row). Run this while the stream
    * is stopped (same contract as any table compaction). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit =
    Seq("bands", "shingles").foreach(t => compactEpochs(spark, s"$indexDir/$t"))

  /** Folds every `epoch=N` partition under `root` into one compacted
    * generation numbered below all existing epochs (readers scan all
    * epochs, so the number is free; staying below every live epoch also
    * keeps replayed epochs from colliding with it). Shared by every
    * epoch-partitioned streaming index in this package. */
  def compactEpochs(spark: SparkSession, root: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sessionState.newHadoopConf())
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(rootPath)) {
      val epochs = fs.listStatus(rootPath).toSeq
        .filter(_.getPath.getName.startsWith("epoch="))
      if (epochs.length > 1) {
        val next = epochs
          .map(_.getPath.getName.stripPrefix("epoch=").toLong).min - 1
        spark.read.parquet(root).drop("epoch").distinct()
          .write.mode("overwrite").parquet(s"$root/epoch=$next")
        epochs.foreach(e => fs.delete(e.getPath, true))
      }
    }
  }
}
