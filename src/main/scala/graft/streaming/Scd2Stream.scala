package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD2 maintenance — the incremental form of the batch history
  * build (q130, [[graft.operators.Lifecycle.scd2Segments]]): each
  * micro-batch is one crawl epoch's observations (doc_id, source, fp), and
  * the maintained state is the slowly-changing-dimension segment table
  * {doc_id, source, fp, valid_from, valid_to}. An arriving observation
  * EXTENDS the doc's latest open segment when the fingerprint is unchanged
  * and the epochs are contiguous, and OPENS a new segment when the content
  * changed or the doc skipped an epoch (the q130 gap rule — a doc that left
  * and came back must not fuse across the hole). Fingerprinting is the
  * caller's concern (pass md5(text) or any stable digest): maintenance is
  * independent of how content is summarized. (Reference scope: the
  * reference has no versioned state at all — each run overwrites the
  * previous aggregate, covid_streaming.py:200-226.)
  *
  * State layout at scale (the [[StreamingDedup]] discipline): NO streaming
  * state store — segments live as parquet partitioned by writer epoch under
  * `stateDir/segments`. A segment that keeps extending is re-asserted each
  * epoch as a superseding row with the same `valid_from` and a larger
  * `valid_to`; [[resolve]] folds supersessions with one groupBy
  * (max(valid_to) per (doc_id, valid_from)) — so writes are append-shaped
  * (no read-modify-write of old partitions, the only layout that scales on
  * an object store) and the fold is a primary-key aggregation. A replayed
  * epoch probes only EARLIER partitions and overwrites its own, keeping the
  * table exactly-once under at-least-once foreachBatch. Every join/agg here
  * keys on doc_id (even hash distribution, bounded per-key work); rows
  * carry ids + 32-byte fps only, never text.
  *
  * Epoch semantics: the foreachBatch epoch id IS the crawl-snapshot number
  * (contiguity is judged on it), so one checkpoint lineage = one snapshot
  * clock, exactly like the batch build's `s` column.
  */
object Scd2Stream {

  /** Starts maintenance over a stream with columns (doc_id, source, fp).
    * `publish` (optional hook) receives per epoch the maintenance report
    * (n_extended, n_opened) before the epoch's rows are committed. */
  def start(observations: DataFrame, stateDir: String, checkpoint: String)(
      publish: (Long, Long, Long) => Unit = (_, _, _) => ()): StreamingQuery = {
    val spark = observations.sparkSession
    val root = s"$stateDir/segments"
    observations.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val entries = batch.select(col("doc_id"), col("source"), col("fp"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(stateDir), spark.sessionState.newHadoopConf())
        val hasState = fs.exists(new Path(root)) &&
          fs.listStatus(new Path(root)).nonEmpty
        // Latest open segment per doc from all EARLIER epochs: fold
        // supersessions per (doc_id, valid_from), then keep the segment
        // with the highest valid_from per doc. Both steps are doc_id-keyed
        // aggregations — no window, no skew.
        val open =
          if (!hasState)
            entries.limit(0).select(col("doc_id"),
              lit(0L).as("o_vf"), lit(0L).as("o_vt"), col("fp").as("o_fp"))
          else spark.read.parquet(root)
            .filter(col("epoch") =!= epochId) // replay: own rows invisible
            .groupBy(col("doc_id"), col("valid_from"))
            .agg(max(struct(col("valid_to"), col("fp"))).as("s"))
            .groupBy(col("doc_id"))
            .agg(max(struct(col("valid_from"), col("s.valid_to"),
              col("s.fp"))).as("t"))
            .select(col("doc_id"), col("t.valid_from").as("o_vf"),
              col("t.valid_to").as("o_vt"), col("t.fp").as("o_fp"))
        val merged = entries.join(open, Seq("doc_id"), "left_outer")
          .withColumn("extends",
            col("o_fp").isNotNull && col("o_fp") === col("fp") &&
              col("o_vt") === lit(epochId - 1))
          .select(col("doc_id"), col("source"), col("fp"),
            when(col("extends"), col("o_vf")).otherwise(lit(epochId))
              .as("valid_from"),
            lit(epochId).as("valid_to"),
            col("extends"))
        merged.persist() // report + state write both scan the merge
        try {
          val counts = merged.groupBy()
            .agg(sum(when(col("extends"), 1L).otherwise(0L)),
              sum(when(col("extends"), 0L).otherwise(1L)))
            .collect()
          val (ext, opened) =
            if (counts.isEmpty || counts.head.isNullAt(0)) (0L, 0L)
            else (counts.head.getLong(0), counts.head.getLong(1))
          publish(epochId, ext, opened)
          merged.drop("extends").write.mode("overwrite")
            .parquet(s"$root/epoch=$epochId")
        } finally { merged.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The maintained SCD2 table: one row per (doc_id, valid_from) segment
    * with its final extent — supersessions folded, equal to what the batch
    * build (q130's [[graft.operators.Lifecycle.scd2Segments]]) derives from
    * the same observations. */
  def resolve(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/segments")
      .groupBy(col("doc_id"), col("valid_from"))
      .agg(max(struct(col("valid_to"), col("source"), col("fp"))).as("s"))
      .select(col("doc_id"), col("s.source").as("source"),
        col("s.fp").as("fp"), col("valid_from"),
        col("s.valid_to").as("valid_to"))

  /** Offline small-files maintenance ([[StreamingDedup.compactEpochs]]).
    * Superseded segment rows are distinct rows and survive compaction;
    * [[resolve]]'s fold is unaffected — the probe and the resolved table
    * read identically across a compaction boundary. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    StreamingDedup.compactEpochs(spark, s"$stateDir/segments")
}
