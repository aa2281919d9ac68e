package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD2 maintenance — the incremental form of the batch history
  * build (q130, [[graft.operators.Lifecycle.scd2Segments]]): each
  * micro-batch carries crawl-epoch observations (doc_id, source, fp), and
  * the maintained state is the slowly-changing-dimension segment table
  * {doc_id, source, fp, valid_from, valid_to}. An arriving observation
  * EXTENDS the doc's latest open segment when the fingerprint is unchanged
  * and the snapshots are contiguous, and OPENS a new segment when the
  * content changed or the doc skipped a snapshot (the q130 gap rule — a doc
  * that left and came back must not fuse across the hole). Fingerprinting
  * is the caller's concern (pass md5(text) or any stable digest):
  * maintenance is independent of how content is summarized. (Reference
  * scope: the reference has no versioned state at all — each run overwrites
  * the previous aggregate, covid_streaming.py:200-226.)
  *
  * State layout at scale (the [[StreamingDedup]] discipline): NO streaming
  * state store — segments live as parquet partitioned by writer epoch under
  * `stateDir/segments`. A segment that keeps extending is re-asserted each
  * snapshot as a superseding row with the same `valid_from` and a larger
  * `valid_to`; [[resolve]] folds supersessions with one groupBy
  * (max(valid_to) per (doc_id, valid_from)) — so writes are append-shaped
  * (no read-modify-write of old partitions, the only layout that scales on
  * an object store) and the fold is a primary-key aggregation. Every
  * join/agg here keys on doc_id (even hash distribution, bounded per-key
  * work); rows carry ids + 32-byte fps only, never text.
  *
  * Per-batch probe cost is O(batch + open set), NOT O(history): the open-
  * segment probe filters `valid_to = snap - 1` — a closed or gapped segment
  * influences the merge identically to an absent one (both "open new"), so
  * only last-snapshot assertions need to be read, and the pushed filter
  * prunes older epoch partitions at the parquet row-group level (each
  * partition's valid_to max is its own epoch). The same row-level predicate
  * is the replay guard: a redelivered batch's own rows carry
  * `valid_to = snap` and are invisible to the probe NO MATTER which
  * partition they sit in — in particular after [[compactState]] folded them
  * into the compacted generation — so the epoch's overwrite stays
  * exactly-once under at-least-once foreachBatch.
  *
  * Snapshot clock: by default the foreachBatch epoch id IS the crawl-
  * snapshot number (one checkpoint lineage = one snapshot clock, exactly
  * like the batch build's `s` column). That default is only sound when the
  * trigger delivers exactly one snapshot per micro-batch: a spurious EMPTY
  * batch still advances the epoch clock and gap-breaks every open segment
  * at the next delivery (a conservative split, never a wrong fuse — and the
  * empty batch itself is skipped without writing a partition). When the
  * observations carry their own snapshot number, pass it as `snapCol` and
  * the clock fragility disappears: contiguity is judged on the data itself
  * (epochId becomes only part of the idempotent partition name), empty
  * batches are harmless, a snapshot split across micro-batches keeps its
  * number, and a batch spanning several snapshots is processed in ascending
  * snapshot order with intra-batch visibility.
  *
  * Checkpoint lineages: epochId restarts at 0 under a fresh checkpoint, so
  * partition names derived from it alone collide across lineages — the
  * exact recovery pattern "restart with a new checkpoint" would clobber an
  * existing `epoch=0` partition and silently lose segments. Each lineage
  * therefore writes at `epoch = base + epochId`, where `base` is assigned
  * ONCE per lineage (max existing epoch + 1, persisted in a
  * `_lineage_<md5(checkpoint)>` marker so same-lineage restarts reuse it
  * and replayed epochs still overwrite their own partition). A redelivery
  * under a fresh lineage then lands in a FRESH partition as duplicate
  * rows — which the row-level `valid_to` probe guard hides from the merge
  * and [[resolve]]'s supersession fold collapses, and which the next
  * [[compactState]]'s `.distinct()` physically removes.
  *
  * Clock regression guard: a batch carrying a snapshot number BELOW the
  * max `valid_to` already stored would be processed as if new and could
  * assert overlapping segments for the same doc. Each batch therefore
  * fails fast unless `min(snap) >= stored clock`, where the clock is a
  * one-line `_snap_clock` file maintained alongside the state (O(1) to
  * check — the per-batch probe stays O(batch + open set), never a history
  * scan). Equality is allowed: an at-least-once redelivery re-carries the
  * LAST processed snapshot, must be byte-identical to the original
  * delivery (the standard replay contract), and is idempotent via the
  * probe guard. The clock is written AFTER the epoch commits, so a crash
  * between the two leaves it one epoch stale — the guard is fail-fast
  * protection against mis-wired pipelines, not a substitute for the
  * replay contract.
  */
object Scd2Stream {

  private def hadoopFs(spark: SparkSession, dir: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sessionState.newHadoopConf())

  private def readSmall(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[String] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val bytes = new Array[Byte](
            math.min(fs.getFileStatus(p).getLen, 4096L).toInt)
          in.readFully(0L, bytes)
          Some(new String(bytes, "UTF-8").trim)
        } finally in.close()
      }
    } catch { case _: Throwable => None }

  private def writeSmall(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      s: String): Unit = {
    val out = fs.create(p, true) // single-object PUT; last writer wins
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The epoch-number base for this checkpoint lineage: reused from the
    * lineage's marker file when it exists (same-lineage restart → same
    * partition names → replayed epochs overwrite idempotently), else
    * max existing epoch + 1 (fresh lineage → collision-free with every
    * prior lineage AND with compacted generations, which number
    * downward). */
  private def lineageBase(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, root: String, checkpoint: String): Long = {
    val marker = new Path(stateDir,
      "_lineage_" + graft.operators.ArtifactStore.md5Hex(checkpoint).take(16))
    readSmall(fs, marker).map(_.toLong).getOrElse {
      val rootPath = new Path(root)
      val maxEpoch =
        if (!fs.exists(rootPath)) -1L
        else fs.listStatus(rootPath).toSeq
          .map(_.getPath.getName)
          .filter(_.startsWith("epoch="))
          .map(_.stripPrefix("epoch=").toLong)
          .foldLeft(-1L)(math.max)
      val base = maxEpoch + 1
      fs.mkdirs(new Path(stateDir))
      writeSmall(fs, marker, base.toString)
      base
    }
  }

  /** Starts maintenance over a stream with columns (doc_id, source, fp)
    * plus, when `snapCol` is set, the snapshot-number column it names.
    * `publish` (optional hook) receives per epoch the maintenance report
    * (n_extended, n_opened) AFTER the epoch's rows are committed; like the
    * state write it is at-least-once — a crash between the parquet commit
    * and the checkpoint commit re-fires it, so consumers must key reports
    * by the epoch id (the state table itself stays exactly-once). */
  def start(observations: DataFrame, stateDir: String, checkpoint: String,
      snapCol: Option[String] = None)(
      publish: (Long, Long, Long) => Unit = (_, _, _) => ()): StreamingQuery = {
    val spark = observations.sparkSession
    val root = s"$stateDir/segments"
    // Assigned once per lineage, BEFORE the first batch: collision-free
    // epoch partition names across checkpoint lineages (Scaladoc above).
    val base =
      lineageBase(hadoopFs(spark, stateDir), stateDir, root, checkpoint)
    val clockPath = new Path(stateDir, "_snap_clock")
    observations.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val entries = batch.select(col("doc_id"), col("source"), col("fp"),
          snapCol.map(c => col(c).cast("long")).getOrElse(lit(epochId))
            .as("snap"))
        entries.persist()
        val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](entries)
        try {
          // One bounded pull: the batch's distinct snapshot numbers
          // (scalar under the one-snapshot-per-batch contract; a short
          // ascending list when a backlog merges snapshots into one batch).
          val snaps = entries.select(col("snap")).distinct()
            .collect().map(_.getLong(0)).sorted
          if (snaps.nonEmpty) { // empty batch: don't consume the clock
            val fs = hadoopFs(spark, stateDir)
            // Fail fast on a snapshot-clock regression (Scaladoc above):
            // a snap below the stored clock would assert overlapping
            // segments; equality is the at-least-once redelivery case.
            readSmall(fs, clockPath).map(_.toLong).foreach { clock =>
              require(snaps.head >= clock,
                s"snapshot clock regression: batch carries snapshot " +
                  s"${snaps.head} but $clockPath already records $clock — " +
                  "only the last processed snapshot may be redelivered")
            }
            val hasState = fs.exists(new Path(root)) &&
              fs.listStatus(new Path(root)).nonEmpty
            val stored =
              if (hasState) spark.read.parquet(root)
                .select(col("doc_id"), col("fp"),
                  col("valid_from"), col("valid_to"))
              else entries.limit(0).select(col("doc_id"), col("fp"),
                lit(0L).as("valid_from"), lit(0L).as("valid_to"))
            // Fold snapshots in order; earlier snapshots' output rows are
            // visible to later ones (acc), so a split/merged delivery
            // derives the same segments as one-batch-per-snapshot.
            var acc = entries.limit(0).select(col("doc_id"), col("source"),
              col("fp"), lit(0L).as("valid_from"), lit(0L).as("valid_to"))
            var (ext, opened) = (0L, 0L)
            snaps.foreach { snap =>
              // Latest open segment per doc: ONLY rows asserted at snap-1
              // matter (closed/gapped segments merge identically to absent
              // ones), which both bounds the scan to the open set and
              // hides a replayed epoch's own rows (valid_to = snap). The
              // supersession fold is kept for defense; post-filter it sees
              // at most one row per doc.
              val open = stored.unionByName(
                  acc.select(col("doc_id"), col("fp"),
                    col("valid_from"), col("valid_to")))
                .filter(col("valid_to") === lit(snap - 1))
                .groupBy(col("doc_id"))
                .agg(max(struct(col("valid_from"), col("valid_to"),
                  col("fp"))).as("t"))
                .select(col("doc_id"), col("t.valid_from").as("o_vf"),
                  col("t.valid_to").as("o_vt"), col("t.fp").as("o_fp"))
              val merged = entries.filter(col("snap") === lit(snap))
                .join(open, Seq("doc_id"), "left_outer")
                .withColumn("extends",
                  col("o_fp").isNotNull && col("o_fp") === col("fp"))
                .select(col("doc_id"), col("source"), col("fp"),
                  when(col("extends"), col("o_vf")).otherwise(lit(snap))
                    .as("valid_from"),
                  lit(snap).as("valid_to"),
                  col("extends"))
              merged.persist() // report + union + state write all scan it
              pinned += merged
              val counts = merged.groupBy()
                .agg(sum(when(col("extends"), 1L).otherwise(0L)),
                  sum(when(col("extends"), 0L).otherwise(1L)))
                .collect()
              if (counts.nonEmpty && !counts.head.isNullAt(0)) {
                ext += counts.head.getLong(0)
                opened += counts.head.getLong(1)
              }
              acc = acc.unionByName(merged.drop("extends"))
            }
            acc.write.mode("overwrite")
              .parquet(s"$root/epoch=${base + epochId}")
            // Clock advances only after the epoch commits: a crash in
            // between leaves it stale by one epoch (guard is fail-fast,
            // not the replay contract). Replay rewrites the same value.
            writeSmall(fs, clockPath, snaps.last.toString)
            publish(epochId, ext, opened) // after commit: at-least-once
          }
        } finally { pinned.foreach(_.unpersist()); () }
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
    * read identically across a compaction boundary, and the open-segment
    * probe's row-level `valid_to` guard keeps a replayed epoch correct
    * even when compaction already folded its rows into the compacted
    * generation. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    StreamingDedup.compactEpochs(spark, s"$stateDir/segments")
}
