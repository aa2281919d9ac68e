package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus profiler — the incremental twin of the sketch pair
  * (q138 HLL registers, q139 Count-Min counters): documents arrive as a
  * stream and the profiler maintains EXACTLY the state the batch
  * operators compute from cold parquet, because both sketches are
  * mergeable by construction — registers by per-(source, bucket) MAX,
  * counters by per-(row, bucket) SUM (the two associativity properties
  * StatsSketchSpec proves for the batch side; SketchStreamSpec proves
  * the streamed state is equal, row for row, to the batch helpers over
  * the same documents).
  *
  * Exactly-once counting under at-least-once delivery: MAX-merge is
  * naturally idempotent, but SUM-merge double-counts a redelivered
  * document — so arrivals pass a doc_id gate first (the [[PurgeStream]]
  * discipline): state keeps a `seen/epoch=E` id set, each batch
  * anti-joins it (ids only, never text), and sketch deltas are computed
  * over genuinely-new documents alone. Replay of an epoch overwrites its
  * own partitions (state reads self-mask the current epoch); a
  * fresh-lineage redelivery lands in a fresh partition but its delta is
  * empty by the gate. Epoch numbers are collision-free across lineages
  * ([[EpochState.lineageBase]]).
  *
  * Shape at scale: the per-batch delta is one shingle pass over the
  * batch (partial-aggregated to ≤ m rows/source + d·w cells before
  * anything shuffles); folds at read time touch O(epochs · state) tiny
  * rows, and [[compactState]] folds epochs into one generation offline.
  * Nothing is ever O(corpus) except the id gate, which is O(ids). */
object SketchStream {
  import graft.operators.Stats.{hllRegistersOf, hllShingles, cmsCounters}

  /** Starts the profiler over a stream of document rows (doc_id, source,
    * text). `publish` receives (epoch, n_new_docs) after commit. */
  def start(docs: DataFrame, stateDir: String, checkpoint: String)(
      publish: (Long, Long) => Unit = (_, _) => ()): StreamingQuery = {
    val spark = docs.sparkSession
    val seenRoot = s"$stateDir/seen"
    val base = EpochState.lineageBase(
      EpochState.fs(spark, stateDir), stateDir, seenRoot, checkpoint)
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val epoch = base + epochId
        val fs = EpochState.fs(spark, stateDir)
        val seen: DataFrame = {
          val p = new Path(seenRoot)
          if (fs.exists(p) && fs.listStatus(p).nonEmpty)
            readTable(spark, seenRoot) // marker-aware (compaction-crash safe)
              .filter(col("epoch") =!= lit(epoch)) // replay-safe self-mask
              .select(col("doc_id"))
          else batch.limit(0).select(col("doc_id"))
        }
        val fresh = batch.toDF()
          .dropDuplicates("doc_id")
          .join(seen, Seq("doc_id"), "left_anti")
        fresh.persist()
        try {
          val n = fresh.count()
          hllRegistersOf(hllShingles(fresh)).write.mode("overwrite")
            .parquet(s"$stateDir/regs/epoch=$epoch")
          cmsCounters(fresh
            .select(explode(graft.operators.Mirror.shingleGen(col("text")))
              .as("sh")))
            .write.mode("overwrite")
            .parquet(s"$stateDir/counters/epoch=$epoch")
          fresh.select(col("doc_id")).write.mode("overwrite")
            .parquet(s"$seenRoot/epoch=$epoch")
          publish(epoch, n)
        } finally { fresh.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The accumulated HLL register table — per-(source, bucket) MAX over
    * every epoch's slice registers. Equal to the batch registers over
    * the same documents (SketchStreamSpec). */
  def registers(spark: SparkSession, stateDir: String): DataFrame =
    readTable(spark, s"$stateDir/regs")
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho"))

  /** The accumulated Count-Min counter table — per-(row, bucket) SUM
    * over every epoch's slice counters. Equal to the batch counters
    * over the same documents (SketchStreamSpec). */
  def counters(spark: SparkSession, stateDir: String): DataFrame =
    readTable(spark, s"$stateDir/counters")
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  // --- compaction commit protocol -----------------------------------------
  //
  // MAX/distinct folds are idempotent under a crashed compaction, but the
  // counters table is SUM-merged: a crash between writing the folded
  // generation and deleting the originals would leave BOTH on disk and
  // every read would double-count permanently (round-12 advice). So a
  // compaction commits through a single-object marker (`_compacting`,
  // underscore-prefixed — invisible to partition discovery; a one-key PUT
  // is atomic on every store Hadoop targets) naming the folded generation
  // and the epochs it covers, and reads resolve the marker:
  //  - no marker                       → all epoch dirs authoritative;
  //  - marker, folded gen NOT committed → fold crashed mid-write: ignore
  //    the partial folded gen, originals authoritative (the folded dir is
  //    only readable once its `_SUCCESS` job-commit file lands);
  //  - marker, folded gen committed     → folded gen authoritative, the
  //    covered epochs (deleted or not-yet-deleted) are excluded.
  // Every crash point therefore reads exactly once. Exclusion filters hit
  // the `epoch` PARTITION column, so superseded dirs are pruned, never
  // scanned. compactState first COMPLETES any interrupted compaction
  // (delete covered dirs or the partial fold, clear the marker), making a
  // re-run the repair path.

  private def marker(root: String) = new Path(root, "_compacting")

  private case class Pending(next: Long, covers: Set[Long])

  private def readPending(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[Pending] =
    try {
      val p = marker(root)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val parts = text.trim.split(";")
        Some(Pending(parts(0).toLong,
          parts.drop(1).filter(_.nonEmpty).map(_.toLong).toSet))
      }
    } catch { case _: Throwable => None }

  private def foldedCommitted(fs: org.apache.hadoop.fs.FileSystem,
      root: String, next: Long): Boolean =
    try fs.exists(new Path(s"$root/epoch=$next/_SUCCESS"))
    catch { case _: Throwable => false }

  /** Epoch partitions a reader must EXCLUDE right now (marker-resolved). */
  private[streaming] def excludedEpochs(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Set[Long] =
    readPending(fs, root) match {
      case Some(p) if foldedCommitted(fs, root, p.next) => p.covers
      case Some(p) => Set(p.next) // partial fold: originals authoritative
      case None => Set.empty
    }

  private def readTable(spark: SparkSession, root: String): DataFrame = {
    val excluded = excludedEpochs(EpochState.fs(spark, root), root)
    val df = spark.read.parquet(root)
    if (excluded.isEmpty) df
    else df.filter(!col("epoch").isin(excluded.toSeq: _*)) // partition-pruned
  }

  /** Finish an interrupted compaction: committed fold → delete the covered
    * dirs; uncommitted fold → delete the partial folded dir. Then clear
    * the marker. Idempotent. */
  private def completePending(spark: SparkSession, root: String): Unit = {
    val fs = EpochState.fs(spark, root)
    readPending(fs, root).foreach { p =>
      if (foldedCommitted(fs, root, p.next))
        p.covers.foreach { e =>
          try { fs.delete(new Path(s"$root/epoch=$e"), true); () }
          catch { case _: Throwable => () }
        }
      else {
        try { fs.delete(new Path(s"$root/epoch=${p.next}"), true); () }
        catch { case _: Throwable => () }
      }
      fs.delete(marker(root), false)
    }
  }

  /** Offline small-files maintenance (run while the stream is stopped):
    * fold each table's epochs into one generation numbered below every
    * existing epoch. The folds are the tables' own merge operations, so
    * resolve-after-compact ≡ resolve-before-compact — and the marker
    * protocol above makes that equality hold across a crash at ANY point
    * of the compaction (SketchStreamSpec's crash-replay tests). */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    val folds: Seq[(String, DataFrame => DataFrame)] = Seq(
      "regs" -> (df => df.groupBy(col("source"), col("bucket"))
        .agg(max(col("rho")).as("rho"))),
      "counters" -> (df => df.groupBy(col("i"), col("bucket"))
        .agg(sum(col("c")).as("c"))),
      "seen" -> (df => df.select(col("doc_id")).distinct()))
    folds.foreach { case (t, fold) =>
      val root = s"$stateDir/$t"
      val fs = EpochState.fs(spark, root)
      val rootPath = new Path(root)
      if (fs.exists(rootPath)) {
        completePending(spark, root) // repair any interrupted compaction
        val epochs = fs.listStatus(rootPath).toSeq
          .filter(_.getPath.getName.startsWith("epoch="))
        if (epochs.length > 1) {
          val nums = epochs
            .map(_.getPath.getName.stripPrefix("epoch=").toLong)
          val next = nums.min - 1
          // marker FIRST: until the folded gen's _SUCCESS lands, readers
          // resolve the marker to "ignore epoch=next" — a crash mid-fold
          // leaves the originals authoritative, never both generations
          val out = fs.create(marker(root), true)
          try out.write(s"$next;${nums.mkString(";")}".getBytes("UTF-8"))
          finally out.close()
          val folded = fold(spark.read.parquet(root)
            .filter(col("epoch") =!= lit(next)).drop("epoch"))
          folded.write.mode("overwrite").parquet(s"$root/epoch=$next")
          // _SUCCESS is on disk → folded gen authoritative from here on
          epochs.foreach(e => fs.delete(e.getPath, true))
          fs.delete(marker(root), false)
        }
      }
    }
  }
}
