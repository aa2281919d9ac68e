package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming right-to-be-forgotten processor — the incremental twin of the
  * batch purge audit (q136, [[graft.operators.Dedup.q136PurgeAudit]]).
  * Deletion requests arrive continuously (GDPR art. 17 requests, opt-out
  * feeds, DMCA notices); the corpus owner must keep a running, auditable
  * account of what the accumulated request set purges — per source, how
  * many documents and tokens — and how far it cascades into DERIVED
  * artifacts: every verified near-dup pair with a purged endpoint must be
  * re-examined, because its surviving side may have been dropped as "the
  * duplicate" of a now-deleted document. PurgeSpec proves the accumulated
  * stream report ≡ the batch audit over the same request set.
  *
  * Input: a stream of request rows carrying `doc_id`. Requests for
  * unknown ids resolve to nothing (dropped — nothing to purge); duplicate
  * requests (within a batch, across batches, or via at-least-once
  * redelivery) purge once, exactly like the batch set-semantics.
  *
  * State layout at scale (the [[StreamingDedup]] epoch discipline): NO
  * streaming state store — two epoch-partitioned parquet tables under
  * `stateDir`: `purged/epoch=E/` (doc_id, source, toks — the resolved,
  * deduplicated request set) and `affected/epoch=E/` (doc_a, doc_b,
  * source — cascade pairs already counted, keyed exactly like the batch
  * audit's per-source attribution). Per-batch cost is O(batch + state +
  * the pair artifact), never O(corpus): the batch resolves against the
  * slim (doc_id, source, toks) corpus index with a keyed PK join, the
  * new-request filter is one anti-join against `purged`, and the cascade
  * joins the O(near-dup pairs) artifact against the batch's newly purged
  * ids — tiny and broadcastable — then anti-joins `affected` so a pair
  * whose two endpoints are purged in DIFFERENT epochs still counts once
  * per source (the batch DISTINCT, incrementally).
  *
  * Exactly-once accounting under at-least-once foreachBatch: state reads
  * exclude the CURRENT epoch partition, so a replayed batch recomputes
  * the identical delta and overwrites its own partition (idempotent);
  * epoch numbers are collision-free across checkpoint lineages
  * ([[EpochState.lineageBase]]). `publish` fires after the state commit
  * (at-least-once; consumers key by epoch). */
object PurgeStream {

  /** The slim corpus index requests resolve against: (doc_id, source,
    * toks) — same token definition as the batch audit (q136). One narrow
    * corpus scan; at 100 TB this is the manifest-grade table a purge
    * pipeline maintains anyway, not a per-request scan. */
  def corpusIndex(spark: SparkSession, dir: String): DataFrame =
    graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(graft.operators.Mirror.words(col("text"))).cast("long")
          .as("toks"))

  /** Starts the purge processor. `requests` streams rows with `doc_id`;
    * `corpus` is [[corpusIndex]] (or an equivalent slim index); `pairs`
    * is the verified near-dup pair artifact (doc_a, doc_b — e.g. the
    * q19/[[graft.operators.PairCache]] table). `publish` receives
    * (epoch, n_purged_delta, tokens_purged_delta, pairs_affected_delta)
    * AFTER the epoch's state is committed. */
  def start(requests: DataFrame, corpus: DataFrame, pairs: DataFrame,
      stateDir: String, checkpoint: String)(
      publish: (Long, Long, Long, Long) => Unit = (_, _, _, _) => ())
      : StreamingQuery = {
    val spark = requests.sparkSession
    val purgedRoot = s"$stateDir/purged"
    val affectedRoot = s"$stateDir/affected"
    val base = EpochState.lineageBase(
      EpochState.fs(spark, stateDir), stateDir, purgedRoot, checkpoint)
    requests.writeStream
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        val epoch = base + epochId
        val fs = EpochState.fs(spark, stateDir)
        def state(root: String, cols: Seq[String]): DataFrame = {
          val p = new Path(root)
          if (fs.exists(p) && fs.listStatus(p).nonEmpty)
            spark.read.parquet(root)
              .filter(col("epoch") =!= lit(epoch)) // replay-safe self-mask
              .select(cols.map(col): _*)
          else corpus.limit(0)
            .select(lit(0L).as("doc_a"), lit(0L).as("doc_b"),
              lit("").as("source"), lit(0L).as("doc_id"),
              lit(0L).as("toks"))
            .select(cols.map(col): _*)
        }
        // resolve + dedupe: set semantics over the accumulated requests
        val resolved = corpus
          .join(broadcast(batch.select(col("doc_id")).distinct()),
            Seq("doc_id"))
        val newPurged = resolved
          .join(state(purgedRoot, Seq("doc_id")), Seq("doc_id"),
            "left_anti")
          .select(col("doc_id"), col("source"), col("toks"))
        newPurged.persist()
        try {
          // cascade into the pair artifact, attributed per purged
          // endpoint's source (a pair purged from two sources counts in
          // both audits — the batch UNION ALL + DISTINCT, incrementally)
          val ids = newPurged.select(col("doc_id"), col("source"))
          val touched = pairs
            .join(broadcast(ids.withColumnRenamed("doc_id", "doc_a")),
              Seq("doc_a"))
            .select(col("doc_a"), col("doc_b"), col("source"))
            .unionByName(pairs
              .join(broadcast(ids.withColumnRenamed("doc_id", "doc_b")),
                Seq("doc_b"))
              .select(col("doc_a"), col("doc_b"), col("source")))
            .distinct()
          val newAffected = touched
            .join(state(affectedRoot, Seq("doc_a", "doc_b", "source")),
              Seq("doc_a", "doc_b", "source"), "left_anti")
          val delta = newPurged.agg(
            count(lit(1)), coalesce(sum(col("toks")), lit(0L))).collect()(0)
          val nAffected = newAffected.count()
          newPurged.write.mode("overwrite")
            .parquet(s"$purgedRoot/epoch=$epoch")
          newAffected.write.mode("overwrite")
            .parquet(s"$affectedRoot/epoch=$epoch")
          publish(epoch, delta.getLong(0), delta.getLong(1), nAffected)
        } finally { newPurged.unpersist(); () }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** The accumulated audit in the batch report's exact shape (q136):
    * per source — docs/tokens the accumulated request set purges, docs
    * retained, and the distinct cascade pairs attributed to it. Equal to
    * running the batch audit over the union of every delivered request
    * (PurgeSpec). One corpus-index rollup + two tiny state rollups. */
  def report(spark: SparkSession, corpus: DataFrame, stateDir: String)
      : DataFrame = {
    val totals = corpus.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"), sum(col("toks")).as("all_tokens"))
    val purged = read(spark, s"$stateDir/purged",
      Seq("doc_id", "source", "toks"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_purged"),
        sum(col("toks")).as("tokens_purged"))
    val affected = read(spark, s"$stateDir/affected",
      Seq("doc_a", "doc_b", "source"))
      .groupBy(col("source")).agg(count(lit(1)).as("pairs_affected"))
    totals
      .join(purged, Seq("source"), "left_outer")
      .join(affected, Seq("source"), "left_outer")
      .select(col("source"),
        coalesce(col("n_purged"), lit(0L)).as("n_purged"),
        (col("n_docs") - coalesce(col("n_purged"), lit(0L)))
          .as("n_retained"),
        coalesce(col("tokens_purged"), lit(0L)).as("tokens_purged"),
        coalesce(col("pairs_affected"), lit(0L)).as("pairs_affected"))
      .orderBy(col("source"))
  }

  private def read(spark: SparkSession, root: String,
      cols: Seq[String]): DataFrame = {
    val fs = EpochState.fs(spark, root)
    val p = new Path(root)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      // distinct: a fresh-lineage redelivery lands duplicates in a fresh
      // partition (EpochState contract) — the fold absorbs them
      spark.read.parquet(root).select(cols.map(col): _*).distinct()
    else
      spark.range(0).select(
        lit(0L).as("doc_a"), lit(0L).as("doc_b"), lit("").as("source"),
        lit(0L).as("doc_id"), lit(0L).as("toks"))
        .select(cols.map(col): _*).limit(0)
  }

  /** Offline small-files maintenance (run while the stream is stopped):
    * fold all epoch partitions of each table into one generation
    * numbered below every existing epoch, dropping the duplicates a
    * fresh-lineage redelivery may have landed. */
  def compactState(spark: SparkSession, stateDir: String): Unit =
    Seq("purged" -> Seq("doc_id", "source", "toks"),
      "affected" -> Seq("doc_a", "doc_b", "source")).foreach {
      case (t, cols) =>
        val root = s"$stateDir/$t"
        val fs = EpochState.fs(spark, root)
        val rootPath = new Path(root)
        if (fs.exists(rootPath)) {
          val epochs = fs.listStatus(rootPath).toSeq
            .filter(_.getPath.getName.startsWith("epoch="))
          if (epochs.length > 1) {
            val next = epochs
              .map(_.getPath.getName.stripPrefix("epoch=").toLong).min - 1
            val folded = spark.read.parquet(root)
              .select(cols.map(col): _*).distinct()
            folded.write.mode("overwrite").parquet(s"$root/epoch=$next")
            epochs.foreach(e => fs.delete(e.getPath, true))
          }
        }
    }
}
