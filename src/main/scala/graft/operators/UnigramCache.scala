package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk persistence of the trained unigram-LM tokenizer piece table
  * ([[TextAnalysis.unigramTrain]]) — the second member of the tokenizer
  * artifact family next to [[BpeCache]], with the identical contract:
  *
  *  - fingerprint = qualified input path + CONTENT stamp of
  *    documents.parquet + build stamps of every class the training
  *    semantics flow through; missing input or unresolvable class → fail
  *    closed (train inline, never serve stale);
  *  - publish = payload into a fresh attempt dir, one atomic pointer PUT,
  *    superseded fingerprints pruned after the grace period;
  *  - store access guards NonFatal ONLY, scoped to the store (a genuine
  *    training failure propagates; fatal errors are never eaten);
  *  - `spark.graft.unigramcache=false` disables the disk tier, and
  *    q145_unigram_train_pipeline bypasses the cache BY CONSTRUCTION so
  *    the EM-prune training pipeline stays gate-visible and oracle-gated
  *    (the q135/q102 pattern). UnigramSpec proves cached ≡ computed.
  *
  * Scale shape: the artifact is O(|pieces|) — ≤ a few hundred rows,
  * bounded by the language — so at 100 TB it is a broadcast-sized parquet
  * read where retraining would replay three corpus-vocabulary EM passes.
  */
private[graft] object UnigramCache {

  /** Everything unigram training flows through: the EM loop + candidate
    * enumeration (TextAnalysis) and the tokenization primitive
    * (Mirror.words). */
  private val CodeClasses = Seq(
    "/graft/operators/TextAnalysis.class", "/graft/operators/Mirror.class")

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.unigramcache").forall(_.toBoolean)

  private def cacheRoot: String =
    sys.props.get("graft.unigramcache.dir")
      .orElse(sys.env.get("SPARK_GRAFT_UNIGRAMCACHE_DIR"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-unigramcache")

  /** Both trained payloads for `dir`'s documents — the piece table
    * (piece, plen, usage) and the segmented vocabulary (w, n_pieces) —
    * from the on-disk artifact when enabled (training + publishing on
    * first use), else trained inline. */
  def trained(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    def compute =
      TextAnalysis.unigramTrainFull(Tables(spark, dir, "documents"))
    if (!enabled(spark)) return compute
    import scala.util.control.NonFatal
    val root = new Path(cacheRoot)
    val keys: Option[(org.apache.hadoop.fs.FileSystem, String, String)] =
      try {
        val fs = ArtifactStore.fileSystem(spark, root)
        val input = fs.makeQualified(new Path(dir, "documents.parquet"))
        for {
          content <- ArtifactStore.contentStamp(fs, input)
          code <- ArtifactStore.codeStamp(CodeClasses)
        } yield (fs, input.toString, ArtifactStore.md5Hex(
          Seq(input.toString, content, code).mkString("|")))
      } catch { case NonFatal(_) => None } // unreachable store: no cache
    keys match {
      case None => compute // fail closed
      case Some((fs, input, f)) =>
        val fpDir = new Path(root, f)
        def readPayload(p: Path): (DataFrame, DataFrame) =
          (spark.read.parquet(new Path(p, "pieces").toString),
            spark.read.parquet(new Path(p, "vocab").toString))
        val cached =
          try ArtifactStore.lock.synchronized {
            ArtifactStore.resolve(fs, fpDir).map(readPayload)
          } catch { case NonFatal(_) => None }
        cached.getOrElse {
          val (pieces, vocab) = compute // training failures propagate
          try ArtifactStore.lock.synchronized {
            val p = ArtifactStore.publish(fs, fpDir, input) { att =>
              pieces.coalesce(1).write.mode("overwrite")
                .parquet(new Path(att, "pieces").toString)
              vocab.coalesce(1).write.mode("overwrite")
                .parquet(new Path(att, "vocab").toString)
            }
            ArtifactStore.pruneSuperseded(fs, root, input, keep = f)
            p.map(readPayload).getOrElse((pieces, vocab))
          } catch { case NonFatal(_) => (pieces, vocab) }
        }
    }
  }

  /** The trained piece table (piece, plen, usage). */
  def pieces(spark: SparkSession, dir: String): DataFrame =
    trained(spark, dir)._1

  /** The segmented vocabulary (w, n_pieces) — the application table. */
  def vocab(spark: SparkSession, dir: String): DataFrame =
    trained(spark, dir)._2
}
