package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk persistence of the q153 reference language model — the bigram
  * and prefix count tables plus the prefix-vocabulary size, i.e. exactly
  * what CCNet serializes as its reference model (Wenzek et al. 2020 ship
  * a trained KenLM; this engine's integer-exact surrogate is two count
  * tables and one scalar).
  *
  * Why: [[Quality.lmCounts]] over the quality-reference slice re-scans
  * and re-aggregates ~40 % of the corpus on every fresh JVM before a
  * single document can be scored. A production perplexity filter never
  * retrains per job — the reference model is an offline artifact every
  * scoring job loads. This object is that artifact, on
  * [[ArtifactStore]]'s rename-free commit protocol, under the
  * [[PairCache]]/[[BpeCache]] contract:
  *  - fingerprint = qualified input path + CONTENT stamp of
  *    documents.parquet + build stamps of every class the training
  *    semantics flow through; anything unresolvable → fail closed
  *    (train inline, serve nothing stale);
  *  - store access guards NonFatal only, scoped to the store itself —
  *    a genuine training failure propagates;
  *  - `spark.graft.lmcache=false` disables the disk tier;
  *    q154_perplexity_train_pipeline bypasses BY CONSTRUCTION so fresh
  *    training stays bench- and oracle-visible every round (the
  *    q135/q59 bypass pattern);
  *  - LmCacheSpec proves cached ≡ freshly trained for all three
  *    payloads and that q153 (cached) ≡ q154 (bypass) row-for-row.
  *
  * Scale shape: the artifact is O(|reference vocabulary|) — bounded by
  * the language, not the corpus — a broadcast-sized parquet read where
  * retraining is a corpus-scale aggregation. */
private[graft] object LmCache {

  /** Everything the reference model's semantics flow through: the
    * scoring/training expressions (Quality), the reference-slice rules
    * (Quality.keepAll + the stopword tables in TextAnalysis), the
    * hash/tokenize mirrors (Mirror), and the native bigram generator. */
  private val CodeClasses = Seq(
    "/graft/operators/Quality.class", "/graft/operators/TextAnalysis.class",
    "/graft/operators/Mirror.class", "/graft/functions/BigramGen.class")

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.lmcache").forall(_.toBoolean)

  private def cacheRoot: String =
    sys.props.get("graft.lmcache.dir")
      .orElse(sys.env.get("SPARK_GRAFT_LMCACHE_DIR"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-lmcache")

  /** The reference model for `dir`'s documents table: (bigram counts,
    * prefix counts, prefix-vocabulary size) — loaded from the on-disk
    * artifact when enabled (training + publishing on first use), else
    * trained inline. */
  def counts(spark: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    def compute = Quality.lmRefCounts(spark, dir)
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
      case None => compute // fail closed: never risk a stale model
      case Some((fs, input, f)) =>
        val fpDir = new Path(root, f)
        def readPayload(p: Path): (DataFrame, DataFrame, Long) = {
          val c2 = spark.read.parquet(new Path(p, "c2").toString)
          val c1 = spark.read.parquet(new Path(p, "c1").toString)
          val v = spark.read.parquet(new Path(p, "meta").toString)
            .collect().head.getAs[Long]("v")
          (c2, c1, v)
        }
        val cached =
          try ArtifactStore.lock.synchronized {
            ArtifactStore.resolve(fs, fpDir).map(readPayload)
          } catch { case NonFatal(_) => None }
        cached.getOrElse {
          val (c2, c1, v) = compute // failures propagate — not cache noise
          try ArtifactStore.lock.synchronized {
            val p = ArtifactStore.publish(fs, fpDir, input) { att =>
              c2.write.mode("overwrite")
                .parquet(new Path(att, "c2").toString)
              c1.write.mode("overwrite")
                .parquet(new Path(att, "c1").toString)
              spark.range(1).select(lit(v).as("v"))
                .coalesce(1).write.mode("overwrite")
                .parquet(new Path(att, "meta").toString)
            }
            ArtifactStore.pruneSuperseded(fs, root, input, keep = f)
            p.map(readPayload).getOrElse((c2, c1, v))
          } catch {
            // publish/read-back failed mid-flight: the freshly trained
            // model is still correct — serve it
            case NonFatal(_) => (c2, c1, v)
          }
        }
    }
  }
}
