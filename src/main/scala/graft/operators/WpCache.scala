package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk persistence of the trained WordPiece tokenizer (the q162/q163
  * family) — merge table + final segmented vocabulary, under exactly the
  * [[BpeCache]] contract: content+code-stamped fingerprint failing closed,
  * [[ArtifactStore]] pointer-file commit, grace-period prune, and a
  * `spark.graft.wpcache=false` kill switch; q163 bypasses by construction
  * so the training pipeline stays gate-visible. WpCacheSpec proves
  * cached ≡ freshly-trained. */
private[graft] object WpCache {

  private val CodeClasses = Seq(
    "/graft/operators/TextAnalysis.class", "/graft/operators/Mirror.class")

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.wpcache").forall(_.toBoolean)

  private def cacheRoot: String =
    sys.props.get("graft.wpcache.dir")
      .orElse(sys.env.get("SPARK_GRAFT_WPCACHE_DIR"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-wpcache")

  /** (final segmented vocabulary, merge 6-tuples) for `dir`'s documents —
    * from the artifact when enabled (training + publishing on first use),
    * else trained inline. */
  def trained(spark: SparkSession, dir: String)
      : (DataFrame, Seq[(Int, String, String, Long, Long, Long)]) = {
    def compute = TextAnalysis.wpTrain(Tables(spark, dir, "documents"))
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
          Seq("wp", input.toString, content, code).mkString("|")))
      } catch { case NonFatal(_) => None } // unreachable store: no cache
    keys match {
      case None => compute // fail closed: never risk a stale model
      case Some((fs, input, f)) =>
        val fpDir = new Path(root, f)
        def readPayload(p: Path)
            : (DataFrame, Seq[(Int, String, String, Long, Long, Long)]) = {
          val vocab = spark.read.parquet(new Path(p, "vocab").toString)
          val merges = spark.read
            .parquet(new Path(p, "merges").toString)
            .collect()
            .map(r => (r.getAs[Int]("rnd"), r.getAs[String]("sym_a"),
              r.getAs[String]("sym_b"), r.getAs[Long]("cnt"),
              r.getAs[Long]("ca"), r.getAs[Long]("cb")))
            .sortBy(_._1).toSeq
          (vocab, merges)
        }
        val cached =
          try ArtifactStore.lock.synchronized {
            ArtifactStore.resolve(fs, fpDir).map(readPayload)
          } catch { case NonFatal(_) => None }
        cached.getOrElse {
          val (vocab, merges) = compute // training failures propagate
          try ArtifactStore.lock.synchronized {
            val p = ArtifactStore.publish(fs, fpDir, input) { att =>
              vocab.write.mode("overwrite")
                .parquet(new Path(att, "vocab").toString)
              import spark.implicits._
              merges.toDF("rnd", "sym_a", "sym_b", "cnt", "ca", "cb")
                .coalesce(1).write.mode("overwrite")
                .parquet(new Path(att, "merges").toString)
            }
            p.map(readPayload) match {
              case Some(payload) =>
                // unpersist ONLY once the published artifact read back —
                // a failed publish must keep serving the persisted vocab,
                // or every downstream action silently retrains
                vocab.unpersist(false)
                try ArtifactStore.pruneSuperseded(fs, root, input, keep = f)
                catch { case NonFatal(_) => () }
                payload
              case None => (vocab, merges)
            }
          } catch {
            case NonFatal(_) => (vocab, merges)
          }
        }
    }
  }
}
