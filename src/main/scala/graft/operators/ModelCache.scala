package graft.operators

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** On-disk persistence of trained quantizer centroid models — the disk
  * tier under the per-JVM memo `Similarity.modelCache`. A production
  * pipeline trains its quantizer once and PERSISTS it (MLlib's
  * `model.save` shape): the index that q48/q73/q81 probe must survive the
  * JVM, or every new session re-pays the full Lloyd training scans before
  * it can probe anything. Round-7 verdict item 2.
  *
  * Same [[ArtifactStore]] contract as [[PairCache]]: Hadoop-`FileSystem`
  * throughout (local/HDFS/S3A), rename-free pointer commit, content-hashed
  * input identity, fail-closed code stamps, grace-period prune of
  * superseded fingerprints. The payload is a few KiB of doubles — cell ids
  * and vectors serialized via `doubleToLongBits`, so a reload is bit-exact
  * (ModelCacheSpec proves a cold session serves the persisted model).
  *
  * `spark.graft.modelcache=false` disables the disk tier (the per-JVM memo
  * still applies — the round-7 behavior).
  */
private[graft] object ModelCache {

  /** Everything centroid training's semantics flow through: the Lloyd loop
    * + seeding (Similarity), assignment (NearestCentroid/s), the vector
    * fold primitives, and the hash/fold mirrors. */
  private val CodeClasses = Seq(
    "/graft/operators/Similarity.class", "/graft/operators/Mirror.class",
    "/graft/functions/NearestCentroid.class",
    "/graft/functions/NearestCentroids.class",
    "/graft/functions/FloatVector.class")

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.modelcache").forall(_.toBoolean)

  private def cacheRoot: String =
    sys.props.get("graft.modelcache.dir")
      .orElse(sys.env.get("SPARK_GRAFT_MODELCACHE_DIR"))
      .getOrElse(sys.props("java.io.tmpdir") + "/graft-modelcache")

  /** One-shot hygiene sweep ([[graft.Warm]] calls this): delete model dirs
    * still carrying the round-12 self-tag (`_graft_input` == own dir name),
    * which the fixed prune predicate can never match again. Grace-period
    * rules apply. */
  def sweepLegacy(spark: SparkSession): Unit =
    try {
      val root = new Path(cacheRoot)
      val fs = ArtifactStore.fileSystem(spark, root)
      if (fs.exists(root)) ArtifactStore.pruneLegacySelfTagged(fs, root)
    } catch { case _: Throwable => () }

  /** Disk fingerprint for a training run. `memoKey` is the memo's
    * (leaf-paths + canonical plan, iters, k, exact) tuple rendered to a
    * string — leaf paths already carry content stamps
    * ([[Similarity.fileLeafPaths]]), so data identity is covered; the code
    * stamp covers the trainer itself. None → disk tier disabled for this
    * key (fail closed). */
  private def fingerprint(memoKey: String): Option[String] =
    ArtifactStore.codeStamp(CodeClasses)
      .map(code => ArtifactStore.md5Hex(memoKey + "|" + code))

  /** Load the persisted model for `memoKey`, or train-and-persist via
    * `train`. Falls back to plain training when the disk tier is disabled
    * or unavailable.
    *
    * `stableTag` is the artifact's STABLE input identity — the memo key
    * with the volatile stamps (data content hash, code build stamp)
    * stripped, so it survives exactly the rotations the fingerprint must
    * not. Tagging the payload with it (instead of the round-12 bug:
    * `inputTag = f`, its own fingerprint, which made `pruneSuperseded`'s
    * same-tag-different-name predicate provably a no-op) lets a publish
    * after a rebuild or data regeneration actually sweep the superseded
    * model dir. Distinct logical models over the same files (q68's 8
    * subspace codebooks) differ in their canonicalized plan and so keep
    * distinct tags. */
  def loadOrTrain(spark: SparkSession, memoKey: String, stableTag: String)(
      train: () => Array[(Long, Array[Double])])
      : Array[(Long, Array[Double])] = {
    if (!enabled(spark)) return train()
    val root = new Path(cacheRoot)
    try {
      val fs = ArtifactStore.fileSystem(spark, root)
      fingerprint(memoKey) match {
        case None => train()
        case Some(f) =>
          val fpDir = new Path(root, f)
          ArtifactStore.lock.synchronized {
            ArtifactStore.resolve(fs, fpDir)
              .flatMap(att => read(fs, new Path(att, "centroids.bin")))
              .getOrElse {
                val m = train()
                ArtifactStore.publish(fs, fpDir, inputTag = stableTag) { att =>
                  write(fs, new Path(att, "centroids.bin"), m)
                }
                ArtifactStore.pruneSuperseded(fs, root,
                  inputTag = stableTag, keep = f)
                ArtifactStore.pruneLegacySelfTagged(fs, root)
                m
              }
          }
      }
    } catch { case _: Throwable => train() } // unreachable store: no cache
  }

  private def write(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      m: Array[(Long, Array[Double])]): Unit = {
    val out = new DataOutputStream(fs.create(p, true))
    try {
      out.writeInt(m.length)
      m.foreach { case (cell, vec) =>
        out.writeLong(cell)
        out.writeInt(vec.length)
        vec.foreach(d => out.writeLong(java.lang.Double.doubleToLongBits(d)))
      }
    } finally out.close()
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Option[Array[(Long, Array[Double])]] =
    try {
      if (!fs.exists(p)) return None
      val in = new DataInputStream(fs.open(p))
      try {
        val n = in.readInt()
        Some(Array.fill(n) {
          val cell = in.readLong()
          val dim = in.readInt()
          (cell, Array.fill(dim)(
            java.lang.Double.longBitsToDouble(in.readLong())))
        })
      } finally in.close()
    } catch { case _: Throwable => None }
}
