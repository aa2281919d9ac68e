package graft.operators

import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Fingerprinted on-disk artifact directories with a rename-free commit
  * protocol, expressed entirely through the Hadoop `FileSystem` API so the
  * same code publishes to local disk, HDFS, or an object store (s3a://)
  * unchanged. Shared by [[PairCache]] (the materialized near-dup pair
  * table) and [[ModelCache]] (trained quantizer centroids).
  *
  * Layout per artifact:
  * {{{
  *   <root>/<fingerprint>/attempt-<uuid>/ ...payload...
  *   <root>/<fingerprint>/_graft_input      (canonical input id, for prune)
  *   <root>/<fingerprint>/_COMMITTED        (pointer naming the attempt)
  * }}}
  *
  * Commit = write the payload into a fresh attempt directory, then PUT the
  * single-object pointer file naming that attempt. No rename anywhere:
  * object stores have no atomic directory rename (S3A "rename" is a
  * copy-then-delete that readers can observe half-done), but a single-key
  * PUT is atomic on every store Hadoop targets — a reader sees the old
  * pointer, no pointer, or the new pointer, never a torn payload.
  * Concurrent writers race benignly: the payload is a deterministic
  * function of the fingerprint, so last-pointer-wins still names a valid,
  * identical artifact, and the loser's attempt directory is garbage swept
  * by the grace-period prune.
  *
  * Staleness safety (round-7 advice):
  *  - input identity is CONTENT-hashed (length + first/last 64 KiB of every
  *    data file), not mtime — a same-size regeneration within filesystem
  *    timestamp granularity changes the fingerprint;
  *  - an unresolvable class resource in the code stamp FAILS CLOSED (the
  *    caller disables its cache) instead of degrading to a constant stamp;
  *  - pruning skips directories modified within [[pruneGraceMs]], so a
  *    concurrent JVM (or a lazy DataFrame created just before an input
  *    regeneration) keeps its artifact readable for the grace window.
  */
private[graft] object ArtifactStore {

  /** Serializes intra-JVM publishes; cross-JVM races are benign (above). */
  val lock = new Object

  /** Count of artifact publishes in this JVM — observability for
    * [[graft.Warm]]/[[graft.Bench]]: a bench run that had to publish
    * (train/build) artifacts is cold, and its JSON self-labels with the
    * count instead of masquerading as a regression. */
  val published = new java.util.concurrent.atomic.AtomicLong(0)

  private val BlockBytes = 64 * 1024

  /** Don't prune artifact dirs modified within this window: another JVM
    * (QBench/Bench run directly) or an already-planned DataFrame in this
    * one may still be scanning them. Overridable for tests only. */
  def pruneGraceMs: Long =
    sys.props.get("graft.artifact.prune.grace.ms").map(_.toLong)
      .getOrElse(10L * 60 * 1000)

  def fileSystem(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Content identity of an input file or one-level directory: per data
    * file, its name, length, and an MD5 over the first and last 64 KiB.
    * Strictly stronger than mtime+length (catches same-size regeneration);
    * reads at most 128 KiB per file — footer-cheap even on object stores.
    * None when the path is missing or unreadable → caller fails closed. */
  def contentStamp(fs: FileSystem, p: Path): Option[String] =
    try {
      if (!fs.exists(p)) return None
      val st = fs.getFileStatus(p)
      val files =
        if (st.isDirectory)
          fs.listStatus(p).filter { s =>
            val n = s.getPath.getName
            s.isFile && !n.startsWith("_") && !n.startsWith(".")
          }.sortBy(_.getPath.getName).toSeq
        else Seq(st)
      val md = MessageDigest.getInstance("MD5")
      files.foreach { s =>
        md.update(s"${s.getPath.getName}:${s.getLen}:".getBytes("UTF-8"))
        val in = fs.open(s.getPath)
        try {
          val head = new Array[Byte](math.min(s.getLen, BlockBytes.toLong).toInt)
          in.readFully(0L, head)
          md.update(head)
          if (s.getLen > BlockBytes) {
            val tail = new Array[Byte](BlockBytes)
            in.readFully(s.getLen - BlockBytes, tail)
            md.update(tail)
          }
        } finally in.close()
      }
      Some(md.digest().map("%02x".format(_)).mkString)
    } catch { case _: Throwable => None }

  /** Build stamp over every compiled class a cached pipeline's semantics
    * flow through — an MD5 over the class BYTES, not their timestamps.
    * Byte-hashing matters operationally: launchers that package the
    * classpath per invocation (sbt's bg-job jar, a spark-submit überjar
    * rebuilt by CI) give every run a fresh entry mtime for IDENTICAL
    * bytes, and a timestamp stamp then rotates every fingerprint per JVM —
    * measured in round 13 as all four path-tagged caches plus both model
    * keys republishing on every `sbt runMain graft.Warm` against a warm
    * store. Content stamps are stable across repackaging and still
    * invalidate on any real code change. None (→ caller disables its
    * cache) when ANY resource is unresolvable — an unusual classloader
    * must never stamp 0 and serve a stale artifact across a code change. */
  def codeStamp(resources: Seq[String]): Option[String] =
    try {
      val md = MessageDigest.getInstance("MD5")
      resources.foreach { r =>
        val expanded = expandClassResource(r).getOrElse(return None)
        expanded.foreach { res =>
          val in = getClass.getResourceAsStream(res)
          if (in == null) return None
          try {
            md.update(res.getBytes("UTF-8"))
            val buf = new Array[Byte](BlockBytes)
            var n = in.read(buf)
            while (n >= 0) {
              if (n > 0) md.update(buf, 0, n)
              n = in.read(buf)
            }
          } finally in.close()
        }
      }
      Some(md.digest().map("%02x".format(_)).mkString)
    } catch { case _: Throwable => None }

  /** Expand '/p/X.class' to the set of class files that actually carry X's
    * semantics. For a Scala `object X` the listed file is only the static-
    * forwarder mirror (MODULE$ call stubs that change ONLY when public
    * signatures change); the implementation lives in '/p/X$.class' — so a
    * body-only edit (a threshold, SQL text, a training-loop tweak) would
    * never rotate a stamp built from the forwarder alone (round-13 advice).
    * The companion-module class is therefore REQUIRED: None (→ caller
    * disables its cache) when it is unresolvable. Inner/synthetic classes
    * ('/p/X$*.class' — nested case classes, typecreators, specialized
    * lambdas) are discovered by listing the enclosing classpath entry,
    * best-effort across file: and jar: entries, sorted for determinism. */
  private[operators] def expandClassResource(r: String): Option[Seq[String]] = {
    if (!r.endsWith(".class")) return Some(Seq(r))
    val companion = r.stripSuffix(".class") + "$.class"
    if (getClass.getResource(companion) == null) return None
    Some((Seq(r, companion) ++ listInnerClasses(r)).distinct)
  }

  /** Sibling '/p/X$*.class' resources of '/p/X.class', via directory or jar
    * listing; Nil when the classpath entry kind can't be enumerated. */
  private def listInnerClasses(r: String): Seq[String] =
    try {
      val url = getClass.getResource(r)
      if (url == null) return Nil
      val slash = r.lastIndexOf('/')
      val pkgDir = r.substring(0, slash + 1) // '/p/'
      val prefix = r.substring(slash + 1).stripSuffix(".class") + "$" // 'X$'
      val names: Seq[String] = url.getProtocol match {
        case "file" =>
          val parent = new java.io.File(url.toURI).getParentFile
          Option(parent.list()).map(_.toSeq).getOrElse(Nil)
        case "jar" =>
          val conn = url.openConnection()
            .asInstanceOf[java.net.JarURLConnection]
          val jar = conn.getJarFile
          val entryPrefix = pkgDir.stripPrefix("/")
          import scala.jdk.CollectionConverters._
          jar.entries().asScala.toSeq.map(_.getName)
            .filter(n => n.startsWith(entryPrefix) &&
              n.indexOf('/', entryPrefix.length) < 0)
            .map(_.substring(entryPrefix.length))
        case _ => Nil
      }
      names
        .filter(n => n.startsWith(prefix) && n.endsWith(".class"))
        .sorted
        .map(pkgDir + _)
    } catch { case _: Throwable => Nil }

  private def readSmall(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](
          math.min(fs.getFileStatus(p).getLen, 64L * 1024).toInt)
        in.readFully(0L, bytes)
        Some(new String(bytes, "UTF-8"))
      } finally in.close()
    } catch { case _: Throwable => None }

  private def writeSmall(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true) // single-object PUT; last writer wins
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The committed payload directory under `fpDir`, or None. A resolved
    * attempt exists and was fully written before its pointer (commit
    * order), so readers never see a partial payload. */
  def resolve(fs: FileSystem, fpDir: Path): Option[Path] =
    readSmall(fs, new Path(fpDir, "_COMMITTED")).flatMap { name =>
      val att = new Path(fpDir, name.trim)
      if (try fs.exists(att) catch { case _: Throwable => false }) Some(att)
      else None
    }

  /** Publish a payload for `fpDir`: payload → input tag → pointer. The
    * `write` callback fills a fresh attempt directory (e.g. a parquet
    * write); only after it returns does the pointer PUT make the artifact
    * visible. Returns the committed payload dir (re-resolved, so a lost
    * benign race still returns the winner's valid attempt). */
  def publish(fs: FileSystem, fpDir: Path, inputTag: String)(
      write: Path => Unit): Option[Path] = {
    val attempt = new Path(fpDir,
      "attempt-" + java.util.UUID.randomUUID().toString)
    fs.mkdirs(attempt)
    write(attempt)
    writeSmall(fs, new Path(fpDir, "_graft_input"), inputTag)
    writeSmall(fs, new Path(fpDir, "_COMMITTED"), attempt.getName)
    if (sys.env.contains("GRAFT_ARTIFACT_DEBUG") || sys.props.contains("graft.artifact.debug"))
      System.err.println(s"[artifact-publish] $fpDir tag=$inputTag")
    published.incrementAndGet()
    resolve(fs, fpDir)
  }

  /** Delete artifacts under `root` tagged with the same input but a
    * different (superseded) fingerprint — older build, regenerated data.
    * Grace-period guarded: entries modified within [[pruneGraceMs]] are
    * skipped, so concurrent readers (other JVMs, lazily-planned
    * DataFrames) don't lose their files mid-scan; the next publish sweeps
    * them once they age out. */
  def pruneSuperseded(fs: FileSystem, root: Path, inputTag: String,
      keep: String): Unit = {
    val cutoff = System.currentTimeMillis() - pruneGraceMs
    val entries =
      try fs.listStatus(root) catch { case _: Throwable => return }
    entries.foreach { e =>
      if (e.isDirectory && e.getPath.getName != keep &&
        e.getModificationTime < cutoff &&
        readSmall(fs, new Path(e.getPath, "_graft_input"))
          .contains(inputTag)) {
        try { fs.delete(e.getPath, true); () }
        catch { case _: Throwable => () }
      }
    }
  }

  /** Full garbage sweep of one artifact store root — what the publish-time
    * prunes can't reach, unified behind the one grace rule
    * ([[pruneGraceMs]]) for `graft.Vacuum`:
    *
    *  1. UNCOMMITTED fingerprint dirs (no `_COMMITTED` pointer — a crashed
    *     or still-racing publish; grace protects the racer);
    *  2. LOSER ATTEMPTS inside committed dirs (`attempt-*` not named by
    *     the pointer — the benign-race leftovers the commit protocol
    *     deliberately abandons);
    *  3. legacy SELF-TAGGED dirs ([[pruneLegacySelfTagged]] semantics);
    *  4. SUPERSEDED same-input dirs: several committed fingerprints
    *     carrying one `_graft_input` tag can only be code-stamp rotations
    *     of the same artifact — keep the newest-modified, sweep the rest
    *     (the publish-time [[pruneSuperseded]] applied store-wide, and
    *     strictly more conservative: it never deletes the newest).
    *
    * Never touches a committed payload a reader could still resolve:
    * deletion targets are pointerless, pointer-abandoned, or pointer-
    * superseded, and all of it grace-guarded. Returns (dirs deleted,
    * bytes reclaimed). */
  def vacuumStore(fs: FileSystem, root: Path): (Long, Long) = {
    val cutoff = System.currentTimeMillis() - pruneGraceMs
    var dirs = 0L
    var bytes = 0L
    def del(p: Path): Unit = {
      val b = try fs.getContentSummary(p).getLength
        catch { case _: Throwable => 0L }
      try if (fs.delete(p, true)) { dirs += 1; bytes += b }
      catch { case _: Throwable => () }
    }
    val entries =
      try fs.listStatus(root).filter(_.isDirectory)
      catch { case _: Throwable => return (0L, 0L) }
    entries.foreach { e =>
      if (e.getModificationTime < cutoff) resolve(fs, e.getPath) match {
        case None => del(e.getPath) // rule 1
        case Some(att) => // rule 2
          try fs.listStatus(e.getPath).foreach { a =>
            if (a.isDirectory && a.getPath.getName.startsWith("attempt-") &&
              a.getPath.getName != att.getName &&
              a.getModificationTime < cutoff) del(a.getPath)
          } catch { case _: Throwable => () }
      }
    }
    val live =
      try fs.listStatus(root).filter(_.isDirectory)
      catch { case _: Throwable => return (dirs, bytes) }
    val tagged = live.flatMap { e =>
      readSmall(fs, new Path(e.getPath, "_graft_input"))
        .map(t => (e, t.trim))
    }
    tagged.foreach { case (e, t) => // rule 3
      if (t == e.getPath.getName && e.getModificationTime < cutoff)
        del(e.getPath)
    }
    tagged.groupBy(_._2).foreach { case (_, group) => // rule 4
      val committed = group.filter { case (e, t) =>
        t != e.getPath.getName && resolve(fs, e.getPath).isDefined
      }
      if (committed.size > 1) {
        val keep = committed.maxBy(_._1.getModificationTime)._1.getPath
        committed.foreach { case (e, _) =>
          if (e.getPath != keep && e.getModificationTime < cutoff)
            del(e.getPath)
        }
      }
    }
    (dirs, bytes)
  }

  /** One-shot migration sweep: delete artifact dirs whose `_graft_input`
    * equals their OWN directory name — the pre-round-13 [[ModelCache]]
    * self-tagging bug, under which [[pruneSuperseded]] was provably a
    * no-op (the only dir tagged `f` was `f` itself) and every fingerprint
    * rotation leaked its model dir forever. Current publishers tag with a
    * STABLE input identity distinct from the fingerprint, so a self-tagged
    * dir can only be a legacy leak. Grace-period guarded like
    * [[pruneSuperseded]]. */
  def pruneLegacySelfTagged(fs: FileSystem, root: Path): Unit = {
    val cutoff = System.currentTimeMillis() - pruneGraceMs
    val entries =
      try fs.listStatus(root) catch { case _: Throwable => return }
    entries.foreach { e =>
      if (e.isDirectory && e.getModificationTime < cutoff &&
        readSmall(fs, new Path(e.getPath, "_graft_input"))
          .contains(e.getPath.getName)) {
        try { fs.delete(e.getPath, true); () }
        catch { case _: Throwable => () }
      }
    }
  }
}
