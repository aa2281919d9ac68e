package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The materialized near-dup pair artifact must be a pure cache: every
  * consumer reads EXACTLY what the uncached pipeline computes — same rows,
  * same doubles, bit for bit — and disabling the conf restores the
  * pre-artifact compute path. */
class PairCacheSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def withCache[A](on: Boolean)(body: => A): A =
    try {
      spark.conf.set("spark.graft.paircache", on.toString)
      body
    } finally spark.conf.unset("spark.graft.paircache")

  test("q19 pairs: cached artifact identical to the computed pipeline") {
    val computed = withCache(on = false) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    val cached = withCache(on = true) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(computed.nonEmpty, "fixture must contain near-dup pairs")
    // exact double equality: the artifact stores the verified stats, not
    // re-derived approximations — jaccard must match bit for bit
    assert(cached == computed)
    // second read must come from the published artifact and still agree
    val again = withCache(on = true) {
      Dedup.nearDupPairs(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    assert(again == computed)
  }

  test("publishing prunes superseded artifacts for the same input") {
    import java.io.File
    val root = new File(sys.props("java.io.tmpdir"), "graft-paircache")
    def deleteRec(f: File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
      f.delete(); ()
    }
    val want = new File(sfDir).getCanonicalPath
    def entriesFor(input: String) =
      Option(root.listFiles()).getOrElse(Array.empty[File]).filter { e =>
        val t = new File(e, "_graft_input")
        t.exists() &&
          (try java.nio.file.Files.readString(t.toPath) == input
          catch { case _: Throwable => false })
      }
    // materialize, then plant a stale sibling claiming the same input
    withCache(on = true)(Dedup.nearDupPairs(spark, sfDir).count())
    assert(entriesFor(want).nonEmpty)
    val stale = new File(root, "deadbeef-stale-spec")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new File(stale, "_graft_input").toPath, want)
    java.nio.file.Files.writeString(new File(stale, "_SUCCESS").toPath, "")
    // force a fresh publish (remove the real artifact) — publishing must
    // sweep the superseded sibling
    entriesFor(want).filterNot(_ == stale).foreach(deleteRec)
    withCache(on = true)(Dedup.nearDupPairs(spark, sfDir).count())
    assert(!stale.exists(), "stale artifact must be pruned at publish")
    assert(entriesFor(want).nonEmpty)
  }

  test("q83 containment: cached artifact identical to the computed pipeline") {
    def run() = Dedup.q83Containment.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val computed = withCache(on = false)(run())
    val cached = withCache(on = true)(run())
    assert(computed.nonEmpty)
    assert(cached == computed)
  }
}
