package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.ArtifactStore

/** Unified store vacuum — ONE entry point sweeping every artifact store
  * the engine maintains (model / pair / cc / sem / manifest / bpe /
  * unigram / lm / wp) plus any
  * [[graft.streaming.LayoutStream]] tables passed as arguments, all under
  * the one shared grace rule ([[ArtifactStore.pruneGraceMs]]). Before
  * this, each store swept only at its own publish time
  * (`pruneSuperseded`) and layout tables had their own `vacuum` — crashed
  * publishes, benign-race loser attempts, and stores that simply stopped
  * being written leaked forever.
  *
  * Deletes ONLY unreferenced garbage (VacuumSpec proves the committed,
  * resolvable artifacts survive byte-identical): uncommitted fingerprint
  * dirs, pointer-abandoned attempts, legacy self-tagged dirs, superseded
  * same-input fingerprints, superseded layout generations and covered
  * delta slices. Correctness never depends on the deletes — readers
  * resolve pointers — so it can run any time; the grace window protects
  * concurrent JVMs mid-plan.
  *
  * Usage: `sbt "runMain graft.Vacuum [layoutTableDir ...]"`. Prints one
  * report line per store: name, dirs removed, bytes reclaimed. */
object Vacuum {

  /** The artifact store roots, honoring each cache's own prop/env
    * overrides (same resolution order as the caches themselves). */
  def storeRoots: Seq[(String, String)] =
    Seq("modelcache", "paircache", "simpaircache", "cccache", "semcache",
      "manifestcache", "bpecache", "unigramcache", "lmcache",
      "wpcache").map { n =>
      n -> sys.props.get(s"graft.$n.dir")
        .orElse(sys.env.get("SPARK_GRAFT_" + n.toUpperCase + "_DIR"))
        .getOrElse(sys.props("java.io.tmpdir") + s"/graft-$n")
    }

  /** Sweep everything; returns (store, dirs_removed, bytes_reclaimed)
    * per store plus one row per layout table. */
  def run(spark: SparkSession,
      layoutTables: Seq[String] = Seq.empty): Seq[(String, Long, Long)] = {
    val storeRows = storeRoots.map { case (name, dir) =>
      val p = new Path(dir)
      val fs = ArtifactStore.fileSystem(spark, p)
      val (d, b) = ArtifactStore.vacuumStore(fs, p)
      (name, d, b)
    }
    val layoutRows = layoutTables.map { t =>
      val (gens, slices) = graft.streaming.LayoutStream.vacuum(spark, t)
      (s"layout:$t", gens + slices, -1L) // LayoutStream counts dirs only
    }
    // in-session retained caches (not on-disk stores): the manifest
    // build's positioned-shingle table
    val retainedRows = Seq(("retained:manifest-shingles",
      if (graft.operators.CorpusBuild.releaseRetained()) 1L else 0L, -1L))
    storeRows ++ layoutRows ++ retainedRows
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args.toSeq).foreach { case (store, d, b) =>
      println(f"[vacuum] $store%-24s dirs_removed=$d%-6d bytes=$b")
    }
    spark.stop()
  }
}
