package graft

import org.apache.spark.sql.SparkSession

/** Managed cold-start: resolve-or-publish every [[operators.ArtifactStore]]
  * artifact for an SF dir BEFORE anything timed runs.
  *
  * Why this exists (round-12 post-mortem): a fresh checkout — or a code
  * change that rotates cache fingerprints — pays ~60 s of one-time model /
  * pair-table / tokenizer training inside whatever run happens first. When
  * that run is a timed benchmark on a degraded host, the republish cost
  * masquerades as a 2× suite regression. This entry point makes cold-start
  * an explicit, measured phase: [[Bench]] invokes it before its sentinel
  * and timed passes and reports `artifacts_published` + `warm_secs` in the
  * bench JSON, so a cold run is self-labeling and republish cost can never
  * land inside a timed iteration.
  *
  * The artifact inventory:
  *  - [[operators.PairCache]] — the verified near-dup pair table;
  *  - [[operators.CcCache]] — duplicate-cluster component labels;
  *  - [[operators.SemCache]] — semantic (embedding-space) cluster labels;
  *  - [[operators.ManifestCache]] — q161's per-doc stage-signal table;
  *  - [[operators.BpeCache]] — the trained BPE tokenizer;
  *  - [[operators.UnigramCache]] — the trained unigram-LM tokenizer;
  *  - [[operators.WpCache]] — the trained WordPiece tokenizer;
  *  - [[operators.LmCache]] — the q153 reference bigram LM;
  *  - [[operators.ModelCache]] — trained quantizer centroid models,
  *    published as a side effect of running each model-training query's
  *    plan once (the exact keys are (input × canonical plan × params)
  *    tuples, so the queries themselves are the only complete enumeration).
  *
  * Idempotent: against a warm store everything resolves and nothing is
  * published (`artifacts_published` = 0). Also performs the one-shot
  * legacy sweep of self-tagged model dirs (the round-12 prune-no-op bug).
  */
object Warm {

  /** The embedding-model family — every query whose plan trains (and so
    * publishes) a [[operators.ModelCache]] quantizer, plus the cache
    * consumers that share those keys. Running each once materializes every
    * model key the bench suite will touch. */
  private[graft] val ModelQueries = Seq(
    "q24_ann_lsh", "q40_ann_ivf", "q48_ann_kmeans_ivf", "q64_ann_int8",
    "q68_ann_pq", "q73_semantic_dedup", "q81_semantic_contamination",
    "q93_embedding_outliers", "q101_contam_blocked", "q117_ann_recall")

  /** Resolve-or-publish every artifact for `dir`. Returns
    * (artifacts published, wall-clock seconds). Failures in any single
    * producer are contained — warming must never fail a bench run. */
  def run(spark: SparkSession, dir: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val before = operators.ArtifactStore.published.get()
    operators.ModelCache.sweepLegacy(spark) // one-shot r12-leak hygiene
    // Path-tagged caches publish inline on resolve-miss; no action needed
    // beyond the call. Each guarded: a cold store with a broken producer
    // should surface in the (gated) queries, not kill the warm phase.
    def guard(body: => Any): Unit =
      try { body; () } catch { case _: Throwable => () }
    guard(operators.PairCache.pairStats(spark, dir))
    guard(operators.SimPairCache.stats(spark, dir))
    guard(operators.CcCache.components(spark, dir))
    guard(operators.SemCache.components(spark, dir))
    guard(operators.BpeCache.trained(spark, dir))
    guard(operators.UnigramCache.pieces(spark, dir))
    guard(operators.LmCache.counts(spark, dir))
    guard(operators.WpCache.trained(spark, dir))
    // depends on LmCache + CcCache above: warm those first, then the
    // composed per-doc signal table
    guard(operators.ManifestCache.flags(spark, dir).count())
    // streaming-twin replay artifacts (q168-q170): multi-epoch stream
    // runs, by far the costliest cold publishes — must never land
    // inside a timed iteration
    guard(streaming.Replay.manifestFlags(spark, dir).count())
    guard(streaming.Replay.scd2Segments(spark, dir).count())
    guard(streaming.Replay.dedupMatches(spark, dir).count())
    // Model tier: execute each training query's plan once — ModelCache
    // publishes on the memo/disk miss inside the plan build; count()
    // forces plans whose training is lazy in the action.
    ModelQueries.foreach { q =>
      SparkEntry.queries.get(q).foreach(fn => guard(fn(spark, dir).count()))
    }
    val published = operators.ArtifactStore.published.get() - before
    (published, (System.nanoTime() - t0) / 1e9)
  }

  /** CLI: `runMain graft.Warm [sfDir]` — warms the store for the dir (or
    * SPARK_GRAFT_SF_DIR) and prints one JSON status line. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (published, secs) = run(spark, sfDir)
    println(String.format(java.util.Locale.ROOT,
      """{"warmed":"%s","artifacts_published":%d,"warm_secs":%.3f}""",
      sfDir, Long.box(published), Double.box(secs)))
    spark.stop()
  }
}
