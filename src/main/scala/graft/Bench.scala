package graft
import org.apache.spark.sql.SparkSession
/** Headline benchmark: times every `SparkEntry.queries` entry at the SF
  * pointed to by SPARK_GRAFT_SF_DIR and emits ONE machine-readable JSON
  * line. Per-query numbers are the MIN over `SPARK_GRAFT_BENCH_ITERS`
  * timed iterations (default 3) — run-to-run swing on a busy host is
  * ±50%, so a single-shot number is noise, not signal. The same JSON is
  * also written to `bench_reading.json` (or SPARK_GRAFT_BENCH_OUT) so the
  * perf gate never depends on stdout scraping surviving sbt's logger.
  *
  * The RAW reading is deliberately written to a different file than the
  * committed floor (`bench_result.json`): rounds 14-16 each lost the floor
  * to a snapshot commit that picked up a degraded raw reading written over
  * it. The floor is now only ever updated by `tools/fold_floor.py`, which
  * min-merges per-query values (monotone — a fold can never regress the
  * floor) from a reading file into `bench_result.json`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_reading.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // The suite's ~90 queries generate several hundred whole-stage-codegen
      // fragments per pass; the default 100-entry LRU cache thrashes on that
      // cyclic access pattern (0% cross-iteration reuse), so every timed
      // iteration re-pays serial driver-side Janino compiles. Size the cache
      // to hold the whole suite — the warmup pass then compiles once and the
      // timed passes measure execution, not compilation.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // the engine's own extensions run in the benched path: native SQL
      // functions + the row_number<=k -> TopKPerKey optimizer rewrite
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup (JMH-style): run every query once at the smallest SF so
    // JIT and the whole-stage-codegen compile cache are hot before timing.
    // The timed pass reads different data — no results are reused, every
    // timed plan still executes from scratch.
    Tables.names.foreach { n =>
      try Tables(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    // Managed cold-start (round-12 post-mortem): resolve-or-publish every
    // ArtifactStore artifact BEFORE any sentinel/timed pass, and measure
    // it. An artifact-cold run (fresh checkout, rotated fingerprints)
    // self-labels via artifacts_published/warm_secs in the JSON instead of
    // republish cost masquerading as a timed-suite regression.
    val (artifactsPublished, warmSecs) =
      try Warm.run(spark, sfDir) catch { case _: Throwable => (-1L, -1.0) }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // Second untimed pass at the TARGET SF: AQE replans at real data sizes,
    // so the sf0.001 pass compiles different post-shuffle plans than the
    // measured ones — without this pass, iteration 1 of every query pays
    // its sf-specific codegen + JIT and min-of-3 never reaches the floor
    // (measured: q19 min-of-3 4.5 s cold vs 0.93 s floor on the same host).
    // A few queries' fragment-heavy codegen (NGram/vector folds) JITs in
    // monotonically over several executions (BENCH_GATE.txt addendum:
    // q82-class queries need >3 runs to reach their floor when fragments
    // land cold) — give those extra untimed target-SF repetitions so the
    // timed min measures execution, not warm-in.
    val extraWarm = Set("q82_span_dedup", "q83_containment")
    SparkEntry.queries.foreach { case (name, fn) =>
      val reps = if (extraWarm(name)) 3 else 1
      (1 to reps).foreach { _ =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    }
    // Host-epoch sentinel (round-11 verdict item 3): the same cheap fixed
    // query re-timed at suite start, middle, and end. A healthy host gives
    // three near-equal readings; a host degrading over the ~10-minute run
    // (the BENCH_r11 failure signature: positional quartile inflation
    // 1.18x -> 1.76x with zero code changes) shows up as sentinel_drift =
    // max/min >= ~1.3 — making a bad epoch self-diagnosing in the JSON
    // without a judge re-run. min-of-3 per reading: host degradation
    // inflates even the min; GC spikes don't.
    //
    // Each checkpoint is preceded by ONE untimed self-warm execution
    // (round-17): the first checkpoint runs immediately after the full-
    // suite warm pass, so its timed runs were absorbing the JVM's
    // accumulated allocation/GC debt rather than host state — measured
    // sentinel_secs [0.364, 0.195, 0.197, 0.195, 0.210, 0.211] on an
    // otherwise-FLAT epoch (floor-ratio segments 1.29-1.42, no positional
    // trend) read as drift 1.87 and self-invalidated three consecutive
    // epochs whose timed suite was uniformly healthy. The warm run is
    // applied at EVERY checkpoint, not just the first, so the instrument
    // stays symmetric: genuine host slowdown inflates the timed min at
    // any checkpoint regardless of a warm run before it (verified against
    // the r14 run-4 rising-segment epoch shape, which this would NOT have
    // rescued — its inflation was in the timed mins themselves).
    val sentinelName = "q01_pricing_summary"
    val sentinelTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def timeSentinel(): Unit =
      SparkEntry.queries.get(sentinelName).foreach { fn =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        val t = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        }.filter(_ >= 0)
        if (t.nonEmpty) sentinelTimes += t.min
      }
    val queriesSeq = SparkEntry.queries.toSeq
    // Sentinel cadence (round-13 verdict item 4): every ~40 queries, not
    // just start/mid/end — the q01 sentinel UNDERSAW intra-run
    // degradation (r11/r12: totals swung 1.24x while start/mid/end drift
    // read 1.07-1.28), and diagnosing the r13 driver reading needed
    // manual quartile forensics. Denser readings plus the per-segment
    // floor ratios below make a positionally-degrading epoch
    // self-invalidating in the JSON.
    val sentinelEvery = 40
    // One timed execution; -1 = failure (a crashing query must never
    // read as a fast one). Catch Throwable, not Exception: an OOM or
    // codegen LinkageError in one query must not lose the whole run.
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case t: Throwable =>
          System.err.println(s"[bench] $name failed: ${t.getMessage}")
          -1.0
      }
    }
    // Order-randomization mode (round-14 verdict item 7):
    // SPARK_GRAFT_BENCH_SHUFFLE=<seed> runs `iters` full SUITE passes,
    // each visiting the queries in a per-pass seeded shuffle, instead of
    // `iters` back-to-back executions per query. On a host whose speed
    // drifts over the ~10-minute run, consecutive min-of-3 pins each
    // query's reading to ONE point of the epoch — positional drift then
    // inflates whole suite segments and invalidates the epoch (the
    // r11/r14 signature). Shuffled passes give each query `iters`
    // samples spread ACROSS the epoch, so its min sees the host's best
    // window and per-query floors stay gradeable under drift. Default
    // off: the driver's consecutive protocol stays bit-compatible.
    val shuffleSeed: Option[Long] =
      sys.env.get("SPARK_GRAFT_BENCH_SHUFFLE").flatMap { s =>
        if (s.isEmpty || s == "false" || s == "0") None
        else scala.util.Try(s.toLong).toOption.orElse(Some(42L))
      }
    timeSentinel()
    val results: Seq[(String, Double)] = shuffleSeed match {
      case None =>
        // min-of-N: each iteration re-executes the full plan (count()
        // is never cached); the min strips GC/JIT/compaction noise.
        queriesSeq.zipWithIndex.map { case ((name, fn), i) =>
          if (i > 0 && i % sentinelEvery == 0) timeSentinel()
          val times = (1 to iters).map(_ => timeOne(name, fn))
          name -> (if (times.contains(-1.0)) -1.0 else times.min)
        }
      case Some(seed) =>
        val best = scala.collection.mutable.Map.empty[String, Double]
        val failed = scala.collection.mutable.Set.empty[String]
        (1 to iters).foreach { pass =>
          val rng = new scala.util.Random(seed + pass)
          val order = rng.shuffle(queriesSeq)
          order.zipWithIndex.foreach { case ((name, fn), i) =>
            if (i > 0 && i % sentinelEvery == 0) timeSentinel()
            val t = timeOne(name, fn)
            if (t < 0) { failed += name; () }
            else best(name) =
              math.min(best.getOrElse(name, Double.MaxValue), t)
          }
          if (pass < iters) timeSentinel() // pass boundary reading
        }
        // emit in suite order so segments/diagnostics stay comparable
        queriesSeq.map { case (name, _) =>
          name -> (if (failed(name)) -1.0
            else best.getOrElse(name, -1.0))
        }
    }
    timeSentinel()
    val sentinelDrift =
      if (sentinelTimes.size >= 2 && sentinelTimes.min > 0)
        sentinelTimes.max / sentinelTimes.min
      else -1.0
    // Second self-diagnostic (round-12): the q01 sentinel catches a host
    // DEGRADING over the run but not a localized noise burst (observed:
    // one run's q71/q74/q111 at 1.6-2.2x floor while its total was the
    // day's fastest and drift read 1.09). Compare each query against the
    // COMMITTED floor (read BEFORE outPath is overwritten below) with the
    // bench_gate bars; the outlier list makes "which queries to re-check"
    // explicit in the reading itself. Regex parse — the floor file is
    // this program's own single-line output, no JSON lib needed.
    val floors: Map[String, Double] = try {
      // default: the COMMITTED floor in the repo cwd (read before the
      // write below replaces it), not outPath — an overridden outPath
      // must not silently disable the diagnostic
      val floorPath =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FLOOR", "bench_result.json")
      val src = scala.io.Source.fromFile(floorPath)
      val text = try src.mkString finally src.close()
      val entry = "\"(q[0-9]+[a-z0-9_]*)\"\\s*:\\s*(-?[0-9.eE+]+)".r
      entry.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val floorOutliers: Seq[String] = results.collect {
      case (name, v) if v > 0 && floors.getOrElse(name, -1.0) > 0 &&
        v >= 1.5 * floors(name) &&
        v - floors(name) >= math.min(0.3, math.max(0.1, floors(name))) =>
        name
    }
    // Per-SEGMENT floor-ratio medians — the positional-drift diagnostic:
    // median(current / committed floor) over each run of `sentinelEvery`
    // queries in suite order. A healthy epoch is FLAT (any uniform
    // inflation is host speed, not position); the r11 bad-epoch signature
    // (quartile medians 1.18x -> 1.76x, host degrading over the run)
    // shows up as a rising tail, and bench_gate.py invalidates on
    // max/min >= the drift bar. Medians, not means: one artifact-cold or
    // GC-hit query must not fake a degraded segment.
    val floorRatioSegments: Seq[Double] = results
      .map { case (name, v) =>
        val f = floors.getOrElse(name, -1.0)
        if (v > 0 && f > 0) v / f else -1.0
      }
      .grouped(sentinelEvery)
      .map { seg =>
        val valid = seg.filter(_ > 0).sorted
        if (valid.isEmpty) -1.0
        else if (valid.size % 2 == 1) valid(valid.size / 2)
        else (valid(valid.size / 2 - 1) + valid(valid.size / 2)) / 2.0
      }
      .toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Total sums SUCCESSFUL queries only: a -1 failure sentinel must not
    // subtract from (i.e. flatter) the total. `failed` lists the failures
    // explicitly so a partial run is never compared 1:1 against a full one.
    val failedNames = results.collect { case (k, v) if v < 0 => k }.toSeq
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sentinelJson = sentinelTimes.map(t =>
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(t)))
      .mkString("[", ",", "]")
    val driftStr =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(sentinelDrift))
    val outliersJson = floorOutliers.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val warmSecsStr =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(warmSecs))
    val segsJson = floorRatioSegments.map(r =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(r)))
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","n":$iters,"failed":$failedJson,"sentinel":"$sentinelName","sentinel_secs":$sentinelJson,"sentinel_drift":$driftStr,"floor_outliers":$outliersJson,"floor_ratio_segments":$segsJson,"artifacts_published":$artifactsPublished,"warm_secs":$warmSecsStr,"queries":$qs,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter(outPath)
      try w.println(json) finally w.close()
    } catch { case _: Throwable => () } // full-precision file for humans/tools
    // The driver keeps only a ~3 KB TAIL of stdout and parses the JSON
    // line out of it. The r03 failure was the verbose line not being
    // last; the r14-r17 failure was the 167-entry per-query map (even
    // with qNN keys) outgrowing the window so the FRONT of the line was
    // truncated and the fragment didn't parse. Emit a SUMMARY-ONLY line
    // — total, counts, drift, outliers, segment ratios, and the path to
    // the full-precision reading — capped well under 1 KB (BenchSpec
    // pins the budget); the 167-entry map lives only in
    // bench_reading.json / bench_result.json.
    println(Bench.compactLine(results, iters, floorOutliers, segsJson,
      artifactsPublished, warmSecsStr, driftStr, outPath, sfDir))
    spark.stop()
  }

  /** A small FIXED flagship subset for the stdout line's "queries" map —
    * one representative per major family, enough for a human skimming
    * the driver artifact; the full per-query map is in the reading
    * file. Fixed so the line's size is schedule-independent. */
  private[graft] val headlineNames: Seq[String] = Seq(
    "q01_pricing_summary", "q02_topk_customers", "q12_windowed_agg",
    "q19_dedup_minhash_lsh", "q23_ann_bruteforce", "q112_quality_funnel",
    "q135_bpe_train_pipeline", "q161_corpus_manifest")

  /** The single machine-readable stdout line. Pure so BenchSpec can pin
    * the two properties the driver's tail-capture needs: the line parses
    * as JSON and stays < 1 KB even with every diagnostic field at its
    * worst-case width (167 queries, 5 segments, outliers capped at 5).
    * Locale.ROOT: the default-locale f-interpolator writes "0,123" under
    * a comma-decimal locale, silently breaking the driver's JSON parse. */
  private[graft] def compactLine(
      results: Seq[(String, Double)],
      iters: Int,
      floorOutliers: Seq[String],
      segsJson: String,
      artifactsPublished: Long,
      warmSecsStr: String,
      driftStr: String,
      outPath: String,
      sfDir: String): String = {
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val nFailed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val byName = results.toMap
    val qsShort = headlineNames.flatMap { n =>
      byName.get(n).map(v =>
        "\"" + n.takeWhile(_ != '_') + "\":" + (if (v < 0) "-1" else f3(v)))
    }.mkString("{", ",", "}")
    val outliersShort = floorOutliers.take(5)
      .map(n => "\"" + n.takeWhile(_ != '_') + "\"").mkString("[", ",", "]")
    s"""{"metric":"total","value":${f3(total)},"unit":"sec","n":$iters,"nq":${results.size},"nfailed":$nFailed,"sentinel_drift":$driftStr,"n_floor_outliers":${floorOutliers.size},"floor_outliers":$outliersShort,"floor_ratio_segments":$segsJson,"artifacts_published":$artifactsPublished,"warm_secs":$warmSecsStr,"queries":$qsShort,"reading":"$outPath","sf":"$sfDir"}"""
  }
}
