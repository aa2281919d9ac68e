package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Data-recipe planning operators — the steps a training-data pipeline runs
  * BETWEEN profiling (q76 datasheet, q112 funnel) and materialization (q66
  * resample, q80 quota sample, q84 shards): deriving the per-source token
  * allocation itself (q118), scoring documents against a target distribution
  * for importance resampling (q119, the DSIR recipe of Xie et al. 2023), and
  * robust local fingerprinting for overlap detection (q120, the winnowing
  * scheme of Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm).
  *
  * Reference scope: the reference has no corpus tooling at all (its closest
  * analog is the static table list in init-db/init.sql:9-110); this module
  * is part of the LLM-pipeline tier the builder prompt makes first-class.
  *
  * Determinism: every compared value is either an exact integer (counts,
  * integer scaled-ratio scores, 60-bit md5 hashes) or an integer division
  * both engines floor identically — negative numerators are shifted
  * non-negative before dividing, because Spark's `div` truncates toward
  * zero while DuckDB's `//` floors, and the two differ exactly on negative
  * operands.
  */
object Recipe {

  import Mirror._

  /** Budget divisor: the recipe targets half of the corpus' tokens. */
  private val BudgetDiv = 2L

  /** q118: token-budget waterfill — derive the per-source allocation a
    * data recipe starts from. Given the per-source token inventory and a
    * global budget (half the corpus), each source gets an equal quota,
    * capped at what it actually has; the leftover budget from saturated
    * (small) sources is redistributed equally to the sources with capacity
    * remaining. One redistribution round, all integer arithmetic:
    * `epochs_pm` (allocated per-mille of available — >1000 would mean
    * repetition) is exact and engine-identical.
    *
    * This PLANS the mixture q66 (resample) and q80 (quota sample) then
    * APPLY — upstream of both, and the piece that was missing.
    *
    * Shape at scale: one corpus scan collapses to a per-source rollup
    * (map-side partial sums; thousands of rows at 100 TB, not billions) —
    * the empty-partition windows that follow run on that TINY relation
    * only, which is exactly when a single-partition window is correct.
    * Nothing corpus-sized ever moves to one task. */
  val q118TokenWaterfill = QueryDef(
    "q118_token_waterfill",
    s"""WITH a AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
       |  FROM documents GROUP BY source),
       |t AS (SELECT source, avail,
       |    CAST(SUM(avail) OVER () AS BIGINT) AS total,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS nsrc
       |  FROM a),
       |q AS (SELECT *, (total // $BudgetDiv) // nsrc AS quota FROM t),
       |s1 AS (SELECT *, LEAST(avail, quota) AS alloc1 FROM q),
       |s2 AS (SELECT *,
       |    (total // $BudgetDiv) - CAST(SUM(alloc1) OVER () AS BIGINT)
       |      AS leftover,
       |    CAST(SUM(CASE WHEN avail > alloc1 THEN 1 ELSE 0 END) OVER ()
       |      AS BIGINT) AS nunsat
       |  FROM s1),
       |s3 AS (SELECT *,
       |    CASE WHEN avail > alloc1
       |         THEN leftover // GREATEST(nunsat, 1) ELSE 0 END AS bonus
       |  FROM s2)
       |SELECT source, avail AS avail_tokens, quota,
       |  LEAST(avail, alloc1 + bonus) AS alloc_tokens,
       |  (LEAST(avail, alloc1 + bonus) * 1000) // GREATEST(avail, 1)
       |    AS epochs_pm,
       |  avail <= quota AS saturated
       |FROM s3
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    // Empty-partition window over the per-source rollup: tiny by
    // construction (see scaladoc), so "all data to a single partition" is
    // a few KB, not a skew hazard.
    val wAll = Window.partitionBy()
    Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(words(col("text"))).cast(LongType)).as("avail"))
      .withColumn("total", sum(col("avail")).over(wAll))
      .withColumn("nsrc", count(lit(1)).over(wAll))
      .withColumn("budget", expr(s"total div $BudgetDiv"))
      .withColumn("quota", expr("budget div nsrc"))
      .withColumn("alloc1", least(col("avail"), col("quota")))
      .withColumn("leftover", col("budget") - sum(col("alloc1")).over(wAll))
      .withColumn("nunsat",
        sum(when(col("avail") > col("alloc1"), 1L).otherwise(0L)).over(wAll))
      .withColumn("bonus",
        when(col("avail") > col("alloc1"),
          expr("leftover div greatest(nunsat, 1L)")).otherwise(lit(0L)))
      .withColumn("alloc_tokens",
        least(col("avail"), col("alloc1") + col("bonus")))
      .select(col("source"), col("avail").as("avail_tokens"), col("quota"),
        col("alloc_tokens"),
        expr("(alloc_tokens * 1000) div greatest(avail, 1L)").as("epochs_pm"),
        (col("avail") <= col("quota")).as("saturated"))
      .orderBy(col("source"))
  }

  /** Feature-space width for the DSIR importance hash (hashed unigrams). */
  private val DsirBuckets = 512

  /** Integer probability scale: per-bucket probabilities live in
    * parts-per-million, so scores are exact BIGINTs in both engines. */
  private val DsirScale = 1000000L

  /** The "target distribution" documents: English — the stand-in for the
    * high-quality reference corpus DSIR reweights toward. */
  private val DsirTargetLang = "en"

  /** q119: DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") — score every document
    * by how much its hashed-unigram feature distribution looks like a
    * TARGET corpus (here: the `en` slice) versus the RAW corpus, then
    * report the score distribution per (source, lang). Real DSIR uses
    * log-probability ratios; log() is not bit-reproducible across libm
    * implementations, so this engine uses the integer surrogate
    * `ppm(target) - ppm(raw)` per feature — the same sign and ordering
    * semantics (positive = target-like), exactly representable, and
    * therefore oracle-exact.
    *
    * Shape at scale: one exploded pass collapses to [[DsirBuckets]] rows
    * via map-side partial aggregation (the shuffle moves buckets×tasks
    * rows, not tokens). The 512-row score table is BOUNDED MODEL STATE —
    * collected to the driver (the IVF-centroid precedent) and re-broadcast
    * as an array literal, so per-doc scoring is a NARROW fold over the
    * token array: zero corpus-scale shuffles until the tiny per-(source,
    * lang) rollup. Driver-side score arithmetic is BigInt — at 100 TB
    * `count × 10⁶` overflows signed 64-bit, and DuckDB's HUGEINT would
    * floor correctly while a Long would wrap.
    *
    * Per-token normalization `imp div n` shifts the numerator non-negative
    * first (`(imp + n·Scale) div n − Scale`): per-token scores are ≥
    * −Scale, so the shifted numerator is ≥ 0 and truncation equals floor
    * in both engines. */
  /** DuckDB CTE chain computing per-doc DSIR importance — `p` yields
    * (doc_id, source, lang, n, imp_pt). Shared by the score report
    * (q119) and the importance-proportional sampler (q125). */
  private val sqlDsirDoc: String =
    s"""tok AS (
       |  SELECT doc_id, source, lang,
       |    ${sqlHash60("w")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, source, lang,
       |          unnest(string_split(text, ' ')) AS w
       |        FROM documents)),
       |tot AS (SELECT
       |    GREATEST(CAST(SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1
       |                           ELSE 0 END) AS BIGINT), 1) AS tt,
       |    GREATEST(COUNT(*), 1) AS tr
       |  FROM tok),
       |sc AS (SELECT b,
       |    CAST(SUM(CASE WHEN lang = '$DsirTargetLang' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ct,
       |    COUNT(*) AS cr
       |  FROM tok GROUP BY b),
       |s AS (SELECT b,
       |    (ct * $DsirScale) // tt - (cr * $DsirScale) // tr AS score
       |  FROM sc, tot),
       |d AS (SELECT t.doc_id, t.source, t.lang,
       |    CAST(SUM(s.score) AS BIGINT) AS imp, COUNT(*) AS n
       |  FROM tok t JOIN s USING (b)
       |  GROUP BY t.doc_id, t.source, t.lang),
       |p AS (SELECT doc_id, source, lang, n,
       |    (imp + n * $DsirScale) // n - $DsirScale AS imp_pt
       |  FROM d)""".stripMargin

  val q119DsirImportance = QueryDef(
    "q119_dsir_importance",
    s"""WITH $sqlDsirDoc
       |SELECT source, lang, COUNT(*) AS docs,
       |  CAST(SUM(imp_pt) AS BIGINT) AS sum_imp_pt,
       |  CAST(MIN(imp_pt) AS BIGINT) AS min_imp_pt,
       |  CAST(MAX(imp_pt) AS BIGINT) AS max_imp_pt,
       |  CAST(SUM(CASE WHEN imp_pt > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS target_like
       |FROM p
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    dsirReport(docs.withColumn("imp_pt", dsirImpPt(dsirModel(docs))))
  }

  /** Train the DSIR score model: per hashed-unigram bucket, the integer
    * ppm(target) − ppm(raw) score, from the given REFERENCE corpus.
    * Bounded model state: ≤ [[DsirBuckets]] rows collected, independent
    * of corpus size (the IVF-centroid precedent); BigInt arithmetic
    * because count × 10⁶ overflows int64 at 100 TB. Shared by the batch
    * query (q119) and the streaming scorer
    * ([[graft.streaming.DsirStream]]). */
  private[graft] def dsirModel(reference: DataFrame): Array[Long] = {
    val tok = reference.select(col("lang"),
      explode(words(col("text"))).as("w"))
      .select(col("lang"),
        pmod(hash60(col("w")), lit(DsirBuckets.toLong)).as("b"))
    val counts = tok.groupBy(col("b")).agg(
      sum(when(col("lang") === DsirTargetLang, 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val rows = counts.collect()
    val totT = math.max(1L, rows.map(_.getAs[Long]("ct")).sum)
    val totR = math.max(1L, rows.map(_.getAs[Long]("cr")).sum)
    val score = Array.fill[Long](DsirBuckets)(0L)
    rows.foreach { r =>
      val b = r.getAs[Long]("b").toInt
      score(b) = ((BigInt(r.getAs[Long]("ct")) * DsirScale) / totT -
        (BigInt(r.getAs[Long]("cr")) * DsirScale) / totR).toLong
    }
    score
  }

  /** Integral division as a Column (Spark's `div` operator — truncating,
    * used here only on non-negative operands where truncation = floor). */
  private def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftshim.Bridge.expression(a),
        org.apache.spark.sql.graftshim.Bridge.expression(b),
        evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))

  /** Per-document importance (per-token, shifted-floor exact — see the
    * q119 scaladoc) over `text`, against a trained [[dsirModel]] riding
    * the plan as an array literal: a NARROW fold, no join, no shuffle. */
  private[graft] def dsirImpPt(model: Array[Long]): Column = {
    val scoreArr = typedLit(model.toSeq)
    let1(words(col("text"))) { w =>
      val imp = aggregate(w, lit(0L), (acc, t) =>
        acc + element_at(scoreArr,
          (pmod(hash60(t), lit(DsirBuckets.toLong)) + 1).cast(IntegerType)))
      val n = size(w).cast(LongType)
      intDiv(imp + n * DsirScale, n) - DsirScale
    }
  }

  /** Per-(source, lang) rollup of an `imp_pt` column — q119's report
    * shape, shared with the streaming scorer so per-epoch reports SUM to
    * the corpus report (counts and integer sums only). */
  private[graft] def dsirReport(scored: DataFrame): DataFrame =
    scored.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("imp_pt")).as("sum_imp_pt"),
        min(col("imp_pt")).as("min_imp_pt"),
        max(col("imp_pt")).as("max_imp_pt"),
        sum(when(col("imp_pt") > 0, 1L).otherwise(0L)).as("target_like"))
      .orderBy(col("source"), col("lang"))

  /** Winnowing window width: a fingerprint is guaranteed for every run of
    * [[WinnowW]] consecutive shingles, so any shared substring of
    * ≥ `WinnowW + 2` words is guaranteed to share a fingerprint. */
  private val WinnowW = 4

  /** Minimum shared fingerprints for a reported candidate pair. */
  private val WinnowMinShared = 2

  /** One (doc_id, nfp, fp) row per selected winnow fingerprint — the
    * sketch relation shared by the batch pair query (q120) and the
    * streaming ingest probe ([[graft.streaming.WinnowStream]]).
    *
    * let1-bound (see [[Mirror.let1]]): the shingle+hash array and the
    * fingerprint set are each evaluated ONCE per row — without the
    * binding, CollapseProject inlines the pipeline into downstream
    * references and the evaluator re-hashes the whole document per use
    * (measured 40×: 4 s for 500 docs at sf0.001). Window minima come
    * from the native [[graft.functions.SlidingMin]] monotonic-deque pass
    * — one O(n) scan instead of an array_min(slice(…)) allocation per
    * position, bit-identical values. The (fp, nfp) structs are emitted
    * INSIDE the binding and exploded immediately — Generate is a real
    * barrier, so the whole per-doc pipeline runs exactly once
    * (plan-pinned in RecipeSpec). */
  private[graft] def winnowEntries(docs: DataFrame): DataFrame = {
    val entries = let1(
      let1(transform(shingleGen(col("text")), s => hash60(s))) { sh =>
        when(size(sh) >= WinnowW,
          array_distinct(
            graft.functions.SlidingMin.mins(sh, WinnowW)))
          .otherwise(array(array_min(sh)))
      }) { fps =>
      transform(fps, f =>
        struct(f.as("fp"), size(fps).cast(LongType).as("n")))
    }
    docs.select(col("doc_id"), explode(entries).as("x"))
      .select(col("doc_id"), col("x.n").as("nfp"), col("x.fp").as("fp"))
  }

  /** One-sided winnow probe: every probe doc against a PRECOMPUTED
    * fingerprint index (the [[Dedup.incrementalMatchesPre]] shape) —
    * index buckets capped per fingerprint at probe time ordered by
    * doc_id, so an index maintained by appending equals a from-scratch
    * rebuild. Returns (doc_id, matched_id, shared_fps, nfp_a, nfp_b),
    * shared ≥ [[WinnowMinShared]]. */
  private[graft] def winnowMatches(probe: DataFrame, index: DataFrame)
      : DataFrame = {
    val capW = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val base = index
      .withColumn("rn", row_number().over(capW))
      .filter(col("rn") <= Buckets.MaxBucket)
      .select(col("doc_id").as("matched_id"), col("nfp").as("nfp_b"),
        col("fp"))
    probe.select(col("doc_id"), col("nfp").as("nfp_a"), col("fp"))
      .join(base, Seq("fp"))
      .groupBy(col("doc_id"), col("matched_id"), col("nfp_a"),
        col("nfp_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= WinnowMinShared)
      .select(col("doc_id"), col("matched_id"), col("shared_fps"),
        col("nfp_a"), col("nfp_b"))
  }

  /** q120: winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    * 2003 — the MOSS local fingerprinting algorithm): hash every 3-word
    * shingle, slide a [[WinnowW]]-wide window over the hash sequence, and
    * keep the MINIMUM hash of each window (value-based variant). The
    * selected set is a ~1/W-density sketch with a GUARANTEE the q19 MinHash
    * sketch lacks: every sufficiently long shared substring is detected,
    * not just probably detected — the right tool for overlap/clone
    * detection as opposed to whole-doc near-dup. Docs sharing ≥
    * [[WinnowMinShared]] fingerprints are reported with their sketch sizes
    * (the ingredients of a containment estimate).
    *
    * Shape at scale: fingerprinting is a NARROW per-doc pass
    * ([[winnowEntries]] — no explode until the selected ~1/W-density
    * sketch), the inverted index groups by fingerprint with the
    * [[Buckets.MaxBucket]] cap — bounded per-task pair work with an
    * observable drop count, the same posture as every other candidate
    * generator in this engine. Sketch sizes ride the index entries as
    * struct fields, so no corpus-scale join re-attaches them. */
  val q120WinnowFingerprint = QueryDef(
    "q120_winnow_fingerprint",
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_transform($sqlShingleGen, s -> ${sqlHash60("s")}) AS sh
       |  FROM documents),
       |fp AS (
       |  SELECT doc_id,
       |    CASE WHEN len(sh) >= $WinnowW
       |      THEN list_distinct(list_transform(
       |             range(1, len(sh) - ${WinnowW - 2}),
       |             i -> list_min(sh[i:i+${WinnowW - 1}])))
       |      ELSE [list_min(sh)] END AS fps
       |  FROM sh),
       |e AS (SELECT doc_id, CAST(len(fps) AS BIGINT) AS nfp, unnest(fps) AS fp
       |  FROM fp),
       |r AS (SELECT doc_id, nfp, fp,
       |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
       |  FROM e),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.nfp AS nfp_a, b.nfp AS nfp_b
       |  FROM r a JOIN r b
       |    ON a.fp = b.fp AND a.doc_id < b.doc_id
       |   AND a.rn <= ${Buckets.MaxBucket} AND b.rn <= ${Buckets.MaxBucket})
       |SELECT doc_a, doc_b, COUNT(*) AS shared_fps, nfp_a, nfp_b
       |FROM p
       |GROUP BY doc_a, doc_b, nfp_a, nfp_b
       |HAVING COUNT(*) >= $WinnowMinShared
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    val e = winnowEntries(Tables(spark, dir, "documents"))
      .select(
        struct(col("doc_id").as("id"), col("nfp").as("n")).as("item"),
        col("fp"))
    Buckets.cappedPairs(e, Seq("fp"), "item", "q120_bucket_cap")
      .groupBy(col("p.a.id").as("doc_a"), col("p.b.id").as("doc_b"),
        col("p.a.n").as("nfp_a"), col("p.b.n").as("nfp_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= WinnowMinShared)
      .select(col("doc_a"), col("doc_b"), col("shared_fps"),
        col("nfp_a"), col("nfp_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Sequence length for the manifest's packing stage (power of two: the
    * q60 precedent — keeps any division floor-exact in both engines). */
  private val SeqTokens = 1024L

  /** q121: end-to-end recipe manifest — the four recipe stages composed
    * into the one report a materialization job executes from:
    *
    *   1. FILTER: q112's funnel rules decide keep/drop per doc;
    *   2. ALLOCATE: the budget (half of all KEPT tokens) spreads over
    *      sources as equal quotas capped at each source's kept inventory
    *      (the q118 waterfill, single round);
    *   3. SELECT: each source keeps docs in deterministic md5-hash order
    *      until its allocation fills (q80's convention: the boundary doc
    *      may overflow — never split a document);
    *   4. PACK: selected tokens pack into [[SeqTokens]]-token training
    *      sequences (q60's greedy running-sum packing).
    *
    * Output: one row per source — kept inventory, allocation, selected
    * docs/tokens, sequence count, and the boundary-overflow excess in
    * per-mille of the allocation. Every stage is integer-exact, so the
    * whole composition is DuckDB-oracle-exact end to end: the gate
    * checks the PIPELINE, not just each stage in isolation.
    *
    * Shape at scale: the funnel pass is q112's (one (doc,word) shuffle +
    * per-doc reduction); selection and packing run one window per source
    * ordered by hash — the q80/q60 stratum-local shape (a hot source
    * serializes its own stratum; q84's hash-range sub-bucketing is the
    * documented escape hatch if a stratum outgrows a task). The final
    * rollup is sources-sized. */
  val q121RecipeManifest = QueryDef(
    "q121_recipe_manifest",
    s"""WITH ${Quality.sqlFunnelMetrics},
       |k AS (SELECT doc_id, source, n_words,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM m WHERE ${Quality.sqlKeepExpr}),
       |inv AS (SELECT source, CAST(SUM(n_words) AS BIGINT) AS kept_tokens,
       |    COUNT(*) AS kept_docs
       |  FROM k GROUP BY source),
       |al AS (SELECT source, kept_docs, kept_tokens,
       |    LEAST(kept_tokens,
       |      (CAST(SUM(kept_tokens) OVER () AS BIGINT) // 2)
       |        // CAST(COUNT(*) OVER () AS BIGINT)) AS alloc_tokens
       |  FROM inv),
       |c AS (SELECT doc_id, source, n_words,
       |    CAST(SUM(n_words) OVER (PARTITION BY source ORDER BY h, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM k),
       |sel AS (SELECT c.doc_id, c.source, c.n_words, c.cum
       |  FROM c JOIN al ON c.source = al.source
       |  WHERE c.cum - c.n_words < al.alloc_tokens),
       |seq AS (SELECT source, COUNT(*) AS sel_docs,
       |    CAST(SUM(n_words) AS BIGINT) AS sel_tokens,
       |    CAST(COUNT(DISTINCT (cum - n_words) // $SeqTokens) AS BIGINT)
       |      AS n_seqs
       |  FROM sel GROUP BY source)
       |SELECT al.source, al.kept_docs, al.kept_tokens, al.alloc_tokens,
       |  CAST(COALESCE(seq.sel_docs, 0) AS BIGINT) AS sel_docs,
       |  CAST(COALESCE(seq.sel_tokens, 0) AS BIGINT) AS sel_tokens,
       |  CAST(COALESCE(seq.n_seqs, 0) AS BIGINT) AS n_seqs,
       |  ((COALESCE(seq.sel_tokens, 0) - al.alloc_tokens) * 1000)
       |    // GREATEST(al.alloc_tokens, 1) AS overflow_pm
       |FROM al LEFT JOIN seq ON al.source = seq.source
       |ORDER BY al.source""".stripMargin) { (spark, dir) =>
    val wAll = Window.partitionBy()
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val k = Quality.funnelMetrics(Tables(spark, dir, "documents"))
      .filter(Quality.keepAll)
      .select(col("doc_id"), col("source"), col("n_words"),
        hash60(col("doc_id").cast(StringType)).as("h"))
    val al = k.groupBy(col("source"))
      .agg(sum(col("n_words")).as("kept_tokens"),
        count(lit(1)).as("kept_docs"))
      .withColumn("alloc_tokens",
        least(col("kept_tokens"),
          expr("((sum(kept_tokens) over ()) div 2L)" +
            " div (count(1) over ())")))
      .select(col("source"), col("kept_docs"), col("kept_tokens"),
        col("alloc_tokens"))
    val sel = k.withColumn("cum", sum(col("n_words")).over(wSrc))
      .join(al.select(col("source"), col("alloc_tokens")), Seq("source"))
      .filter(col("cum") - col("n_words") < col("alloc_tokens"))
    val seq = sel.groupBy(col("source"))
      .agg(count(lit(1)).as("sel_docs"),
        sum(col("n_words")).as("sel_tokens"),
        countDistinct(expr(s"(cum - n_words) div $SeqTokens"))
          .as("n_seqs"))
    al.join(seq, Seq("source"), "left")
      .select(col("source"), col("kept_docs"), col("kept_tokens"),
        col("alloc_tokens"),
        coalesce(col("sel_docs"), lit(0L)).as("sel_docs"),
        coalesce(col("sel_tokens"), lit(0L)).as("sel_tokens"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"),
        expr("((coalesce(sel_tokens, 0L) - alloc_tokens) * 1000)" +
          " div greatest(alloc_tokens, 1L)").as("overflow_pm"))
      .orderBy(col("source"))
  }

  /** Vocabulary size for the coverage report (top-K words by corpus
    * count, ties broken by word order — fully deterministic). */
  private val VocabK = 256

  /** q122: vocabulary coverage / OOV report — given the top-[[VocabK]]
    * corpus vocabulary, how much of each source the vocabulary covers:
    * total tokens, covered tokens, coverage in per-mille, distinct
    * out-of-vocabulary words, and each source's most frequent OOV word.
    * The report that decides whether a tokenizer/vocab trained on the
    * mixture serves every source, BEFORE training it (complements q108's
    * after-the-fact fertility).
    *
    * Shape at scale: token counts collapse via map-side partial
    * aggregation; the vocabulary is a bounded top-K (orderBy+limit plans
    * TakeOrderedAndProject — per-partition heaps, k-row merge) and joins
    * BROADCAST against the per-(source, word) counts; the top-OOV pick
    * is one WindowGroupLimit-able rank over the OOV slice. */
  val q122VocabCoverage = QueryDef(
    "q122_vocab_coverage",
    s"""WITH t AS (
       |  SELECT source, w AS word, COUNT(*) AS cnt
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  GROUP BY source, w),
       |v AS (SELECT word FROM (
       |    SELECT word, CAST(SUM(cnt) AS BIGINT) AS tot FROM t GROUP BY word
       |    ORDER BY tot DESC, word LIMIT $VocabK)),
       |c AS (SELECT t.source, t.word, t.cnt,
       |    (v.word IS NOT NULL) AS in_vocab
       |  FROM t LEFT JOIN v ON t.word = v.word),
       |oov AS (SELECT source, word, cnt,
       |    row_number() OVER (PARTITION BY source
       |                       ORDER BY cnt DESC, word) AS rn
       |  FROM c WHERE NOT in_vocab)
       |SELECT c.source,
       |  CAST(SUM(c.cnt) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN c.in_vocab THEN c.cnt ELSE 0 END) AS BIGINT)
       |    AS covered,
       |  CAST((SUM(CASE WHEN c.in_vocab THEN c.cnt ELSE 0 END) * 1000)
       |    // GREATEST(SUM(c.cnt), 1) AS BIGINT) AS coverage_pm,
       |  CAST(SUM(CASE WHEN c.in_vocab THEN 0 ELSE 1 END) AS BIGINT)
       |    AS oov_words,
       |  MIN(o.word) AS top_oov
       |FROM c LEFT JOIN (SELECT source, word FROM oov WHERE rn = 1) o
       |  ON c.source = o.source
       |GROUP BY c.source
       |ORDER BY c.source""".stripMargin) { (spark, dir) =>
    val t = Tables(spark, dir, "documents")
      .select(col("source"), explode(words(col("text"))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("cnt"))
    val v = t.groupBy(col("word"))
      .agg(sum(col("cnt")).as("tot"))
      .orderBy(col("tot").desc, col("word"))
      .limit(VocabK)
      .select(col("word"), lit(true).as("in_v"))
    val c = t.join(broadcast(v), Seq("word"), "left")
      .withColumn("in_vocab", coalesce(col("in_v"), lit(false)))
    val topOov = c.filter(!col("in_vocab"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("cnt").desc, col("word"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("word").as("top_oov"))
    c.groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(when(col("in_vocab"), col("cnt")).otherwise(0L)).as("covered"),
        sum(when(col("in_vocab"), lit(0L)).otherwise(1L)).as("oov_words"))
      .join(topOov, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("covered"),
        expr("(covered * 1000) div greatest(n_tokens, 1L)")
          .as("coverage_pm"),
        col("oov_words"), col("top_oov"))
      .orderBy(col("source"))
  }

  /** q123: temperature-scaled mixture weights (the UniMax/multilingual
    * sampling recipe): source sampling probability ∝ tokens^τ with
    * τ = 0.5 — up-weights small sources without letting any source
    * dominate. τ = 0.5 is exactly `sqrt`, which IEEE-754 defines
    * bit-exactly (unlike `pow`/`log`, which vary across libm builds), so
    * the whole report stays oracle-exact IF the float SUM is ordered:
    * the normalizer is a RUNNING sum over sources in source order (an
    * explicit left fold — both engines perform the identical addition
    * sequence) surfaced per-row via MAX OVER () (max is order-safe).
    * Planned tokens per source = floor(p · budget) — two deterministic
    * IEEE ops from exact integers.
    *
    * Shape at scale: everything after the per-source rollup runs on
    * thousands of rows (the q118 posture). */
  val q123TemperatureMixture = QueryDef(
    "q123_temperature_mixture",
    s"""WITH a AS (
       |  SELECT source,
       |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |s AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w,
       |    CAST(SUM(n_tokens) OVER () AS BIGINT) // $BudgetDiv AS budget
       |  FROM a),
       |c AS (SELECT *, SUM(w) OVER (ORDER BY source
       |    ROWS UNBOUNDED PRECEDING) AS cum FROM s),
       |n AS (SELECT *, MAX(cum) OVER () AS norm FROM c)
       |SELECT source, n_tokens, w AS weight, w / norm AS p,
       |  CAST(FLOOR((w / norm) * CAST(budget AS DOUBLE)) AS BIGINT)
       |    AS planned_tokens
       |FROM n
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    val wOrd = Window.orderBy(col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(words(col("text"))).cast(LongType)).as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast(DoubleType)))
      .withColumn("budget",
        expr(s"(sum(n_tokens) over ()) div $BudgetDiv"))
      .withColumn("cum", sum(col("w")).over(wOrd))
      .withColumn("norm", max(col("cum")).over(wAll))
      .select(col("source"), col("n_tokens"), col("w").as("weight"),
        (col("w") / col("norm")).as("p"),
        floor((col("w") / col("norm")) * col("budget").cast(DoubleType))
          .cast(LongType).as("planned_tokens"))
      .orderBy(col("source"))
  }

  /** Boilerplate document-frequency threshold, in tenths: a shingle is
    * boilerplate within a source when it appears in ≥ 3/10 of the
    * source's documents. */
  private val BoilerplateTenths = 3L

  /** q124: boilerplate n-gram detection (the C4/RefinedWeb step that
    * strips repeated headers/footers/navigation before training): a
    * 3-word shingle is BOILERPLATE within a source when it appears in ≥
    * 30% of that source's documents — per source, report the distinct
    * shingle inventory, how many are boilerplate, how many documents
    * carry at least one, and the most widespread boilerplate shingle.
    * Cross-doc repetition WITHIN a source is navigation chrome, not
    * content — exactly what per-doc quality rules (q61/q112) cannot see.
    *
    * Shape at scale: one explode of per-doc DISTINCT shingles (document
    * frequency needs distinct-per-doc anyway, so the multiset never
    * shuffles), one (source, shingle) count — map-side combinable since
    * rows are pre-deduped per doc — then the tiny boilerplate slice
    * semi-joins back to flag affected docs. Threshold arithmetic is
    * integer cross-multiplication (df·10 ≥ docs·3): no float near the
    * decision boundary. */
  val q124Boilerplate = QueryDef(
    "q124_boilerplate",
    s"""WITH d AS (
       |  SELECT source, doc_id, unnest($sqlShingles3) AS sh
       |  FROM documents),
       |nd AS (SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
       |    AS n_docs
       |  FROM documents GROUP BY source),
       |df AS (SELECT source, sh, COUNT(*) AS df
       |  FROM d GROUP BY source, sh),
       |bp AS (SELECT df.source, df.sh, df.df
       |  FROM df JOIN nd ON df.source = nd.source
       |  WHERE df.df * 10 >= nd.n_docs * $BoilerplateTenths),
       |top AS (SELECT source, sh, row_number() OVER (PARTITION BY source
       |    ORDER BY df DESC, sh) AS rn FROM bp),
       |aff AS (SELECT d.source,
       |    CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS affected_docs
       |  FROM d JOIN bp ON d.source = bp.source AND d.sh = bp.sh
       |  GROUP BY d.source),
       |inv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles
       |  FROM df GROUP BY source),
       |nbp AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS bp_shingles
       |  FROM bp GROUP BY source)
       |SELECT nd.source, nd.n_docs, inv.n_shingles,
       |  CAST(COALESCE(nbp.bp_shingles, 0) AS BIGINT) AS bp_shingles,
       |  CAST(COALESCE(aff.affected_docs, 0) AS BIGINT) AS affected_docs,
       |  t.sh AS top_boilerplate
       |FROM nd
       |JOIN inv ON nd.source = inv.source
       |LEFT JOIN nbp ON nd.source = nbp.source
       |LEFT JOIN aff ON nd.source = aff.source
       |LEFT JOIN (SELECT source, sh FROM top WHERE rn = 1) t
       |  ON nd.source = t.source
       |ORDER BY nd.source""".stripMargin) { (spark, dir) =>
    // TWO lazy executions of the corpus explode+count subtree (was ~five
    // — inv, nbp, the top-shingle window, and aff each re-ran d→df from
    // the scan), still ONE action with no driver barrier:
    //  1. a per-source ROLLUP over the (source, shingle) document-
    //     frequency aggregation, boilerplate flagged in-row off the
    //     broadcast doc-count table: shingle inventory count, boilerplate
    //     count, and the top boilerplate shingle as min(struct(-df, sh))
    //     — lexicographic struct-min ≡ the old row_number ORDER BY df
    //     DESC, sh, deterministic, and the window exchange is gone;
    //  2. the affected-doc count, off its own df→bp slice (the tiny
    //     ≥30%-df inventory) semi-joined back to the exploded docs.
    val docs = Tables(spark, dir, "documents")
    val d = docs.select(col("source"), col("doc_id"),
      explode(shingles3(col("text"))).as("sh"))
    val nd = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val isBp = col("df") * 10 >= col("n_docs") * BoilerplateTenths
    val df = d.groupBy(col("source"), col("sh"))
      .agg(count(lit(1)).as("df"))
      .join(broadcast(nd), Seq("source"))
      .select(col("source"), col("sh"), col("df"), isBp.as("bp"))
    val roll = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("bp"), 1L).otherwise(0L)).as("bp_shingles"),
        min(when(col("bp"), struct((-col("df")).as("nd"), col("sh"))))
          .as("top"))
    val bp = df.filter(col("bp")).select(col("source"), col("sh"))
    val aff = d.join(bp, Seq("source", "sh"))
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("affected_docs"))
    nd.join(roll, Seq("source"))
      .join(aff, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_shingles"),
        col("bp_shingles"),
        coalesce(col("affected_docs"), lit(0L)).as("affected_docs"),
        col("top").getField("sh").as("top_boilerplate"))
      .orderBy(col("source"))
  }

  /** Sampling-probability clamp bounds, in per-mille. */
  private val SampleFloorPm = 10L
  private val SampleCeilPm = 990L

  /** q125: importance-proportional document sampling — DSIR's actual
    * selection step (q119 scores; this KEEPS documents with probability
    * proportional to their score). Keep probability in per-mille is the
    * clamped affine map `500 + imp_pt/4` (target-neutral docs keep at
    * ~50%, strongly target-like near [[SampleCeilPm]], strongly off-
    * target near [[SampleFloorPm]] — never 0 or 1000, so every stratum
    * keeps some mass); the keep DECISION is `hash60(doc_id) mod 1000 <
    * p` — a pure function of (corpus, doc_id), reproducible across
    * engines, reruns, and partitionings (the q63/q66 determinism
    * property, now importance-weighted). Report: per (source, lang)
    * kept/dropped accounting with kept-token sums.
    *
    * Determinism notes: `imp_pt/4` is computed as the SHIFTED floor
    * `(imp_pt + Scale) div 4 − Scale/4` — imp_pt ≥ −Scale, so the
    * numerator is non-negative and Spark's truncating `div` equals
    * DuckDB's flooring `//`. All outputs are counts/integer sums.
    *
    * Shape at scale: per-doc scoring is the q119 narrow fold (broadcast
    * literal model, no join); the decision is another narrow map; the
    * only shuffle is the tiny per-(source, lang) rollup. */
  val q125ImportanceSample = QueryDef(
    "q125_importance_sample",
    s"""WITH $sqlDsirDoc,
       |k AS (SELECT source, lang, n, imp_pt,
       |    GREATEST(LEAST(500 + ((imp_pt + $DsirScale) // 4
       |      - ${DsirScale / 4}), $SampleCeilPm), $SampleFloorPm) AS p_pm,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 1000 AS roll
       |  FROM p)
       |SELECT source, lang, COUNT(*) AS docs,
       |  CAST(SUM(CASE WHEN roll < p_pm THEN 1 ELSE 0 END) AS BIGINT)
       |    AS kept_docs,
       |  CAST(SUM(CASE WHEN roll < p_pm THEN n ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(SUM(n) AS BIGINT) AS total_tokens,
       |  CAST(MIN(p_pm) AS BIGINT) AS min_p_pm,
       |  CAST(MAX(p_pm) AS BIGINT) AS max_p_pm
       |FROM k
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val scored = docs.select(col("doc_id"), col("source"), col("lang"),
      size(words(col("text"))).cast(LongType).as("n"),
      dsirImpPt(dsirModel(docs)).as("imp_pt"))
    scored
      .withColumn("p_pm",
        greatest(least(
          lit(500L) + (intDiv(col("imp_pt") + DsirScale, lit(4L))
            - (DsirScale / 4)),
          lit(SampleCeilPm)), lit(SampleFloorPm)))
      .withColumn("roll",
        pmod(hash60(col("doc_id").cast(StringType)), lit(1000L)))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(when(col("roll") < col("p_pm"), 1L).otherwise(0L))
          .as("kept_docs"),
        sum(when(col("roll") < col("p_pm"), col("n")).otherwise(0L))
          .as("kept_tokens"),
        sum(col("n")).as("total_tokens"),
        min(col("p_pm")).as("min_p_pm"),
        max(col("p_pm")).as("max_p_pm"))
      .orderBy(col("source"), col("lang"))
  }

  /** Training-sequence capacity (tokens) for q137's packing audit. Small
    * enough that the synthetic docs actually straddle boundaries; the
    * arithmetic is capacity-agnostic. */
  private val PackCap = 512L

  /** q137: sequence-packing audit for the CONCAT-AND-CHOP convention —
    * the OTHER packing scheme next to [[Corpus.q60PackSequences]]'s
    * never-split contiguous fill: here docs are joined into one token
    * stream per shard and chopped into fixed [[PackCap]]-token context
    * windows, so documents DO split across boundaries (zero padding
    * except the shard tail, at the cost of truncated attention). Where
    * q60 emits the per-doc assignment, q137 emits the per-shard COST
    * REPORT a recipe uses to choose between the two conventions: how
    * many sequences the shard yields, how much tail padding is wasted,
    * and how many documents get split across a context boundary (split
    * docs lose cross-boundary attention — the quantity a packing recipe
    * tries to minimize; cf. the document-mask packing discussion in
    * Dubey et al. 2024, §3.2).
    *
    * Packing is defined per PACK SHARD with a deterministic intra-shard
    * order, never globally — a global concat order would serialize the
    * corpus through one task. Here the shard key is `source` and the
    * order `doc_id` so DuckDB can replay it exactly; in production the
    * key is `pmod(hash60(doc_id), nShards)` with the same per-shard
    * running-sum shape (a 100 TB source is not one window partition —
    * see the [[q84Shards]] sharding note).
    *
    * Integer-exactness: every output is a count or a non-negative
    * integer division (truncating `div` = flooring `//` on non-negative
    * operands). A doc's boundary crossings are closed-form from the
    * running sum: `spans = (end-1) div cap - start div cap`.
    *
    * Shape at scale: ONE hash exchange on the shard key; the running-sum
    * window sorts within partitions only, and the per-shard rollup
    * reuses the window's partitioning (no second exchange — pinned by
    * RecipePackSpec). Nothing global, nothing corpus-sized on one task. */
  val q137SequencePack = QueryDef(
    "q137_sequence_pack",
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST(len($sqlWords) AS BIGINT) AS toks
       |  FROM documents),
       |c AS (SELECT *,
       |    CAST(SUM(toks) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS cum
       |  FROM d),
       |m AS (SELECT *,
       |    CASE WHEN toks > 0
       |      THEN ((cum - 1) // $PackCap) - ((cum - toks) // $PackCap)
       |      ELSE 0 END AS spans
       |  FROM c),
       |g AS (SELECT source,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(toks) AS BIGINT) AS total_tokens,
       |    CAST(SUM(CASE WHEN spans > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS docs_split,
       |    CAST(SUM(spans) AS BIGINT) AS extra_spans
       |  FROM m GROUP BY source)
       |SELECT source, n_docs, total_tokens,
       |  (total_tokens + ${PackCap - 1}) // $PackCap AS n_sequences,
       |  ((total_tokens + ${PackCap - 1}) // $PackCap) * $PackCap
       |    - total_tokens AS tail_pad,
       |  docs_split,
       |  (docs_split * 1000000) // n_docs AS split_ppm,
       |  extra_spans
       |FROM g
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast(LongType).as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("spans",
        when(col("toks") > 0,
          expr(s"((cum - 1) div $PackCap) - ((cum - toks) div $PackCap)"))
          .otherwise(lit(0L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(when(col("spans") > 0, 1L).otherwise(0L)).as("docs_split"),
        sum(col("spans")).as("extra_spans"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${PackCap - 1}) div $PackCap")
          .as("n_sequences"),
        (expr(s"(total_tokens + ${PackCap - 1}) div $PackCap") * PackCap
          - col("total_tokens")).as("tail_pad"),
        col("docs_split"),
        expr("(docs_split * 1000000) div n_docs").as("split_ppm"),
        col("extra_spans"))
      .orderBy(col("source"))
  }

  val all: Seq[QueryDef] =
    Seq(q118TokenWaterfill, q119DsirImportance, q120WinnowFingerprint,
      q121RecipeManifest, q122VocabCoverage, q123TemperatureMixture,
      q124Boilerplate, q125ImportanceSample, q137SequencePack)
}
