package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Model-based quality classification — the "quality classifier" stage of a
  * GPT-3/LLaMA-style curation pipeline: train a linear text classifier on a
  * labeled slice, then score the whole corpus and keep what classifies as
  * high-quality. Complements the RULE-based q112 funnel (fixed thresholds)
  * and the UNSUPERVISED q119 DSIR importance (distribution matching) with
  * the supervised member of the family — and, new to the suite, a proper
  * train/held-out evaluation loop run entirely inside the engine.
  *
  * Reference scope: the reference's only "model" is the hand-written linear
  * forecast in predict_future_trends (covid_streaming.py:63-109, reused at
  * :152); it trains nothing. Training + frozen-model scoring is the
  * LLM-pipeline tier.
  *
  * Determinism: labels are integer cross-multiplications of q15's 'good'
  * thresholds, features are [[Mirror.hash60]]-hashed unigrams, and the
  * model is the same integer ppm log-odds surrogate as q119 (`ppm(good) −
  * ppm(bad)` per bucket — log() is not bit-reproducible across libm;
  * integer ppm differences are). Every compared value is an exact BIGINT.
  */
object Classify {

  import Mirror._

  /** Hashed-unigram feature width. Bounded model state: the score table
    * is ≤ [[ClsBuckets]] rows regardless of corpus size. */
  private[operators] val ClsBuckets = 256

  /** Integer probability scale (parts-per-million). */
  private[operators] val ClsScale = 1000000L

  /** q128: train a hashed-bag-of-words quality classifier on the q53
    * 'train' split (labels = the integer-exact form of q15's 'good' rule),
    * score every document with the frozen model, and report the confusion
    * matrix per split — so the held-out 'valid'/'test' rows measure real
    * generalization, not training-set recall.
    *
    * Shape at scale: training is one exploded token pass collapsing to
    * [[ClsBuckets]] rows via map-side partial aggregation (the shuffle
    * moves buckets×tasks rows, not tokens); the collected model re-enters
    * the plan as an array literal, so scoring is a NARROW per-row fold —
    * no join, no shuffle — and the report is a tiny (split × 2 × 2)
    * rollup. Driver-side model arithmetic is BigInt: token-count × 10⁶
    * overflows int64 at 100 TB. Negative score sums are shifted
    * non-negative before the per-token division (Spark `div` truncates,
    * DuckDB `//` floors; they differ exactly on negatives). */
  val q128QualityClassifier = QueryDef(
    "q128_quality_classifier",
    s"""$sqlScored
       |SELECT split, label_good, score_pt > 0 AS pred_good,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MIN(score_pt) AS BIGINT) AS min_score_pt,
       |  CAST(MAX(score_pt) AS BIGINT) AS max_score_pt
       |FROM p GROUP BY split, label_good, pred_good
       |ORDER BY split, label_good, pred_good""".stripMargin) { (spark, dir) =>
    val docs = labeledDocs(Tables(spark, dir, "documents"))
    val model = trainModel(docs.filter(col("split") === "train"))
    docs
      .withColumn("score_pt", scorePt(model))
      .groupBy(col("split"), col("label_good"),
        (col("score_pt") > 0).as("pred_good"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("score_pt")).as("min_score_pt"),
        max(col("score_pt")).as("max_score_pt"))
      .orderBy(col("split"), col("label_good"), col("pred_good"))
  }

  /** Calibration-bin width in score_pt units. Sized to the OBSERVED
    * score scale, not the theoretical ±10⁶ bound: per-doc scores are
    * means of per-token bucket scores, so they concentrate within a few
    * thousand ppt of zero (±~7500 on the driver corpus at every SF) —
    * width 500 yields the ~20-bin reliability diagram a threshold
    * decision needs, while the worst-case row bound stays tiny
    * (≤ splits × 2·10⁶/500 rows). The +Scale shift keeps the numerator
    * non-negative, so Spark's truncating div equals DuckDB's flooring
    * `//` — the known negative-division trap (q128's shifted-floor
    * trick, reused). */
  private val BinWidth = 500L

  /** Candidate keep thresholds for the q158 sweep, in score_pt units —
    * spanning the observed score scale and centered on q128's implied
    * operating point (score_pt > 0) so the sweep shows where that
    * default sits on the curve. */
  private[graft] val thresholds: Seq[Long] = Seq(-2000L, -1000L, -500L,
    -200L, -100L, -50L, 0L, 50L, 100L, 200L, 500L, 1000L, 2000L)

  /** Shared oracle-CTE prefix for all three classifier queries: docs →
    * split/label → train → frozen model → per-doc score_pt (the `p`
    * table). Lazy: q128 is declared above this definition. */
  private lazy val sqlScored: String =
    s"""WITH l2 AS (
       |  SELECT doc_id, text,
       |    CASE WHEN ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 < 80
       |         THEN 'train'
       |         WHEN ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 < 90
       |         THEN 'valid' ELSE 'test' END AS split,
       |    (CAST(len($sqlWords) AS BIGINT) >= 20
       |     AND ${TextAnalysis.sqlCountIn(TextAnalysis.stopEn)} * 20
       |         >= CAST(len($sqlWords) AS BIGINT)
       |     AND ${TextAnalysis.sqlCountIn(TextAnalysis.stopEn)} * 2
       |         <= CAST(len($sqlWords) AS BIGINT)) AS label_good
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, split, label_good,
       |    ${sqlHash60("w")} % $ClsBuckets AS b
       |  FROM (SELECT doc_id, split, label_good,
       |          unnest(string_split(text, ' ')) AS w
       |        FROM l2)),
       |tr AS (
       |  SELECT b,
       |    CAST(SUM(CASE WHEN label_good THEN 1 ELSE 0 END) AS BIGINT)
       |      AS cg,
       |    CAST(SUM(CASE WHEN label_good THEN 0 ELSE 1 END) AS BIGINT)
       |      AS cb
       |  FROM tok WHERE split = 'train' GROUP BY b),
       |tot AS (
       |  SELECT GREATEST(CAST(SUM(cg) AS BIGINT), 1) AS tg,
       |         GREATEST(CAST(SUM(cb) AS BIGINT), 1) AS tb
       |  FROM tr),
       |s AS (
       |  SELECT b, (cg * $ClsScale) // tg - (cb * $ClsScale) // tb AS score
       |  FROM tr, tot),
       |d AS (
       |  SELECT t.doc_id, t.split, t.label_good,
       |    CAST(SUM(COALESCE(s.score, 0)) AS BIGINT) AS imp,
       |    COUNT(*) AS n
       |  FROM tok t LEFT JOIN s USING (b)
       |  GROUP BY t.doc_id, t.split, t.label_good),
       |p AS (
       |  SELECT doc_id, split, label_good,
       |    (imp + n * $ClsScale) // n - $ClsScale AS score_pt
       |  FROM d)""".stripMargin

  /** q157: the classifier's reliability report — per split and score
    * bin, how many docs land there and how many are actually good. THE
    * diagram a pipeline reads before trusting classifier-filtered data:
    * q128's confusion matrix says whether the default threshold works;
    * the calibration bins say whether the SCORE is meaningful across its
    * whole range (monotone good-fraction ⇒ any threshold is a coherent
    * knob). Scale shape: scoring is q128's narrow per-row fold (frozen
    * model as array literal, no join); the rollup is ≤ splits × 21 rows
    * behind map-side partial aggregation. */
  val q157ClassifierCalibration = QueryDef(
    "q157_classifier_calibration",
    s"""$sqlScored
       |SELECT split, (score_pt + $ClsScale) // $BinWidth AS bin,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN label_good THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_good,
       |  CAST(MIN(score_pt) AS BIGINT) AS min_score_pt,
       |  CAST(MAX(score_pt) AS BIGINT) AS max_score_pt
       |FROM p GROUP BY split, bin ORDER BY split, bin""".stripMargin) {
    (spark, dir) =>
    val docs = labeledDocs(Tables(spark, dir, "documents"))
    val model = trainModel(docs.filter(col("split") === "train"))
    calBins(scoredDocs(docs, model))
  }

  /** q158: threshold operating points — for each candidate keep
    * threshold, the exact confusion counts per split (tp/fp/fn/tn over
    * `score_pt > thr`). The decision table that picks the production
    * threshold from the held-out splits. Scale shape: one broadcast
    * cross join against the `thresholds` list (bounded at a handful of
    * rows; narrow compares per doc, no wide shuffle), collapsing
    * map-side to splits × thresholds rows. */
  val q158ThresholdSweep = QueryDef(
    "q158_threshold_sweep",
    s"""$sqlScored
       |SELECT split, thr,
       |  CAST(SUM(CASE WHEN score_pt > thr AND label_good
       |       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN score_pt > thr AND NOT label_good
       |       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN score_pt <= thr AND label_good
       |       THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN score_pt <= thr AND NOT label_good
       |       THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |FROM p CROSS JOIN (VALUES ${thresholds.map(t => s"($t)")
            .mkString(", ")}) t(thr)
       |GROUP BY split, thr ORDER BY split, thr""".stripMargin) {
    (spark, dir) =>
    val docs = labeledDocs(Tables(spark, dir, "documents"))
    val model = trainModel(docs.filter(col("split") === "train"))
    sweepOf(scoredDocs(docs, model))
  }

  /** q157 body over a scored table: per-(split, bin) reliability rollup.
    * Shared with [[graft.streaming.ClassifierStream]]'s read side. */
  private[graft] def calBins(scored: DataFrame): DataFrame =
    scored
      .withColumn("bin", intDiv(col("score_pt") + ClsScale, lit(BinWidth)))
      .groupBy(col("split"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("label_good"), 1L).otherwise(0L)).as("n_good"),
        min(col("score_pt")).as("min_score_pt"),
        max(col("score_pt")).as("max_score_pt"))
      .orderBy(col("split"), col("bin"))

  /** q158 body over a scored table: per-(split, threshold) confusion
    * counts. Shared with [[graft.streaming.ClassifierStream]]. */
  private[graft] def sweepOf(scored: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.crossJoin(broadcast(thresholds.toDF("thr")))
      .groupBy(col("split"), col("thr"))
      .agg(
        sum(when(col("score_pt") > col("thr") && col("label_good"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score_pt") > col("thr") && !col("label_good"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score_pt") <= col("thr") && col("label_good"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("score_pt") <= col("thr") && !col("label_good"), 1L)
          .otherwise(0L)).as("tn"))
      .orderBy(col("split"), col("thr"))
  }

  /** Split + integer-exact label over raw document rows — the labeled
    * view every classifier query (and the streaming twin) starts from. */
  private[graft] def labeledDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), splitCol.as("split"),
      labelGood.as("label_good"))

  /** Frozen-model scoring over a labeled view: (doc_id, split,
    * label_good, score_pt), one narrow per-row fold. Shared by q157/
    * q158 and [[graft.streaming.ClassifierStream]] — scoring is
    * per-document pure given the model, which is what makes the stream
    * twin replay-safe. */
  private[graft] def scoredDocs(docs: DataFrame,
      model: Array[Long]): DataFrame =
    docs.select(col("doc_id"), col("split"), col("label_good"),
      scorePt(model).as("score_pt"))

  /** q53's split convention (hash60(doc_id) % 100 → 80/10/10). */
  private def splitCol: Column = {
    val bucket = hash60(col("doc_id").cast(StringType)) % 100
    when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
  }

  /** Integer-exact form of q15's 'good' rule: ≥20 tokens and stopword
    * ratio in [0.05, 0.5] — `stops/n ≥ 1/20` as `stops·20 ≥ n`, so the
    * label needs no float division. */
  private def labelGood: Column = {
    val w = words(col("text"))
    val n = size(w).cast(LongType)
    val stops = TextAnalysis.countIn(w, TextAnalysis.stopEn)
    n >= 20 && stops * 20 >= n && stops * 2 <= n
  }

  /** Train the per-bucket score table from a LABELED training slice.
    * Bounded model state (≤ [[ClsBuckets]] rows collected — the q119
    * [[Recipe]] precedent); BigInt because count × 10⁶ overflows int64 at
    * 100 TB. */
  private[graft] def trainModel(train: DataFrame): Array[Long] =
    trainModelTok(train.select(col("label_good"),
        explode(words(col("text"))).as("w"))
      .select(col("label_good"),
        pmod(hash60(col("w")), lit(ClsBuckets.toLong)).as("b")))

  /** Per-occurrence token-bucket rows (doc_id, b) — the token-level
    * classifier state the streaming manifest maintainer persists at
    * ingest, so scoring and (re)training never re-read text. */
  private[graft] def tokenBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"),
        pmod(hash60(col("w")), lit(ClsBuckets.toLong)).as("b"))

  /** [[trainModel]] over a PRE-COMPUTED (label_good, b) token table —
    * the streaming-state form; the text path above delegates here so the
    * two can never drift. */
  private[graft] def trainModelTok(tok: DataFrame): Array[Long] = {
    val counts = tok.groupBy(col("b")).agg(
      sum(when(col("label_good"), 1L).otherwise(0L)).as("cg"),
      sum(when(col("label_good"), 0L).otherwise(1L)).as("cb"))
    val rows = counts.collect()
    val tg = math.max(1L, rows.map(_.getAs[Long]("cg")).sum)
    val tb = math.max(1L, rows.map(_.getAs[Long]("cb")).sum)
    val score = Array.fill[Long](ClsBuckets)(0L)
    rows.foreach { r =>
      val b = r.getAs[Long]("b").toInt
      score(b) = ((BigInt(r.getAs[Long]("cg")) * ClsScale) / tg -
        (BigInt(r.getAs[Long]("cb")) * ClsScale) / tb).toLong
    }
    score
  }

  /** Per-document per-token score against a frozen model riding the plan
    * as an array literal — a NARROW fold over the token array, no join.
    * Shifted-floor exact: per-token scores are ≥ −[[ClsScale]], so the
    * shifted numerator is non-negative and truncation equals floor. */
  private[graft] def scorePt(model: Array[Long]): Column = {
    val scoreArr = typedLit(model.toSeq)
    let1(words(col("text"))) { w =>
      val imp = aggregate(w, lit(0L), (acc, t) =>
        acc + element_at(scoreArr,
          (pmod(hash60(t), lit(ClsBuckets.toLong)) + 1).cast(IntegerType)))
      val n = size(w).cast(LongType)
      intDiv(imp + n * ClsScale, n) - ClsScale
    }
  }

  /** [[scorePt]] over a PRE-COMPUTED (doc_id, b) token table: per-doc
    * (doc_id, score_pt), arithmetically identical to the narrow text
    * fold (same per-token model lookups, same shifted-floor division) —
    * the streaming-state form. A doc absent from `tok` (zero tokens)
    * simply has no row, matching the text path's null score. */
  private[graft] def scoreFromTok(tok: DataFrame,
      model: Array[Long]): DataFrame = {
    val scoreArr = typedLit(model.toSeq)
    tok.groupBy(col("doc_id"))
      .agg(sum(element_at(scoreArr, (col("b") + 1).cast(IntegerType)))
          .as("imp"),
        count(lit(1)).as("n"))
      .select(col("doc_id"),
        (intDiv(col("imp") + col("n") * ClsScale, col("n")) - ClsScale)
          .as("score_pt"))
  }

  val all: Seq[QueryDef] = Seq(q128QualityClassifier,
    q157ClassifierCalibration, q158ThresholdSweep)
}
