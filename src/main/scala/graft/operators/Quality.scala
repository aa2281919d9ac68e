package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-QA operators a production training-data pipeline runs before
  * (and after) the filter/dedup stages: a rule-attribution quality funnel,
  * distribution-drift reports, embedding-table health checks, split-leakage
  * detection, and a language-metadata confusion matrix.
  *
  * Reference scope: the reference has no corpus QA at all (its quality
  * surface is the null/zero guards in covid_streaming.py:119-127) — this
  * module is part of the LLM-pipeline tier the builder prompt makes
  * first-class.
  *
  * Every aggregate here is integer-exact (counts, integer cross-
  * multiplications for threshold rules) or a deterministic scalar double
  * over exact integers, so the DuckDB oracle comparison is bit-exact —
  * and, at cluster scale, results do not vary with partition merge order.
  */
object Quality {

  import Mirror._

  /** Union of all per-language marker words (quality rule R4: a natural-
    * language doc should contain at least two distinct markers). */
  private val stopAll: Seq[String] =
    (TextAnalysis.stopEn ++ TextAnalysis.stopDe ++ TextAnalysis.stopFr ++
      TextAnalysis.stopEs).distinct

  private def sqlInList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("(", ", ", ")")

  /** DuckDB CTE fragment computing the per-doc funnel metrics (the wc/m
    * stages of q112's oracle) — shared with the recipe-manifest oracle
    * (q121), which gates its selection on the same rules. */
  private[operators] val sqlFunnelMetrics: String =
    s"""wc AS (
       |  SELECT doc_id, source, word, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
       |        FROM documents)
       |  GROUP BY doc_id, source, word),
       |m AS (
       |  SELECT doc_id, source,
       |    CAST(SUM(cnt) AS BIGINT) AS n_words,
       |    CAST(MAX(cnt) AS BIGINT) AS top_cnt,
       |    CAST(SUM(cnt * strlen(word)) AS BIGINT) AS sum_chars,
       |    CAST(COUNT(DISTINCT CASE WHEN word IN ${sqlInList(stopAll)}
       |      THEN word END) AS BIGINT) AS n_stop
       |  FROM wc GROUP BY doc_id, source)""".stripMargin

  /** DuckDB boolean over the [[sqlFunnelMetrics]] `m` columns: the
    * all-rules-pass keep decision (conjunction of q112's R1-R4). */
  private[operators] val sqlKeepExpr: String =
    "(n_words BETWEEN 10 AND 5000)" +
      " AND (sum_chars >= 2 * n_words AND sum_chars <= 12 * n_words)" +
      " AND (top_cnt * 5 <= n_words) AND (n_stop >= 2)"

  /** Spark twin of [[sqlKeepExpr]] over [[funnelMetrics]] output. */
  private[graft] def keepAll: Column =
    col("n_words").between(10, 5000) &&
      col("sum_chars") >= lit(2) * col("n_words") &&
      col("sum_chars") <= lit(12) * col("n_words") &&
      col("top_cnt") * 5 <= col("n_words") &&
      col("n_stop") >= 2

  /** Gopher-style quality-filter funnel with per-rule drop attribution.
    *
    * Rules are applied SEQUENTIALLY (a doc is charged to the FIRST rule it
    * fails — funnel semantics, so drops sum to docs − kept):
    *   R1 length:      10 ≤ n_words ≤ 5000
    *   R2 word length: mean word length in [2, 12] — evaluated as the
    *                   integer cross-multiplication
    *                   `2·n_words ≤ sum_chars ≤ 12·n_words` (exact; no
    *                   float division anywhere near the threshold)
    *   R3 repetition:  most frequent word ≤ 20% of tokens (`5·top ≤ n`)
    *   R4 naturalness: ≥ 2 distinct language-marker stopwords
    *
    * Shape at scale: one shuffle on (doc_id, word) with map-side partial
    * counts, a narrow per-doc reduction, then a tiny per-source rollup —
    * the same two-level aggregation a 100 TB corpus profile runs. No
    * arrays are materialized across rows and no rule needs a second scan.
    */
  /** Per-doc funnel metrics: token count, most-frequent-word count, total
    * word characters, distinct stopword markers — all FOUR computed as
    * narrow array expressions over the token array, so the corpus is
    * never exploded: the obvious formulation shuffles one row per TOKEN
    * (two corpus-scale exchanges at 100 TB); this one shuffles nothing
    * until the tiny per-source rollup. The most-frequent-word count is a
    * left fold over the SORTED token array tracking (prev, run-length,
    * best) — equal tokens are adjacent after the sort, so the max run IS
    * the max multiplicity. The oracle keeps the explode/GROUP BY spec
    * form (a specification of the VALUES, not the plan); equality of the
    * two formulations is exactly what the gate checks.
    *
    * Measured trade-off (sf0.1, 32 threads): 0.145 s exploded vs 0.249 s
    * narrow — higher-order-function lambdas evaluate interpreted, outside
    * whole-stage codegen, so the narrow form pays ~70% more CPU at test
    * scale where the exchange is an in-memory no-op. It is still the
    * right shape for the target: at 100 TB the exploded form shuffles one
    * row per TOKEN (corpus-sized disk+network), while this form's cost
    * stays a constant CPU factor on a zero-shuffle scan.
    *
    * A native one-pass expression (ShingleGen-style: single byte scan,
    * zero-copy token views, unboxed multiplicity counters) was built and
    * MEASURED in round 10 and did NOT beat these folds — 0.62 s native
    * vs 0.50 s folds on 20k×1500-token synthetic docs, parity (±5%) on
    * the real corpus at sf0.1 — so it was not shipped: Spark 4 evaluates
    * these HOF lambdas cheaply enough that per-token HashMap probing
    * costs as much as the sort-plus-run-scan it replaces. Don't redo
    * this without a profile showing the folds dominate. Shared by
    * the batch query (q112) and the streaming monitor
    * ([[graft.streaming.QualityStream]]). */
  def funnelMetrics(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = funnelMetrics(docs, Seq.empty)

  /** [[funnelMetrics]] with extra input columns carried through — the
    * metrics are a narrow per-doc projection, so keeping e.g. `text`
    * alongside them is free (no shuffle sees the wider row) and lets a
    * caller filter on [[keepAll]] IN the text-scanning pass instead of
    * joining the keep ids back to the corpus. */
  def funnelMetrics(docs: org.apache.spark.sql.DataFrame,
      carry: Seq[String]): org.apache.spark.sql.DataFrame = {
    val w = words(col("text"))
    val sorted = array_sort(w)
    val topCnt = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(col("doc_id") +: col("source") +:
      carry.map(col) :+
      size(w).cast(LongType).as("n_words") :+
      topCnt.as("top_cnt") :+
      aggregate(w, lit(0L),
        (a, x) => a + length(x).cast(LongType)).as("sum_chars") :+
      size(array_intersect(array_distinct(w),
        array(stopAll.map(lit): _*))).cast(LongType).as("n_stop"): _*)
  }

  /** Sequential-rule funnel rollup over [[funnelMetrics]] output: each doc
    * is charged to the FIRST rule it fails, so drops + kept = docs and
    * per-epoch reports sum exactly to the whole-corpus report. */
  def funnelReport(m: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val p1 = col("n_words").between(10, 5000)
    val p2 = col("sum_chars") >= lit(2) * col("n_words") &&
      col("sum_chars") <= lit(12) * col("n_words")
    val p3 = col("top_cnt") * 5 <= col("n_words")
    val p4 = col("n_stop") >= 2
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    m.groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        cnt(!p1).as("drop_len"),
        cnt(p1 && !p2).as("drop_word_len"),
        cnt(p1 && p2 && !p3).as("drop_repetition"),
        cnt(p1 && p2 && p3 && !p4).as("drop_stopword"),
        cnt(p1 && p2 && p3 && p4).as("kept"),
        sum(when(p1 && p2 && p3 && p4, col("n_words")).otherwise(0L))
          .as("kept_tokens"))
      .orderBy(col("source"))
  }

  val q112QualityFunnel = QueryDef(
    "q112_quality_funnel",
    s"""WITH $sqlFunnelMetrics,
       |r AS (
       |  SELECT source, n_words,
       |    (n_words BETWEEN 10 AND 5000) AS p1,
       |    (sum_chars >= 2 * n_words AND sum_chars <= 12 * n_words) AS p2,
       |    (top_cnt * 5 <= n_words) AS p3,
       |    (n_stop >= 2) AS p4
       |  FROM m)
       |SELECT source, COUNT(*) AS docs,
       |  CAST(SUM(CASE WHEN NOT p1 THEN 1 ELSE 0 END) AS BIGINT) AS drop_len,
       |  CAST(SUM(CASE WHEN p1 AND NOT p2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_word_len,
       |  CAST(SUM(CASE WHEN p1 AND p2 AND NOT p3 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS drop_repetition,
       |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND NOT p4 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS drop_stopword,
       |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS kept,
       |  CAST(SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN n_words ELSE 0 END)
       |    AS BIGINT) AS kept_tokens
       |FROM r GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    funnelReport(funnelMetrics(Tables(spark, dir, "documents")))
  }

  /** Per-source token-length distribution drift vs the whole corpus.
    *
    * Each (source, 16-token-wide length bin) row reports the source's
    * in-bin fraction, the corpus-wide fraction, and their ratio — the
    * report that catches one source skewing short/long before it is mixed
    * in. All fractions divide EXACT integer counts (window sums over
    * longs), so the doubles are single deterministic IEEE divisions —
    * no float accumulation anywhere.
    *
    * Shape at scale: one narrow map to (source, bin), one count shuffle,
    * then window sums over the tiny (sources × bins) aggregate — the big
    * table is touched once.
    */
  val q113LengthDrift = QueryDef(
    "q113_length_drift",
    """WITH b AS (
      |  SELECT source, len(string_split(text, ' ')) // 16 AS bin,
      |    COUNT(*) AS docs
      |  FROM documents GROUP BY source, bin),
      |t AS (
      |  SELECT source, bin, CAST(docs AS BIGINT) AS docs,
      |    CAST(SUM(docs) OVER (PARTITION BY source) AS BIGINT) AS src_total,
      |    CAST(SUM(docs) OVER (PARTITION BY bin) AS BIGINT) AS bin_total,
      |    CAST(SUM(docs) OVER () AS BIGINT) AS corpus_total
      |  FROM b)
      |SELECT source, CAST(bin AS BIGINT) AS bin, docs,
      |  CAST(docs AS DOUBLE) / CAST(src_total AS DOUBLE) AS src_frac,
      |  CAST(bin_total AS DOUBLE) / CAST(corpus_total AS DOUBLE)
      |    AS corpus_frac,
      |  (CAST(docs AS DOUBLE) / CAST(src_total AS DOUBLE))
      |    / (CAST(bin_total AS DOUBLE) / CAST(corpus_total AS DOUBLE))
      |    AS drift_ratio
      |FROM t ORDER BY source, bin""".stripMargin) { (spark, dir) =>
    val b = Tables(spark, dir, "documents")
      .select(col("source"),
        (size(words(col("text"))) / 16).cast(LongType).as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("docs"))
    val t = b
      .withColumn("src_total",
        sum(col("docs")).over(Window.partitionBy(col("source"))))
      .withColumn("bin_total",
        sum(col("docs")).over(Window.partitionBy(col("bin"))))
      .withColumn("corpus_total", sum(col("docs")).over(Window.partitionBy()))
    val srcFrac = col("docs").cast(DoubleType) /
      col("src_total").cast(DoubleType)
    val corpusFrac = col("bin_total").cast(DoubleType) /
      col("corpus_total").cast(DoubleType)
    t.select(col("source"), col("bin"), col("docs"),
      srcFrac.as("src_frac"), corpusFrac.as("corpus_frac"),
      (srcFrac / corpusFrac).as("drift_ratio"))
      .orderBy(col("source"), col("bin"))
  }

  /** Embedding-table health datasheet, per label: vector count, dimension
    * range (a dim that isn't constant is a broken table), zero-vector
    * count, and min / lower-median / max L2 norm.
    *
    * Norms are bit-exact across engines: a fixed-order left fold of
    * Σx² inside each vector (Mirror.dotD ≡ its DuckDB mirror) followed by
    * IEEE sqrt. min/max/median are selections, not accumulations, so no
    * cross-row float summation exists in the query — the reason mean-norm
    * is deliberately absent (a running double mean varies with partition
    * merge order at cluster scale; the median is the robust stat anyway).
    *
    * Shape at scale: one narrow map computes (label, dim, norm), the
    * median runs as a per-label window rank — one shuffle on label.
    */
  val q114EmbeddingQa = QueryDef(
    "q114_embedding_qa",
    s"""WITH n AS (
       |  SELECT label, vec_id, CAST(len(embedding) AS BIGINT) AS dim,
       |    sqrt(${sqlDotD("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |r AS (
       |  SELECT label, dim, norm,
       |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY norm, vec_id)
       |      AS rn,
       |    COUNT(*) OVER (PARTITION BY label) AS cnt
       |  FROM n)
       |SELECT label, CAST(MAX(cnt) AS BIGINT) AS n_vecs,
       |  MIN(dim) AS dim_min, MAX(dim) AS dim_max,
       |  CAST(SUM(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS zero_vecs,
       |  MIN(norm) AS norm_min,
       |  MAX(CASE WHEN rn = (cnt + 1) // 2 THEN norm END) AS norm_median,
       |  MAX(norm) AS norm_max
       |FROM r GROUP BY label ORDER BY label""".stripMargin) { (spark, dir) =>
    val n = Tables(spark, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        size(col("embedding")).cast(LongType).as("dim"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("norm"))
    val w = Window.partitionBy(col("label")).orderBy(col("norm"), col("vec_id"))
    val wc = Window.partitionBy(col("label"))
    n.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .groupBy(col("label"))
      .agg(
        max(col("cnt")).as("n_vecs"),
        min(col("dim")).as("dim_min"),
        max(col("dim")).as("dim_max"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("zero_vecs"),
        min(col("norm")).as("norm_min"),
        max(when(col("rn") === ((col("cnt") + 1) / 2).cast(LongType),
          col("norm"))).as("norm_median"),
        max(col("norm")).as("norm_max"))
      .orderBy(col("label"))
  }

  /** Train/valid/test leakage check: exact-content fingerprints (md5 of
    * whitespace-normalized text, the q17 fingerprint) that appear in MORE
    * than one split of the deterministic q53 hash split. Every (split_a,
    * split_b) pair gets a row — an explicit 0 when clean — with the number
    * of leaked fingerprints and the affected documents on each side: the
    * report a pipeline must drive to all-zeros before training.
    *
    * Shape at scale: fingerprints collapse to (fp, split, count) first —
    * the leak join then runs on the DISTINCT fingerprint set (bounded by
    * corpus cardinality, not corpus size), and only fingerprints present
    * in ≥2 splits survive the self-join's inequality. The pair scaffold is
    * a ≤3-row broadcast. No row-level pairs are ever enumerated.
    */
  val q115SplitLeakage = QueryDef(
    "q115_split_leakage",
    s"""WITH f AS (
       |  SELECT md5(trim(regexp_replace(text, '[ ]+', ' ', 'g'))) AS fp,
       |    CASE WHEN ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 < 80
       |         THEN 'train'
       |         WHEN ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 < 90
       |         THEN 'valid'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |g AS (SELECT fp, split, COUNT(*) AS docs FROM f GROUP BY fp, split),
       |leaks AS (
       |  SELECT a.split AS split_a, b.split AS split_b,
       |    COUNT(*) AS leaked_fps,
       |    CAST(SUM(a.docs) AS BIGINT) AS docs_a,
       |    CAST(SUM(b.docs) AS BIGINT) AS docs_b
       |  FROM g a JOIN g b ON a.fp = b.fp AND a.split < b.split
       |  GROUP BY a.split, b.split),
       |s AS (SELECT DISTINCT split FROM g),
       |pairs AS (SELECT s1.split AS split_a, s2.split AS split_b
       |          FROM s s1 JOIN s s2 ON s1.split < s2.split)
       |SELECT p.split_a, p.split_b,
       |  CAST(COALESCE(l.leaked_fps, 0) AS BIGINT) AS leaked_fps,
       |  CAST(COALESCE(l.docs_a, 0) AS BIGINT) AS docs_a,
       |  CAST(COALESCE(l.docs_b, 0) AS BIGINT) AS docs_b
       |FROM pairs p LEFT JOIN leaks l
       |  ON p.split_a = l.split_a AND p.split_b = l.split_b
       |ORDER BY p.split_a, p.split_b""".stripMargin) {
    (spark, dir) =>
      val g = Tables(spark, dir, "documents")
        .select(
          md5(trim(regexp_replace(col("text"), "[ ]+", " "))).as("fp"),
          when(hash60(col("doc_id").cast(StringType)) % 100 < 80, "train")
            .when(hash60(col("doc_id").cast(StringType)) % 100 < 90, "valid")
            .otherwise("test").as("split"))
        .groupBy(col("fp"), col("split"))
        .agg(count(lit(1)).as("docs"))
      val a = g.select(col("fp"), col("split").as("split_a"),
        col("docs").as("docs_va"))
      val b = g.select(col("fp").as("fp_b"), col("split").as("split_b"),
        col("docs").as("docs_vb"))
      val leaks = a
        .join(b, col("fp") === col("fp_b") && col("split_a") < col("split_b"))
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("leaked_fps"),
          sum(col("docs_va")).as("docs_a"),
          sum(col("docs_vb")).as("docs_b"))
      val s = g.select(col("split")).distinct()
      val pairs = s.select(col("split").as("split_a"))
        .join(s.select(col("split").as("split_b")),
          col("split_a") < col("split_b"))
      pairs.join(leaks, Seq("split_a", "split_b"), "left")
        .select(col("split_a"), col("split_b"),
          coalesce(col("leaked_fps"), lit(0L)).as("leaked_fps"),
          coalesce(col("docs_a"), lit(0L)).as("docs_a"),
          coalesce(col("docs_b"), lit(0L)).as("docs_b"))
        .orderBy(col("split_a"), col("split_b"))
  }

  /** Language-metadata audit: confusion matrix between the declared `lang`
    * column and the q16 content-based language-ID heuristic, with the
    * per-cell share of the declared language's documents. Off-diagonal
    * mass is mislabeled metadata — the first thing to check before
    * per-language sampling decisions. Counts are exact; the share is one
    * deterministic division per output row (sources × langs cells).
    */
  val q116LangidConfusion = QueryDef(
    "q116_langid_confusion",
    s"""WITH p AS (
       |  SELECT lang,
       |    CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |         WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |         WHEN s_fr >= s_es THEN 'fr'
       |         ELSE 'es' END AS predicted_lang
       |  FROM (
       |    SELECT lang,
       |      CAST(len(list_filter($sqlWords,
       |        w -> w IN ${sqlInList(TextAnalysis.stopEn)})) AS BIGINT) AS s_en,
       |      CAST(len(list_filter($sqlWords,
       |        w -> w IN ${sqlInList(TextAnalysis.stopDe)})) AS BIGINT) AS s_de,
       |      CAST(len(list_filter($sqlWords,
       |        w -> w IN ${sqlInList(TextAnalysis.stopFr)})) AS BIGINT) AS s_fr,
       |      CAST(len(list_filter($sqlWords,
       |        w -> w IN ${sqlInList(TextAnalysis.stopEs)})) AS BIGINT) AS s_es
       |    FROM documents)),
       |c AS (SELECT lang, predicted_lang, COUNT(*) AS docs
       |      FROM p GROUP BY lang, predicted_lang)
       |SELECT lang, predicted_lang, docs,
       |  CAST(docs AS DOUBLE)
       |    / CAST(SUM(docs) OVER (PARTITION BY lang) AS DOUBLE) AS lang_share
       |FROM c ORDER BY lang, predicted_lang""".stripMargin) { (spark, dir) =>
    def score(ws: Seq[String]): Column =
      size(filter(words(col("text")), x => x.isInCollection(ws)))
        .cast(LongType)
    val p = Tables(spark, dir, "documents")
      .select(col("lang"),
        score(TextAnalysis.stopEn).as("s_en"),
        score(TextAnalysis.stopDe).as("s_de"),
        score(TextAnalysis.stopFr).as("s_fr"),
        score(TextAnalysis.stopEs).as("s_es"))
      .select(col("lang"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es").as("predicted_lang"))
    val c = p.groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("docs"))
    c.withColumn("lang_share",
      col("docs").cast(DoubleType) /
        sum(col("docs")).over(Window.partitionBy(col("lang")))
          .cast(DoubleType))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  /** Gopher repetition thresholds (Rae et al. 2021, table A1): keep a
    * document iff the most-frequent n-gram's character mass is ≤ pct% of
    * the document for n = 2,3,4 … */
  private[operators] val TopNgramPct = Seq(2 -> 20, 3 -> 18, 4 -> 16)

  /** … and iff characters covered by WITHIN-DOC duplicated n-grams are
    * ≤ pct% for n = 5..10. */
  private[operators] val DupNgramPct =
    Seq(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)

  private def sqlNList(ns: Seq[Int]): String = ns.mkString("[", ", ", "]")

  /** q151: the Gopher repetition filter suite (Rae et al. 2021 table A1,
    * the repetition family every major pipeline reuses — MassiveText,
    * RefinedWeb, Dolma, FineWeb): per document, the CHARACTER fraction of
    * (a) the most frequent n-gram's occurrences for n = 2,3,4 and (b) the
    * union of all within-document duplicated n-grams' occurrences for
    * n = 5..10, plus the all-rules keep verdict. q112's R3 is the 1-gram
    * degenerate case; this emits the full profile. The paper's two LINE
    * metrics are omitted as degenerate here: `documents.text` contains no
    * newline in any driver generation (checked at sf0.01/sf0.1), so
    * dup_line_frac ≡ 0 for every document.
    *
    * Exactness: numerators are integers in both engines — top mass is
    * occurrence-count × n-gram character length; duplicated coverage is an
    * interval-union length in character space, computed as merged token
    * intervals (running-max gaps-and-islands, q143's discipline — two
    * occurrences overlapping in tokens never double-count) evaluated
    * against per-token character prefix sums. Fractions are one IEEE
    * division of those integers by length(text); the keep verdict uses
    * integer cross-multiplication (num·100 ≤ pct·n_chars), never float
    * compare — the q112 rule discipline.
    *
    * Shape at 100 TB: everything is keyed by doc_id (+ gram width) —
    * grams hash to 60-bit longs before the per-doc count shuffles (q82's
    * compact-key rule), every window partitions by document so per-task
    * state is bounded by document length, and the final profile is one
    * row per document. No cross-document anything: this is the per-doc
    * quality pass that runs BEFORE dedup in a real pipeline.
    * Reference scope: file:line n/a — no quality surface in the
    * reference; LLM-pipeline extension tier. */
  val q151GopherRepetition = QueryDef(
    "q151_gopher_repetition",
    s"""WITH d AS (SELECT doc_id, $sqlWords AS w FROM documents
       |  WHERE length(text) >= 1),
       |tg AS (SELECT doc_id, n, array_to_string(w[i:i+n-1], ' ') AS gram
       |  FROM (SELECT doc_id, n, w, unnest(range(1, len(w) - n + 2)) AS i
       |        FROM d CROSS JOIN (SELECT unnest(${sqlNList(
      TopNgramPct.map(_._1))}) AS n))),
       |tc AS (SELECT doc_id, n, ${sqlHash60("gram")} AS sh,
       |    CAST(COUNT(*) AS BIGINT) AS cnt,
       |    CAST(MAX(length(gram)) AS BIGINT) AS glen
       |  FROM tg GROUP BY doc_id, n, ${sqlHash60("gram")}),
       |topn AS (SELECT doc_id, n, cnt * glen AS num FROM (
       |    SELECT doc_id, n, cnt, glen, row_number() OVER (
       |        PARTITION BY doc_id, n ORDER BY cnt DESC, sh) AS rn
       |    FROM tc) WHERE rn = 1),
       |dgr AS (SELECT doc_id, n, i AS pos,
       |    array_to_string(w[i:i+n-1], ' ') AS gram
       |  FROM (SELECT doc_id, n, w, unnest(range(1, len(w) - n + 2)) AS i
       |        FROM d CROSS JOIN (SELECT unnest(${sqlNList(
      DupNgramPct.map(_._1))}) AS n))),
       |dh AS (SELECT doc_id, n, pos, ${sqlHash60("gram")} AS sh FROM dgr),
       |dc AS (SELECT doc_id, n, sh FROM dh
       |  GROUP BY doc_id, n, sh HAVING COUNT(*) >= 2),
       |dup AS (SELECT dh.doc_id, dh.n, dh.pos, dh.pos + dh.n - 1 AS e
       |  FROM dh JOIN dc USING (doc_id, n, sh)),
       |gi AS (SELECT doc_id, n, pos, e,
       |    SUM(CASE WHEN pmax IS NULL OR pos > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id, n ORDER BY pos
       |        ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM (SELECT doc_id, n, pos, e,
       |      MAX(e) OVER (PARTITION BY doc_id, n ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |    FROM dup)),
       |iv AS (SELECT doc_id, n, MIN(pos) AS a, MAX(e) AS b
       |  FROM gi GROUP BY doc_id, n, grp),
       |c AS (SELECT doc_id, p, SUM(wl) OVER (PARTITION BY doc_id
       |      ORDER BY p ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM (SELECT doc_id, i AS p, length(w[i]) AS wl
       |    FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
       |          FROM d))),
       |dupn AS (SELECT doc_id, n, CAST(SUM(chars) AS BIGINT) AS num
       |  FROM (SELECT iv.doc_id, iv.n,
       |      cb.cum - COALESCE(ca.cum, 0) + (iv.b - iv.a) AS chars
       |    FROM iv
       |    JOIN c cb ON cb.doc_id = iv.doc_id AND cb.p = iv.b
       |    LEFT JOIN c ca ON ca.doc_id = iv.doc_id AND ca.p = iv.a - 1)
       |  GROUP BY doc_id, n),
       |base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
       |  FROM documents WHERE length(text) >= 1),
       |tp AS (SELECT doc_id,
       |${TopNgramPct.map { case (n, _) =>
        s"    MAX(CASE WHEN n = $n THEN num END) AS t$n"
      }.mkString(",\n")}
       |  FROM topn GROUP BY doc_id),
       |dp AS (SELECT doc_id,
       |${DupNgramPct.map { case (n, _) =>
        s"    MAX(CASE WHEN n = $n THEN num END) AS d$n"
      }.mkString(",\n")}
       |  FROM dupn GROUP BY doc_id)
       |SELECT b.doc_id, b.n_chars,
       |${TopNgramPct.map { case (n, _) =>
        s"  CAST(COALESCE(t$n, 0) AS DOUBLE) / CAST(b.n_chars AS DOUBLE)" +
          s" AS top${n}_frac"
      }.mkString(",\n")},
       |${DupNgramPct.map { case (n, _) =>
        s"  CAST(COALESCE(d$n, 0) AS DOUBLE) / CAST(b.n_chars AS DOUBLE)" +
          s" AS dup${n}_frac"
      }.mkString(",\n")},
       |  (${(TopNgramPct.map { case (n, pct) =>
        s"COALESCE(t$n, 0) * 100 <= $pct * b.n_chars"
      } ++ DupNgramPct.map { case (n, pct) =>
        s"COALESCE(d$n, 0) * 100 <= $pct * b.n_chars"
      }).mkString("\n    AND ")}) AS gopher_keep
       |FROM base b
       |LEFT JOIN tp USING (doc_id)
       |LEFT JOIN dp USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    gopherProfile(Tables(spark, dir, "documents")).orderBy(col("doc_id"))
  }

  /** q151's per-document repetition profile (doc_id, n_chars, the
    * top/dup fracs, gopher_keep), unordered — shared with the q161
    * corpus-build manifest, whose gopher stage is exactly this keep
    * column. */
  private[graft] def gopherProfile(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), length(col("text")).cast(LongType).as("n_chars"))
      .filter(col("n_chars") >= 1)

    // top n-gram mass: per width, per doc, the most frequent gram's
    // occurrence count x its char length (ties: smallest 60-bit hash,
    // the deterministic stand-in for lexicographic order both engines
    // replay on the same hashes)
    val topNum = TopNgramPct.map { case (n, _) =>
      docs.select(col("doc_id"),
          explode(graft.functions.NGramGen(col("text"), n)).as("gram"))
        .select(col("doc_id"), hash60(col("gram")).as("sh"),
          length(col("gram")).cast(LongType).as("glen"))
        .groupBy(col("doc_id"), col("sh"))
        .agg(count(lit(1)).as("cnt"), max(col("glen")).as("glen"))
        .withColumn("n", lit(n))
    }.reduce(_ unionByName _)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("doc_id"), col("n"))
        .orderBy(col("cnt").desc, col("sh"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n"), (col("cnt") * col("glen")).as("num"))

    // duplicated n-gram coverage: positioned grams -> within-doc counts
    // -> occurrences of duplicated grams as token intervals -> interval
    // union (running-max islands) -> char length via token prefix sums
    val posGrams = DupNgramPct.map { case (n, _) =>
      docs.select(col("doc_id"),
          posexplode(graft.functions.NGramGen(col("text"), n))
            .as(Seq("p0", "gram")))
        .select(col("doc_id"), lit(n).as("n"),
          (col("p0") + 1).cast(LongType).as("pos"),
          hash60(col("gram")).as("sh"))
    }.reduce(_ unionByName _)
    val dupPos = posGrams
      .join(posGrams.groupBy(col("doc_id"), col("n"), col("sh"))
          .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2)
          .drop("cnt"),
        Seq("doc_id", "n", "sh"))
      .select(col("doc_id"), col("n"), col("pos"),
        (col("pos") + col("n") - 1).as("e"))
    val wSeq = Window.partitionBy(col("doc_id"), col("n"))
      .orderBy(col("pos"))
    val ivs = dupPos
      .withColumn("pmax",
        max(col("e")).over(wSeq.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("grp",
        sum(when(col("pmax").isNull || col("pos") > col("pmax"), 1L)
          .otherwise(0L)).over(wSeq))
      .groupBy(col("doc_id"), col("n"), col("grp"))
      .agg(min(col("pos")).as("a"), max(col("e")).as("b"))
    val cum = docs
      .select(col("doc_id"), posexplode(words(col("text")))
        .as(Seq("p0", "wd")))
      .select(col("doc_id"), (col("p0") + 1).cast(LongType).as("p"),
        length(col("wd")).cast(LongType).as("wl"))
      .withColumn("cum", sum(col("wl")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("p"))))
      .select(col("doc_id"), col("p"), col("cum"))
    val dupNum = ivs.as("iv")
      .join(cum.as("cb"), col("iv.doc_id") === col("cb.doc_id") &&
        col("iv.b") === col("cb.p"))
      .join(cum.as("ca"), col("iv.doc_id") === col("ca.doc_id") &&
        (col("iv.a") - 1) === col("ca.p"), "left")
      .select(col("iv.doc_id").as("doc_id"), col("iv.n").as("n"),
        (col("cb.cum") - coalesce(col("ca.cum"), lit(0L)) +
          (col("iv.b") - col("iv.a"))).as("chars"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("chars")).as("num"))

    val tp = topNum.groupBy(col("doc_id")).agg(
      max(when(col("n") === TopNgramPct.head._1, col("num")))
        .as(s"t${TopNgramPct.head._1}"),
      TopNgramPct.tail.map { case (n, _) =>
        max(when(col("n") === n, col("num"))).as(s"t$n")
      }: _*)
    val dp = dupNum.groupBy(col("doc_id")).agg(
      max(when(col("n") === DupNgramPct.head._1, col("num")))
        .as(s"d${DupNgramPct.head._1}"),
      DupNgramPct.tail.map { case (n, _) =>
        max(when(col("n") === n, col("num"))).as(s"d$n")
      }: _*)

    val fracCols =
      TopNgramPct.map { case (n, _) =>
        (coalesce(col(s"t$n"), lit(0L)).cast(DoubleType) /
          col("n_chars").cast(DoubleType)).as(s"top${n}_frac")
      } ++ DupNgramPct.map { case (n, _) =>
        (coalesce(col(s"d$n"), lit(0L)).cast(DoubleType) /
          col("n_chars").cast(DoubleType)).as(s"dup${n}_frac")
      }
    val keep = (TopNgramPct.map { case (n, pct) =>
      coalesce(col(s"t$n"), lit(0L)) * 100 <= lit(pct) * col("n_chars")
    } ++ DupNgramPct.map { case (n, pct) =>
      coalesce(col(s"d$n"), lit(0L)) * 100 <= lit(pct) * col("n_chars")
    }).reduce(_ && _)

    base
      .join(tp, Seq("doc_id"), "left")
      .join(dp, Seq("doc_id"), "left")
      .select(col("doc_id") +: col("n_chars") +: fracCols :+
        keep.as("gopher_keep"): _*)
  }

  /** Integer probability scale for the q153 LM scores: per-transition
    * probabilities in parts-per-billion, per-doc scores in parts-per-
    * million. Integer division (both engines floor positive operands
    * identically) keeps every compared value exact. */
  private[operators] val Ppb = 1000000000L

  /** q153: CCNet-style perplexity bucketing (Wenzek et al. 2020) — the
    * reference-model quality filter: train a bigram LM on the documents
    * that pass the q112 quality rules (the in-repo stand-in for CCNet's
    * Wikipedia reference), score EVERY document by its mean transition
    * probability under that reference with add-one smoothing (unknown
    * words and transitions score low instead of crashing the product —
    * the difference from q69, whose MLE over whole-corpus counts has no
    * out-of-vocabulary case), and split each source into head/middle/
    * tail thirds — the CCNet shape: downstream recipes keep head+middle.
    *
    * Everything compared is integer: each transition scores
    * `(c2+1)·10^9 div (c1+V)` (c2/c1 = reference bigram/prefix counts,
    * V = reference prefix vocabulary), a doc scores the integer mean in
    * ppm, and bucket assignment is integer cross-multiplication against
    * per-source cumulative counts. Buckets are assigned by SCORE-CLASS
    * thresholds (CCNet's percentile-cutoff semantics), not per-row
    * ntile: a doc is head iff its whole score class fits in the first
    * third (cum·3 ≤ n), tail iff the classes strictly above it already
    * cover two thirds ((cum−c)·3 ≥ 2n), else middle — ties share a
    * bucket, so the result is independent of row order.
    *
    * Shape at scale: bigrams hash to 60-bit longs before the two count
    * aggregations and the two lookup joins (q69's plan); the count
    * tables are vocabulary-sized and AQE-broadcast at runtime; V is one
    * scalar collect (Lloyd-pattern bounded). The bucket histogram is
    * (source × distinct ppm scores) — ≤ 10^6 rows per source BY
    * CONSTRUCTION regardless of corpus size, because scores quantize to
    * ppm — so the cumulative window runs over model-sized state, never a
    * per-document global sort (the q84 anti-pattern this avoids). */
  val q153PerplexityBuckets = QueryDef(
    "q153_perplexity_buckets",
    s"""WITH $sqlFunnelMetrics,
       |ref AS (SELECT d.doc_id, d.text FROM documents d
       |  JOIN m ON m.doc_id = d.doc_id WHERE $sqlKeepExpr),
       |rb AS (SELECT array_to_string(w[i:i+1], ' ') AS bg, w[i] AS pw
       |  FROM (SELECT w, unnest(range(1, len(w))) AS i
       |        FROM (SELECT string_split(text, ' ') AS w FROM ref
       |              WHERE len(string_split(text, ' ')) >= 2))),
       |rh AS (SELECT ${sqlHash60("bg")} AS h2, ${sqlHash60("pw")} AS h1
       |  FROM rb),
       |c2 AS (SELECT h2, CAST(COUNT(*) AS BIGINT) AS n2 FROM rh
       |  GROUP BY h2),
       |c1 AS (SELECT h1, CAST(COUNT(*) AS BIGINT) AS n1 FROM rh
       |  GROUP BY h1),
       |vv AS (SELECT CAST(COUNT(DISTINCT h1) AS BIGINT) AS v FROM rh),
       |ab AS (SELECT doc_id, source, array_to_string(w[i:i+1], ' ') AS bg,
       |    w[i] AS pw
       |  FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i
       |        FROM (SELECT doc_id, source, $sqlWords AS w FROM documents
       |              WHERE len($sqlWords) >= 2))),
       |ah AS (SELECT doc_id, source, ${sqlHash60("bg")} AS h2,
       |    ${sqlHash60("pw")} AS h1 FROM ab),
       |sc AS (SELECT doc_id, source,
       |    CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    CAST(SUM((COALESCE(n2, 0) + 1) * $Ppb
       |      // (COALESCE(n1, 0) + v)) AS BIGINT) AS sum_ppb
       |  FROM ah
       |  LEFT JOIN c2 USING (h2)
       |  LEFT JOIN c1 USING (h1)
       |  CROSS JOIN vv
       |  GROUP BY doc_id, source),
       |sp AS (SELECT doc_id, source, n_bigrams,
       |    sum_ppb // (n_bigrams * 1000) AS score_ppm FROM sc),
       |hist AS (SELECT source, score_ppm, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM sp GROUP BY source, score_ppm),
       |cum AS (SELECT source, score_ppm, c,
       |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY score_ppm DESC
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM hist),
       |bkt AS (SELECT source, score_ppm,
       |    CASE WHEN cum * 3 <= n THEN 'head'
       |         WHEN (cum - c) * 3 >= 2 * n THEN 'tail'
       |         ELSE 'middle' END AS bucket
       |  FROM cum)
       |SELECT sp.doc_id, sp.source, sp.n_bigrams, sp.score_ppm, b.bucket
       |FROM sp JOIN bkt b
       |  ON b.source = sp.source AND b.score_ppm = sp.score_ppm
       |ORDER BY sp.doc_id""".stripMargin) { (spark, dir) =>
    // production consumer: the reference model comes from the LmCache
    // artifact (trained + published on first use); q154 is the
    // gate-visible fresh-train bypass on the same oracle
    val (c2, c1, v) = LmCache.counts(spark, dir)
    perplexityReport(Tables(spark, dir, "documents"), c2, c1, v)
  }

  private def perplexityReport(docs: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame, v: Long)
      : org.apache.spark.sql.DataFrame =
    bucketReport(truncated(lmScores(docs, c2, c1, v)))

  private def perplexityReportV(docs: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame,
      vDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // sp feeds BOTH the per-doc report and the bucket histogram; AQE
    // plans the two subtrees independently (no exchange reuse across
    // them), so without a barrier the corpus text scan + model joins
    // execute twice in the final action (measured: q153 12 jobs). sp is
    // ONE narrow row per document — truncate it once and the join-back
    // is a doc-count-sized hash join (same cluster-aware posture as
    // [[lmCounts]]' model truncation).
    //
    bucketReport(truncated(lmScoresV(docs, c2, c1, vDf)))
  }

  /** The shared report tail over a TRUNCATED per-doc score table: bucket
    * thresholds, join-back, order. The bucket side is broadcast
    * EXPLICITLY: it is (source × distinct ppm scores) ≤ 10⁶ rows per
    * source by construction, while sp is corpus-scale — without the hint
    * Spark picked its build side from the checkpoint's unknown stats
    * (observed: BuildLeft on sp, i.e. broadcasting the per-document
    * table — wrong at any real scale). */
  private def bucketReport(sp: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    sp.join(broadcast(lmBuckets(sp)), Seq("source", "score_ppm"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        col("score_ppm"), col("bucket"))
      .orderBy(col("doc_id"))

  /** Lineage-truncate a SMALL (model- or doc-count-sized) relation so
    * multi-consumer plans materialize it once. Executor-local by
    * default; `spark.graft.cc.checkpointDir` switches to a reliable
    * store (on a cluster an executor loss makes a local checkpoint
    * unrecoverable — non-local deployments set it). */
  private def truncated(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = Mirror.truncated(df)

  /** q154: the q153 pipeline with the artifact tier bypassed BY
    * CONSTRUCTION — reference training runs fresh inside the query, so
    * the full train-then-score pipeline stays visible to the bench
    * regression gate and hash-checked against the SAME oracle every
    * round (the q135/q59 bypass pattern; LmCacheSpec proves q153 ≡
    * q154 row-for-row). */
  val q154PerplexityTrainPipeline = QueryDef(
    "q154_perplexity_train_pipeline",
    q153PerplexityBuckets.oracle.get) { (spark, dir) =>
    // Fresh-train path: V rides as a 1-row broadcast relation (exactly
    // the oracle's CROSS JOIN vv) instead of a blocking c1.count() driver
    // action — one fewer scheduled job between training and scoring.
    val (c2, c1, vDf) = lmRefCountsLazy(spark, dir)
    perplexityReportV(Tables(spark, dir, "documents"), c2, c1, vDf)
  }

  /** Per-occurrence bigram hash rows (keep-cols, h2, h1) — the token-
    * level LM state. private[graft]: the streaming manifest maintainer
    * ([[graft.streaming.ManifestStream]]) persists exactly these rows at
    * ingest so the LM stage never re-reads text. */
  private[graft] def bigramHashes(df: org.apache.spark.sql.DataFrame,
      keep: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(keep.map(col) :+
        explode(bigramGen(col("text"))).as("bg"): _*)
      .select(keep.map(col) :+ hash60(col("bg")).as("h2") :+
        hash60(substring_index(col("bg"), " ", 1)).as("h1"): _*)

  /** The q153/q154 reference training pipeline over `dir`'s documents:
    * the quality-rule-passing slice feeds [[lmCounts]]. The keep decision
    * is computed IN the text-scanning pass ([[funnelMetrics]] carrying
    * `text` through) and filtered in-row — the old doc_id join shuffled
    * the full documents table, text column included, just to apply a
    * per-row predicate. Fresh compute — [[LmCache.counts]] wraps this
    * with the persisted-artifact tier. */
  private[graft] def lmRefCounts(spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Long) =
    lmCounts(funnelMetrics(Tables(spark, dir, "documents"), Seq("text"))
      .filter(keepAll).select(col("text")))

  /** [[lmRefCounts]] with V kept LAZY — a 1-row (v) relation derived from
    * the truncated model instead of an eager c1.count(): the q154 fresh
    * path never blocks the driver between training and scoring, and the
    * scoring plan cross-joins the broadcast scalar exactly like the
    * oracle's `CROSS JOIN vv`. */
  private[graft] def lmRefCountsLazy(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val g = truncated(
      bigramHashes(funnelMetrics(Tables(spark, dir, "documents"),
          Seq("text")).filter(keepAll).select(col("text")), Seq.empty)
        .groupBy(col("h2"), col("h1")).agg(count(lit(1)).as("n")))
    val c1 = g.groupBy(col("h1")).agg(sum(col("n")).as("n1"))
    (g.groupBy(col("h2")).agg(sum(col("n")).as("n2")), c1,
      c1.select(count(lit(1)).as("v")))
  }

  /** The frozen q153 reference model: bigram counts, prefix counts, and
    * prefix-vocabulary size over `ref` (one scalar collect for V — the
    * Lloyd-pattern bound). Shared with the streaming twin
    * ([[graft.streaming.PerplexityStream]]), which trains once at start
    * and scores every arriving batch against the SAME counts. */
  private[graft] def lmCounts(ref: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Long) = {
    // ONE corpus-scale pass total: the occurrence-level (h2, h1) rows
    // funnel straight into a single (h2, h1)-keyed count aggregation —
    // h2 is the full-bigram hash and h1 its prefix hash, so BOTH model
    // tables re-aggregate exactly from it (c2(h2) = Σ_h1 n, c1(h1) =
    // Σ_h2 n; every occurrence contributes one (h2, h1) row, no
    // approximation). Only that bigram-vocabulary-sized table is
    // lineage-truncated; the occurrence rows are consumed by exactly one
    // aggregation, so they need no persist and nothing reference-sized
    // outlives this call (the round-16 ADVICE lifecycle concern shrinks
    // to a model-sized checkpoint). Truncation follows the shared
    // cluster-aware posture: `spark.graft.cc.checkpointDir` switches
    // executor-local truncation to a reliable store — without it an
    // executor loss on a cluster makes the truncated model
    // unrecoverable, which is why non-local deployments set it.
    val g = truncated(bigramHashes(ref, Seq.empty)
      .groupBy(col("h2"), col("h1")).agg(count(lit(1)).as("n")))
    val c2 = g.groupBy(col("h2")).agg(sum(col("n")).as("n2"))
    val c1 = g.groupBy(col("h1")).agg(sum(col("n")).as("n1"))
    // V = distinct prefixes = c1's cardinality; counted over the
    // truncated model-sized table — no second corpus pass
    (c2, c1, c1.count())
  }

  /** [[lmCounts]] over a PRE-COMPUTED bigram-hash table (h2, h1) — the
    * form the streaming manifest maintainer uses, where bigram rows are
    * persisted at ingest and the reference slice is an id filter. */
  private[graft] def lmCountsFromBigrams(rh: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        Long) =
    (rh.groupBy(col("h2")).agg(count(lit(1)).as("n2")),
      rh.groupBy(col("h1")).agg(count(lit(1)).as("n1")),
      rh.select(col("h1")).distinct().count())

  /** q153's per-document integer score under a frozen reference model:
    * (doc_id, source, n_bigrams, score_ppm). Stateless per document —
    * the property that makes the streaming twin's per-batch scoring
    * exactly the batch operator on the batch's rows. */
  private[graft] def lmScores(docs: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame, v: Long)
      : org.apache.spark.sql.DataFrame =
    lmScoresFromBigrams(bigramHashes(docs, Seq("doc_id", "source")),
      c2, c1, v)

  /** [[lmScores]] over a PRE-COMPUTED per-doc bigram-hash table
    * (doc_id, source, h2, h1) — the streaming-state form. */
  private[graft] def lmScoresFromBigrams(
      bg: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame, v: Long)
      : org.apache.spark.sql.DataFrame =
    bg
      .join(c2, Seq("h2"), "left")
      .join(c1, Seq("h1"), "left")
      .select(col("doc_id"), col("source"),
        expr(s"(coalesce(n2, 0L) + 1L) * $Ppb div (coalesce(n1, 0L) + $v)")
          .as("ppb"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppb")).as("sum_ppb"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        expr("sum_ppb div (n_bigrams * 1000L)").as("score_ppm"))

  /** [[lmScores]] with V as a 1-row broadcast relation (see
    * [[lmRefCountsLazy]]) — identical arithmetic, the scalar arrives via
    * a broadcast cross join (the oracle's `CROSS JOIN vv`) instead of a
    * collected literal. */
  private[graft] def lmScoresV(docs: org.apache.spark.sql.DataFrame,
      c2: org.apache.spark.sql.DataFrame,
      c1: org.apache.spark.sql.DataFrame,
      vDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    bigramHashes(docs, Seq("doc_id", "source"))
      .join(c2, Seq("h2"), "left")
      .join(c1, Seq("h1"), "left")
      .crossJoin(broadcast(vDf))
      .select(col("doc_id"), col("source"),
        expr(s"(coalesce(n2, 0L) + 1L) * $Ppb div (coalesce(n1, 0L) + v)")
          .as("ppb"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppb")).as("sum_ppb"))
      .select(col("doc_id"), col("source"), col("n_bigrams"),
        expr("sum_ppb div (n_bigrams * 1000L)").as("score_ppm"))

  /** q153's head/middle/tail thresholds from the (source × ppm score)
    * histogram of a scored table — ≤ 10⁶ rows per source by ppm
    * quantization, so the cumulative window never sees per-document
    * state. Row-order independent (score classes share a bucket). */
  private[graft] def lmBuckets(scored: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wCum = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.groupBy(col("source"), col("score_ppm"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("score_ppm"),
        when(col("cum") * 3 <= col("n"), "head")
          .when((col("cum") - col("c")) * 3 >= lit(2) * col("n"), "tail")
          .otherwise("middle").as("bucket"))
  }

  // ---------------------------------------------------------------------
  // q155/q156: multi-pattern blocklist filtering — the banned-phrase
  // filter every production corpus pipeline runs (Dolma/RefinedWeb-style
  // blocklists hold thousands of phrases). The native Aho–Corasick
  // expression ([[graft.functions.MultiMatch]]) counts EVERY pattern in
  // one pass per document, so cost is O(chars), not O(chars × patterns);
  // the pattern set is compiled once and rides the plan as a broadcast-
  // sized reference object. (Reference scope: the reference has no text
  // filtering at all — its only string predicates are null/sentinel
  // guards, covid_streaming.py:119-127.)
  // ---------------------------------------------------------------------

  /** Fixed demo blocklist (alphabetical, so pattern order == output
    * order): phrases over the synthetic vocabulary with shared prefixes
    * ("slow join"/"slow join sort"), nesting ("batch batch"/"batch batch
    * batch"), and self-overlap ("window window" in "window window
    * window") — the cases that exercise automaton fail links and the
    * non-overlapping count semantics. */
  private[graft] val blockPatterns: Seq[String] = Seq(
    "a part", "batch batch", "batch batch batch", "data line",
    "fast value", "key order sort", "merge slow", "slow join",
    "slow join sort", "spark table", "stream spark window",
    "window window")

  private val sqlBlockPats: String =
    blockPatterns.map(p => s"('$p')").mkString(", ")

  /** The per-document blocklist pass: ONE automaton scan per doc →
    * (doc_id, source, n_chars, counts) with `counts` aligned with
    * [[blockPatterns]]. Shared by batch q155/q156 and the streaming
    * ingest twin ([[graft.streaming.BlocklistStream]]) — scoring is
    * per-document pure (the pattern set is frozen at compile time), so
    * the stream's accumulated table is row-identical to this over the
    * same documents. */
  def blockHits(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("n_chars"),
      graft.functions.MultiMatch.counts(col("text"), blockPatterns)
        .as("counts"))

  /** The manifest's narrow per-doc verdict block in ONE text scan:
    * (doc_id, source, n_tokens, f1, f3[, carried…]). Every column here is
    * a total per-row projection over the same `words`/`text` pass —
    * n_tokens IS [[funnelMetrics]]' n_words (the identical `size(words)`
    * expression), f1 the [[keepAll]] decision in-row, f3 the
    * blocklist-clean flag via the native MultiMatch — so the three
    * verdicts that the corpus-build funnel previously attached with
    * three doc_id joins (each a corpus-scale shuffle of a thin table,
    * plus its own text scan) ride a single scan instead. The
    * aggregation-shaped verdicts (gopher's n-gram profile, the
    * perplexity bucket) stay joins — they genuinely reduce. */
  def narrowVerdicts(docs: DataFrame,
      carry: Seq[String] = Seq.empty): DataFrame =
    // ("text" +: carry).distinct: a caller already carrying "text" (the
    // manifest's docFlags does) must not make funnelMetrics select the
    // column twice — with same-exprId attributes the resolver happens to
    // dedup, but an aliased/recomputed text column would hit an
    // ambiguous-reference AnalysisException.
    funnelMetrics(docs, ("text" +: carry).distinct)
      .select(col("doc_id") +: col("source") +:
        col("n_words").as("n_tokens") +:
        keepAll.as("f1") +:
        (aggregate(
          graft.functions.MultiMatch.counts(col("text"), blockPatterns),
          lit(0L), (a, x) => a + x) === 0L).as("f3") +:
        carry.map(col): _*)

  /** q155 body over a (…, counts) table: per-pattern docs-hit +
    * occurrence rollup, ≤ n_patterns rows. */
  def blockReport(hits: DataFrame): DataFrame = {
    val patArr = array(blockPatterns.map(lit): _*)
    hits
      .select(posexplode(col("counts")).as(Seq("pid", "occ")))
      .groupBy(col("pid"))
      .agg(count(when(col("occ") > 0, 1)).as("docs_hit"),
        sum(col("occ")).as("occurrences"))
      .select(element_at(patArr, col("pid") + 1).as("pattern"),
        col("docs_hit"), col("occurrences"))
      .orderBy(col("pattern"))
  }

  /** q156 body over a (…, counts) table: per-source keep/drop funnel
    * verdict, ≤ n_sources rows. */
  def blockVerdict(hits: DataFrame): DataFrame =
    hits
      .select(col("source"), col("n_chars"),
        aggregate(col("counts"), lit(0L), (a, x) => a + x).as("hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_total"),
        count(when(col("hits") === 0, 1)).as("docs_kept"),
        count(when(col("hits") > 0, 1)).as("docs_dropped"),
        sum(col("hits")).as("occ_total"),
        coalesce(sum(when(col("hits") > 0, col("n_chars"))), lit(0L))
          .as("chars_dropped"))
      .orderBy(col("source"))

  /** Per-pattern blocklist hit report: documents hit and total leftmost
    * non-overlapping occurrences for every pattern (zero-hit patterns
    * included — a silent never-matching pattern is a blocklist bug).
    * Scale shape: one narrow corpus pass (the automaton), then a rollup
    * to ≤ n_patterns rows — map-side partial aggregation absorbs
    * everything before the one tiny shuffle. */
  val q155Blocklist = QueryDef(
    "q155_blocklist",
    s"""WITH pats(pattern) AS (VALUES $sqlBlockPats),
       |h AS (SELECT d.doc_id, p.pattern,
       |    CAST((length(d.text) - length(replace(d.text, p.pattern, '')))
       |      // length(p.pattern) AS BIGINT) AS occ
       |  FROM documents d CROSS JOIN pats p)
       |SELECT pattern, COUNT(CASE WHEN occ > 0 THEN 1 END) AS docs_hit,
       |  CAST(SUM(occ) AS BIGINT) AS occurrences
       |FROM h GROUP BY pattern ORDER BY pattern""".stripMargin) {
    (spark, dir) =>
    blockReport(blockHits(Tables(spark, dir, "documents")))
  }

  /** The blocklist filter verdict per source: docs kept/dropped, total
    * occurrences, and chars lost to the drop — the funnel-stage numbers
    * a pipeline reports before committing a blocklist. Per-doc totals
    * come from the same one-pass automaton column (`aggregate` over the
    * 12-long counts array); the rollup is ≤ n_sources rows. */
  val q156BlocklistKeep = QueryDef(
    "q156_blocklist_keep",
    s"""WITH pats(pattern) AS (VALUES $sqlBlockPats),
       |occ AS (SELECT d.doc_id, d.source, d.n_chars,
       |    CAST(SUM((length(d.text) - length(replace(d.text, p.pattern, '')))
       |      // length(p.pattern)) AS BIGINT) AS hits
       |  FROM documents d CROSS JOIN pats p
       |  GROUP BY d.doc_id, d.source, d.n_chars)
       |SELECT source, COUNT(*) AS docs_total,
       |  COUNT(CASE WHEN hits = 0 THEN 1 END) AS docs_kept,
       |  COUNT(CASE WHEN hits > 0 THEN 1 END) AS docs_dropped,
       |  CAST(SUM(hits) AS BIGINT) AS occ_total,
       |  CAST(COALESCE(SUM(CASE WHEN hits > 0 THEN n_chars END), 0)
       |    AS BIGINT) AS chars_dropped
       |FROM occ GROUP BY source ORDER BY source""".stripMargin) {
    (spark, dir) =>
    blockVerdict(blockHits(Tables(spark, dir, "documents")))
  }

  val all: Seq[QueryDef] = Seq(q112QualityFunnel, q113LengthDrift,
    q114EmbeddingQa, q115SplitLeakage, q116LangidConfusion,
    q151GopherRepetition, q153PerplexityBuckets,
    q154PerplexityTrainPipeline, q155Blocklist, q156BlocklistKeep)
}
