package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Statistics and dataset-management operators for a training-data
  * pipeline: deterministic sampling / train-valid-test splits, histogram
  * binning, and exact-moment correlation. None exist in the reference; all
  * are oracle-verified bit-exact.
  */
object Stats {
  import Mirror._

  /** Deterministic hash-based sampling + split assignment: bucket =
    * md5-hash(doc_id) mod 100 → 80/10/10 train/valid/test. The property a
    * training pipeline needs — membership is a pure function of the row
    * key — means the split survives reruns, repartitioning, and engine
    * changes (the oracle computes the identical assignment), unlike
    * `df.sample`/TABLESAMPLE whose seeds are engine-private. A narrow map:
    * no shuffle, embarrassingly parallel at any scale. */
  val q53HashSplit = QueryDef(
    "q53_hash_split",
    s"""SELECT doc_id, lang, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'valid'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, lang,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (hash60(col("doc_id").cast(StringType)) % 100).as("bucket"))
      .select(col("doc_id"), col("lang"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-width histogram per group: bin = floor(value / width). The
    * binning expression is one IEEE divide + floor — identical in both
    * engines — and the aggregation is an ordinary partial-pushed count:
    * the constant-memory way to profile a 100 TB column (vs collecting
    * quantiles exactly). */
  val q54Histogram = QueryDef(
    "q54_histogram",
    """SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type, bin
      |ORDER BY event_type, bin""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        floor(col("value") / 50.0).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** Pearson correlation from EXACT decimal moments. Built-in
    * `corr(x, y)` accumulates running co-moments in double — results vary
    * with merge order, so it can't be oracle-compared (and isn't
    * reproducible run to run at cluster scale). Summing the five moments
    * through exact decimals instead makes the aggregation
    * order-independent; the final formula is then one deterministic double
    * expression over identical inputs in both engines. Same single-pass,
    * partial-pushed shape as the built-in. */
  val q55ExactCorr = QueryDef(
    "q55_exact_corr",
    """SELECT event_type, n,
      |  (nd * sxy - sx * sy)
      |    / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)) AS corr_vu
      |FROM (
      |  SELECT event_type, COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) AS nd,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(user_id) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
      |      AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(user_id AS DECIMAL(18,0)))
      |      AS DOUBLE) AS sxy,
      |    CAST(SUM(user_id * user_id) AS DOUBLE) AS syy
      |  FROM events GROUP BY event_type)
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val x = col("value").cast(DecimalType(18, 2))
    val y = col("user_id")
    val moments = Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(lit(1)).cast(DoubleType).as("nd"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(x * y.cast(DecimalType(18, 0))).cast(DoubleType).as("sxy"),
        sum(y * y).cast(DoubleType).as("syy"))
    moments
      .select(col("event_type"), col("n"),
        ((col("nd") * col("sxy") - col("sx") * col("sy"))
          / (sqrt(col("nd") * col("sxx") - col("sx") * col("sx"))
            * sqrt(col("nd") * col("syy") - col("sy") * col("sy"))))
          .as("corr_vu"))
      .orderBy(col("event_type"))
  }

  /** Gap-based session windows with the BUILT-IN `session_window` function
    * — the declarative batch twin of [[graft.streaming.Sessions]] (which
    * needs flatMapGroupsWithState only because streaming emission must be
    * watermark-aware). One shuffle on the user key; Spark merges per-key
    * gap windows whose next event starts AT OR BEFORE the previous
    * session's end — a gap of EXACTLY 30 min still merges (probed on
    * Spark 4.1.2: two events 30:00 apart yield ONE session ending at
    * +60 min; the streaming twin's `<= gapMs` merge matches). The oracle
    * replays that as gaps-and-islands: a new session starts only when
    * the gap to the previous event EXCEEDS 30 min; session end = last
    * event + gap. The gap compares exact integer `epoch_us`, never
    * DuckDB's DOUBLE-typed `epoch()`, whose rounding near microsecond
    * boundaries could disagree with Spark's integer micros on exact-gap
    * ties — and BOTH window passes order by (ts, event_id), because a
    * running sum ordered by a timestamp with duplicates assigns
    * tie-group rows to sessions in nondeterministic order (driver data's
    * microsecond jitter never produced a tie; the 10× synthetic sweep's
    * second-granularity timestamps did, 31 phantom sessions per run). */
  val q56SessionWindow = QueryDef(
    "q56_session_window",
    s"""WITH d AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |           IS NULL
       |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
       |              ORDER BY ts, event_id)) > 1800000000
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |g AS (SELECT user_id, ts, value,
       |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM d)
       |SELECT user_id,
       |  MIN(ts) AS session_start,
       |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       |  COUNT(*) AS n_events,
       |  ${Exact.sqlSum("value")} AS sum_value
       |FROM g
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        Exact.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Scalar JSON-path extraction (`get_json_object`) — the schemaless
    * sibling of q26's full from_json decode: pull one field out of a JSON
    * props column without declaring its schema. Narrow map; the JSON parse
    * is the per-row cost, so at scale prefer q26's typed decode when the
    * schema is known. */
  val q57JsonPath = QueryDef(
    "q57_json_path",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    AS BIGINT) AS sum_k,
      |  COUNT(json_extract_string(props, '$.k')) AS n_with_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(sum(k).as("sum_k"), count(k).as("n_with_k"))
      .orderBy(col("event_type"))
  }

  /** Curriculum / length-bucket assignment: quartile bin, percent rank, and
    * cumulative distribution of document length within each language — the
    * binning a curriculum-learning or length-bucketed-batching data loader
    * consumes. One shuffle on `lang`, per-partition sort; the rank family
    * (ntile/percent_rank/cume_dist) is computed in a single window pass.
    * The ORDER BY carries doc_id as the unique tiebreak, so ranks — and
    * therefore every output value — are engine-independent; percent_rank
    * ((rank-1)/(n-1)) and cume_dist (peers/n) are int/int double divisions,
    * exactly rounded in both engines. Per-lang partitions are
    * corpus-fraction-sized; a single giant stratum would switch to the
    * q67-style order-statistic machinery instead of one sorted window. */
  val q70CurriculumBins = QueryDef(
    "q70_curriculum_bins",
    """SELECT doc_id, lang, n_chars,
      |  CAST(ntile(4) OVER win AS BIGINT) AS bin,
      |  percent_rank() OVER win AS pct_rank,
      |  cume_dist() OVER win AS cum_dist
      |FROM documents
      |WINDOW win AS (PARTITION BY lang ORDER BY n_chars, doc_id)
      |ORDER BY lang, n_chars, doc_id""".stripMargin) { (spark, dir) =>
    val win = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("bin", ntile(4).over(win).cast(LongType))
      .withColumn("pct_rank", percent_rank().over(win))
      .withColumn("cum_dist", cume_dist().over(win))
      .orderBy(col("lang"), col("n_chars"), col("doc_id"))
  }

  /** Missing-value repair on a per-user time series: forward fill (last
    * observation carried forward) and time-weighted linear interpolation
    * between the surrounding known points — the gap-repair pass an ML
    * feature pipeline runs before training. A deterministic hash mask
    * hides 2/3 of the values so the repair is exercised non-vacuously and
    * identically in both engines. Two windows per row (preceding /
    * following, IGNORE NULLS), one shuffle on user_id; the carried
    * (value, timestamp) pair rides as two same-row window results.
    * Interpolation weight is exact-integer epoch-microseconds divided in
    * double (int/int division is correctly rounded in both engines), and
    * the term order `prev + (next-prev)·w` is mirrored exactly, so the
    * repaired doubles hash-match. */
  val q75FillInterp = QueryDef(
    "q75_fill_interp",
    s"""WITH base AS (SELECT user_id, event_id, ts, epoch_us(ts) AS t,
       |    CASE WHEN ${sqlHash60("CAST(event_id AS VARCHAR)")} % 3 = 0
       |         THEN value END AS x
       |  FROM events),
       |w AS (SELECT user_id, event_id, x, t,
       |    last_value(x IGNORE NULLS) OVER pw AS pv,
       |    last_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS)
       |      OVER pw AS pt,
       |    first_value(x IGNORE NULLS) OVER nw AS nv,
       |    first_value(CASE WHEN x IS NOT NULL THEN t END IGNORE NULLS)
       |      OVER nw AS nt
       |  FROM base
       |  WINDOW pw AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS UNBOUNDED PRECEDING),
       |         nw AS (PARTITION BY user_id ORDER BY ts, event_id
       |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT user_id, event_id, x AS raw, pv AS ffill,
       |  CASE WHEN x IS NOT NULL THEN x
       |       WHEN pv IS NULL THEN nv
       |       WHEN nv IS NULL THEN pv
       |       ELSE pv + (nv - pv)
       |         * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
       |  END AS interp
       |FROM w
       |ORDER BY user_id, event_id""".stripMargin) { (spark, dir) =>
    val byU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prevW = byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextW = byU.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val base = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("t"),
        when(hash60(col("event_id").cast(StringType)) % 3 === 0,
          col("value")).as("x"))
    val w = base
      .withColumn("pv", last(col("x"), ignoreNulls = true).over(prevW))
      .withColumn("pt",
        last(when(col("x").isNotNull, col("t")), ignoreNulls = true)
          .over(prevW))
      .withColumn("nv", first(col("x"), ignoreNulls = true).over(nextW))
      .withColumn("nt",
        first(when(col("x").isNotNull, col("t")), ignoreNulls = true)
          .over(nextW))
    w.select(col("user_id"), col("event_id"), col("x").as("raw"),
        col("pv").as("ffill"),
        when(col("x").isNotNull, col("x"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * ((col("t") - col("pt")).cast(DoubleType)
              / (col("nt") - col("pt")).cast(DoubleType)))
          .as("interp"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val LangTokenBudget = 4000L

  /** Token-budget sampling: each language keeps documents in deterministic
    * md5-hash order until its token budget fills — the quota-ed subset
    * selection a data recipe uses ("at most N tokens of each language"),
    * with the q63 determinism property: membership is a pure function of
    * doc ids, stable across reruns, partitionings, and engines. One window
    * per stratum (running token sum over hash order, shard-local like
    * q60's packing); the first doc may overflow the budget by its own
    * tail, the convention that never splits a document and never starves a
    * stratum. All-integer running sums — nothing to drift. */
  val q80TokenBudgetSample = QueryDef(
    "q80_token_budget_sample",
    s"""WITH t AS (SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents),
       |c AS (SELECT doc_id, lang, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, lang, n_tokens, cum_tokens
       |FROM c
       |WHERE cum_tokens - n_tokens < $LangTokenBudget
       |ORDER BY lang, cum_tokens, doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.StringType
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        hash60(col("doc_id").cast(StringType)).as("h"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < LangTokenBudget)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("lang"), col("cum_tokens"), col("doc_id"))
  }

  /** Rolling 7-day distinct active users (DAU/WAU) per calendar day — the
    * usage-telemetry staple that is NOT expressible as a window function at
    * scale (COUNT(DISTINCT) over a RANGE frame either isn't supported or
    * degenerates to per-row set rebuilds).
    *
    * Scale shape: events first collapse to DISTINCT (user, day) — the only
    * corpus-sized shuffle, and a shrinking one (bounded by users × days).
    * Each collapsed row then fans FORWARD to the ≤ 7 window-days it
    * contributes to, and a plain exact distinct-agg per window-day finishes
    * the job. Total shuffle is O(7 · |distinct user-days|), independent of
    * how many raw events a hot user emits; the naive form re-scans the raw
    * event range once per output day. Days with no events report nothing
    * (the join back to observed days), matching the oracle. */
  val q85RollingActiveUsers = QueryDef(
    "q85_rolling_active_users",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |    FROM events),
      |days AS (SELECT DISTINCT day FROM ud),
      |exp AS (SELECT user_id, day + CAST(i.range AS INTEGER) AS day
      |    FROM ud CROSS JOIN range(7) i),
      |wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau
      |    FROM exp GROUP BY day),
      |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau
      |    FROM ud GROUP BY day)
      |SELECT day, dau, wau
      |FROM days JOIN dau USING (day) JOIN wau USING (day)
      |ORDER BY day""".stripMargin) { (spark, dir) =>
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    val wau = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("i"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("i")).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
    val dau = ud.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    days.join(dau, "day").join(wau, "day")
      .select(col("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  /** Ordered conversion funnel over the event stream: users who viewed,
    * then clicked within [[FunnelWindow]] after their first view, then
    * purchased within [[FunnelWindow]] after that first qualifying click.
    * First-touch semantics (MIN timestamps) with a per-stage conversion
    * window — deterministic, order-insensitive, and non-vacuous (an
    * unwindowed funnel saturates on any long-lived user base).
    *
    * Scale shape: each stage is one equi-join on user_id against the
    * previous stage's (user, min-ts) table followed by a min-agg — three
    * O(N) hash passes, no window over a user's full history and no
    * per-user event sorting. Stage tables shrink monotonically
    * (funnel property), so later joins get cheaper, and at cluster scale
    * the stage-k table is broadcastable long before stage counts
    * matter. */
  /** Per-stage conversion window for [[q87FunnelStages]] (exact integer
    * microsecond interval arithmetic in both engines). */
  private val FunnelWindow = expr("INTERVAL 2 HOURS")

  val q87FunnelStages = QueryDef(
    "q87_funnel_stages",
    // ts IS NOT NULL mirrors FunnelProcessor's null-row drop, so the
    // stream/batch parity contract holds even on a source whose schema
    // permits null timestamps (a MIN() funnel would otherwise silently
    // ignore them here but the streaming fold never sees them — same
    // outcome, now written identically on both paths)
    """WITH ev AS (SELECT user_id, event_type, ts FROM events
      |    WHERE ts IS NOT NULL),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev
      |    WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
      |    FROM ev e JOIN s1 USING (user_id)
      |    WHERE e.event_type = 'click' AND e.ts > s1.t1
      |      AND e.ts <= s1.t1 + INTERVAL 2 HOUR
      |    GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
      |    FROM ev e JOIN s2 USING (user_id)
      |    WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      |      AND e.ts <= s2.t2 + INTERVAL 2 HOUR
      |    GROUP BY e.user_id)
      |SELECT 1 AS stage, 'view' AS event_type, COUNT(*) AS n_users FROM s1
      |UNION ALL
      |SELECT 2 AS stage, 'click' AS event_type, COUNT(*) AS n_users FROM s2
      |UNION ALL
      |SELECT 3 AS stage, 'purchase' AS event_type, COUNT(*) AS n_users
      |FROM s3
      |ORDER BY stage""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .filter(col("ts").isNotNull) // mirror of FunnelProcessor's drop
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") &&
        col("ts") <= col("t1") + FunnelWindow)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id")
      .filter(col("ts") > col("t2") &&
        col("ts") <= col("t2") + FunnelWindow)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    def stage(df: org.apache.spark.sql.DataFrame, no: Int, et: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(no).as("stage"), lit(et).as("event_type"),
          col("n_users"))
    stage(s1, 1, "view")
      .unionAll(stage(s2, 2, "click"))
      .unionAll(stage(s3, 3, "purchase"))
      .orderBy(col("stage"))
  }

  /** Weekly cohort retention: users are cohorted by the Monday-start week
    * of their first activity; each following week-offset reports how many
    * of them were active again. Both engines truncate weeks to Monday, and
    * the week offset is exact integer day arithmetic divided at < 2^31
    * magnitudes, so the comparison is bit-exact.
    *
    * Scale shape: one distinct-collapse to (user, day), one min-agg for
    * the cohort day, one equi-join back on user_id, one distinct-count agg
    * — every step shuffles on a single key with map-side partials, nothing
    * is quadratic in users or days. */
  val q88CohortRetention = QueryDef(
    "q88_cohort_retention",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |    FROM events),
      |c AS (SELECT user_id, MIN(day) AS cday FROM ud GROUP BY user_id)
      |SELECT CAST(date_trunc('week', c.cday) AS DATE) AS cohort_week,
      |  CAST(FLOOR((ud.day - c.cday) / 7.0) AS BIGINT) AS week_no,
      |  COUNT(DISTINCT ud.user_id) AS n_users
      |FROM ud JOIN c USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_no""".stripMargin) { (spark, dir) =>
    val ud = Tables(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("cday"))
    ud.join(cohort, "user_id")
      .groupBy(
        date_trunc("week", col("cday")).cast("date").as("cohort_week"),
        floor(datediff(col("day"), col("cday")) / 7.0).as("week_no"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_no"))
  }

  /** First-order event-type transition matrix (the Markov-chain view of
    * user behavior): for every consecutive event pair within a user's
    * timeline, count prev→next transitions and their conditional
    * probability P(next | prev).
    *
    * Scale shape: ONE window pass partitioned by user (lag over
    * (ts, event_id) order — per-user history sorts in parallel, never a
    * global sort), then two shrinking aggregations: pair counts (output
    * bounded by |event types|², not events) and per-prev totals (a
    * broadcast-sized model table). The probability is a single int/int
    * IEEE division, bit-exact in both engines (the q79 rational-math
    * convention — no log/float accumulation). */
  val q90EventTransitions = QueryDef(
    "q90_event_transitions",
    """WITH t AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev
      |  FROM events),
      |c AS (SELECT prev, event_type, COUNT(*) AS n FROM t
      |  WHERE prev IS NOT NULL GROUP BY prev, event_type),
      |tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS total
      |  FROM c GROUP BY prev)
      |SELECT c.prev, c.event_type, c.n,
      |  CAST(c.n AS DOUBLE) / CAST(tot.total AS DOUBLE) AS p
      |FROM c JOIN tot USING (prev)
      |ORDER BY prev, event_type""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev"))
      .agg(sum(col("n")).as("total"))
    pairs.join(broadcast(totals), "prev")
      .select(col("prev"), col("event_type"), col("n"),
        (col("n").cast(DoubleType) / col("total").cast(DoubleType))
          .as("p"))
      .orderBy(col("prev"), col("event_type"))
  }

  /** HLL register count (m). 64 keeps the demo's standard-regime error
    * ~1.04/√m ≈ 13 %; production picks 2^12-2^14. Must be a power of 2. */
  private val HllM = 64L

  /** q138: HyperLogLog cardinality sketch vs exact distinct — the
    * associative-merge distinct-count structure a 100 TB scan actually
    * uses (Flajolet et al. 2007), evaluated the q117 way: build the
    * sketch AND the exact answer, report the measured error. Per source,
    * [[HllM]] registers over 3-word shingles: register b keeps the max
    * "leading-zero rank" ρ of any 60-bit shingle hash routed to b; the
    * estimate is αm·m²/Σ2^(−R[b]).
    *
    * Everything compared is deterministic: ρ is integer bit-length math
    * (`bin()` string length — identical across engines), 2^(−R) terms
    * are exact powers of two built by INTEGER shift (never `pow`), the
    * Σ is a left fold in register order ([[Mirror.foldSum]] discipline),
    * and αm enters as the same literal arithmetic both engines evaluate
    * with identical IEEE ops. No linear-counting branch: its m·ln(m/V)
    * needs libm `ln`, which is not bit-reproducible — and the shingle
    * domain (~1.4k/source at sf0.001) keeps every source in the
    * standard regime (n_zero_regs = 0; err_pm lands in the expected
    * ~1.04/√m band, asserted in StatsSketchSpec).
    *
    * Shape at scale: registers are a per-(source, bucket) MAX — partial
    * aggregation absorbs any skew, state is m rows per source, and
    * register tables MERGE (max is associative/commutative), which is
    * the whole point: distinct-counting a 100 TB corpus becomes a
    * shuffle of m·n_sources tiny rows. The exact branch exists to GRADE
    * the sketch (drop it in production); both branches hang off one
    * shared (source, shingle) distinct, whose exchange Spark reuses
    * (ReuseExchange — asserted in the spec). */
  /** The (source, shingle) distinct domain q138 sketches and grades on. */
  private[graft] def hllShingles(docs: DataFrame): DataFrame =
    rawShingles(docs).distinct()

  /** Per-occurrence (source, shingle) rows — [[hllShingles]] without the
    * corpus-scale DISTINCT exchange, for consumers that dedup inside
    * their own aggregation (collect_set / countDistinct / a downstream
    * hash-distinct). */
  private[graft] def rawShingles(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(shingleGen(col("text"))).as("sh"))

  /** Per-(source, bucket) HLL registers over a shingle slice. MERGEABLE:
    * the registers of a union of slices are the per-bucket max of each
    * slice's registers (max is associative/commutative — proven in
    * StatsSketchSpec), which is what lets 1000 executors sketch 100 TB
    * with map-side partial maxes and an m-rows-per-source shuffle. */
  private[graft] def hllRegistersOf(s: DataFrame): DataFrame = {
    val v = expr(s"h60 div $HllM")
    s.select(col("source"), hash60(col("sh")).as("h60"))
      .select(col("source"), (col("h60") % HllM).as("bucket"),
        when(v === 0L, lit(55L))
          .otherwise(lit(55L) - length(bin(v)).cast(LongType)).as("rho"))
      .groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  val q138HllCardinality = QueryDef(
    "q138_hll_cardinality",
    s"""WITH s AS (SELECT DISTINCT source, sh FROM (
       |    SELECT source, unnest($sqlShingleGen) AS sh FROM documents)),
       |h AS (SELECT source, ${sqlHash60("sh")} AS h60 FROM s),
       |r AS (SELECT source, h60 % $HllM AS bucket,
       |    MAX(CASE WHEN h60 // $HllM = 0 THEN 55
       |        ELSE 55 - length(bin(h60 // $HllM)) END) AS rho
       |  FROM h GROUP BY source, h60 % $HllM),
       |f AS (SELECT source,
       |    CAST(COUNT(*) AS BIGINT) AS n_regs,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list(rho ORDER BY bucket),
       |        x -> 1.0 / CAST((CAST(1 AS BIGINT) << x) AS DOUBLE))),
       |      (acc, v) -> acc + v) AS fold_terms
       |  FROM r GROUP BY source),
       |e AS (SELECT source, $HllM - n_regs AS n_zero_regs,
       |    fold_terms + ($HllM.0 - n_regs) AS sum_terms FROM f),
       |x AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
       |  FROM s GROUP BY source)
       |SELECT e.source, x.exact_distinct, e.n_zero_regs, e.sum_terms,
       |  (0.7213 / (1.0 + 1.079 / $HllM.0)) * ${HllM * HllM}.0
       |    / e.sum_terms AS est_raw,
       |  CAST(floor(abs((0.7213 / (1.0 + 1.079 / $HllM.0))
       |      * ${HllM * HllM}.0 / e.sum_terms
       |      - CAST(x.exact_distinct AS DOUBLE))
       |    * 1000000.0 / CAST(x.exact_distinct AS DOUBLE)) AS BIGINT)
       |    AS err_pm
       |FROM e JOIN x ON x.source = e.source
       |ORDER BY e.source""".stripMargin) { (spark, dir) =>
    val s = hllShingles(Tables(spark, dir, "documents"))
    val regs = hllRegistersOf(s)
    val folded = regs.groupBy(col("source")).agg(
      count(lit(1)).as("n_regs"),
      foldSum(transform(
        sort_array(collect_list(struct(col("bucket"), col("rho")))),
        x => lit(1.0)
          / shiftL(lit(1L), x.getField("rho")).cast(DoubleType)))
        .as("fold_terms"))
    val est = folded.select(col("source"),
      (lit(HllM) - col("n_regs")).as("n_zero_regs"),
      (col("fold_terms") + (lit(HllM.toDouble) - col("n_regs")))
        .as("sum_terms"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble))
    val exact = s.groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    est.join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_zero_regs"),
        col("sum_terms"),
        (alpha * lit((HllM * HllM).toDouble) / col("sum_terms"))
          .as("est_raw"),
        floor(abs(alpha * lit((HllM * HllM).toDouble) / col("sum_terms")
          - col("exact_distinct").cast(DoubleType))
          * 1000000.0 / col("exact_distinct").cast(DoubleType))
          .cast(LongType).as("err_pm"))
      .orderBy(col("source"))
  }

  /** Count-Min geometry: d rows × w counters. Tiny on purpose (the
    * sf0.001 shingle domain then exercises the εN overcount bound, not
    * just the collision-free regime); production sizes w ≈ e/ε. */
  private val CmsD = 4L
  private val CmsW = 256L

  /** Count-Min counter table over the shingle occurrence stream: row i
    * buckets each occurrence at `(h1 + i·h2) mod w` (Kirsch-Mitzenmacher
    * double hashing from the two independent 60-bit digest windows) and
    * counts. ASSOCIATIVE: counters of a union of slices are the
    * element-wise SUM of each slice's counters (StatsSketchSpec), so
    * 100 TB reduces to d·w cells per partition map-side, then one tiny
    * merge — the frequency twin of [[hllRegistersOf]]'s max-merge. */
  private[graft] def cmsCounters(occ: DataFrame): DataFrame =
    occ.select(hash60(col("sh")).as("h1"), hash60b(col("sh")).as("h2"))
      .select(explode(transform(sequence(lit(0L), lit(CmsD - 1)),
        i => struct(i.as("i"),
          ((col("h1") + i * col("h2")) % CmsW).as("bucket")))).as("ib"))
      .groupBy(col("ib.i").as("i"), col("ib.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** [[cmsCounters]] derived from a per-key count table (sh, n) instead
    * of the raw occurrence stream — element-wise IDENTICAL (a counter is
    * a sum over occurrences; summing n per key groups the same terms),
    * proven in StatsSketchSpec. q139 uses this path because its exact
    * grading side materializes the per-key rollup anyway, so the counter
    * build rides that shuffle instead of re-exploding every occurrence;
    * [[cmsCounters]] remains the production path when no per-key rollup
    * exists (the [[graft.streaming.SketchStream]] ingest shape). */
  private[graft] def cmsCountersFromCounts(byKey: DataFrame): DataFrame =
    byKey.select(col("n"), hash60(col("sh")).as("h1"),
      hash60b(col("sh")).as("h2"))
      .select(col("n"), explode(transform(sequence(lit(0L), lit(CmsD - 1)),
        i => struct(i.as("i"),
          ((col("h1") + i * col("h2")) % CmsW).as("bucket")))).as("ib"))
      .groupBy(col("ib.i").as("i"), col("ib.bucket").as("bucket"))
      .agg(sum(col("n")).as("c"))

  /** q139: Count-Min frequency sketch vs exact counts — the other
    * mergeable sketch a 100 TB profiler runs next to q138's HLL
    * (Cormode & Muthukrishnan 2005): estimate the frequency of the
    * top-20 true-heaviest shingles from a d×w counter table and report
    * the overcount. Everything is integer (counts, 60-bit hashes,
    * non-negative mod) — hash-exact across engines with no float
    * discipline needed at all.
    *
    * The graded guarantees: `cms_est ≥ exact_n` ALWAYS (min over rows
    * of sums that each include every true occurrence — one-sided by
    * construction, asserted for EVERY key in StatsSketchSpec, not just
    * the top 20), and overcount ≤ εN with ε = e/w at 1−(1/e)^d — the
    * [[CmsW]]=256 geometry puts the sf0.001 shingle stream (~27k
    * occurrences over ~21k keys) in the collision-heavy regime where
    * that bound is actually load-bearing.
    *
    * Shape at scale: the counter build is the scan — the 4-way
    * per-occurrence explode collapses to ≤ d·w rows per partition via
    * partial aggregation before anything shuffles; the probe joins the
    * 20-key top list against the broadcast ≤1024-cell table. The exact
    * side (full per-key rollup + top-k) exists to GRADE the sketch and
    * drops in production. */
  val q139CountMin = QueryDef(
    "q139_count_min",
    s"""WITH occ AS (SELECT unnest($sqlShingleGen) AS sh FROM documents),
       |hh AS (SELECT sh, ${sqlHash60("sh")} AS h1,
       |    ${sqlHash60b("sh")} AS h2 FROM occ),
       |r AS (SELECT unnest(range(0, $CmsD)) AS i),
       |cm AS (SELECT i, (h1 + i * h2) % $CmsW AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS c
       |  FROM hh, r GROUP BY 1, 2),
       |byk AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS exact_n
       |  FROM occ GROUP BY sh),
       |top AS (SELECT sh, exact_n FROM byk
       |  ORDER BY exact_n DESC, sh LIMIT 20),
       |probe AS (SELECT t.sh, t.exact_n, r.i,
       |    (${sqlHash60("t.sh")} + r.i * ${sqlHash60b("t.sh")}) % $CmsW
       |      AS bucket
       |  FROM top t, r),
       |est AS (SELECT p.sh, p.exact_n, MIN(cm.c) AS cms_est
       |  FROM probe p JOIN cm ON cm.i = p.i AND cm.bucket = p.bucket
       |  GROUP BY 1, 2)
       |SELECT sh AS shingle, exact_n, cms_est,
       |  cms_est - exact_n AS overcount
       |FROM est ORDER BY exact_n DESC, shingle""".stripMargin) {
    (spark, dir) =>
    val occ = Tables(spark, dir, "documents")
      .select(explode(shingleGen(col("text"))).as("sh"))
    // ONE per-key rollup feeds both branches: counters ride its shuffle
    // (cmsCountersFromCounts ≡ cmsCounters, see its Scaladoc) and the
    // top-k exact side is the rollup's TakeOrdered
    val byKey = occ.groupBy(col("sh")).agg(count(lit(1)).as("exact_n"))
    val cm = cmsCountersFromCounts(
      byKey.select(col("sh"), col("exact_n").as("n")))
    val top = byKey.orderBy(col("exact_n").desc, col("sh")).limit(20)
    top
      .select(col("sh"), col("exact_n"), hash60(col("sh")).as("h1"),
        hash60b(col("sh")).as("h2"))
      .select(col("sh"), col("exact_n"),
        explode(transform(sequence(lit(0L), lit(CmsD - 1)),
          i => struct(i.as("i"),
            ((col("h1") + i * col("h2")) % CmsW).as("bucket")))).as("ib"))
      .select(col("sh"), col("exact_n"), col("ib.i").as("i"),
        col("ib.bucket").as("bucket"))
      .join(broadcast(cm), Seq("i", "bucket"))
      .groupBy(col("sh"), col("exact_n"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("sh").as("shingle"), col("exact_n"), col("cms_est"),
        (col("cms_est") - col("exact_n")).as("overcount"))
      .orderBy(col("exact_n").desc, col("shingle"))
  }

  /** KMV sketch size. 32 keeps the demo's standard error ~1/√(k−1) ≈ 18 %;
    * production picks 1024-4096. Like [[HllM]], tiny on purpose so the
    * small-SF run exercises the estimator, not the exhaustive regime. */
  private[operators] val KmvK = 32L

  /** 2^60 (the hash60 domain size) as an EXACT double — built by integer
    * shift then cast, never `pow` ([[Mirror.shiftL]] discipline). */
  private val KmvU = (1L << 60).toDouble

  /** The distinct per-source hash domain KMV sketches: one row per
    * (source, h60-of-shingle). Deduped on the HASH (not just the
    * shingle) so per-source ranks over `h` are total orders and both
    * engines keep the identical k-smallest set. */
  private[graft] def kmvValues(docs: DataFrame): DataFrame =
    hllShingles(docs)
      .select(col("source"), hash60(col("sh")).as("h"))
      .distinct()

  /** Per-source KMV sketch: the [[KmvK]] SMALLEST distinct hash values.
    * Applies its own distinct, so it is also the MERGE operation — the
    * k-smallest of a union of per-slice k-smallest sets equals the
    * k-smallest of the whole (min-union is associative/commutative and
    * naturally idempotent; proven in StatsSketchSpec). The row_number ≤ k
    * filter is the TopKPerKey rewrite's shape, so per-source state never
    * exceeds k rows anywhere in the plan — 100 TB of shingles reduce to
    * map-side partial top-k then a k·n_sources-row shuffle. */
  private[graft] def kmvSketchOf(v: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("h"))
    v.select(col("source"), col("h")).distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= KmvK)
      .drop("rn")
  }

  /** q149: K-Minimum-Values distinct sketch vs exact distinct — the
    * third mergeable sketch of the profiler triple (Bar-Yossef et al.
    * 2002; the Theta-sketch family's base case), next to q138's HLL
    * (max-merge) and q139's Count-Min (sum-merge): keep the k smallest
    * distinct 60-bit shingle hashes per source; the k-th smallest value
    * U(k) estimates distinct ≈ (k−1)·2^60/U(k). Every compared number
    * is deterministic: the kept set is an exact rank over unique
    * integers, the estimate is one IEEE multiply-divide both engines
    * evaluate on identical operands, and err_pm is integer-floored ppm
    * (the q138 grading convention). Sources with fewer than k distinct
    * hashes report exactly (the sketch IS the set) — the CASE both
    * engines evaluate identically.
    *
    * Why KMV next to HLL: registers only count — a KMV sketch is a
    * uniform SAMPLE of the distinct domain, so the same k rows/source
    * also answer set-expression queries (q150 rides these sketches for
    * pairwise overlap, the union/intersection estimates HLL cannot
    * give without inclusion-exclusion error stacking).
    *
    * Shape at scale: per-source state is ≤ k rows at every plan point
    * (TopKPerKey partial top-k map-side); the exact branch exists to
    * GRADE the sketch and drops in production. */
  val q149KmvDistinct = QueryDef(
    "q149_kmv_distinct",
    s"""WITH s AS (SELECT DISTINCT source, sh FROM (
       |    SELECT source, unnest($sqlShingleGen) AS sh FROM documents)),
       |v AS (SELECT DISTINCT source, ${sqlHash60("sh")} AS h FROM s),
       |r AS (SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM v),
       |k AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_k,
       |    MAX(h) AS kth_min
       |  FROM r WHERE rn <= $KmvK GROUP BY source),
       |x AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
       |  FROM s GROUP BY source),
       |e AS (SELECT k.source, x.exact_distinct, k.n_k, k.kth_min,
       |    CASE WHEN k.n_k < $KmvK THEN CAST(x.exact_distinct AS DOUBLE)
       |      ELSE ${KmvK - 1}.0
       |        * CAST((CAST(1 AS BIGINT) << 60) AS DOUBLE)
       |        / CAST(k.kth_min AS DOUBLE) END AS est_raw
       |  FROM k JOIN x ON x.source = k.source)
       |SELECT source, exact_distinct, n_k, kth_min, est_raw,
       |  CAST(floor(abs(est_raw - CAST(exact_distinct AS DOUBLE))
       |    * 1000000.0 / CAST(exact_distinct AS DOUBLE)) AS BIGINT)
       |    AS err_pm
       |FROM e ORDER BY source""".stripMargin) { (spark, dir) =>
    // RAW shingle occurrences — no string-level distinct: the sketch
    // chain dedups on (source, hash) inside kmvSketchOf (DISTINCT over
    // raw hashes ≡ DISTINCT over pre-distincted strings, hash collisions
    // merge identically), and the exact branch dedups inside its own
    // aggregation (countDistinct). The old shape ran the corpus-scale
    // (source, sh) DISTINCT exchange once per consumer and then
    // re-distincted the hashes on top of it.
    val raw = rawShingles(Tables(spark, dir, "documents"))
    val sketch = kmvSketchOf(
      raw.select(col("source"), hash60(col("sh")).as("h")))
    val k = sketch.groupBy(col("source"))
      .agg(count(lit(1)).as("n_k"), max(col("h")).as("kth_min"))
    val exact = raw.groupBy(col("source"))
      .agg(countDistinct(col("sh")).as("exact_distinct"))
    val est = when(col("n_k") < KmvK, col("exact_distinct").cast(DoubleType))
      .otherwise(lit((KmvK - 1).toDouble) * lit(KmvU)
        / col("kth_min").cast(DoubleType))
    k.join(exact, Seq("source"))
      .select(col("source"), col("exact_distinct"), col("n_k"),
        col("kth_min"), est.as("est_raw"))
      .select(col("source"), col("exact_distinct"), col("n_k"),
        col("kth_min"), col("est_raw"),
        floor(abs(col("est_raw") - col("exact_distinct").cast(DoubleType))
          * 1000000.0 / col("exact_distinct").cast(DoubleType))
          .cast(LongType).as("err_pm"))
      .orderBy(col("source"))
  }

  /** q150: pairwise source overlap from the q149 KMV sketches vs the
    * exact pairwise Jaccard — the estimator that makes KMV worth its k
    * rows (Beyer et al. 2007): for each source pair, take the k smallest
    * of the two sketches' VALUE union; the fraction of those present in
    * BOTH sketches estimates Jaccard, and scaling by the union-sketch's
    * own (k−1)·2^60/θ distinct estimate gives the intersection size.
    * This is q97's approximate twin: exact source-overlap at 100 TB
    * joins the corpus against itself per pair — the KMV version touches
    * ONLY the k·n_sources-row sketch table (every stage after sketch
    * construction is O(n_sources²·k), corpus-independent).
    *
    * Determinism: membership flags are integer MAX over exact ranks of
    * unique integers; est_jaccard = n_both/k is exact (small int over a
    * power of two); the union estimate is the q149 IEEE form; err_pm
    * grades the JACCARD estimate in absolute ppm (exact_j can be 0, so
    * relative error is undefined — both engines floor the same product).
    * The exact branch (pair-join over the distinct shingle domain)
    * exists to GRADE and drops in production. */
  val q150KmvOverlap = QueryDef(
    "q150_kmv_overlap",
    s"""WITH s AS (SELECT DISTINCT source, sh FROM (
       |    SELECT source, unnest($sqlShingleGen) AS sh FROM documents)),
       |v AS (SELECT DISTINCT source, ${sqlHash60("sh")} AS h FROM s),
       |r AS (SELECT source, h,
       |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn
       |  FROM v),
       |k AS (SELECT source, h FROM r WHERE rn <= $KmvK),
       |p AS (SELECT a.source AS src_a, b.source AS src_b
       |  FROM (SELECT DISTINCT source FROM s) a
       |  JOIN (SELECT DISTINCT source FROM s) b ON a.source < b.source),
       |uv AS (SELECT p.src_a, p.src_b, k.h,
       |    MAX(CASE WHEN k.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
       |    MAX(CASE WHEN k.source = p.src_b THEN 1 ELSE 0 END) AS in_b
       |  FROM p JOIN k ON k.source IN (p.src_a, p.src_b)
       |  GROUP BY p.src_a, p.src_b, k.h),
       |ur AS (SELECT src_a, src_b, h, in_a, in_b,
       |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn
       |  FROM uv),
       |u AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_vals,
       |    MAX(h) AS theta,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
       |  FROM ur WHERE rn <= $KmvK GROUP BY src_a, src_b),
       |xv AS (SELECT p.src_a, p.src_b, s.sh,
       |    MAX(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS in_a,
       |    MAX(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS in_b
       |  FROM p JOIN s ON s.source IN (p.src_a, p.src_b)
       |  GROUP BY p.src_a, p.src_b, s.sh),
       |x AS (SELECT src_a, src_b,
       |    CAST(COUNT(*) AS BIGINT) AS exact_union,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS exact_inter
       |  FROM xv GROUP BY src_a, src_b),
       |e AS (SELECT u.src_a, u.src_b, x.exact_inter, x.exact_union,
       |    u.n_both, u.theta,
       |    CAST(x.exact_inter AS DOUBLE) / CAST(x.exact_union AS DOUBLE)
       |      AS exact_jaccard,
       |    CAST(u.n_both AS DOUBLE) / CAST(u.n_vals AS DOUBLE)
       |      AS est_jaccard,
       |    CASE WHEN u.n_vals < $KmvK THEN CAST(u.n_vals AS DOUBLE)
       |      ELSE ${KmvK - 1}.0
       |        * CAST((CAST(1 AS BIGINT) << 60) AS DOUBLE)
       |        / CAST(u.theta AS DOUBLE) END AS est_union
       |  FROM u JOIN x ON x.src_a = u.src_a AND x.src_b = u.src_b)
       |SELECT src_a, src_b, exact_inter, exact_union, n_both, theta,
       |  exact_jaccard, est_jaccard, est_jaccard * est_union AS est_inter,
       |  CAST(floor(abs(est_jaccard - exact_jaccard) * 1000000.0)
       |    AS BIGINT) AS err_pm
       |FROM e ORDER BY src_a, src_b""".stripMargin) { (spark, dir) =>
    // TWO corpus passes total (was four executions of the corpus-scale
    // explode+DISTINCT subtree — the sketch chain, the source dimension,
    // the per-source rollup, and the per-shingle pass each re-ran it):
    //  1. the sketch chain, dedup fused into kmvSketchOf's own DISTINCT
    //     (raw hashes ≡ pre-distincted strings — collisions merge
    //     identically);
    //  2. ONE per-shingle aggregation whose source set expands natively
    //     (PairGen, ≤ n_sources²/2 structs per shingle) to its unordered
    //     pairs PLUS the diagonal — a (src_a=src_b=s) struct per member —
    //     so a single (a, b) count table carries the per-pair
    //     intersections (a < b) AND the per-source distinct-shingle
    //     counts (a = b); the source dimension is the diagonal's key set
    //     (a source has a diagonal row iff it has ≥ 1 shingle, exactly
    //     the old DISTINCT source domain).
    // Every branch consumes RAW shingle occurrences and dedups inside
    // its own aggregation — the old shape put a corpus-scale
    // (source, sh) string-DISTINCT exchange under FOUR consumers (the
    // sketch chain re-distincted the hashes on top of it; the source
    // dimension ran a full explode+DISTINCT just to list 20 sources).
    // The plan stays ONE lazy action (no driver barrier): at bench scale
    // sibling subtrees overlap across cores, and at cluster scale each
    // branch is one exchange narrower than before.
    val docs = Tables(spark, dir, "documents")
    val raw = rawShingles(docs)
    val sketch = kmvSketchOf(
      raw.select(col("source"), hash60(col("sh")).as("h")))
    // the source dimension off the BASE TABLE — no shingle explode. A
    // source whose docs carry zero shingles gains pair rows here, but
    // they die in the INNER perSrc joins of x below exactly like the
    // never-formed pairs of the old DISTINCT-over-shingles dimension.
    val sources = docs.select(col("source")).distinct()
    val pairs = sources.as("a").join(sources.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
    def flagged(values: DataFrame, valueCol: String): DataFrame =
      broadcast(pairs).join(values,
          values("source") === col("src_a") ||
            values("source") === col("src_b"))
        .groupBy(col("src_a"), col("src_b"), col(valueCol))
        .agg(max(when(col("source") === col("src_a"), 1L).otherwise(0L))
            .as("in_a"),
          max(when(col("source") === col("src_b"), 1L).otherwise(0L))
            .as("in_b"))
    val ur = flagged(sketch, "h").withColumn("rn",
      row_number().over(
        Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
    val u = ur.filter(col("rn") <= KmvK)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_vals"), max(col("h")).as("theta"),
        sum(col("in_a") * col("in_b")).as("n_both"))
    // exact side: inclusion-exclusion from ONE per-shingle pass — each
    // shingle's (sorted, ≤ n_sources) source set expands to its pairs
    // natively (PairGen, the capped-bucket discipline: ≤ n_sources²/2
    // structs per shingle regardless of corpus), giving per-pair
    // intersection counts; union = nA + nB − inter. collect_set dedups
    // the raw occurrences in-aggregation — no upstream DISTINCT.
    val inter = raw.groupBy(col("sh"))
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(explode(Mirror.pairs(col("ss"))).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val perSrc = raw.groupBy(col("source"))
      .agg(countDistinct(col("sh")).as("n_sh"))
    val x = pairs
      .join(broadcast(perSrc.select(col("source").as("src_a"),
        col("n_sh").as("na"))), "src_a")
      .join(broadcast(perSrc.select(col("source").as("src_b"),
        col("n_sh").as("nb"))), "src_b")
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        (col("na") + col("nb") -
          coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
    val estUnion = when(col("n_vals") < KmvK, col("n_vals").cast(DoubleType))
      .otherwise(lit((KmvK - 1).toDouble) * lit(KmvU)
        / col("theta").cast(DoubleType))
    u.join(x, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("exact_inter"),
        col("exact_union"), col("n_both"), col("theta"),
        (col("exact_inter").cast(DoubleType)
          / col("exact_union").cast(DoubleType)).as("exact_jaccard"),
        (col("n_both").cast(DoubleType) / col("n_vals").cast(DoubleType))
          .as("est_jaccard"),
        estUnion.as("est_union"))
      .select(col("src_a"), col("src_b"), col("exact_inter"),
        col("exact_union"), col("n_both"), col("theta"),
        col("exact_jaccard"), col("est_jaccard"),
        (col("est_jaccard") * col("est_union")).as("est_inter"),
        floor(abs(col("est_jaccard") - col("exact_jaccard")) * 1000000.0)
          .cast(LongType).as("err_pm"))
      .orderBy(col("src_a"), col("src_b"))
  }

  val all: Seq[QueryDef] = Seq(q53HashSplit, q54Histogram, q55ExactCorr,
    q56SessionWindow, q57JsonPath, q70CurriculumBins, q75FillInterp,
    q80TokenBudgetSample, q85RollingActiveUsers, q87FunnelStages,
    q88CohortRetention, q90EventTransitions, q138HllCardinality,
    q139CountMin, q149KmvDistinct, q150KmvOverlap)
}
