package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.3–§2.7): projections,
  * filters, joins, hash/window aggregation, dedup, top-k — each as a
  * verifiable query over the driver test tables.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins (`nation`, `region`, `part`) are explicit
  *    `broadcast()`s — no shuffle of the fact table for dim lookups;
  *  - fact-fact joins (orders⋈customer, lineitem⋈orders) are left to
  *    Catalyst's sort-merge with AQE so skew/re-plan handling is free;
  *  - top-k is `orderBy(...).limit(k)` which Catalyst plans as
  *    `TakeOrderedAndProject` — per-partition heaps, no global sort;
  *  - every aggregate is hash-based with map-side partial aggregation.
  *
  * Every query ends in a deterministic ORDER BY (with key tie-breaks) so the
  * driver's hash compare is order-stable; Catalyst removes those sorts when
  * the result feeds a `count()` (bench path), so they are verification-only
  * cost.
  */
object Relational {
  import Exact._

  /** TPC-H Q1-shaped pricing summary: hash agg with map-side combine.
    * Mirrors reference aggregation semantics at covid_streaming.py:162-180
    * (grouped sum/avg) re-expressed over lineitem. */
  val q01PricingSummary = QueryDef(
    "q01_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_discount", 4)} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top-k aggregate (reference init.sql:105-110 `top_10_affected_countries`
    * semantics): group → sum → ORDER BY DESC LIMIT 10, planned as
    * TakeOrderedAndProject (no global sort at scale). */
  val q02TopkCustomers = QueryDef(
    "q02_topk_customers",
    s"""SELECT o_custkey,
       |  ${sqlSum("o_totalprice")} AS total_spend,
       |  COUNT(*) AS n_orders
       |FROM orders
       |GROUP BY o_custkey
       |ORDER BY total_spend DESC, o_custkey
       |LIMIT 10""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        dsum(col("o_totalprice")).as("total_spend"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("total_spend").desc, col("o_custkey"))
      .limit(10)
  }

  /** Broadcast hash join: fact (lineitem) ⋈ small dim (part). The explicit
    * broadcast keeps the fact table un-shuffled at any scale. */
  val q03JoinBroadcast = QueryDef(
    "q03_join_broadcast",
    s"""SELECT p_brand,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Multiway star join (TPC-H Q5 shape): two fact-fact sort-merge joins +
    * two broadcast dim joins, revenue rollup per region/nation. */
  val q04JoinMultiway = QueryDef(
    "q04_join_multiway",
    s"""SELECT r_name, n_name,
       |  ${sqlSum("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin) { (spark, dir) =>
    val li = Tables(spark, dir, "lineitem")
    val orders = Tables(spark, dir, "orders")
    val customer = Tables(spark, dir, "customer")
    val nation = Tables(spark, dir, "nation")
    val region = Tables(spark, dir, "region")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join (EXISTS): customers holding at least one 'F' order. */
  val q05SemiJoin = QueryDef(
    "q05_semi_join",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val customer = Tables(spark, dir, "customer")
    val fOrders = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
    customer
      .join(fOrders, customer("c_custkey") === fOrders("o_custkey"),
        "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): customers with no high-value order, per
    * nation. (Every customer in the fixture has *some* order, so the anti
    * side is predicated to keep the result non-vacuous.) */
  val q06AntiJoin = QueryDef(
    "q06_anti_join",
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_totalprice > 300000.0)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    val customer = Tables(spark, dir, "customer")
    val bigOrders = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000.0)
    customer
      .join(bigOrders, customer("c_custkey") === bigOrders("o_custkey"),
        "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))
  }

  /** OR-predicate filter + projection (reference hotspot filter shape,
    * covid_streaming.py:186). The conjunct on l_returnflag is pushed into
    * the parquet scan; the disjunction is evaluated codegen'd. */
  val q07FilterProject = QueryDef(
    "q07_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
      |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND (l_quantity > 45.0 OR l_discount > 0.09)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
    // charge is raw IEEE double math (no round): identical parenthesization
    // over identical parquet doubles is bit-identical in Spark and DuckDB,
    // whereas round() diverges on half-boundaries (HALF_UP vs C rounding).
    Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R" &&
        (col("l_quantity") > 45.0 || col("l_discount") > 0.09))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("charge"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Window spec shared by the analytic queries: one hash-partition
    * exchange on user_id + per-partition sort, reused across frames
    * (Catalyst computes all frames in a single Window operator). */
  private def userWindow = Window
    .partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** Trailing-mean window frames (reference W1/W2, covid_streaming.py:67-79):
    * 7-row and 14-row trailing averages per user. */
  val q08WindowTrailing = QueryDef(
    "q08_window_trailing",
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w7 AS DOUBLE)
      |    / CAST(COUNT(value) OVER w7 AS DOUBLE) AS avg_7,
      |  CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w14 AS DOUBLE)
      |    / CAST(COUNT(value) OVER w14 AS DOUBLE) AS avg_14
      |FROM events
      |WINDOW
      |  w7 AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      |  w14 AS (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    // Trailing mean as exact-decimal sum / count (value is 2-decimal, so the
    // DECIMAL(30,2) cast is lossless): the frame sum is order-independent and
    // the final double division is IEEE-identical across engines. A raw
    // avg(double) window would differ in the last ulps between engines.
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    def frameAvg(lo: Int): Column = {
      val w = userWindow.rowsBetween(lo, 0)
      sum(col("value").cast(DecimalType(30, 2))).over(w).cast(DoubleType) /
        count(col("value")).over(w).cast(DoubleType)
    }
    Tables(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        frameAvg(-6).as("avg_7"),
        frameAvg(-13).as("avg_14"))
      .orderBy(col("event_id"))
  }

  /** lag + guarded growth rate (reference W3/W4, covid_streaming.py:69-78):
    * (value - prev)/prev with a divide-by-zero/null guard. */
  val q09WindowLagGrowth = QueryDef(
    "q09_window_lag_growth",
    """SELECT event_id, user_id, value,
      |  LAG(value, 1) OVER w AS prev_value,
      |  CASE WHEN LAG(value, 1) OVER w > 0.0
      |       THEN (value - LAG(value, 1) OVER w) / LAG(value, 1) OVER w
      |       ELSE 0.0 END AS growth_rate
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    // growth_rate is raw IEEE (value-prev)/prev — bit-identical across
    // engines; round() would diverge on half-boundaries.
    val prev = lag(col("value"), 1).over(userWindow)
    Tables(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"), col("value"),
        prev.as("prev_value"),
        when(prev > 0.0, (col("value") - prev) / prev)
          .otherwise(0.0).as("growth_rate"))
      .orderBy(col("event_id"))
  }

  /** Ranking (reference W8, the implied country_rankings at init.sql:81-90):
    * top-3 customers per nation by balance via row_number. */
  val q10RankTopn = QueryDef(
    "q10_rank_topn",
    """SELECT * FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_nationkey, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(spark, dir, "customer")
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Deterministic dedup (reference A2, covid_streaming.py:153): first row
    * per (user_id, event_type) expressed as row_number()=1 so survivor
    * choice is well-defined for the oracle (dropDuplicates keeps an
    * arbitrary row; this is its order-stable equivalent). */
  val q11DedupFirstRow = QueryDef(
    "q11_dedup_first_row",
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Tumbling-window grouped aggregation (reference A1,
    * covid_streaming.py:162-180): 5-minute windows × event_type with
    * sum/avg/exact distinct. */
  val q12WindowedAgg = QueryDef(
    "q12_windowed_agg",
    s"""SELECT time_bucket(INTERVAL '5 minutes', ts) AS w_start, event_type,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS sum_value,
       |  ${sqlAvg("value")} AS avg_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"), col("n_users"))
      .orderBy(col("w_start"), col("event_type"))
  }

  /** Daily dashboard rollup (reference A3, init.sql:92-103): GROUP BY date
    * with exact distinct + conditional count. */
  val q13DailyRollup = QueryDef(
    "q13_daily_rollup",
    s"""SELECT CAST(ts AS DATE) AS day,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  ${sqlSum("value")} AS sum_value,
       |  ${sqlAvg("value")} AS avg_value,
       |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
       |  COUNT(*) AS n_events
       |FROM events
       |GROUP BY 1
       |ORDER BY 1""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"),
        count(when(col("event_type") === "error", lit(1))).as("n_errors"),
        count(lit(1)).as("n_events"))
      .orderBy(col("day"))
  }

  /** Hopping (sliding) window aggregation — q12's tumbling variant with
    * overlap: 10-minute windows every 5 minutes, so every event lands in
    * exactly two windows. Spark's `window(ts, len, slide)` generates the
    * window set per row (a narrow expansion before the hash agg, map-side
    * partials intact — the fan-out factor is len/slide, fixed and small);
    * the oracle mirrors it by unnesting each event's two bucket starts.
    * The streaming form is identical (SURVEY §2.9 T4: same expression on
    * a watermarked stream). */
  val q92HoppingWindow = QueryDef(
    "q92_hopping_window",
    s"""WITH e AS (SELECT ts, event_type, value,
       |    time_bucket(INTERVAL '5 minutes', ts) AS b FROM events),
       |h AS (SELECT event_type, value,
       |    unnest([b, b - INTERVAL 5 MINUTE]) AS w_start FROM e)
       |SELECT w_start, event_type,
       |  COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS sum_value
       |FROM h
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02TopkCustomers, q03JoinBroadcast, q04JoinMultiway,
    q05SemiJoin, q06AntiJoin, q07FilterProject, q08WindowTrailing,
    q09WindowLagGrowth, q10RankTopn, q11DedupFirstRow, q12WindowedAgg,
    q13DailyRollup, q92HoppingWindow)
}
