package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Completeness surface beyond the reference's own operators (SURVEY §2.7
  * notes none of these exist there): set operations, hierarchical rollup,
  * blocked n-gram Jaccard, skew-aware two-phase aggregation, and sketch
  * aggregates — the operators a user of a general engine reaches for next.
  */
object Extended {
  import Exact._
  import Mirror._

  /** UNION ALL of two branch projections (bag semantics preserved). */
  val q33UnionAll = QueryDef(
    "q33_union_all",
    """SELECT src, COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS
      |  DECIMAL(30,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT 'open' AS src, o_totalprice FROM orders
      |    WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT 'done' AS src, o_totalprice FROM orders
      |    WHERE o_orderstatus = 'F')
      |GROUP BY src
      |ORDER BY src""".stripMargin) { (spark, dir) =>
    val orders = Tables(spark, dir, "orders")
    val open = orders.filter(col("o_orderstatus") === "O")
      .select(lit("open").as("src"), col("o_totalprice"))
    val done = orders.filter(col("o_orderstatus") === "F")
      .select(lit("done").as("src"), col("o_totalprice"))
    open.unionAll(done)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("src"))
  }

  /** INTERSECT (distinct set semantics): nations present on both the
    * customer and supplier side. */
  val q34Intersect = QueryDef(
    "q34_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(
        Tables(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  /** EXCEPT (distinct): nations with customers but no well-capitalized
    * supplier (every nation has *some* supplier in the fixture, so the
    * right side is predicated to keep the result non-vacuous). */
  val q35Except = QueryDef(
    "q35_except",
    """SELECT c_nationkey AS nationkey FROM customer
      |EXCEPT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(
        Tables(spark, dir, "supplier")
          .filter(col("s_acctbal") > 5000.0)
          .select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  /** Hierarchical ROLLUP region → nation with subtotal + grand-total rows
    * (reference has no grouping sets; SURVEY §2.5). NULLS FIRST pinned in
    * both engines so the verification sort agrees. */
  val q36Rollup = QueryDef(
    "q36_rollup",
    s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
       |  ${sqlSum("c_acctbal")} AS sum_bal
       |FROM customer
       |  JOIN nation ON c_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) {
    (spark, dir) =>
      Tables(spark, dir, "customer")
        .join(broadcast(Tables(spark, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(spark, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  private val NgramJaccardThreshold = 0.3

  /** Blocked n-gram Jaccard near-dup: exact pairwise 3-gram Jaccard within a
    * (lang, length-bucket) blocking key — the no-sketch baseline the MinHash
    * path (q19) approximates.
    *
    * Implemented as an inverted-index join, not an all-pairs block
    * cross-product: explode shingles, group on (block, shingle) so the
    * per-pair intersection size falls out of a count aggregation, then
    * attach set sizes. Pairs sharing zero shingles (jaccard 0, below any
    * threshold) never materialize — at scale the work is proportional to
    * the number of co-occurring shingles, not block-size². Posting lists
    * are capped at [[Buckets.MaxBucket]] docs (a shingle shared by more is
    * stopword-like noise; see Buckets for the drop-count observation), and
    * the oracle applies the identical row_number cut. */
  /** (doc_id, n) packed into one long for the posting shuffle: doc_id in
    * the high 40 bits, the doc's distinct-shingle count in the low 24.
    * Bounds: 2^40 ≈ 1T documents; 2^24 ≈ 16.8M distinct 3-word shingles
    * per doc (a doc ~100 MB of text — far past any corpus' doc-length
    * cap; the quality rules drop such docs long before dedup). Packing
    * is order-preserving by doc_id (unique, high bits), so the capped
    * bucket's first-[[Buckets.MaxBucket]]-by-sort-order semantics are
    * IDENTICAL to sorting raw doc_ids — the oracle's
    * `row_number() ORDER BY doc_id` cut selects the same ids. */
  private val PackBits = 24

  val q37NgramJaccard = QueryDef(
    "q37_ngram_jaccard",
    s"""WITH sh AS (
       |  SELECT doc_id, lang, n_chars // 100 AS len_bucket,
       |    $sqlShingles3 AS sh
       |  FROM documents),
       |exp AS (SELECT doc_id, len(sh) AS n,
       |    ${sqlHash60("concat(lang, '|', CAST(len_bucket AS VARCHAR), " +
        "'|', unnest(sh))")} AS h
       |  FROM sh),
       |ranked AS (SELECT doc_id, n, h,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
       |  FROM exp),
       |ic AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.n AS n_a, b.n AS n_b, COUNT(*) AS inter
       |  FROM ranked a JOIN ranked b
       |    ON a.h = b.h AND a.doc_id < b.doc_id
       |   AND a.rn <= ${Buckets.MaxBucket} AND b.rn <= ${Buckets.MaxBucket}
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b,
       |  CAST(inter AS DOUBLE) /
       |    (CAST(n_a + n_b AS DOUBLE) - CAST(inter AS DOUBLE)) AS jaccard
       |FROM ic
       |WHERE CAST(inter AS DOUBLE) /
       |    (CAST(n_a + n_b AS DOUBLE) - CAST(inter AS DOUBLE))
       |  >= $NgramJaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin) { (spark, dir) =>
    // ONE pass over documents and ONE corpus-scale shuffle total: the
    // distinct shingle array is let1-bound per row (dedup happens IN-ROW,
    // so repeated shingles never become shuffle rows) and its size rides
    // every exploded posting INSIDE the packed id long — the q120 pattern
    // compressed to bare longs. The (lang, len_bucket) block key is
    // folded into the shingle hash (one 60-bit md5 over
    // `lang|len_bucket|shingle`, computed post-explode in whole-stage
    // codegen), so a posting row crossing the shuffle is exactly TWO
    // longs — (h, packed) — instead of (string, long, long,
    // struct(long, long)): less than half the bytes per row of the
    // struct-carrying form, and no per-shingle struct allocation. The
    // per-pair intersection then falls out of a second all-longs
    // aggregation on the two packed values; set sizes unpack AFTER the
    // aggregation (shiftright/mask), so NO size join re-scans documents.
    // The oracle applies the identical composite hash — a (negligible,
    // ~2^-60) collision would merge the same postings in both engines,
    // results stay bit-identical regardless.
    val entries = Mirror.let1(shingles3(col("text"))) { sh =>
      transform(sh, s =>
        struct(s.as("s"), size(sh).cast(LongType).as("n")))
    }
    val mask = (1L << PackBits) - 1
    val shingleRows = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast(LongType).as("len_bucket"),
        explode(entries).as("x"))
      .select(
        hash60(concat_ws("|", col("lang"),
          col("len_bucket").cast(StringType), col("x.s"))).as("h"),
        (shiftleft(col("doc_id"), PackBits) + col("x.n")).as("item"))
    Buckets.cappedPairs(shingleRows, Seq("h"), "item", "q37_posting_cap")
      .groupBy(col("p.a").as("pa"), col("p.b").as("pb"))
      .agg(count(lit(1)).as("inter"))
      .select(shiftright(col("pa"), PackBits).as("doc_a"),
        shiftright(col("pb"), PackBits).as("doc_b"),
        (col("pa").bitwiseAND(mask) + col("pb").bitwiseAND(mask))
          .as("n_sum"), col("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("n_sum").cast(DoubleType) -
            col("inter").cast(DoubleType))).as("jaccard"))
      .filter(col("jaccard") >= NgramJaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val Salts = 8

  /** Skew-aware two-phase aggregation: pre-aggregate on (key, salt) so one
    * hot key spreads over `Salts` reducers before the final per-key merge.
    * With exact decimal partials the result is identical to the direct
    * groupBy (the oracle) — this is the salting pattern for keys too hot for
    * AQE's skew handling, expressed as plain operators. */
  val q38SaltedAgg = QueryDef(
    "q38_salted_agg",
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  ${sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    Tables(spark, dir, "events")
      .withColumn("salt", pmod(hash(col("event_id")), lit(Salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n_part"),
        sum(col("value").cast(DecimalType(30, 2))).as("sum_part"))
      .groupBy(col("event_type"))
      .agg(sum(col("n_part")).as("n_events"),
        sum(col("sum_part")).cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** HLL sketch distinct — the at-scale replacement for q12/q13's exact
    * countDistinct — reformulated so DuckDB CAN oracle-check it (round-7
    * verdict item 6): the sketch estimates themselves differ engine to
    * engine (Spark HLL++ vs DuckDB's HLL), so the HASHED columns are the
    * deterministic exact count plus `within_bound`, each engine's own
    * verdict on whether ITS estimate lands within 5% relative error of
    * exact. Both engines' sketches are far inside 5% at these
    * cardinalities (Spark runs rsd=0.01), so the boolean agrees and the
    * row hashes match; a broken sketch on either side flips its flag and
    * fails the gate. The ScalaTest error-bound check stays as the direct
    * numeric assertion on Spark's estimate. Production keeps only the
    * sketch column — the exact countDistinct here is the verification
    * harness, not the operator. */
  val q39ApproxDistinct = QueryDef(
    "q39_approx_distinct",
    """SELECT event_type, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  CASE WHEN COUNT(DISTINCT user_id) = 0
      |       THEN approx_count_distinct(user_id) = 0
      |       ELSE CAST(ABS(approx_count_distinct(user_id)
      |                     - COUNT(DISTINCT user_id)) AS DOUBLE)
      |            / COUNT(DISTINCT user_id) <= 0.05
      |  END AS within_bound
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"), col("exact_users"),
        when(col("exact_users") === 0, col("approx") === 0)
          .otherwise(abs(col("approx") - col("exact_users"))
            .cast(DoubleType) / col("exact_users") <= 0.05)
          .as("within_bound"))
      .orderBy(col("event_type"))
  }

  /** Full CUBE over two dimensions (all four grouping sets). */
  val q41Cube = QueryDef(
    "q41_cube",
    s"""SELECT p_brand, p_type, COUNT(*) AS n_parts,
       |  ${sqlAvg("p_retailprice")} AS avg_price
       |FROM part
       |GROUP BY CUBE(p_brand, p_type)
       |ORDER BY p_brand NULLS FIRST, p_type NULLS FIRST""".stripMargin) {
    (spark, dir) =>
      Tables(spark, dir, "part")
        .cube(col("p_brand"), col("p_type"))
        .agg(count(lit(1)).as("n_parts"),
          davg(col("p_retailprice")).as("avg_price"))
        .orderBy(col("p_brand").asc_nulls_first, col("p_type").asc_nulls_first)
  }

  /** Edit-distance self-join on a tiny dimension: levenshtein is the same
    * integer DP in both engines, so thresholds compare exactly. Quadratic
    * on a dimension table only — never on a fact table. */
  val q42EditDistance = QueryDef(
    "q42_edit_distance",
    """SELECT a.n_name AS name_a, b.n_name AS name_b,
      |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
      |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
      |WHERE levenshtein(a.n_name, b.n_name) <= 4
      |ORDER BY name_a, name_b""".stripMargin) { (spark, dir) =>
    val n = Tables(spark, dir, "nation")
    val a = n.select(col("n_nationkey").as("key_a"), col("n_name").as("name_a"))
    val b = n.select(col("n_nationkey").as("key_b"), col("n_name").as("name_b"))
    a.join(broadcast(b), col("key_a") < col("key_b"))
      .select(col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).cast(LongType).as("dist"))
      .filter(col("dist") <= 4)
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Exact per-group median (lower element, no interpolation) via
    * row_number — the deterministic form of percentile for the oracle;
    * approx at scale is percentile_approx (sketch, q39's family). */
  val q43ExactMedian = QueryDef(
    "q43_exact_median",
    """SELECT o_orderpriority,
      |  MAX(CASE WHEN rn = (cnt + 1) // 2 THEN o_totalprice END) AS median_price,
      |  MAX(cnt) AS n_orders
      |FROM (
      |  SELECT o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
      |  FROM orders)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wc = Window.partitionBy(col("o_orderpriority"))
    Tables(spark, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rn") === ((col("cnt") + 1) / 2).cast(LongType),
          col("o_totalprice"))).as("median_price"),
        max(col("cnt")).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** As-of join (an operator Spark lacks natively; DuckDB's native ASOF
    * JOIN is the oracle): each event picks up the most recent hourly rate
    * marker at-or-before its timestamp for its type. Composed Spark-first
    * as union + last-ignoreNulls window: tag rate rows 0 / event rows 1,
    * sort each key partition by (ts, tag), and carry the last seen rate
    * forward — ONE shuffle on the key, no range-condition join explosion,
    * and at 100 TB the pattern holds because state per key is a single
    * carried value, not a buffered range. */
  val q44AsofJoin = QueryDef(
    "q44_asof_join",
    """WITH rates AS (
      |  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS rate_ts,
      |    MIN(value) AS rate
      |  FROM events GROUP BY 1, 2)
      |SELECT e.event_id, e.event_type, e.value, r.rate_ts, r.rate
      |FROM events e ASOF JOIN rates r
      |  ON e.event_type = r.event_type AND r.rate_ts <= e.ts
      |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
    val events = Tables(spark, dir, "events")
    val rates = events
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(min(col("value")).as("rate"))
      .select(col("event_type"), col("window.start").as("ts"),
        lit(0).as("tag"), col("rate"),
        lit(null).cast(LongType).as("event_id"),
        lit(null).cast(DoubleType).as("value"))
    val tagged = events.select(col("event_type"), col("ts"),
      lit(1).as("tag"), lit(null).cast(DoubleType).as("rate"),
      col("event_id"), col("value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rates.unionAll(tagged)
      .withColumn("carried_rate", last(col("rate"), ignoreNulls = true).over(w))
      .withColumn("carried_ts",
        last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("carried_rate").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"),
        col("carried_ts").as("rate_ts"), col("carried_rate").as("rate"))
      .orderBy(col("event_id"))
  }

  /** Equi + range join (the at-scale interval-join shape): lineitems
    * shipped within 60 days of their order's date. The equi key carries the
    * shuffle; the range condition is a post-join residual filter — Catalyst
    * plans a sort-merge join on the key with the band as `joinCondition`,
    * never a cross product. */
  val q45RangeJoin = QueryDef(
    "q45_range_join",
    """SELECT o_orderpriority, COUNT(*) AS n_shipped
      |FROM orders JOIN lineitem
      |  ON o_orderkey = l_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val orders = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    orders.join(li,
      col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy(col("o_orderpriority"))
  }

  /** Explicit GROUPING SETS with grouping_id, via the engine's SQL entry
    * point (the Dataset API only exposes rollup/cube; arbitrary grouping
    * sets are SQL-native in both engines). Also demonstrates temp-view
    * registration — the spark.sql path a BI tool would take. */
  val q46GroupingSets = QueryDef(
    "q46_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
      |    AS BIGINT) AS gid,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, o_orderstatus NULLS FIRST,
      |  o_orderpriority NULLS FIRST""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
        |    AS BIGINT) AS gid,
        |  COUNT(*) AS n
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin)
  }

  /** Native per-key top-k ([[graft.plans.TopK]]): the custom LogicalPlan +
    * Strategy + SparkPlan operator replacing the window-sort form of q10 —
    * bounded per-key heaps after one shuffle, no sort of the input. The
    * oracle is the row_number formulation (they are definitionally
    * equivalent given the deterministic tie-break). */
  val q47TopkNative = QueryDef(
    "q47_topk_native",
    """SELECT c_nationkey, c_custkey, c_acctbal, CAST(rn AS INTEGER) AS rank
      |FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_nationkey, rn""".stripMargin) { (spark, dir) =>
    graft.plans.TopK.perKey(
      Tables(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
      3, Seq("c_nationkey"),
      Seq(("c_acctbal", false), ("c_custkey", true)))
      .orderBy(col("c_nationkey"), col("rank"))
  }

  /** Salted equi-JOIN (the join-side sibling of q38's salted aggregation):
    * revenue per nation through lineitem ⋈ supplier ⋈ nation. A skewed fact
    * key would pile every matching row into one shuffle partition; salting
    * splits each big-side key into [[Salts]] sub-keys
    * (`pmod(hash(rowkey), S)`) and replicates the SMALLER side once per
    * salt (an `explode` of 0..S-1 — replication cost S × |small side|,
    * never the fact table), so the hot key's rows land on S partitions.
    * The `merge` hint forces the sort-merge path the pattern exists for —
    * unhinted, Catalyst would legitimately broadcast the tiny fixture
    * supplier table and no skew could occur. AQE's skew-join split handles
    * most cases automatically; explicit salting is the portable fallback
    * when AQE can't see the skew (single-key joins, pre-partitioned state).
    * Revenue aggregates through exact DECIMAL(30,2) partials, so the result
    * is provably identical to the unsalted plan (ExtendedSpec asserts it
    * against the plain join). */
  val q71SaltedSkewJoin = QueryDef(
    "q71_salted_skew_join",
    s"""SELECT n_name, COUNT(*) AS n_items,
       |  ${sqlSum("l_extendedprice")} AS revenue
       |FROM lineitem
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.DecimalType
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice"),
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salts))
          .as("salt_l"))
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .withColumn("salt_s", explode(sequence(lit(0), lit(Salts - 1))))
    val joined = li.hint("merge")
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("salt_l") === col("salt_s"))
    joined
      .join(broadcast(Tables(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(30, 2)))
          .cast(DoubleType).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** Interval-overlap join via bin-and-residual — the scalable plan for
    * "which intervals intersect": per-user daily activity spans × per-type
    * daily activity spans. The DAY key is the equi prefilter (here spans
    * are day-contained by construction; multi-day intervals would explode
    * into covered days + dedupe, same pattern), so Catalyst plans a plain
    * hash/merge equi-join and the residual `start <= end` conditions
    * filter pairs post-match. Without the bin key this is a pure theta
    * join — O(|A|·|B|) compared everywhere; with it, work is bounded by
    * pairs sharing a bin, the interval-join strategy dedicated engines
    * implement natively. Overlap bounds compare exact micro timestamps;
    * duration is integer epoch-microsecond subtraction (no float time
    * math, per the q51/q56 rule). */
  val q74IntervalJoin = QueryDef(
    "q74_interval_join",
    s"""WITH a AS (SELECT user_id, CAST(ts AS DATE) AS day,
       |    MIN(ts) AS a_start, MAX(ts) AS a_end
       |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
       |b AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    MIN(ts) AS b_start, MAX(ts) AS b_end
       |  FROM events GROUP BY event_type, CAST(ts AS DATE))
       |SELECT a.user_id, b.event_type, a.day,
       |  GREATEST(a_start, b_start) AS o_start,
       |  LEAST(a_end, b_end) AS o_end,
       |  epoch_us(LEAST(a_end, b_end))
       |    - epoch_us(GREATEST(a_start, b_start)) AS overlap_us
       |FROM a JOIN b ON a.day = b.day
       |  AND a_start <= b_end AND b_start <= a_end
       |ORDER BY user_id, event_type, a.day""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir, "events")
    val a = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("a_start"), max(col("ts")).as("a_end"))
    val b = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("b_start"), max(col("ts")).as("b_end"))
    a.join(b, Seq("day"))
      .filter(col("a_start") <= col("b_end") &&
        col("b_start") <= col("a_end"))
      .select(col("user_id"), col("event_type"), col("day"),
        greatest(col("a_start"), col("b_start")).as("o_start"),
        least(col("a_end"), col("b_end")).as("o_end"),
        (unix_micros(least(col("a_end"), col("b_end")))
          - unix_micros(greatest(col("a_start"), col("b_start"))))
          .as("overlap_us"))
      .orderBy(col("user_id"), col("event_type"), col("day"))
  }

  /** One skew profile of `df` grouped by `key`: the full distribution of
    * per-key row counts via the COUNTS-OF-COUNTS trick — exact p50/p99
    * order statistics WITHOUT any per-key global sort: per-key counts
    * (one shuffle), then a histogram of counts (the distinct-count table
    * is tiny — at most one row per distinct group size), and the
    * percentile is the first histogram cell whose running total clears
    * the ceil-rank.
    *
    * Single-exchange shape: the per-key count relation is consumed
    * EXACTLY ONCE — the histogram row for group size `c` carries its
    * frequency `f` AND the smallest key of that size (`mk`), so key
    * cardinality (Σf), row total (Σc·f), max size, both percentiles
    * (running Σf over the size-ordered histogram), and the tie-broken
    * top key (`max_by(mk, c)` — sizes are unique per histogram row) all
    * derive from the tiny histogram without ever re-executing the
    * per-key aggregation. One wide shuffle + one histogram-sized
    * shuffle + a single-partition window over at-most-distinct-sizes
    * rows, at any scale. */
  private def skewProfile(df: org.apache.spark.sql.DataFrame,
      key: String, name: String): org.apache.spark.sql.DataFrame = {
    val c1 = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    val h = c1.groupBy(col("c"))
      .agg(count(lit(1)).as("f"), min(col("k")).as("mk"))
    val ord = Window.orderBy(col("c"))
    val all = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = h.withColumn("cum", sum(col("f")).over(ord))
      .withColumn("nk", sum(col("f")).over(all))
    def rank(num: Long, den: Long) =
      ((col("nk") * num + (den - 1L)) / den).cast(LongType)
    cum.agg(
        max(col("nk")).as("nk"),
        sum(col("c") * col("f")).as("nr"),
        max(col("c")).as("mx"),
        min(when(col("cum") >= rank(1L, 2L), col("c"))).as("p50"),
        min(when(col("cum") >= rank(99L, 100L), col("c"))).as("p99"),
        max_by(col("mk"), col("c")).as("top_key"))
      .select(lit(name).as("key_name"), col("nk").as("n_keys"),
        col("nr").as("n_rows"),
        (col("nr").cast(DoubleType) / col("nk").cast(DoubleType))
          .as("mean_rows"),
        col("mx").as("max_rows"), col("p50"), col("p99"),
        ((col("mx") * col("nk")).cast(DoubleType) /
          col("nr").cast(DoubleType)).as("skew"),
        col("top_key"))
  }

  /** DuckDB mirror of one [[skewProfile]] — emits a one-row SELECT. */
  private def sqlSkewProfile(table: String, key: String): String = {
    val name = s"$table.$key"
    s"""SELECT '$name' AS key_name, st.nk AS n_keys, st.nr AS n_rows,
       |  CAST(st.nr AS DOUBLE) / CAST(st.nk AS DOUBLE) AS mean_rows,
       |  st.mx AS max_rows, pp.p50, pp.p99,
       |  CAST(st.mx * st.nk AS DOUBLE) / CAST(st.nr AS DOUBLE) AS skew,
       |  tk.top_key
       |FROM
       |  (SELECT CAST(COUNT(*) AS BIGINT) AS nk, CAST(SUM(c) AS BIGINT)
       |      AS nr, MAX(c) AS mx
       |    FROM (SELECT COUNT(*) AS c FROM $table GROUP BY $key)) st,
       |  (SELECT MIN(CASE WHEN cum >= (st2.nk + 1) // 2 THEN c END)
       |      AS p50,
       |    MIN(CASE WHEN cum >= (99 * st2.nk + 99) // 100 THEN c END)
       |      AS p99
       |    FROM (SELECT c, SUM(f) OVER (ORDER BY c) AS cum FROM
       |        (SELECT c, COUNT(*) AS f FROM
       |          (SELECT COUNT(*) AS c FROM $table GROUP BY $key)
       |         GROUP BY c)),
       |      (SELECT CAST(COUNT(*) AS BIGINT) AS nk FROM
       |        (SELECT COUNT(*) AS c FROM $table GROUP BY $key)) st2) pp,
       |  (SELECT MIN(k) AS top_key FROM
       |      (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY $key)
       |        ck,
       |      (SELECT MAX(c) AS mx FROM
       |        (SELECT COUNT(*) AS c FROM $table GROUP BY $key)) m
       |    WHERE ck.c = m.mx) tk""".stripMargin
  }

  /** Shuffle-key SKEW datasheet — the pre-flight diagnostic a 100 TB
    * pipeline runs before committing a partitioning: for each candidate
    * shuffle key, the exact distribution of per-key row counts (key
    * cardinality, mean/max rows per key, exact p50/p99 group sizes, and
    * skew = max/mean — the straggler factor a plain hash-partitioned
    * shuffle would suffer on that key). q38/q71 are the salting
    * TREATMENTS; this is the measurement that says which keys need them
    * (and feeds AQE skew-join thresholds). p50/p99 come from the
    * counts-of-counts histogram — no per-key global sort at any scale;
    * ties in `top_key` break to the smallest key id. */
  val q111KeySkewReport = QueryDef(
    "q111_key_skew_report",
    Seq(("events", "user_id"), ("lineitem", "l_orderkey"),
      ("lineitem", "l_partkey"), ("orders", "o_custkey"))
      .map { case (t, k) => sqlSkewProfile(t, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name")) {
    (spark, dir) =>
      Seq(("events", "user_id"), ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"), ("orders", "o_custkey"))
        .map { case (t, k) =>
          skewProfile(Tables(spark, dir, t), k, s"$t.$k")
        }
        .reduce(_.unionByName(_))
        .orderBy(col("key_name"))
  }

  val all: Seq[QueryDef] = Seq(
    q33UnionAll, q34Intersect, q35Except, q36Rollup, q37NgramJaccard,
    q38SaltedAgg, q39ApproxDistinct, q41Cube, q42EditDistance,
    q43ExactMedian, q44AsofJoin, q45RangeJoin, q46GroupingSets,
    q47TopkNative, q71SaltedSkewJoin, q74IntervalJoin, q111KeySkewReport)
}
