package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Reshaping and aggregation-surface operators the reference lacks
  * entirely: pivot (long→wide), unpivot/melt (wide→long), event-time RANGE
  * window frames, and a typed Aggregator UDAF — the remaining API surface a
  * BI/feature-engineering user expects from a complete engine.
  */
object Reshape {
  import Exact._

  /** Pivot with an EXPLICIT value list — the at-scale form: without it,
    * Spark first runs a distinct scan of the pivot column and then
    * collect()s the values to the driver (two jobs and an unbounded driver
    * list). Explicit values make pivot a single pass compiled to one
    * hash aggregation with `count×values` columns. */
  val q49Pivot = QueryDef(
    "q49_pivot",
    """SELECT o_orderpriority,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
      |    FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) AS total_f,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
      |    FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) AS total_o,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
      |    FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) AS total_p
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val zero = lit(0).cast(DecimalType(30, 2))
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast(DecimalType(30, 2))))
      .select(col("o_orderpriority"),
        coalesce(col("F"), zero).cast(DoubleType).as("total_f"),
        coalesce(col("O"), zero).cast(DoubleType).as("total_o"),
        coalesce(col("P"), zero).cast(DoubleType).as("total_p"))
      .orderBy(col("o_orderpriority"))
  }

  /** Unpivot/melt (wide→long): four lineitem measures to (metric, value)
    * rows — a pure narrow map (each input row emits 4, no shuffle until
    * the downstream agg), which is what makes melt safe on a 100 TB fact
    * table. The oracle mirrors it as the UNION ALL expansion. */
  val q50Unpivot = QueryDef(
    "q50_unpivot",
    s"""SELECT metric, ${sqlSum("value")} AS total, COUNT(*) AS n
       |FROM (
       |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
       |  UNION ALL
       |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
       |  UNION ALL
       |  SELECT 'l_discount', l_discount FROM lineitem
       |  UNION ALL
       |  SELECT 'l_tax', l_tax FROM lineitem)
       |GROUP BY metric
       |ORDER BY metric""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "lineitem")
      .unpivot(
        Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy(col("metric"))
      .agg(dsum(col("value")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("metric"))
  }

  /** Event-time sliding aggregate via a RANGE frame (value-based, not
    * row-count-based): per event, the trailing 1 hour of its type. Frame
    * membership is a set over epoch seconds — identical in both engines
    * because both floor EXACT integer microseconds (`epoch_us // 1e6` ≡
    * Spark's timestamp→long floorDiv; DuckDB's `epoch()` returns DOUBLE
    * seconds whose rounding near micro boundaries can disagree) — and the
    * frame sum goes through exact decimal, so results are bit-stable. One
    * shuffle on the partition key; at scale this is the standard
    * sorted-window pass. */
  val q51TimeRangeWindow = QueryDef(
    "q51_time_range_window",
    """WITH s AS (SELECT event_id, event_type, value,
      |    epoch_us(ts) // 1000000 AS sec FROM events)
      |SELECT event_id, event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER w AS DOUBLE) AS sum_1h,
      |  COUNT(*) OVER w AS n_1h
      |FROM s
      |WINDOW w AS (PARTITION BY event_type ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("sec"))
      .rangeBetween(-3600, 0)
    Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts").cast(LongType).as("sec")) // floor seconds, = floor(epoch(ts))
      .withColumn("sum_1h",
        sum(col("value").cast(DecimalType(30, 2))).over(w).cast(DoubleType))
      .withColumn("n_1h", count(lit(1)).over(w))
      .select(col("event_id"), col("event_type"), col("sum_1h"), col("n_1h"))
      .orderBy(col("event_id"))
  }

  /** The typed Aggregator UDAF ([[graft.functions.DecimalSum]]) driven
    * through the untyped agg API — proof the custom-aggregation surface
    * matches built-in `sum(decimal)` bit-for-bit (same oracle SQL). */
  val q52UdafDecimalSum = QueryDef(
    "q52_udaf_decimal_sum",
    s"""SELECT o_orderpriority, ${sqlSum("o_totalprice")} AS total,
       |  COUNT(*) AS n
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
    val decimalSum = udaf(graft.functions.DecimalSum, Encoders.scalaDouble)
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(decimalSum(col("o_totalprice")).as("total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val all: Seq[QueryDef] = Seq(
    q49Pivot, q50Unpivot, q51TimeRangeWindow, q52UdafDecimalSum)
}
