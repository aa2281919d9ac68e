package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** The reference's streaming-pipeline semantics (SURVEY §2.3/§2.6/§2.8/§2.9)
  * re-expressed as oracle-verifiable batch queries over `events`:
  * JSON decode/encode (S3/S4, covid_streaming.py:214-217 +
  * covid_producer.py:9-12), sentinel-aware cleansing casts (P2,
  * covid_streaming.py:120-149), trailing-window trend prediction
  * (W1–W7, covid_streaming.py:63-109), and hotspot detection
  * (P5/A2, covid_streaming.py:185-191).
  *
  * The same column expressions power the streaming path in [[graft.covid]];
  * here they run over the driver test tables so the DuckDB gate covers them.
  *
  * Determinism notes (per [[Mirror]] / [[Exact]]):
  *  - frame averages of the 2-decimal `value` use exact DECIMAL(30,2) sums;
  *  - frame averages of full-precision growth rates use an ordered
  *    collect-then-left-fold (both engines fold the frame in (ts, event_id)
  *    order), because double→high-scale-decimal casts differ cross-engine
  *    (Spark shortest-repr vs DuckDB exact expansion);
  *  - classifications compare those deterministic doubles, so bucket
  *    boundaries cannot flip between engines.
  */
object Pipeline {
  import Mirror._

  /** Shared partition-ordered window (one exchange + sort reused by every
    * frame: Catalyst plans a single Window operator). */
  private def userW = Window
    .partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  private val sqlUserW = "PARTITION BY user_id ORDER BY ts, event_id"

  /** JSON decode + re-encode roundtrip (S3/S4): parse the `props` JSON
    * payload with an explicit schema, project a field, re-encode a struct.
    * Mirrors `from_json`/`select("data.*")`/producer `json.dumps`. */
  val q26JsonRoundtrip = QueryDef(
    "q26_json_roundtrip",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  CAST(to_json(struct_pack(event_id := event_id,
      |    k := CAST(json_extract_string(props, '$.k') AS BIGINT)))
      |    AS VARCHAR) AS reencoded
      |FROM events
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", LongType))))
          .getField("k").as("k"))
      .select(col("event_id"), col("k"),
        // keep null fields: DuckDB's to_json emits "k":null, Spark's
        // default ignoreNullFields would drop the key entirely
        to_json(struct(col("event_id"), col("k")),
          Map("ignoreNullFields" -> "false")).as("reencoded"))
      .orderBy(col("event_id"))
  }

  /** Sentinel-aware cleansing casts (P2, covid_streaming.py:120-132): a
    * deterministically dirtied string column (empty / "null" / "NULL" /
    * padded) cleaned with trim + sentinel test + cast, plus a string→boolean
    * cast (":149"). */
  val q27SentinelClean = QueryDef(
    "q27_sentinel_clean",
    """SELECT event_id, dirty,
      |  CASE WHEN trim(dirty) IN ('', 'null', 'NULL') THEN 0.0
      |       ELSE CAST(trim(dirty) AS DOUBLE) END AS cleaned,
      |  CAST(CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END
      |    AS BOOLEAN) AS is_flag
      |FROM (
      |  SELECT event_id, user_id,
      |    CASE CAST(event_id % 5 AS INTEGER)
      |      WHEN 0 THEN ''
      |      WHEN 1 THEN 'null'
      |      WHEN 2 THEN 'NULL'
      |      WHEN 3 THEN concat('  ', CAST(user_id AS VARCHAR), ' ')
      |      ELSE CAST(user_id AS VARCHAR) END AS dirty
      |  FROM events)
      |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val dirty = when(col("event_id") % 5 === 0, "")
      .when(col("event_id") % 5 === 1, "null")
      .when(col("event_id") % 5 === 2, "NULL")
      .when(col("event_id") % 5 === 3,
        concat(lit("  "), col("user_id").cast("string"), lit(" ")))
      .otherwise(col("user_id").cast("string"))
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), dirty.as("dirty"))
      .select(col("event_id"), col("dirty"),
        when(trim(col("dirty")).isin("", "null", "NULL"), 0.0)
          .otherwise(trim(col("dirty")).cast(DoubleType)).as("cleaned"),
        when(col("user_id") % 2 === 0, "true").otherwise("false")
          .cast(BooleanType).as("is_flag"))
      .orderBy(col("event_id"))
  }

  import org.apache.spark.sql.types.DecimalType

  /** Exact frame mean of the 2-decimal `value` column (as in q08). */
  private def frameAvgValue(lo: Int): Column = {
    val w = userW.rowsBetween(lo, 0)
    sum(col("value").cast(DecimalType(30, 2))).over(w).cast(DoubleType) /
      count(col("value")).over(w).cast(DoubleType)
  }

  private def sqlFrameAvgValue(frame: String): String =
    s"""CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER $frame AS DOUBLE)
       | / CAST(COUNT(value) OVER $frame AS DOUBLE)""".stripMargin
      .replace("\n", "")

  /** Guarded day-over-day growth rate (W3/W4, covid_streaming.py:75-78). */
  private def growthCol: Column = {
    val prev = lag(col("value"), 1).over(userW)
    when(prev > 0.0, (col("value") - prev) / prev).otherwise(0.0)
  }

  private val sqlGrowth =
    s"""CASE WHEN LAG(value, 1) OVER ($sqlUserW) > 0.0
       | THEN (value - LAG(value, 1) OVER ($sqlUserW))
       |      / LAG(value, 1) OVER ($sqlUserW)
       | ELSE 0.0 END""".stripMargin.replace("\n", "")

  /** Order-exact frame mean of a full-precision double: collect the frame in
    * (ts, event_id) order and left-fold — identical IEEE sequence in both
    * engines (decimal casts of such doubles would NOT match cross-engine). */
  private def foldFrameAvg(c: Column, lo: Int): Column = {
    val w = userW.rowsBetween(lo, 0)
    foldSum(collect_list(c).over(w)) /
      count(c).over(w).cast(DoubleType)
  }

  /** Trend + confidence classification (W6/W7, covid_streaming.py:86-93):
    * 7-day vs 14-day exact frame means → Increasing/Decreasing/Stable;
    * |avg growth| buckets → High/Medium/Low. */
  val q28TrendClassify = QueryDef(
    "q28_trend_classify",
    s"""SELECT event_id, user_id, avg_7, avg_14, avg_growth_7,
       |  CASE WHEN avg_7 > avg_14 THEN 'Increasing'
       |       WHEN avg_7 < avg_14 THEN 'Decreasing'
       |       ELSE 'Stable' END AS trend,
       |  CASE WHEN abs(avg_growth_7) < 0.05 THEN 'High'
       |       WHEN abs(avg_growth_7) < 0.15 THEN 'Medium'
       |       ELSE 'Low' END AS confidence
       |FROM (
       |  SELECT event_id, user_id,
       |    ${sqlFrameAvgValue("w7")} AS avg_7,
       |    ${sqlFrameAvgValue("w14")} AS avg_14,
       |    ${sqlFoldSum("list(growth) OVER w7")}
       |      / CAST(COUNT(*) OVER w7 AS DOUBLE) AS avg_growth_7
       |  FROM (SELECT event_id, user_id, ts, value, $sqlGrowth AS growth
       |        FROM events)
       |  WINDOW
       |    w7 AS ($sqlUserW ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
       |    w14 AS ($sqlUserW ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
       |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        growthCol.as("growth"))
      .select(col("event_id"), col("user_id"),
        frameAvgValue(-6).as("avg_7"),
        frameAvgValue(-13).as("avg_14"),
        foldFrameAvg(col("growth"), -6).as("avg_growth_7"))
      .withColumn("trend",
        when(col("avg_7") > col("avg_14"), "Increasing")
          .when(col("avg_7") < col("avg_14"), "Decreasing")
          .otherwise("Stable"))
      .withColumn("confidence",
        when(abs(col("avg_growth_7")) < 0.05, "High")
          .when(abs(col("avg_growth_7")) < 0.15, "Medium")
          .otherwise("Low"))
      .orderBy(col("event_id"))
  }

  /** Next-day forecast (W5, covid_streaming.py:80-85, :95): predicted next
    * value = 7-frame mean × (1 + mean growth); predicted running value; next
    * calendar day via date_add. */
  val q29Forecast = QueryDef(
    "q29_forecast",
    s"""SELECT event_id, user_id,
       |  avg_7 * (1.0 + avg_growth_7) AS predicted_next,
       |  value + avg_7 * (1.0 + avg_growth_7) AS predicted_total,
       |  CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS DATE) AS prediction_date
       |FROM (
       |  SELECT event_id, user_id, ts, value,
       |    ${sqlFrameAvgValue("w7")} AS avg_7,
       |    ${sqlFoldSum("list(growth) OVER w7")}
       |      / CAST(COUNT(*) OVER w7 AS DOUBLE) AS avg_growth_7
       |  FROM (SELECT event_id, user_id, ts, value, $sqlGrowth AS growth
       |        FROM events)
       |  WINDOW w7 AS ($sqlUserW ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
       |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        growthCol.as("growth"))
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        frameAvgValue(-6).as("avg_7"),
        foldFrameAvg(col("growth"), -6).as("avg_growth_7"))
      .select(col("event_id"), col("user_id"),
        (col("avg_7") * (lit(1.0) + col("avg_growth_7")))
          .as("predicted_next"),
        (col("value") + col("avg_7") * (lit(1.0) + col("avg_growth_7")))
          .as("predicted_total"),
        date_add(to_date(col("ts")), 1).as("prediction_date"))
      .orderBy(col("event_id"))
  }

  /** Hotspot detection (P5 + A2 + to_date, covid_streaming.py:185-191):
    * OR-predicate over value / growth / type, then first event per
    * (user_id, day) with a deterministic row_number survivor. */
  val q30HotspotDetect = QueryDef(
    "q30_hotspot_detect",
    s"""SELECT user_id, detected_day, event_id, value, event_type
       |FROM (
       |  SELECT user_id, CAST(ts AS DATE) AS detected_day, event_id, value,
       |    event_type, ts,
       |    ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
       |                       ORDER BY ts, event_id) AS rn
       |  FROM (
       |    SELECT *, $sqlGrowth AS growth FROM events)
       |  WHERE value > 150.0 OR growth > 0.5 OR event_type = 'error')
       |WHERE rn = 1
       |ORDER BY user_id, detected_day""".stripMargin) { (spark, dir) =>
    val flagged = Tables(spark, dir, "events")
      .withColumn("growth", growthCol)
      .filter(col("value") > 150.0 || col("growth") > 0.5 ||
        col("event_type") === "error")
      .withColumn("detected_day", to_date(col("ts")))
    val w = Window.partitionBy(col("user_id"), col("detected_day"))
      .orderBy(col("ts"), col("event_id"))
    flagged
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("detected_day"), col("event_id"),
        col("value"), col("event_type"))
      .orderBy(col("user_id"), col("detected_day"))
  }

  val all: Seq[QueryDef] = Seq(
    q26JsonRoundtrip, q27SentinelClean, q28TrendClassify, q29Forecast,
    q30HotspotDetect)
}
