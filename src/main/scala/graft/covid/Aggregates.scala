package graft.covid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped aggregations and serving views over cleaned observations:
  * continent windowed stats (covid_streaming.py:162-180), hotspot detection
  * (:185-191), the MySQL dashboard views (init-db/init.sql:92-110), and the
  * implied-but-unimplemented country rankings (init.sql:81-90, SURVEY §2.6
  * W8) done properly with rank().
  */
object Aggregates {

  /** Per-(5-minute window × continent) stats. Faithful per-batch semantics:
    * the reference's watermark is a no-op inside foreachBatch (SURVEY
    * §2.9-T4), so none is applied here; the real streaming watermarked
    * variant is [[Stream.continentStatsStreaming]]. */
  def continentStats(cleaned: DataFrame): DataFrame =
    cleaned
      .groupBy(window(col("timestamp"), "5 minutes"), col("continent"))
      .agg(
        sum(col("new_cases")).as("continent_new_cases"),
        sum(col("new_deaths")).as("continent_new_deaths"),
        avg(col("death_rate")).as("continent_avg_death_rate"),
        countDistinct(col("location")).as("countries_count"),
        sum(col("total_cases")).as("continent_total_cases"))
      .select(
        col("window.start").as("continent_window_start"),
        col("window.end").as("continent_window_end"),
        col("continent"), col("continent_new_cases"),
        col("continent_new_deaths"), col("continent_avg_death_rate"),
        col("countries_count"), col("continent_total_cases"),
        current_timestamp().as("processed_at"))
      // faithful mirror of covid_streaming.py:179 — a no-op here (the
      // groupBy keys already guarantee uniqueness), kept for 1:1 semantics
      .dropDuplicates(Seq("continent_window_start", "continent"))

  /** Hotspot rows (covid_streaming.py:185-191): OR-predicate, first per
    * (location, detected day), 8-column projection. */
  def hotspots(cleaned: DataFrame): DataFrame =
    cleaned
      .filter(col("new_cases") > 10000 || col("death_rate") > 0.05 ||
        col("is_hotspot") === true)
      .withColumn("detected_date", to_date(col("timestamp")))
      .dropDuplicates(Seq("location", "detected_date"))
      .select(col("location"), col("iso_code"), col("total_cases"),
        col("new_cases"), col("death_rate"), col("active_cases"),
        col("timestamp"), current_timestamp().as("detected_at"))

  /** covid_dashboard_summary view (init.sql:92-103) as a Spark batch query
    * over the realtime-stats data. */
  def dashboardSummary(realtime: DataFrame): DataFrame =
    realtime
      .groupBy(to_date(col("timestamp")).as("report_date"))
      .agg(
        countDistinct(col("location")).as("countries_count"),
        sum(col("total_cases")).as("global_total_cases"),
        sum(col("new_cases")).as("global_new_cases"),
        sum(col("total_deaths")).as("global_total_deaths"),
        sum(col("new_deaths")).as("global_new_deaths"),
        avg(col("death_rate")).as("global_avg_death_rate"),
        count(when(col("is_hotspot") === true, lit(1)))
          .as("hotspot_count"))

  /** top_10_affected_countries view (init.sql:105-110): group → max →
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def topAffected(realtime: DataFrame, k: Int = 10): DataFrame =
    realtime
      .groupBy(col("location"), col("iso_code"))
      .agg(max(col("total_cases")).as("total_cases"))
      .orderBy(col("total_cases").desc)
      .limit(k)

  /** country_rankings (init.sql:81-90): the schema exists in the reference
    * but nothing populates ranking_position — here it is, with SQL rank()
    * semantics computed by [[graft.operators.Ranking.globalRankDesc]]
    * (distributed sort + zipWithIndex + tie-group min) instead of
    * `rank().over(Window.orderBy(...))`, whose single-partition window is
    * the pattern users copy into unbounded inputs. Input here is one row
    * per country (~200), but the operator holds at any cardinality. */
  def countryRankings(realtime: DataFrame): DataFrame =
    graft.operators.Ranking.globalRankDesc(
      realtime
        .groupBy(col("location"), col("iso_code"), col("continent"))
        .agg(
          max(col("total_cases")).as("max_cases_country"),
          sum(col("new_cases")).as("total_new_cases_country"),
          avg(col("death_rate")).as("avg_death_rate_country")),
      "max_cases_country", "ranking_position")
}
