package graft.covid

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend prediction over cleaned observations (covid_streaming.py:63-109):
  * trailing 7/14-row means, lag-based growth, next-day forecast, trend and
  * confidence classification.
  *
  * All three frames share the same (location, date) partition-order, so
  * Catalyst plans ONE Window operator: a single hash exchange on location +
  * one per-partition sort serves every column here — this is the property
  * that keeps the stage a single shuffle at 100 TB.
  */
object Predict {

  def predictFutureTrends(df: DataFrame): DataFrame = {
    val w7 = Window.partitionBy("location").orderBy("date").rowsBetween(-6, 0)
    val w14 =
      Window.partitionBy("location").orderBy("date").rowsBetween(-13, 0)
    val wlag = Window.partitionBy("location").orderBy("date")

    val avgNewCases7d = avg(col("new_cases")).over(w7)
    val avgNewCases14d = avg(col("new_cases")).over(w14)
    val avgNewDeaths7d = avg(col("new_deaths")).over(w7)
    val yesterday = lag(col("total_cases"), 1).over(wlag)
    val dailyGrowth = when(yesterday > 0,
      (col("total_cases") - yesterday) / yesterday).otherwise(0.0)

    df.withColumn("avg_new_cases_7d", avgNewCases7d)
      .withColumn("avg_new_cases_14d", avgNewCases14d)
      .withColumn("avg_new_deaths_7d", avgNewDeaths7d)
      .withColumn("total_cases_yesterday", yesterday)
      .withColumn("daily_growth_rate", dailyGrowth)
      .withColumn("avg_growth_rate_7d",
        avg(col("daily_growth_rate")).over(w7))
      .withColumn("predicted_new_cases_next_day",
        col("avg_new_cases_7d") * (lit(1) + col("avg_growth_rate_7d")))
      .withColumn("predicted_total_cases_next_day",
        col("total_cases") + col("predicted_new_cases_next_day"))
      .withColumn("predicted_new_deaths_next_day",
        col("avg_new_deaths_7d") * (lit(1) + col("avg_growth_rate_7d")))
      .withColumn("trend_direction",
        when(col("avg_new_cases_7d") > col("avg_new_cases_14d"),
          lit("Increasing"))
          .when(col("avg_new_cases_7d") < col("avg_new_cases_14d"),
            lit("Decreasing"))
          .otherwise(lit("Stable")))
      .withColumn("prediction_confidence",
        when(abs(col("avg_growth_rate_7d")) < 0.05, lit("High"))
          .when(abs(col("avg_growth_rate_7d")) < 0.15, lit("Medium"))
          .otherwise(lit("Low")))
      .withColumn("predicted_at", current_timestamp())
      .withColumn("prediction_date", date_add(col("date"), 1))
      .select(
        col("location"), col("iso_code"), col("continent"), col("date"),
        col("total_cases"), col("new_cases"), col("total_deaths"),
        col("new_deaths"), col("avg_new_cases_7d"), col("avg_new_cases_14d"),
        col("avg_new_deaths_7d"), col("daily_growth_rate"),
        col("avg_growth_rate_7d"), col("predicted_new_cases_next_day"),
        col("predicted_total_cases_next_day"),
        col("predicted_new_deaths_next_day"), col("trend_direction"),
        col("prediction_confidence"), col("prediction_date"),
        col("predicted_at"))
      .filter(col("predicted_new_cases_next_day").isNotNull)
  }
}
