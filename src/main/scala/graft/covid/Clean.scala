package graft.covid

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, DoubleType, TimestampType}

/** Cleansing + derived-metric stage (covid_streaming.py:120-150), as one
  * declarative projection.
  *
  * Faithful to the reference, including its null posture: the sentinel test
  * (`trim(c).isin("", "null", "NULL")`) maps sentinels to 0.0 but leaves SQL
  * NULL as NULL (trim(NULL) IN (...) is NULL → otherwise branch → cast(NULL)
  * = NULL).
  *
  * Unlike the reference's 18-deep withColumn chain (which Catalyst collapses
  * anyway), this is a single `select` — one Project node even before
  * optimization, no per-call analysis cost, and an explicit statement that
  * the whole stage is a narrow map: no shuffle at any scale.
  */
object Clean {

  /** Sentinel-aware string→double cast (covid_streaming.py:121-132).
    *
    * `try_cast`, not `cast`: Spark 4 defaults `spark.sql.ansi.enabled=true`,
    * under which a plain cast of a malformed non-sentinel string ("N/A",
    * "abc") THROWS and kills the whole batch. The Spark 3.5 reference runs
    * non-ANSI where the same cast yields NULL — try_cast restores exactly
    * that never-fail-the-batch posture without turning ANSI off globally. */
  def sentinelDouble(c: Column): Column =
    when(trim(c).isin("", "null", "NULL"), lit(0.0))
      .otherwise(trim(c).try_cast(DoubleType))

  /** Guarded rounded ratio (covid_streaming.py:133-145): num/den (optionally
    * scaled) rounded to `scale` decimals when den > 0, else 0.0. */
  def guardedRatio(num: Column, den: Column, scale: Int,
      factor: Double = 1.0): Column =
    when(den > 0, round(num / den * factor, scale)).otherwise(0.0)

  /** The clean transform: apply on a decoded raw batch (19 string columns).
    * Derived metrics reference the already-cast numeric columns, exactly as
    * the reference's sequential withColumns resolve. */
  def clean(df: DataFrame): DataFrame = {
    val totalCases = sentinelDouble(col("total_cases"))
    val newCases = sentinelDouble(col("new_cases"))
    val totalDeaths = sentinelDouble(col("total_deaths"))
    val newDeaths = sentinelDouble(col("new_deaths"))
    val activeCases = sentinelDouble(col("active_cases"))
    val population = sentinelDouble(col("population"))
    df.select(
      col("uuid"), col("continent"), col("location"), col("iso_code"),
      // try_cast ≡ non-ANSI to_date/to_timestamp: malformed → NULL, never throw
      col("date").try_cast(DateType).as("date"),
      col("timestamp").try_cast(TimestampType).as("timestamp"),
      totalCases.as("total_cases"),
      newCases.as("new_cases"),
      totalDeaths.as("total_deaths"),
      newDeaths.as("new_deaths"),
      activeCases.as("active_cases"),
      population.as("population"),
      // recomputed ratios — raw input values are discarded (SURVEY §1)
      when(totalCases > 0,
        round((totalCases - activeCases - totalDeaths) / totalCases, 6))
        .otherwise(0.0).as("recovery_rate"),
      guardedRatio(totalDeaths, totalCases, 6).as("death_rate"),
      guardedRatio(totalCases, population, 2, 1000000.0)
        .as("cases_per_million"),
      guardedRatio(totalDeaths, population, 2, 1000000.0)
        .as("deaths_per_million"),
      guardedRatio(newCases, totalCases, 6).as("new_cases_ratio"),
      guardedRatio(totalCases, population, 6)
        .as("cases_to_population_ratio"),
      col("is_hotspot").try_cast(BooleanType).as("is_hotspot"),
      current_timestamp().as("processing_time"))
  }

  /** Typed projection of the cleaned batch (drops the audit column). */
  def typed(df: DataFrame): Dataset[CovidObservation] = {
    import df.sparkSession.implicits._
    clean(df).drop("processing_time").as[CovidObservation]
  }
}
