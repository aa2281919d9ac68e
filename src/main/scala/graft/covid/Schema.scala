package graft.covid

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's ingestion schema (covid_streaming.py:29-49): 19 fields,
  * all nullable strings — schema-on-read with typing applied downstream by
  * [[Clean]]. */
object Schema {

  val rawFieldNames: Seq[String] = Seq(
    "uuid", "continent", "location", "iso_code", "date", "timestamp",
    "total_cases", "new_cases", "total_deaths", "new_deaths",
    "active_cases", "population", "recovery_rate", "death_rate",
    "cases_per_million", "deaths_per_million", "new_cases_ratio",
    "cases_to_population_ratio", "is_hotspot")

  /** RAW_SCHEMA equivalent. */
  val raw: StructType =
    StructType(rawFieldNames.map(StructField(_, StringType, nullable = true)))
}

/** Typed view of a cleaned observation (what the reference can't express in
  * PySpark): the post-[[Clean]] record minus the nondeterministic
  * processing_time audit column. Use `Clean.typed` for a Dataset[CovidObservation]. */
final case class CovidObservation(
    uuid: String,
    continent: String,
    location: String,
    iso_code: String,
    date: java.sql.Date,
    timestamp: java.sql.Timestamp,
    total_cases: Option[Double],
    new_cases: Option[Double],
    total_deaths: Option[Double],
    new_deaths: Option[Double],
    active_cases: Option[Double],
    population: Option[Double],
    recovery_rate: Option[Double],
    death_rate: Option[Double],
    cases_per_million: Option[Double],
    deaths_per_million: Option[Double],
    new_cases_ratio: Option[Double],
    cases_to_population_ratio: Option[Double],
    is_hotspot: Option[Boolean])
