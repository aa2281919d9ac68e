package graft.covid

/** OWID-shaped dirty JSON fixture builder (FIXTURES.md §A): all 19 fields
  * string-typed; generators inject sentinel/padded/duplicate dirt. */
object Fixture {

  val defaults: Map[String, String] = Map(
    "uuid" -> "u-0",
    "continent" -> "Asia",
    "location" -> "Egypt",
    "iso_code" -> "EGY",
    "date" -> "2021-03-01",
    "timestamp" -> "2021-03-01 12:00:00",
    "total_cases" -> "1000",
    "new_cases" -> "100",
    "total_deaths" -> "10",
    "new_deaths" -> "1",
    "active_cases" -> "500",
    "population" -> "1000000",
    "recovery_rate" -> "ignored",
    "death_rate" -> "ignored",
    "cases_per_million" -> "ignored",
    "deaths_per_million" -> "ignored",
    "new_cases_ratio" -> "ignored",
    "cases_to_population_ratio" -> "ignored",
    "is_hotspot" -> "false")

  /** One JSON record; `null` as a value emits a JSON null. */
  def record(overrides: (String, String)*): String = {
    val m = defaults ++ overrides.toMap
    Schema.rawFieldNames.map { f =>
      val v = m(f)
      if (v == null) s""""$f":null""" else s""""$f":"$v""""
    }.mkString("{", ",", "}")
  }

  /** A per-day series for one location: day i (0-based) gets the given
    * metric values. */
  def series(location: String, iso: String, continent: String,
      days: Seq[(String, String, String, String)]): Seq[String] =
    days.zipWithIndex.map { case ((total, newC, totalD, newD), i) =>
      val day = java.time.LocalDate.of(2021, 3, 1).plusDays(i.toLong)
      record(
        "uuid" -> s"$location-$i", "location" -> location,
        "iso_code" -> iso, "continent" -> continent,
        "date" -> day.toString,
        "timestamp" -> s"$day 12:00:00",
        "total_cases" -> total, "new_cases" -> newC,
        "total_deaths" -> totalD, "new_deaths" -> newD)
    }
}
