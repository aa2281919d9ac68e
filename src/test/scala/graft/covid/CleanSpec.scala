package graft.covid

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class CleanSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def cleanOf(jsons: String*): Array[Row] =
    Clean.clean(Stream.decode(jsons.toDF("value"))).collect()

  test("sentinel strings and padded numerics cast per the reference") {
    val rows = cleanOf(
      Fixture.record("total_cases" -> "", "new_cases" -> "null",
        "total_deaths" -> "NULL", "new_deaths" -> "  7  ",
        "active_cases" -> " 3", "population" -> "0"))
    val r = rows.head
    assert(r.getAs[Double]("total_cases") == 0.0)
    assert(r.getAs[Double]("new_cases") == 0.0)
    assert(r.getAs[Double]("total_deaths") == 0.0)
    assert(r.getAs[Double]("new_deaths") == 7.0)
    assert(r.getAs[Double]("active_cases") == 3.0)
    assert(r.getAs[Double]("population") == 0.0)
  }

  test("JSON null stays null through the sentinel cast (reference posture)") {
    val r = cleanOf(Fixture.record("total_cases" -> null)).head
    assert(r.isNullAt(r.fieldIndex("total_cases")))
  }

  test("malformed non-sentinel strings yield NULL, not an ANSI throw") {
    // Spark 4 defaults ansi.enabled=true; the reference (3.5, non-ANSI)
    // nulls these. try_cast must keep the never-fail-the-batch posture for
    // every typed column: numerics, boolean, date, timestamp.
    val r = cleanOf(Fixture.record(
      "total_cases" -> "N/A", "new_cases" -> "abc",
      "is_hotspot" -> "maybe", "date" -> "not-a-date",
      "timestamp" -> "13 o'clock")).head
    assert(r.isNullAt(r.fieldIndex("total_cases")))
    assert(r.isNullAt(r.fieldIndex("new_cases")))
    assert(r.isNullAt(r.fieldIndex("is_hotspot")))
    assert(r.isNullAt(r.fieldIndex("date")))
    assert(r.isNullAt(r.fieldIndex("timestamp")))
    // derived ratios guard on the nulled numerator/denominator: NULL > 0 is
    // NULL → otherwise branch → 0.0 stays the reference's fallback
    assert(r.getAs[Double]("death_rate") == 0.0)
  }

  test("derived ratios recompute with divide-by-zero guards") {
    val r = cleanOf(Fixture.record(
      "total_cases" -> "2000", "total_deaths" -> "40",
      "active_cases" -> "160", "new_cases" -> "100",
      "population" -> "1000000")).head
    assert(r.getAs[Double]("death_rate") == 0.02)
    assert(r.getAs[Double]("recovery_rate") == 0.9) // (2000-160-40)/2000
    assert(r.getAs[Double]("cases_per_million") == 2000.0)
    assert(r.getAs[Double]("deaths_per_million") == 40.0)
    assert(r.getAs[Double]("new_cases_ratio") == 0.05)
    assert(r.getAs[Double]("cases_to_population_ratio") == 0.002)

    val zero = cleanOf(Fixture.record(
      "total_cases" -> "0", "population" -> "0")).head
    assert(zero.getAs[Double]("death_rate") == 0.0)
    assert(zero.getAs[Double]("recovery_rate") == 0.0)
    assert(zero.getAs[Double]("cases_per_million") == 0.0)
  }

  test("temporal and boolean typing") {
    val df = Clean.clean(Stream.decode(Seq(
      Fixture.record("is_hotspot" -> "true")).toDF("value")))
    val sch = df.schema
    assert(sch("date").dataType == DateType)
    assert(sch("timestamp").dataType == TimestampType)
    assert(sch("is_hotspot").dataType == BooleanType)
    assert(sch("processing_time").dataType == TimestampType)
    val r = df.collect().head
    assert(r.getAs[Boolean]("is_hotspot"))
    assert(r.getAs[java.sql.Date]("date").toString == "2021-03-01")
  }

  test("typed view yields Dataset[CovidObservation]") {
    val ds = Clean.typed(Stream.decode(Seq(
      Fixture.record("total_cases" -> "", "is_hotspot" -> "true"))
      .toDF("value")))
    val o = ds.collect().head
    assert(o.location == "Egypt")
    assert(o.total_cases.contains(0.0))
    assert(o.is_hotspot.contains(true))
  }
}
