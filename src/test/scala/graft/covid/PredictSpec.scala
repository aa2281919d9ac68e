package graft.covid

import org.scalatest.funsuite.AnyFunSuite

class PredictSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def predicted(jsons: Seq[String]) =
    Predict.predictFutureTrends(
      Clean.clean(Stream.decode(jsons.toDF("value"))))
      .orderBy("location", "date").collect()

  test("frame means at series edges and lag-null guard") {
    // total_cases 100,200,...: growth (t-p)/p; new_cases constant 10
    val days = (1 to 16).map(i => ((i * 100).toString, "10", "0", "0"))
    val rows = predicted(Fixture.series("A", "AAA", "Asia", days))
    assert(rows.length == 16)
    val first = rows.head
    // first row: 1-row frames; lag is null -> growth 0.0
    assert(first.getAs[Double]("avg_new_cases_7d") == 10.0)
    assert(first.getAs[Double]("daily_growth_rate") == 0.0)
    // day 2: growth (200-100)/100 = 1.0; avg over {0.0, 1.0} = 0.5
    val second = rows(1)
    assert(second.getAs[Double]("daily_growth_rate") == 1.0)
    assert(second.getAs[Double]("avg_growth_rate_7d") == 0.5)
    // day 8 (index 7): 7-row frame = days 2..8, growth_i = 1/(i-1)
    val d8 = rows(7)
    val expected = (2 to 8).map(i => 1.0 / (i - 1)).sum / 7.0
    assert(math.abs(d8.getAs[Double]("avg_growth_rate_7d") - expected) < 1e-12)
  }

  test("forecast arithmetic and prediction date") {
    val days = (1 to 3).map(i => ((i * 100).toString, "10", "0", "0"))
    val rows = predicted(Fixture.series("B", "BBB", "Asia", days))
    val r = rows(2) // day 3: avg7=10, growth avg = (0+1+0.5)/3 = 0.5
    val predNew = 10.0 * (1 + 0.5)
    assert(math.abs(r.getAs[Double]("predicted_new_cases_next_day") - predNew) < 1e-12)
    assert(r.getAs[Double]("predicted_total_cases_next_day") == 300.0 + predNew)
    assert(r.getAs[java.sql.Date]("prediction_date").toString == "2021-03-04")
  }

  test("trend and confidence classification") {
    // constant totals -> growth 0 -> High confidence; constant new_cases ->
    // Stable trend
    val flat = (1 to 15).map(_ => ("1000", "10", "0", "0"))
    val rows = predicted(Fixture.series("C", "CCC", "Europe", flat))
    val last = rows.last
    assert(last.getAs[String]("trend_direction") == "Stable")
    assert(last.getAs[String]("prediction_confidence") == "High")

    // rising new_cases -> avg7 > avg14 once frames differ -> Increasing
    val rising = (1 to 15).map(i => ("1000", (i * 10).toString, "0", "0"))
    val up = predicted(Fixture.series("D", "DDD", "Europe", rising)).last
    assert(up.getAs[String]("trend_direction") == "Increasing")

    val falling = (1 to 15).map(i => ("1000", ((16 - i) * 10).toString, "0", "0"))
    val down = predicted(Fixture.series("E", "EEE", "Europe", falling)).last
    assert(down.getAs[String]("trend_direction") == "Decreasing")
  }

  test("partitions are independent per location") {
    val a = Fixture.series("A", "AAA", "Asia",
      (1 to 3).map(i => ((i * 100).toString, "10", "0", "0")))
    val b = Fixture.series("B", "BBB", "Asia",
      (1 to 3).map(_ => ("5000", "50", "0", "0")))
    val rows = predicted(a ++ b)
    val byLoc = rows.groupBy(_.getAs[String]("location"))
    assert(byLoc("A").head.getAs[Double]("avg_new_cases_7d") == 10.0)
    assert(byLoc("B").head.getAs[Double]("avg_new_cases_7d") == 50.0)
  }
}
