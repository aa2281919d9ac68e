package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ranking.globalRankDesc must equal the single-partition
  * `rank().over(Window.orderBy(...))` it replaces — including tie groups —
  * while never funneling all rows through one task. */
class RankingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("distributed global rank equals the window form, ties included") {
    val df = Seq(
      ("a", 50.0), ("b", 100.0), ("c", 100.0), ("d", 10.0),
      ("e", 50.0), ("f", 75.0), ("g", 10.0), ("h", 200.0))
      .toDF("id", "m")
      .repartition(5) // rows spread over several partitions going in
    val got = Ranking.globalRankDesc(df, "m", "r")
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    val want = df.withColumn("r",
        rank().over(Window.orderBy(col("m").desc)))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got == want)
    // spot the tie semantics: two values at 100 share rank 2, next is 4
    assert(got("b") == 2 && got("c") == 2 && got("f") == 4)
    assert(got("h") == 1)
  }
}
