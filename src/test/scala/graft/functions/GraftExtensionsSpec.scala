package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The injected SQL functions must resolve and agree with the Column API.
  * Needs its own session (extensions bind at session build). */
class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ext-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("float_dot and md5_hash60 are callable from SQL") {
    val rows = spark.sql(
      """SELECT
        |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  md5_hash60('hello') AS h1,
        |  md5_hash60b('hello') AS h2""".stripMargin).collect()
    assert(rows.head.getDouble(0) == 11.0)
    // cross-check against the declarative specs
    import org.apache.spark.sql.functions._
    import graft.operators.Mirror
    val spec = spark.range(1).select(
      Mirror.hash60Spec(lit("hello")).as("h1"),
      Mirror.hash60bSpec(lit("hello")).as("h2")).collect().head
    assert(rows.head.getLong(1) == spec.getLong(0))
    assert(rows.head.getLong(2) == spec.getLong(1))
  }
}
