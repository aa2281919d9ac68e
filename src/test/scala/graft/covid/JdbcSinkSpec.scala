package graft.covid

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** BatchSink.jdbc against a REAL JDBC database: embedded Derby (in-memory,
  * in-process — shipped with Spark, no network), standing in for the
  * reference's MySQL sink (covid_streaming.py:51-61, init-db/init.sql:9-90).
  * The parquet twins prove routing; this proves the actual JDBC write path:
  * Spark's dialect mapping, table auto-creation, append semantics, and
  * read-back fidelity through java.sql end to end. */
class JdbcSinkSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("streaming pipeline appends all four sink tables through real JDBC") {
    // keep derby.log out of the repo root
    System.setProperty("derby.system.home",
      Files.createTempDirectory("derby-home").toString)
    val url = "jdbc:derby:memory:graft_sink;create=true"
    val input = MemoryStream[String](spark)
    val ckpt = Files.createTempDirectory("covid-ckpt-jdbc").toString
    val query = Stream.run(Stream.decode(input.toDF()),
      BatchSink.jdbc(url, Map.empty), ckpt)
    try {
      // same fixture as the parquet-twin test: a dup key, a hotspot row,
      // then a second batch appending the next day (exercises JDBC append
      // into an EXISTING table, not just auto-creation)
      input.addData(
        Fixture.record("uuid" -> "1", "location" -> "Egypt",
          "new_cases" -> "20000"),
        Fixture.record("uuid" -> "2", "location" -> "Egypt"), // dup key
        Fixture.record("uuid" -> "3", "location" -> "Kenya",
          "iso_code" -> "KEN"))
      query.processAllAvailable()
      input.addData(
        Fixture.record("uuid" -> "4", "location" -> "Egypt",
          "date" -> "2021-03-02", "timestamp" -> "2021-03-02 12:00:00"))
      query.processAllAvailable()
    } finally query.stop()

    def table(name: String) =
      spark.read.format("jdbc").option("url", url)
        .option("dbtable", name).load()
    val realtime = table("covid_realtime_stats")
    assert(realtime.count() == 3) // batch-1 dedup + batch-2 append
    // values survive the dialect round-trip (string→CLOB→string etc.)
    assert(realtime.select("location").collect().map(_.getString(0)).toSet ==
      Set("Egypt", "Kenya"))
    val preds = table("covid_predictions")
    assert(preds.count() == 3)
    assert(preds.columns.contains("trend_direction"))
    val hot = table("covid_hotspots")
    assert(hot.count() == 1)
    assert(table("continent_covid_stats").count() >= 1)
  }

  test("jdbc sink keeps the reference's swallow-and-log posture on failure") {
    import spark.implicits._
    // unreachable database: the write must log and return, never throw
    // (covid_streaming.py:57-61 catches per-table exceptions)
    val sink = BatchSink.jdbc("jdbc:derby:/nonexistent/path/db", Map.empty)
    sink.write(Seq((1L, "x")).toDF("id", "s"), "t", 0L) // must not throw
  }
}
