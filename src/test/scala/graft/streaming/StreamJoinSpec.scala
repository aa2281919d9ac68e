package graft.streaming

import java.nio.file.Files
import graft.covid.{Fixture, SparkTestSession, Stream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static enrichment join + checkpoint recovery — the remaining
  * streaming surface (SURVEY §2.9): a micro-batch stream joined per batch
  * against a broadcast dimension, and a foreachBatch query resuming from
  * its checkpoint without reprocessing delivered batches. */
class StreamJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("stream-static broadcast join enriches each micro-batch") {
    val dim = Seq(("EGY", "Africa-Region"), ("KEN", "Africa-Region"),
      ("DEU", "Europe-Region")).toDF("iso", "region_name")
    val input = MemoryStream[String](spark)
    val enriched = Stream.decode(input.toDF())
      .join(broadcast(dim), col("iso_code") === col("iso"), "left")
      .select(col("location"), col("iso_code"), col("region_name"))
    val query = enriched.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try {
      input.addData(
        Fixture.record("uuid" -> "1", "location" -> "Egypt",
          "iso_code" -> "EGY"),
        Fixture.record("uuid" -> "2", "location" -> "Atlantis",
          "iso_code" -> "ATL"))
      query.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getString(0), r.getString(2))).toMap
      assert(rows("Egypt") == "Africa-Region")
      assert(rows("Atlantis") == null) // left join keeps unmatched
    } finally query.stop()
  }

  test("foreachBatch resumes from checkpoint without reprocessing") {
    val input = MemoryStream[String](spark)
    val outDir = Files.createTempDirectory("ckpt-sink").toString
    val ckpt = Files.createTempDirectory("ckpt-dir").toString
    val sink = graft.covid.BatchSink.parquet(outDir)

    val q1 = Stream.run(Stream.decode(input.toDF()), sink, ckpt)
    try {
      input.addData(Fixture.record("uuid" -> "1", "location" -> "Egypt"))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = spark.read.parquet(s"$outDir/covid_realtime_stats").count()
    assert(afterFirst == 1)

    // restart from the same checkpoint: the delivered batch must not replay
    input.addData(Fixture.record("uuid" -> "2", "location" -> "Kenya"))
    val q2 = Stream.run(Stream.decode(input.toDF()), sink, ckpt)
    try q2.processAllAvailable()
    finally q2.stop()
    val afterSecond = spark.read.parquet(s"$outDir/covid_realtime_stats")
    assert(afterSecond.count() == 2) // 1 old + 1 new, no duplicates
    assert(afterSecond.select("location").as[String].collect().sorted.toSeq ==
      Seq("Egypt", "Kenya"))
  }
}
