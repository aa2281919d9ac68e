package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class StreamingDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  // 20-word base docs: long enough that a one-word edit keeps shingle
  // Jaccard ≈ 0.9, comfortably over the 0.5 near-dup threshold
  private val baseText1 =
    (1 to 20).map(i => s"alpha$i").mkString(" ")
  private val baseText2 =
    (1 to 20).map(i => s"beta$i").mkString(" ")

  test("micro-batch probe equals the batch operator, batch by batch") {
    val base = Seq((1L, baseText1), (2L, baseText2)).toDF("doc_id", "text")
    val stream = MemoryStream[Doc](spark)
    val got = ArrayBuffer.empty[(Long, Long, Long, Double)] // (epoch, ...)
    val ckpt = java.nio.file.Files
      .createTempDirectory("sdedup").toString
    val query = StreamingDedup.start(stream.toDF(), base, ckpt) {
      (matches, epoch) =>
        got ++= matches.collect().map(r =>
          (epoch, r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    try {
      // batch 1: exact copy of base 1, near-dup of base 2 (last word
      // changed), and a completely novel doc
      val b1 = Seq(
        Doc(101L, baseText1),
        Doc(102L, baseText2.replace("beta20", "gamma")),
        Doc(103L, (1 to 20).map(i => s"nova$i").mkString(" ")))
      stream.addData(b1: _*)
      query.processAllAvailable()
      val expected1 = Dedup
        .incrementalMatches(b1.toDF(), base).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(expected1.exists(_._1 == 101L)) // exact dup must be caught
      assert(!expected1.exists(_._1 == 103L)) // novel doc must not match
      assert(got.map(t => (t._2, t._3, t._4)).toSet == expected1)

      // batch 2: another near-dup — results accumulate, prior batch intact
      val b2 = Seq(Doc(201L, baseText1.replace("alpha1 ", "omega ")))
      stream.addData(b2: _*)
      query.processAllAvailable()
      val expected2 = Dedup
        .incrementalMatches(b2.toDF(), base).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.count(_._1 == 1) == expected2.size)
      assert(got.filter(_._1 == 1).map(t => (t._2, t._3, t._4)).toSet
        == expected2)
    } finally query.stop()
  }
}
