package graft.streaming

import graft.covid.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class CVec(vec_id: Long, embedding: Array[Float])

class ContamStreamSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def bucket(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
  }

  private def trainVecs: Array[CVec] =
    graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => CVec(r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(v => bucket(v.vec_id) < 95)

  /** Run `mkHits` over the train split streamed in two halves; assert the
    * emitted hit set equals `flagged` batch-by-batch and the query holds
    * zero streaming state. */
  private def assertStreamParity(name: String, flagged: Set[Long])(
      mkHits: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): Unit = {
    assert(flagged.nonEmpty)
    val (half1, half2) = trainVecs.partition(_.vec_id < 250)
    val stream = MemoryStream[CVec](spark)
    val query = mkHits(stream.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      def gotIds = spark.table(name).collect().map(_.getLong(0)).toSet
      stream.addData(half1.toIndexedSeq: _*)
      query.processAllAvailable()
      // incremental: after half the corpus, exactly that half's flags
      assert(gotIds == flagged.filter(_ < 250))
      // stateless by construction — no state store operator may appear
      assert(query.lastProgress.stateOperators.isEmpty)
      stream.addData(half2.toIndexedSeq: _*)
      query.processAllAvailable()
      assert(gotIds == flagged)
      // every emitted hit clears the threshold
      val hits = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(hits.forall(_._3 >= 0.35))
      assert(hits.map(_._1).toSet == flagged)
    } finally query.stop()
  }

  test("blocked stream-static hits equal batch q101's contaminated set, " +
    "batch by batch") {
    val (cents, evalIdx) = ContamStream.index(spark, sfDir)
    // ground truth: the always-blocked batch form (same model, same capped
    // index, same threshold — the blocked stream must flag exactly these)
    val flagged = Similarity.q101ContamBlocked.fn(spark, sfDir)
      .collect().filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assertStreamParity("contam_hits_blocked", flagged)(
      ContamStream.hits(_, evalIdx, cents))
  }

  test("exact stream hits equal adaptive batch q81's contaminated set " +
    "(fixture selects the exact branch), batch by batch") {
    assert(ContamStream.exactMode(spark, sfDir),
      "fixture eval split must select the exact mode")
    val evalRows = ContamStream.exactIndex(spark, sfDir)
    val flagged = Similarity.q81SemanticContamination.fn(spark, sfDir)
      .collect().filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assertStreamParity("contam_hits_exact", flagged)(
      ContamStream.hitsExact(_, evalRows))
  }
}
