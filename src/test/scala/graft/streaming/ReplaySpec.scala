package graft.streaming

import graft.covid.SparkTestSession
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming-twin replay gate ([[Replay]] +
  * [[graft.operators.ReplayedStreams]]): the properties the oracle rows
  * (q168-q170) stand on beyond what the twins' own specs already prove —
  * staged-file delivery ORDER (the modtime contract with Spark's file
  * stream source), arrival-order probe semantics for the dedup replay,
  * and artifact caching returning the fresh replay's rows exactly. */
class ReplaySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def withFreshReplay[A](body: => A): A = {
    spark.conf.set("spark.graft.replaycache", "false")
    try body finally spark.conf.unset("spark.graft.replaycache")
  }

  test("staged files arrive as micro-batches in staging order") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("replaystage")
    val parts = (0 until 4).map(i =>
      Seq.tabulate(5)(j => (i.toLong * 100 + j, s"p$i")).toDF("id", "tag"))
    val schema = Replay.stage(spark, parts, dir.resolve("stage").toString)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    val q = Replay.fileStream(spark, dir.resolve("stage").toString, schema)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], e: Long) =>
        got += ((e, b.select(col("id")).collect().map(_.getLong(0)).toSet))
        ()
      }
      .option("checkpointLocation", dir.resolve("ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got.size == 4, s"4 files must be 4 micro-batches, got $got")
    got.sortBy(_._1).zipWithIndex.foreach { case ((_, ids), i) =>
      assert(ids == Seq.tabulate(5)(j => i.toLong * 100 + j).toSet,
        s"micro-batch $i must carry staged part $i, got $ids")
    }
  }

  test("q169 replayed SCD2 rollup == batch q130 (fresh replay)") {
    val got = withFreshReplay(rows(
      graft.operators.ReplayedStreams.q169StreamScd2Replay.fn(spark, sfDir)))
    val want = rows(
      graft.operators.Lifecycle.q130Scd2History.fn(spark, sfDir))
    assert(got == want, s"replayed SCD2 != batch q130:\n$got\nvs\n$want")
  }

  test("q170 replayed dedup matches == arrival-ordered batch probes " +
    "(fresh replay)") {
    import graft.operators.{Dedup, Mirror}
    import org.apache.spark.sql.types.StringType
    val withBucket = graft.Tables(spark, sfDir, "documents")
      .withColumn("bucket",
        Mirror.hash60(col("doc_id").cast(StringType)) % 100)
    val base = withBucket.filter(col("bucket") < 90)
      .select(col("doc_id"), col("text"))
    val fresh = withBucket.filter(col("bucket") >= 90)
      .select(col("doc_id"), col("text"))
    // batch recomputation of the arrival semantics: probe batch b sees
    // base + every earlier batch, capped at probe time
    val want: Seq[Seq[Any]] = rows(
      (0 until Replay.DedupBatches).map { b =>
        val visible = base.unionByName(
          fresh.filter(col("doc_id") % Replay.DedupBatches < b))
        Dedup.incrementalMatchesPre(
          fresh.filter(col("doc_id") % Replay.DedupBatches === b),
          Dedup.minhashBandsOf(visible), Dedup.shingleSetsOf(visible))
      }.reduce(_ unionByName _))
    val got = withFreshReplay(rows(
      graft.operators.ReplayedStreams.q170StreamDedupReplay.fn(spark, sfDir)))
    assert(got == want, s"replayed dedup != arrival-ordered batch:" +
      s"\n$got\nvs\n$want")
    assert(got.nonEmpty, "sf0.001 must yield at least one match " +
      "(vacuous equality would hide a broken replay)")
  }

  test("artifact cache: second read resolves (no republish), rows equal") {
    val root = java.nio.file.Files.createTempDirectory("replaycache")
    sys.props("graft.replaycache.dir") = root.toString
    try {
      val before = graft.operators.ArtifactStore.published.get()
      val first = rows(Replay.scd2Segments(spark, sfDir))
      val afterFirst = graft.operators.ArtifactStore.published.get()
      assert(afterFirst - before >= 1, "first read must publish")
      val second = rows(Replay.scd2Segments(spark, sfDir))
      assert(graft.operators.ArtifactStore.published.get() == afterFirst,
        "second read must resolve, not republish")
      assert(first == second, "cached rows must equal the fresh replay's")
    } finally { sys.props.remove("graft.replaycache.dir"); () }
  }
}
