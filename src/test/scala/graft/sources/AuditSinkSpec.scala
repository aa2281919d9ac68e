package graft.sources

import java.nio.file.Files
import graft.covid.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class AuditSinkSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("batch write publishes rows on driver commit") {
    AuditSinkStore.clear("b1")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .repartition(3)
      .write.format("graft.sources.AuditSink").option("name", "b1")
      .mode("append").save()
    val rows = AuditSinkStore.rows("b1").map(r => (r(0), r(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(AuditSinkStore.epochs("b1") == Seq(-1L))
  }

  test("sink-driven layout: clusterBy/sortBy options shape the write plan") {
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      AuditSinkStore.clear("layout")
      val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (1L, "a2"))
        .toDF("k", "v")
      df.write.format("graft.sources.AuditSink")
        .option("name", "layout")
        .option("clusterBy", "k").option("sortBy", "k")
        .mode("append").save()
      assert(AuditSinkStore.rows("layout").length == 4)
      // the listener fires asynchronously — poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      def found = plans.synchronized {
        plans.exists(p => p.contains("hashpartitioning(k") &&
          p.contains("Sort [k"))
      }
      while (!found && System.nanoTime() < deadline) Thread.sleep(100)
      assert(found, plans.synchronized(plans.mkString("\n---\n")))
    } finally spark.listenerManager.unregister(listener)
  }

  test("clusterBy/sortBy options reject unknown and empty column names") {
    val df = Seq((1L, "a")).toDF("k", "v")
    def attempt(opt: String, value: String): Throwable =
      intercept[Throwable] {
        df.write.format("graft.sources.AuditSink")
          .option("name", "badopt").option(opt, value)
          .mode("append").save()
      }
    // a typo'd column must name itself and the schema, not fail deep in
    // planning (Spark may wrap the cause — search the chain)
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val unknown = attempt("clusterBy", "k,typo")
    assert(chain(unknown).exists(m =>
      m.contains("'typo'") && m.contains("clusterBy")), unknown.toString)
    val empty = attempt("sortBy", "k,,v")
    assert(chain(empty).exists(m =>
      m.contains("empty column") && m.contains("sortBy")), empty.toString)
  }

  test("streaming write honors the sink's required distribution") {
    val stream = MemoryStream[(Long, String)](spark)
    AuditSinkStore.clear("s_layout")
    val ckpt = Files.createTempDirectory("audit-layout").toString
    val q = stream.toDF().toDF("k", "v")
      .writeStream.format("graft.sources.AuditSink")
      .option("name", "s_layout").option("clusterBy", "k")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      stream.addData((1L, "a"), (2L, "b"), (1L, "c"), (3L, "d"))
      q.processAllAvailable()
      assert(AuditSinkStore.rows("s_layout").length == 4)
      // the micro-batch plan must carry the sink-required hash exchange
      val exec = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution
      val plan = exec.executedPlan.toString
      assert(plan.contains("hashpartitioning(k"), plan)
    } finally q.stop()
  }

  test("streaming write commits one idempotent slot per epoch") {
    AuditSinkStore.clear("s1")
    val input = MemoryStream[Long](spark)
    val ckpt = Files.createTempDirectory("audit-ckpt").toString
    val q = input.toDS().toDF("id")
      .writeStream.format("graft.sources.AuditSink").option("name", "s1")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      input.addData(3L)
      q.processAllAvailable()
      val epochs = AuditSinkStore.epochs("s1")
      assert(epochs.size == 2, s"epochs $epochs")
      assert(AuditSinkStore.rows("s1").map(_.head).toSet ==
        Set(1L, 2L, 3L))
      // idempotence: re-publishing an epoch replaces, never appends
      AuditSinkStore.publish("s1", epochs.head,
        AuditSinkStore.rows("s1").take(2))
      assert(AuditSinkStore.epochs("s1").size == 2)
    } finally q.stop()
  }
}
