package graft.sources

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SyntheticDocsSpec extends AnyFunSuite with SparkTestSession {

  private def docs(rows: Int = 1000, parts: Int = 10) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows).option("partitions", parts).load()

  test("reads the declared row count with deterministic content") {
    val df = docs()
    assert(df.count() == 1000)
    val r = df.filter(col("doc_id") === 42L).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("lang") == "fr") // 42 % 4 = 2 -> fr
    assert(r.head.getAs[Int]("n_chars") == r.head.getAs[String]("text").length)
    // re-read yields the identical row (pure function of doc_id)
    assert(docs().filter(col("doc_id") === 42L).collect().head == r.head)
  }

  test("doc_id range filter prunes input partitions at planning time") {
    val df = docs(rows = 1000, parts = 10).filter(col("doc_id") < 100L)
    // 10 partitions of 100 ids; bound [0,100) intersects exactly one
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == 100)
    val both = docs(rows = 1000, parts = 10)
      .filter(col("doc_id") >= 150L && col("doc_id") <= 249L)
    assert(both.rdd.getNumPartitions == 2) // spans [100,200) and [200,300)
    assert(both.count() == 100)
    // pushed bounds surface in the scan description
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters")
      || df.queryExecution.executedPlan.toString.contains("SyntheticDocs"))
  }

  test("column pruning reaches the reader") {
    val df = docs().select(col("lang"))
    val scanSchema = df.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSeq
    assert(scanSchema == Seq("lang"), scanSchema)
    assert(df.distinct().count() == 4)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from partition metadata") {
    val agg = docs(rows = 10000, parts = 8)
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
        max(col("doc_id")).as("mx"))
    val row = agg.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) ==
      ((10000L, 0L, 9999L)))
    // the scan node (inside an AQE query stage, so assert on the plan
    // string) must carry the pushed aggregates and emit the
    // partial-aggregate schema, not document rows
    val planStr = agg.queryExecution.executedPlan.toString
    assert(planStr.contains("pushedAggregates=[count,min,max]"), planStr)
    assert(planStr.contains("count_0"), planStr)
    // with a row-level filter in between, pushdown must NOT fire and the
    // count must come from re-applied predicates — correctness first
    val filtered = docs(rows = 1000, parts = 10)
      .filter(col("lang") === "en").agg(count(lit(1)))
    assert(filtered.collect().head.getLong(0) == 250)
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
  }

  test("micro-batch streaming read resumes from the checkpoint without dups") {
    // end-to-end over both custom connectors: SyntheticDocs micro-batch
    // source -> AuditSink epoch-committed sink (the memory sink cannot
    // recover from a checkpoint; ours can). Exactly-once across a restart
    // means the union of all published ids stays contiguous and unique.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("docs-stream").toString
    AuditSinkStore.clear("docs_rt")
    def start() = spark.readStream
      .format("graft.sources.SyntheticDocs")
      .option("rows", 50).option("partitions", 4).load()
      .writeStream.format("graft.sources.AuditSink")
      .option("name", "docs_rt")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .outputMode("append").start()
    def ids = AuditSinkStore.rows("docs_rt")
      .map(_.head.asInstanceOf[Long]).sorted
    val q1 = start()
    try {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (ids.length < 100 && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally q1.stop()
    val n1 = ids.length
    assert(n1 >= 100)
    assert(ids == (0L until n1).toSeq, "phase 1 not contiguous")
    // restart from the same checkpoint: continues AFTER the committed ids
    val q2 = start()
    try {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (ids.length <= n1 && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally q2.stop()
    val all = ids
    assert(all.length > n1)
    assert(all == (0L until all.length).toSeq,
      s"restart produced dup/gap: ${all.take(5)}..${all.takeRight(5)}")
  }

  test("plays with the rest of the engine: shingles + dedup over the source") {
    val df = docs(rows = 200, parts = 4)
    val shingled = df.select(col("doc_id"),
      graft.operators.Mirror.shingles3(col("text")).as("sh"))
    assert(shingled.filter(size(col("sh")) > 0).count() == 200)
  }
}
