package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The LSH bucket cap (VERDICT r1 #2): a degenerate hot bucket must produce
  * at most C(MaxBucket, 2) candidate pairs, taken deterministically from the
  * MaxBucket smallest ids — the exact rows the oracle's
  * `row_number() <= MaxBucket` keeps. */
class BucketsSpec extends AnyFunSuite with SparkTestSession {

  test("hot bucket is capped at C(MaxBucket,2) pairs over the smallest ids") {
    import spark.implicits._
    val m = Buckets.MaxBucket
    // one hot bucket with 2.5×MaxBucket members, one small bucket, one singleton
    val rows =
      (1L to 250L).map(("hot", _)) ++ Seq(("cold", 7L), ("cold", 3L),
        ("cold", 5L), ("lone", 9L))
    val df = rows.toDF("b", "id")
    val pairs = Buckets.cappedPairs(df, Seq("b"), "id", "cap_test")
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == m * (m - 1) / 2 + 3)
    // survivors are exactly ids 1..MaxBucket (sorted-prefix == rn <= MaxBucket);
    // ids above 9 can only come from the hot bucket
    assert(pairs.flatMap(p => Seq(p._1, p._2)).filter(_ > 9L).max == m.toLong)
    assert(pairs.contains((3L, 5L)) && pairs.contains((3L, 7L))
      && pairs.contains((5L, 7L)))
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("distinctItems collapses repeated (bucket, id) rows before pairing") {
    import spark.implicits._
    val df = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("x", 2L), ("x", 1L))
      .toDF("b", "id")
    val pairs = Buckets.cappedPairs(df, Seq("b"), "id", "cap_test_distinct",
        distinctItems = true)
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("drop count is observable via QueryExecutionListener") {
    import spark.implicits._
    @volatile var dropped = -1L
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("cap_obs").foreach { row =>
          dropped = row.getAs[Long]("dropped_ids")
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = (1L to (Buckets.MaxBucket + 40L)).map(("hot", _)).toDF("b", "id")
      Buckets.cappedPairs(df, Seq("b"), "id", "cap_obs").count()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (dropped < 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(dropped == 40L)
    } finally spark.listenerManager.unregister(listener)
  }
}
