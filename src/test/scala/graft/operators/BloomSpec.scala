package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q142 Bloom decontamination cascade: the no-false-negatives soundness
  * claim (verified against a bloom-free exact join), the one-sided
  * accounting, and OR-mergeability of the filter words. Runs at sf0.1 —
  * the scale where the fixture has real contamination AND real false
  * positives (62/42/20 at last measure), so neither side is vacuous. */
class BloomSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.1"

  private def docs = graft.Tables(spark, sfDir, "documents")
  private def isEval =
    pmod(Mirror.hash60b(col("doc_id").cast("string")), lit(50L)) === 0

  test("the cascade is SOUND: flagged_exact equals the bloom-free " +
    "exact contamination, and the accounting is one-sided per source") {
    val out = Bloom.q142BloomContam.fn(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("flagged_exact") <= r.getAs[Long]("flagged_bloom"))
      assert(r.getAs[Long]("false_pos") ==
        r.getAs[Long]("flagged_bloom") - r.getAs[Long]("flagged_exact"))
    }
    // fixture: both real contamination and real FPs exist somewhere
    assert(out.map(_.getAs[Long]("flagged_exact")).sum > 0,
      "fixture has no true contamination")
    assert(out.map(_.getAs[Long]("false_pos")).sum > 0,
      "fixture exercises no false positives")

    // ground truth WITHOUT the bloom stage: direct eval-shingle join
    val ev = docs.filter(isEval)
      .select(explode(Mirror.shingle5Gen(col("text"))).as("sh")).distinct()
    val exact = docs.filter(!isEval)
      .select(col("doc_id"), col("source"),
        explode(Mirror.shingle5Gen(col("text"))).as("sh"))
      .join(ev, Seq("sh"), "left_semi")
      .select(col("source"), col("doc_id")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("flagged_exact") ==
        exact.getOrElse(r.getAs[String]("source"), 0L),
        s"cascade dropped a contaminated doc in ${r.getAs[String]("source")}")
    }
  }

  test("q142 plan: the corpus probe joins the filter BROADCAST and " +
    "nothing goes cartesian") {
    val df = Bloom.q142BloomContam.fn(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the (word, bits) filter table must reach the probe as a broadcast
    // — a corpus-keyed shuffle against a <=32K-row side is the failure
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom words MERGE by bitwise OR across eval slices") {
    def bloomOf(filter: org.apache.spark.sql.Column) = {
      val ev = docs.filter(isEval && filter)
        .select(explode(Mirror.shingle5Gen(col("text"))).as("sh")).distinct()
      ev.select(explode(array(
        pmod(Mirror.hash60(col("sh")), lit(1048576L)),
        pmod(Mirror.hash60b(col("sh")), lit(1048576L)))).as("b"))
        .select(Mirror.intDiv(col("b"), lit(32L)).as("word"),
          Mirror.shiftL(lit(1L), pmod(col("b"), lit(32L))).as("mask"))
        .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
        .collect().map(r => r.getAs[Long]("word") -> r.getAs[Long]("bits"))
        .toMap
    }
    val a = bloomOf(col("doc_id") % 2 === 0)
    val b = bloomOf(col("doc_id") % 2 === 1)
    val merged = (a.keySet ++ b.keySet).map(w =>
      w -> (a.getOrElse(w, 0L) | b.getOrElse(w, 0L))).toMap
    val full = bloomOf(lit(true))
    assert(merged == full,
      "OR of slice filters differs from the whole-eval filter")
  }
}
