package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan checks for the classifier decision surface (q157
  * calibration, q158 threshold sweep) beyond the DuckDB oracle gate:
  * the bins must partition each split and be internally consistent with
  * their min/max scores, the sweep must partition each split at every
  * threshold and move monotonically, its thr=0 row must reproduce
  * q128's confusion matrix exactly, and the plans must keep the
  * frozen-model shape (no join on the scoring path, the 13-row
  * threshold table broadcast). */
class ClassifySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val nBySplit: Map[String, Long] =
    Classify.labeledDocs(graft.Tables(spark, sfDir, "documents"))
      .groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q157: bins partition each split, n_good bounded, min/max land in " +
    "their own bin") {
    val rows = Classify.q157ClassifierCalibration.fn(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet == Set("train", "valid", "test"))
    bySplit.foreach { case (split, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum == nBySplit(split),
        s"$split: bins must partition the split")
      rs.foreach { r =>
        val (nd, ng) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_good"))
        assert(ng >= 0 && ng <= nd, r.toString)
        assert(nd >= 1, "empty bins must not be emitted")
        val bin = r.getAs[Long]("bin")
        val (lo, hi) = (r.getAs[Long]("min_score_pt"),
          r.getAs[Long]("max_score_pt"))
        assert(lo <= hi, r.toString)
        // both bound scores re-bin to the row's own bin (the shifted
        // floor-division identity Spark and DuckDB must agree on)
        assert((lo + 1000000L) / 500L == bin, r.toString)
        assert((hi + 1000000L) / 500L == bin, r.toString)
      }
    }
  }

  test("q158: every threshold partitions each split; tp/fp fall and fn/tn " +
    "rise monotonically in thr; thr=0 reproduces q128's confusion matrix") {
    val rows = Classify.q158ThresholdSweep.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("thr")) ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Long]("tn"))).toMap
    assert(rows.size == 3 * Classify.thresholds.size)
    Seq("train", "valid", "test").foreach { split =>
      Classify.thresholds.foreach { t =>
        val (tp, fp, fn, tn) = rows((split, t))
        assert(tp + fp + fn + tn == nBySplit(split), s"$split thr=$t")
      }
      Classify.thresholds.sliding(2).foreach { case Seq(a, b) =>
        val (tpA, fpA, fnA, tnA) = rows((split, a))
        val (tpB, fpB, fnB, tnB) = rows((split, b))
        assert(tpB <= tpA && fpB <= fpA && fnB >= fnA && tnB >= tnA,
          s"$split: raising thr $a -> $b must only move keeps to drops")
      }
    }
    // thr=0 IS q128's operating point: (label_good, pred_good) counts match
    val q128 = Classify.q128QualityClassifier.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Boolean]("label_good"),
        r.getAs[Boolean]("pred_good")) -> r.getAs[Long]("n_docs")).toMap
      .withDefaultValue(0L)
    Seq("train", "valid", "test").foreach { split =>
      val (tp, fp, fn, tn) = rows((split, 0L))
      assert(tp == q128((split, true, true)), s"$split tp")
      assert(fp == q128((split, false, true)), s"$split fp")
      assert(fn == q128((split, true, false)), s"$split fn")
      assert(tn == q128((split, false, false)), s"$split tn")
    }
  }

  test("q157/q158 plan: frozen-model shape — scoring joins nothing; the " +
    "threshold table enters as a broadcast nested loop, never a shuffle " +
    "join or cartesian") {
    val cal = Classify.q157ClassifierCalibration.fn(spark, sfDir)
    cal.collect()
    val calPlan = cal.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!calPlan.contains("Join"),
      s"q157 scores against an array literal, no join\n$calPlan")
    assert("Exchange hashpartitioning".r.findAllIn(calPlan).length == 1,
      s"q157: one rollup exchange expected\n$calPlan")

    val sw = Classify.q158ThresholdSweep.fn(spark, sfDir)
    sw.collect()
    val swPlan = sw.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(swPlan.contains("BroadcastNestedLoopJoin"), swPlan)
    assert(!swPlan.contains("SortMergeJoin") &&
      !swPlan.contains("CartesianProduct"), swPlan)
    assert("Exchange hashpartitioning".r.findAllIn(swPlan).length == 1,
      s"q158: one rollup exchange expected\n$swPlan")
  }
}
