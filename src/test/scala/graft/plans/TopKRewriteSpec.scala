package graft.plans

import graft.covid.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must turn the textbook row_number-filter pattern into
  * the native TopKPerKey operator with identical results. */
class TopKRewriteSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def windowForm = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    graft.Tables(spark, sfDir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  test("row_number<=k window filter rewrites to TopKPerKey and matches") {
    val expected = windowForm.collect()
      .map(r => (r.get(0), r.get(1), r.getInt(3))).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKStrategy
    try {
      val df = windowForm
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      assert(!plan.contains("RunningWindowFunction")
        && !plan.toLowerCase.contains("window function"), plan)
      val got = df.collect()
        .map(r => (r.get(0), r.get(1), r.getInt(3))).toSet
      assert(got == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  test("rule refuses oversized k and honors the session kill switch") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKStrategy
    try {
      // k above MaxK: the no-spill heaps lose to the window's spillable
      // sort, so the pattern must stay a Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val big = graft.Tables(spark, sfDir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= TopKRewrite.MaxK + 1)
      assert(!big.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      // kill switch: same eligible plan as the rewrite test, rule disabled
      spark.conf.set("spark.graft.topk.rewrite", "false")
      try
        assert(!windowForm.queryExecution.executedPlan.toString
          .contains("TopKPerKey"))
      finally spark.conf.unset("spark.graft.topk.rewrite")
      assert(windowForm.queryExecution.executedPlan.toString
        .contains("TopKPerKey"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }

  test("rule leaves multi-expression and non-row_number windows alone") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewrite
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKStrategy
    try {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      // rank(), not row_number() — must NOT rewrite (rank can exceed k rows)
      val df = graft.Tables(spark, sfDir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), plan)
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
    }
  }
}
