package graft.functions

import graft.covid.SparkTestSession
import graft.operators.Mirror
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen dot product must be BIT-identical to the declarative
  * higher-order-function form (and therefore to the DuckDB oracle). */
class FloatVectorSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
  }

  test("native dot is bit-identical to the fold form") {
    val df = vecs(200, 64).toDF("id", "v")
      .select(col("id"), col("v"),
        FloatVector.dot(col("v"), col("v")).as("native"),
        Mirror.dotD(col("v"), col("v")).as("folded"))
    val rows = df.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val n = java.lang.Double.doubleToRawLongBits(r.getAs[Double]("native"))
      val f = java.lang.Double.doubleToRawLongBits(r.getAs[Double]("folded"))
      assert(n == f, s"row ${r.getLong(0)}: bits differ")
    }
  }

  test("cosine via native dot matches Mirror.cosineD bitwise") {
    val pairs = vecs(50, 64).zip(vecs(50, 64).reverse).map {
      case ((i, a), (_, b)) => (i, a, b)
    }
    val rows = pairs.toDF("id", "a", "b")
      .select(
        FloatVector.cosine(col("a"), col("b")).as("native"),
        Mirror.cosineD(col("a"), col("b")).as("folded"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null and empty inputs") {
    val df = Seq(
      (1L, Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (2L, None, Some(Seq(3f, 4f))),
      (3L, Some(Seq.empty[Float]), Some(Seq.empty[Float])),
      (4L, Some(Seq(1f, 2f, 3f)), Some(Seq(1f))))
      .toDF("id", "a", "b")
      .select(col("id"), FloatVector.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 11.0)
    assert(df(1).isNullAt(1))
    assert(df(2).getDouble(1) == 0.0)
    assert(df(3).isNullAt(1)) // ragged arrays are null, like the zip_with spec
    // a null ELEMENT also nulls the result (poisoned fold), even though the
    // array columns themselves are non-null
    val withNullElem = Seq(
      (1L, Seq(Some(1f), None, Some(3f)), Seq(Some(1f), Some(2f), Some(3f))))
      .toDF("id", "a", "b")
      .select(FloatVector.dot(col("a"), col("b")).as("d"))
      .collect().head
    assert(withNullElem.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation so a real stage is planned
    val df = vecs(10, 8).toDF("id", "v").repartition(2)
      .select(FloatVector.dot(col("v"), col("v")).as("d"))
    assert(df.collect().length == 10) // finalize the adaptive plan first
    // "*(n)" marks a WholeStageCodegen stage in the plan tree — float_dot
    // must sit inside one, not force interpreted projection
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[float_dot.*"), plan)
  }
}
