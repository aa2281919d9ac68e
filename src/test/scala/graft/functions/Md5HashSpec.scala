package graft.functions

import graft.covid.SparkTestSession
import graft.operators.Mirror
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native digest-to-long hash must equal the declarative
  * conv(substring(md5)) specification on every input. */
class Md5HashSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val inputs = {
    val rnd = new scala.util.Random(7)
    Seq("", "a", "hello world", "äöü ☃ unicode", "x" * 1000) ++
      (0 until 500).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
  }

  test("native hash60/hash60b equal their declarative specs") {
    val rows = inputs.toDF("s").repartition(3)
      .select(
        Mirror.hash60(col("s")).as("n1"),
        Mirror.hash60Spec(col("s")).as("s1"),
        Mirror.hash60b(col("s")).as("n2"),
        Mirror.hash60bSpec(col("s")).as("s2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("null input yields null") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(Mirror.hash60(col("s"))).collect().head
    assert(r.isNullAt(0))
  }
}
