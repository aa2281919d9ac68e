package graft.functions

import graft.covid.SparkTestSession
import graft.operators.Mirror
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native [[PairGen]] vs its executable declarative spec
  * ([[Mirror.pairsSpec]]): value equality on real data for BOTH element
  * types it serves (strings in q79, bigints in the LSH bucket
  * enumeration), edge cases, SQL registration, and codegen
  * compatibility. */
class PairGenSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("native == declarative spec over real word arrays (string) and " +
    "hash arrays (bigint)") {
    val words = graft.Tables(spark, sfDir, "documents")
      .select(array_sort(array_distinct(split(col("text"), " "))).as("w"))
    val a = words.select(Mirror.pairs(col("w")).as("p")).collect()
    val b = words.select(Mirror.pairsSpec(col("w")).as("p")).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)

    val longs = graft.Tables(spark, sfDir, "documents")
      .select(array_sort(transform(split(col("text"), " "),
        w => Mirror.hash60(w))).as("w"))
    val c = longs.select(Mirror.pairs(col("w")).as("p")).collect()
    val d = longs.select(Mirror.pairsSpec(col("w")).as("p")).collect()
    assert(c.map(_.toString).toSeq == d.map(_.toString).toSeq)
  }

  test("edge cases: empty and 1-element arrays yield no pairs; order " +
    "and duplicates are preserved") {
    val df = Seq(Seq.empty[String], Seq("x"), Seq("b", "a", "b"))
      .toDF("w")
    val got = df.select(Mirror.pairs(col("w")).as("p")).collect()
      .map(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p")
        .map(r => (r.getString(0), r.getString(1))).toList).toList
    assert(got == List(List(), List(),
      List(("b", "a"), ("b", "b"), ("a", "b"))))
  }

  test("pairs_gen is SQL-callable and count matches n*(n-1)/2") {
    graft.functions.GraftExtensions.registerInto(spark)
    val rows = spark.sql(
      "SELECT size(pairs_gen(sequence(1, 6))) AS n").collect()
    assert(rows.head.getInt(0) == 15)
  }

  test("an array too large to expand fails with a clear error instead of " +
    "Int-overflowing to NegativeArraySizeException") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.LongType
    // n = 65537 → n·(n−1)/2 = 2_147_516_416 > Int.MaxValue. The size check
    // precedes any element access, so null elements are fine and the call
    // returns immediately — no giant allocation.
    val big = new GenericArrayData(new Array[Any](65537))
    val e = intercept[IllegalArgumentException](PairUtil.pairs(big, LongType))
    assert(e.getMessage.contains("pairs_gen"))
  }
}
