package graft.functions

import graft.covid.SparkTestSession
import graft.operators.{Mirror, Quality}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native [[MultiMatch]] (one Aho–Corasick pass) vs its executable
  * declarative spec ([[Mirror.multiMatchSpec]], one `replace` scan per
  * pattern): value equality on the real corpus with the production
  * blocklist, a randomized binary-alphabet stress that hammers fail
  * links, hand-computed overlap/nesting cases, SQL registration, and
  * the build-time guards. */
class MultiMatchSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("native == declarative replace-count spec over real documents " +
    "with the q155 blocklist, and the blocklist actually hits") {
    val docs = graft.Tables(spark, sfDir, "documents").select(col("text"))
    val pats = Quality.blockPatterns
    val a = docs.select(MultiMatch.counts(col("text"), pats).as("c"))
      .collect()
    val b = docs.select(Mirror.multiMatchSpec(col("text"), pats).as("c"))
      .collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val total = docs
      .select(aggregate(MultiMatch.counts(col("text"), pats), lit(0L),
        (acc, x) => acc + x).as("t"))
      .agg(sum("t")).collect().head.getLong(0)
    assert(total > 0, "blocklist never matches — the suite tests nothing")
  }

  test("randomized binary-alphabet stress: automaton == naive greedy " +
    "indexOf scan (fail links under maximal pattern overlap)") {
    val pats = Seq("a", "b", "aa", "ab", "ba", "bb", "aab", "aba", "bab",
      "abab", "aaaa")
    val ac = AhoCorasick.build(pats)
    def naive(s: String, p: String): Long = {
      var idx = 0; var cnt = 0L
      var j = s.indexOf(p, idx)
      while (j >= 0) { cnt += 1; idx = j + p.length; j = s.indexOf(p, idx) }
      cnt
    }
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val s = (0 until rnd.nextInt(40)).map(_ =>
        if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = ac.counts(UTF8String.fromString(s))
      pats.indices.foreach { i =>
        assert(got.getLong(i) == naive(s, pats(i)),
          s"pattern '${pats(i)}' on '$s'")
      }
    }
  }

  test("hand-computed cases: self-overlap, nesting, shared prefixes, " +
    "empty text, cross-pattern independence") {
    val p = Seq("ab", "aba", "batch batch", "window window", "slow join",
      "slow join sort")
    def counts(text: String): List[Long] =
      Seq(text).toDF("t")
        .select(MultiMatch.counts(col("t"), p).as("c"))
        .collect().head.getAs[scala.collection.Seq[Long]]("c").toList
    // "ab" greedy twice; "aba" self-overlaps at 0 and 2 → only one counts;
    // both scored independently on the ORIGINAL text
    assert(counts("ababa") == List(2, 1, 0, 0, 0, 0))
    // three windows hold exactly ONE non-overlapping "window window"
    assert(counts("window window window") == List(0, 0, 0, 1, 0, 0))
    assert(counts("batch batch batch") == List(0, 0, 1, 0, 0, 0))
    // prefix pattern and its extension both count on the same span
    assert(counts("a slow join sort") == List(0, 0, 0, 0, 1, 1))
    assert(counts("") == List(0, 0, 0, 0, 0, 0))
    assert(counts("no hits here") == List(0, 0, 0, 0, 0, 0))
  }

  test("null text yields null") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(MultiMatch.counts(col("t"), Seq("x")).as("c")).collect()
    assert(r.head.isNullAt(0))
  }

  test("multi_match is SQL-callable; a non-foldable pattern array is " +
    "rejected at analysis time") {
    GraftExtensions.registerInto(spark)
    val rows = spark.sql(
      "SELECT multi_match('abcabc', array('abc', 'bc')) AS c").collect()
    assert(rows.head.getAs[scala.collection.Seq[Long]]("c").toList ==
      List(2L, 2L))
    val e = intercept[Exception](spark.sql(
      "SELECT multi_match('a', array(CAST(rand() AS STRING)))").collect())
    assert(e.getMessage.toLowerCase.contains("foldable"))
    val eNull = intercept[Exception](spark.sql(
      "SELECT multi_match('a', array('x', CAST(NULL AS STRING)))").collect())
    assert(eNull.getMessage.contains("null pattern"))
    val eNullArr = intercept[Exception](spark.sql(
      "SELECT multi_match('a', CAST(NULL AS ARRAY<STRING>))").collect())
    assert(eNullArr.getMessage.contains("must not be null"))
    // wrong element type: clean analysis error, not a ClassCastException
    val eType = intercept[Exception](spark.sql(
      "SELECT multi_match('a', array(1, 2))").collect())
    assert(eType.getMessage.contains("ARRAY<STRING>"),
      s"expected a descriptive type error, got: ${eType.getMessage}")
  }

  test("expression participates in whole-stage codegen") {
    // repartition defeats ConvertToLocalRelation so a real stage is planned
    val df = Seq.tabulate(10)(i => s"doc $i slow join").toDF("t")
      .repartition(2)
      .select(MultiMatch.counts(col("t"), Seq("slow join")).as("c"))
    assert(df.collect().length == 10) // finalize the adaptive plan first
    // "*(n)" marks a WholeStageCodegen stage — multi_match must sit
    // inside one, not force interpreted projection (the scoring pass is
    // the hot path of every blocklist query)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[multi_match.*"), plan)
  }

  test("build guards: empty set, empty pattern, duplicate pattern") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "a")))
  }
}
