package graft.operators

import java.nio.file.Files

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan checks for the corpus-QA module (q112–q116) beyond the
  * DuckDB oracle gate: funnel attribution must partition the corpus,
  * fraction columns must be consistent with their integer numerators, and
  * q115 must actually detect an injected cross-split duplicate (the
  * sf* fixtures are leak-free, so the oracle only ever checks the
  * zero case there).
  */
class QualitySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("q112: rule drops partition the corpus (docs = drops + kept)") {
    val rows = Quality.q112QualityFunnel.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getAs[Long]("docs")
      val parts = Seq("drop_len", "drop_word_len", "drop_repetition",
        "drop_stopword", "kept").map(r.getAs[Long](_))
      assert(parts.sum == docs, s"source ${r.getString(0)}")
      assert(parts.forall(_ >= 0))
      assert(r.getAs[Long]("kept_tokens") >= r.getAs[Long]("kept"),
        "a kept doc has >= 10 tokens by rule R1")
    }
  }

  test("q113: per-source fractions sum to 1 and drift ratio is consistent") {
    val rows = Quality.q113LengthDrift.fn(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      val fracSum = rs.map(_.getAs[Double]("src_frac")).sum
      assert(math.abs(fracSum - 1.0) < 1e-9, s"source $src")
    }
    rows.foreach { r =>
      val expect = r.getAs[Double]("src_frac") / r.getAs[Double]("corpus_frac")
      assert(r.getAs[Double]("drift_ratio") == expect)
    }
  }

  test("q114: norm stats ordered, dim constant on the fixture") {
    val rows = Quality.q114EmbeddingQa.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim_min") == r.getAs[Long]("dim_max"))
      val (lo, med, hi) = (r.getAs[Double]("norm_min"),
        r.getAs[Double]("norm_median"), r.getAs[Double]("norm_max"))
      assert(lo <= med && med <= hi)
      assert(r.getAs[Long]("zero_vecs") == 0)
    }
  }

  test("q115: detects an injected cross-split duplicate; clean pairs stay 0") {
    // Build a corpus where two doc_ids landing in DIFFERENT q53 splits
    // share identical text; everything else is unique.
    val dir = Files.createTempDirectory("quality-spec").toFile.getAbsolutePath
    import spark.implicits._
    val withSplit = (0L until 200L).toDF("doc_id")
      .withColumn("bucket",
        Mirror.hash60(col("doc_id").cast("string")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid").otherwise("test"))
      .collect().map(r => r.getLong(0) -> r.getString(2))
    val train = withSplit.collectFirst { case (id, "train") => id }.get
    val test_ = withSplit.collectFirst { case (id, "test") => id }.get
    withSplit.toSeq.toDF("doc_id", "split")
      .select(col("doc_id"),
        when(col("doc_id").isin(train, test_), lit("the same leaked text"))
          .otherwise(concat(lit("unique text "), col("doc_id"))).as("text"),
        lit("en").as("lang"), lit("src0").as("source"),
        lit(20).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Quality.q115SplitLeakage.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("leaked_fps"), r.getAs[Long]("docs_a"),
          r.getAs[Long]("docs_b"))).toMap
    assert(rows.size == 3, "every split pair reported, zeros explicit")
    assert(rows(("test", "train")) == ((1L, 1L, 1L)))
    assert(rows(("test", "valid")) == ((0L, 0L, 0L)))
    assert(rows(("train", "valid")) == ((0L, 0L, 0L)))
  }

  test("q115 plan: no cartesian product, leak join keyed on fingerprint") {
    val plan = Quality.q115SplitLeakage.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "row-level pair enumeration must never appear")
  }

  test("q116: confusion matrix covers every doc exactly once") {
    val rows = Quality.q116LangidConfusion.fn(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("docs")).sum
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    assert(total == nDocs)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val share = rs.map(_.getAs[Double]("lang_share")).sum
      assert(math.abs(share - 1.0) < 1e-9, s"lang $lang")
    }
  }
}
