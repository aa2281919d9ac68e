package graft.operators

import graft.Tables
import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape coverage for the data-recipe operators
  * (q118 waterfill, q119 DSIR importance, q120 winnowing). Value-level
  * oracle parity is the driver gate's job (DuckDB, `tools/check.py`);
  * these tests pin the properties the oracle can't express: allocation
  * feasibility, the winnowing detection guarantee, and plan shapes.
  */
class RecipeSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("q118: allocation is feasible, budget-bounded, and exhausts " +
    "capacity before leaving budget unspent") {
    val rows = Recipe.q118TokenWaterfill.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val avail = rows.map(_.getAs[Long]("avail_tokens"))
    val alloc = rows.map(_.getAs[Long]("alloc_tokens"))
    val budget = avail.sum / 2
    // feasibility: no source allocates more than it has, epochs ≤ 1000‰
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("avail_tokens"))
      assert(r.getAs[Long]("epochs_pm") <= 1000L)
    }
    // budget: never overspent
    assert(alloc.sum <= budget)
    // one-round waterfill slack: what stays unspent is at most one
    // integer-division remainder per source plus the bonus round's floor
    // loss — far under one whole quota
    val quota = rows.head.getAs[Long]("quota")
    assert(budget - alloc.sum <= quota,
      s"unspent ${budget - alloc.sum} vs quota $quota")
  }

  test("q119: scores are deterministic, target slice scores above the " +
    "corpus, and every group is covered") {
    val df = Recipe.q119DsirImportance.fn(spark, sfDir)
    val rows = df.collect()
    val again = Recipe.q119DsirImportance.fn(spark, sfDir).collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted), "two runs disagree")
    // group coverage: every (source, lang) present in the corpus reports
    val expected = Tables(spark, sfDir, "documents")
      .select(col("source"), col("lang")).distinct().count()
    assert(rows.length == expected)
    // direction: the mean per-token importance of the target language is
    // strictly above the non-target mean (that's what importance means)
    def meanImp(sel: org.apache.spark.sql.Row => Boolean): Double = {
      val g = rows.filter(sel)
      g.map(_.getAs[Long]("sum_imp_pt")).sum.toDouble /
        g.map(_.getAs[Long]("docs")).sum
    }
    val en = meanImp(_.getAs[String]("lang") == "en")
    val rest = meanImp(_.getAs[String]("lang") != "en")
    assert(en > rest, s"en=$en rest=$rest")
  }

  test("q120: winnowing guarantees detection of long shared substrings") {
    import spark.implicits._
    // doc 2 embeds a 12-word run of doc 1 (≥ WinnowW + 2 = 6 words ⇒ the
    // run spans ≥ one full fingerprint window ⇒ detection is GUARANTEED,
    // not probabilistic); doc 3 is disjoint.
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four five"),
      (3L, "completely different words with no overlap at all zz yy xx")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("winnow").toFile
    tmp.deleteOnExit()
    docs.write.mode("overwrite")
      .parquet(new java.io.File(tmp, "documents.parquet").getPath)
    val pairs = Recipe.q120WinnowFingerprint.fn(spark, tmp.getPath).collect()
    val ab = pairs.find(r =>
      r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(ab.isDefined, s"1-2 pair missing: ${pairs.mkString(";")}")
    assert(ab.get.getAs[Long]("shared_fps") >= 2L)
    assert(!pairs.exists(r => r.getAs[Long]("doc_b") == 3L ||
      r.getAs[Long]("doc_a") == 3L), "disjoint doc 3 paired")
  }

  test("q120: sketch density is ~1/W of shingles, and real-data pairs " +
    "stay ordered and capped") {
    val rows = Recipe.q120WinnowFingerprint.fn(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("shared_fps") <= r.getAs[Long]("nfp_a"))
      assert(r.getAs[Long]("shared_fps") <= r.getAs[Long]("nfp_b"))
    }
  }

  test("q121: manifest stages stay mutually consistent and agree with " +
    "the q112 funnel") {
    val manifest = Recipe.q121RecipeManifest.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(manifest.nonEmpty)
    manifest.values.foreach { r =>
      val (kept, alloc, selD, selT, seqs) = (r.getAs[Long]("kept_tokens"),
        r.getAs[Long]("alloc_tokens"), r.getAs[Long]("sel_docs"),
        r.getAs[Long]("sel_tokens"), r.getAs[Long]("n_seqs"))
      assert(alloc <= kept)
      // selection fills the allocation (boundary doc may overflow) or
      // exhausts the source
      assert(selT >= alloc || selT == kept)
      assert(r.getAs[Long]("overflow_pm") >= 0L)
      assert((selD == 0L) == (seqs == 0L))
      assert(seqs <= math.max(selD, 1L))
    }
    // stage-1 totals must be EXACTLY q112's kept accounting per source —
    // the composition reuses the funnel, not a re-implementation of it
    Quality.q112QualityFunnel.fn(spark, sfDir).collect().foreach { q =>
      val src = q.getAs[String]("source")
      if (q.getAs[Long]("kept") > 0) {
        assert(manifest(src).getAs[Long]("kept_docs")
          == q.getAs[Long]("kept"), src)
        assert(manifest(src).getAs[Long]("kept_tokens")
          == q.getAs[Long]("kept_tokens"), src)
      }
    }
  }

  test("q122: coverage accounting is consistent and top_oov present " +
    "exactly when OOV words exist") {
    val rows = Recipe.q122VocabCoverage.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("coverage_pm") <= 1000L)
      val hasOov = r.getAs[Long]("oov_words") > 0
      assert(hasOov == (r.getAs[String]("top_oov") != null),
        r.getAs[String]("source"))
    }
  }

  test("q123: temperature weights normalize, smaller sources get boosted " +
    "shares, and planning stays inside the budget") {
    val rows = Recipe.q123TemperatureMixture.fn(spark, sfDir).collect()
    val pSum = rows.map(_.getAs[Double]("p")).sum
    assert(math.abs(pSum - 1.0) < 1e-9, s"p sums to $pSum")
    // τ=0.5 flattens: every source's share of probability must exceed
    // half its raw token share only when it is SMALL, and overall the
    // ordering of weights must follow the ordering of token counts
    val byTokens = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTokens.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p.head.getAs[Double]("weight") <= p.last.getAs[Double]("weight"))
    }
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val planned = rows.map(_.getAs[Long]("planned_tokens")).sum
    assert(planned <= totalTokens / 2, "planned exceeds the budget")
  }

  test("q124: detects injected boilerplate above the 30% threshold and " +
    "stays silent below it") {
    import spark.implicits._
    val header = "subscribe to our newsletter today"
    // src_bp: header in 2 of 4 docs (50% ≥ 30%); src_ok: 1 of 4 (25% < 30%)
    // bodies must share NO shingle across docs: every body word carries
    // the doc id, so only the injected header repeats
    def doc(id: Long, src: String, withHeader: Boolean): (Long, String, String) =
      (id, (if (withHeader) header + " " else "") +
        s"w${id}a w${id}b w${id}c w${id}d w${id}e w${id}f", src)
    val rows = Seq(
      doc(1, "src_bp", true), doc(2, "src_bp", true),
      doc(3, "src_bp", false), doc(4, "src_bp", false),
      doc(5, "src_ok", true), doc(6, "src_ok", false),
      doc(7, "src_ok", false), doc(8, "src_ok", false))
    val dir = java.nio.file.Files.createTempDirectory("boilerplate").toFile
    dir.deleteOnExit()
    rows.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = Recipe.q124Boilerplate.fn(spark, dir.getPath).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val bp = got("src_bp")
    // the 5-word header yields 3 distinct shingles, each in 2/4 docs
    assert(bp.getAs[Long]("bp_shingles") >= 3L, bp)
    assert(bp.getAs[Long]("affected_docs") == 2L, bp)
    assert(bp.getAs[String]("top_boilerplate") != null)
    val ok = got("src_ok")
    assert(ok.getAs[Long]("bp_shingles") == 0L, ok)
    assert(ok.getAs[Long]("affected_docs") == 0L, ok)
    assert(ok.getAs[String]("top_boilerplate") == null)
  }

  test("q125: sampling is deterministic, bounded by the clamp, and " +
    "keeps more of the target language than of the rest") {
    val rows = Recipe.q125ImportanceSample.fn(spark, sfDir).collect()
    val again = Recipe.q125ImportanceSample.fn(spark, sfDir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("min_p_pm") >= 10L)
      assert(r.getAs[Long]("max_p_pm") <= 990L)
    }
    def keepRate(sel: org.apache.spark.sql.Row => Boolean): Double = {
      val g = rows.filter(sel)
      g.map(_.getAs[Long]("kept_docs")).sum.toDouble /
        g.map(_.getAs[Long]("docs")).sum
    }
    // importance-proportional: the target slice must survive sampling at
    // a higher rate than the off-target slices
    assert(keepRate(_.getAs[String]("lang") == "en")
      > keepRate(_.getAs[String]("lang") != "en"))
  }

  test("recipe plans: no cartesian products, q119 scoring is a narrow " +
    "fold (no corpus-scale join), q118 windows run post-rollup") {
    Seq(Recipe.q118TokenWaterfill, Recipe.q119DsirImportance,
      Recipe.q120WinnowFingerprint, Recipe.q121RecipeManifest,
      Recipe.q122VocabCoverage, Recipe.q123TemperatureMixture,
      Recipe.q124Boilerplate, Recipe.q125ImportanceSample).foreach { q =>
      val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct")
        && !plan.contains("BroadcastNestedLoopJoin"), s"${q.name}: $plan")
    }
    // q119's per-doc pass must NOT join: the score table rides along as a
    // collected literal, so the only joins in the plan would be a bug
    val q119 = Recipe.q119DsirImportance.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!q119.contains("Join"), q119)
    // q120's shingle+hash pipeline must appear exactly ONCE in the
    // optimized plan — CollapseProject inlining it into the window
    // slices was a measured 40× regression (Mirror.let1 guards it)
    val q120 = Recipe.q120WinnowFingerprint.fn(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert("md5_hash60".r.findAllIn(q120).length == 1, q120)
    assert("shingles3_gen".r.findAllIn(q120).length == 1, q120)
    // q122's vocabulary must stay a bounded top-K (per-partition heaps +
    // k-row merge, never a global sort) joined BROADCAST — the two plan
    // properties that keep it 100 TB-shaped
    val q122 = Recipe.q122VocabCoverage.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(q122.contains("TakeOrderedAndProject"), q122)
    assert(q122.contains("BroadcastHashJoin"), q122)
  }

  test("q137: packing audit matches an independent imperative packer " +
    "and the rollup reuses the window's shard partitioning") {
    val df = Recipe.q137SequencePack.fn(spark, sfDir)
    val got = df.collect().map(r => r.getAs[String]("source") -> r).toMap

    // independent model: replay concat-and-chop per source in plain Scala
    val cap = 512L
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("toks")))
    docs.groupBy(_._2).foreach { case (src, rows) =>
      var cum = 0L; var split = 0L; var spans = 0L
      rows.sortBy(_._1).foreach { case (_, _, t) =>
        val start = cum; cum += t
        if (t > 0) {
          val s = (cum - 1) / cap - start / cap
          spans += s; if (s > 0) split += 1
        }
      }
      val r = got(src)
      assert(r.getAs[Long]("n_docs") == rows.length, src)
      assert(r.getAs[Long]("total_tokens") == cum, src)
      assert(r.getAs[Long]("n_sequences") == (cum + cap - 1) / cap, src)
      assert(r.getAs[Long]("tail_pad")
        == ((cum + cap - 1) / cap) * cap - cum, src)
      assert(r.getAs[Long]("docs_split") == split, src)
      assert(r.getAs[Long]("extra_spans") == spans, src)
      // a doc that straddles k boundaries appears in k+1 sequences
      assert(r.getAs[Long]("extra_spans") >= r.getAs[Long]("docs_split"))
    }

    // plan: ONE hash exchange total — the per-shard rollup must consume
    // the running-sum window's hash(source) partitioning, not re-shuffle
    // (the orderBy adds a rangepartitioning exchange; that's the
    // presentation sort, not a data-movement stage at scale)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1,
      s"rollup must reuse the window partitioning (1 hash exchange):\n$plan")
    assert(plan.contains("Window"), plan)
  }
}
