package graft.operators

import java.nio.file.Files

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + plan-shape coverage for the corpus-lifecycle diff (q126),
  * the perceptual-hash media clustering (q127), and the trained quality
  * classifier (q128). Value-level oracle parity is the driver gate's job
  * (DuckDB, `tools/check.py`); these pin the properties the oracle can't
  * express: diff-class accounting against independently-derived snapshot
  * sizes, detection of a CONSTRUCTED perceptual near-dup that exact
  * hashing scatters, held-out generalization on a separable corpus, and
  * the no-join scoring plan.
  */
class LifecycleSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("q126: diff classes reconcile with independently-computed " +
    "snapshot sizes") {
    val rows = Lifecycle.q126SnapshotDiff.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val added = rows.map(_.getAs[Long]("n_added")).sum
    val removed = rows.map(_.getAs[Long]("n_removed")).sum
    val changed = rows.map(_.getAs[Long]("n_changed")).sum
    val unchanged = rows.map(_.getAs[Long]("n_unchanged")).sum

    // Derive the membership predicates independently (same q53-style
    // hashes) and check |old| and |new| against the class sums.
    val base = graft.Tables(spark, sfDir, "documents").select(
      (Mirror.hash60(col("doc_id").cast("string")) % 10).as("h"),
      (Mirror.hash60b(col("doc_id").cast("string")) % 4).as("h2"))
    val nOld = base.filter(col("h") < 8).count()
    val nNew = base.filter(col("h") >= 2).count()
    val nBothEdited = base.filter(col("h") >= 2 && col("h") < 8 &&
      col("h2") === 0).count()
    assert(removed + changed + unchanged == nOld)
    assert(added + changed + unchanged == nNew)
    // an edited doc's fp is md5(fp||':rev2') — never equal to fp, so
    // every carried-over edited doc classifies as changed, no more no less
    assert(changed == nBothEdited)
  }

  test("q127: groups a constructed transposition near-dup (same block " +
    "sums, different md5) and not an unrelated payload; plan is " +
    "join-free and explode-free") {
    val dir = Files.createTempDirectory("lifecycle-spec").toFile
      .getAbsolutePath
    import spark.implicits._
    val baseText = ("abcdefgh" * 8) // 64 chars, 16 blocks of 4
    // transposing two chars INSIDE one block preserves that block's byte
    // sum => identical phash, different exact fingerprint
    val nearDup = baseText.updated(0, 'b').updated(1, 'a')
    assert(nearDup != baseText)
    val unrelated = "zzzzyyyy" + ("aaaabbbb" * 7) // different bit pattern
    Seq(
      (0L, baseText, "en", "src0", baseText.length),
      (1L, nearDup, "en", "src0", nearDup.length),
      (2L, unrelated, "en", "src0", unrelated.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.q127MediaPhash.fn(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows.head.getAs[Long]("n_files") == 2)
    assert(rows.head.getAs[Long]("n_payloads") == 2,
      "near-dup group must collapse two DISTINCT exact payloads")
    assert(rows.head.getAs[Long]("first_doc") == 0L)

    val plan = Multimodal.q127MediaPhash.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Generate"), plan)
  }

  test("q127: a small byte-value edit inside the block-mean margin keeps " +
    "the phash — the perceptual tolerance md5 lacks") {
    val dir = Files.createTempDirectory("lifecycle-spec2").toFile
      .getAbsolutePath
    import spark.implicits._
    // alternating high ('z') and low ('a') blocks of 4 => every bit has a
    // wide margin; nudging one byte by 1 ('z'->'y') cannot cross it
    val t = ("zzzz" + "aaaa") * 8 // 64 chars, blocks of 4
    val edited = t.updated(1, 'y')
    assert(edited != t)
    Seq((0L, t, "en", "src0", t.length),
      (1L, edited, "en", "src0", edited.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Multimodal.q127MediaPhash.fn(spark, dir).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_files") == 2 &&
      rows.head.getAs[Long]("n_payloads") == 2, rows.mkString(";"))
  }

  test("q129: counts Hamming-1 signature neighbors; join is broadcast " +
    "over the signature-space table") {
    val dir = Files.createTempDirectory("lifecycle-spec4").toFile
      .getAbsolutePath
    import spark.implicits._
    val a = ("zzzz" + "aaaa") * 8
    val b = "zzzz" + "zzzz" + ("zzzz" + "aaaa") * 7 // block 1 flipped high
    Seq((0L, a, "en", "src0", a.length), (1L, b, "en", "src0", b.length))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // validate the construction: signatures differ in exactly one bit
    val sigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.functions.Phash16(col("text"))).collect()
      .map(_.getLong(0))
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(1)) == 1,
      s"fixture must be Hamming-1 apart, got ${sigs.toSeq}")
    val rows = Multimodal.q129PhashAdjacency.fn(spark, dir).collect()
    assert(rows.length == 2, rows.mkString(";"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_files") == 1)
      assert(r.getAs[Long]("nbr_files") == 1, r.toString)
    }

    val plan = Multimodal.q129PhashAdjacency.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      !plan.contains("SortMergeJoin"), plan)
  }

  test("q128: perfect held-out separation on a vocabulary-disjoint " +
    "corpus; scoring plan is join-free") {
    val dir = Files.createTempDirectory("lifecycle-spec3").toFile
      .getAbsolutePath
    import spark.implicits._
    // good docs: 24 tokens, 50% stopwords  -> label_good = true
    // bad docs: 10 tokens, disjoint vocab  -> label_good = false (too short)
    val good = Array.fill(12)("the cat").mkString(" ")
    val bad = Array.fill(5)("zq xv").mkString(" ")
    (0L until 200L).map { i =>
      if (i % 2 == 0) (i, good, "en", "src0", good.length)
      else (i, bad, "en", "src0", bad.length)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Classify.q128QualityClassifier.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    // every (split, label) row predicts the label itself — including the
    // held-out valid/test splits: the model generalizes off the train set
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pred_good") == r.getAs[Boolean]("label_good"),
        r.toString)
      assert(r.getAs[Long]("n_docs") > 0)
    }
    // all three splits must actually appear (the hash split covered both
    // classes in each) for the generalization claim to mean anything
    assert(rows.map(_.getAs[String]("split")).toSet ==
      Set("train", "valid", "test"))

    val plan = Classify.q128QualityClassifier.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("q128: training is deterministic and model state is bounded") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        lit("train").as("split"),
        (length(col("text")) % 2 === 0).as("label_good"))
    val m1 = Classify.trainModel(docs)
    val m2 = Classify.trainModel(docs)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.length == 256)
  }

  // ---- q130/q131: SCD2 history + point-in-time lookup ----

  /** Imperative re-derivation of the snapshot simulation — an independent
    * implementation (java MessageDigest + loops, no Spark) the distributed
    * window/groupBy pipeline must agree with. */
  private object Scd2Model {
    import java.security.MessageDigest

    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    def h60(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

    def h60b(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(15, 30), 16)

    /** Per-doc segments as (fp, from, to), from the same rules as
      * Lifecycle.scd2Segments. */
    def segments(id: Long, text: String): Seq[(String, Int, Int)] = {
      val fp0 = md5hex(text)
      var v = 0
      var segs = List.empty[(String, Int, Int)]
      var lastS = -10
      (0 to 3).foreach { s =>
        if (s >= 1 && h60b(s"$id:rev:$s") % 3 == 0) v += 1
        val fp = (0 until v).foldLeft(fp0)((acc, _) => md5hex(acc + ":r"))
        if (h60(s"$id:mem:$s") % 10 < 8) {
          segs match {
            case (pfp, pf, pt) :: rest if pfp == fp && s == lastS + 1 =>
              segs = (pfp, pf, s) :: rest
            case _ => segs = (fp, s, s) :: segs
          }
          lastS = s
        }
      }
      segs.reverse
    }
  }

  test("q130: distributed SCD2 build agrees with an independent " +
    "imperative re-derivation, per source") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
    val expected = docs
      .map { r =>
        val segs = Scd2Model.segments(r.getLong(0), r.getString(2))
        (r.getString(1), segs.size)
      }
      .filter(_._2 > 0)
      .groupBy(_._1)
      .map { case (src, xs) =>
        src -> ((xs.length.toLong, xs.map(_._2.toLong).sum,
          xs.count(_._2 > 1).toLong, xs.map(_._2.toLong).max))
      }
    val got = Lifecycle.q130Scd2History.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_segments"),
          r.getAs[Long]("n_multiseg_docs"), r.getAs[Long]("max_segments"))))
      .toMap
    assert(got == expected, s"got=$got expected=$expected")
    // the simulation must actually exercise multi-segment histories,
    // or the collapse logic is untested
    assert(got.values.map(_._3).sum > 0, "no multi-segment docs simulated")
  }

  test("q131: PIT lookup — segments are disjoint (no probe duplication), " +
    "hits match independent membership, checksum matches model") {
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
    var nProbes, nHits, checksum = 0L
    docs.foreach { r =>
      val id = r.getLong(0)
      if (Scd2Model.h60(s"$id:pit") % 7 == 0) {
        nProbes += 1
        val t = (Scd2Model.h60b(s"$id:pit") % 4).toInt
        val hit = Scd2Model.segments(id, r.getString(2))
          .filter { case (_, f, to) => f <= t && t <= to }
        assert(hit.size <= 1, s"overlapping segments for doc $id")
        if (hit.nonEmpty) {
          nHits += 1
          checksum += Scd2Model.h60(hit.head._1) % 1000000
        }
      }
    }
    val rows = Lifecycle.q131PitLookup.fn(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_probes")).sum == nProbes)
    assert(rows.map(_.getAs[Long]("n_hits")).sum == nHits)
    assert(rows.map(_.getAs[Long]("fp_checksum")).sum == checksum)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") + r.getAs[Long]("n_misses") ==
        r.getAs[Long]("n_probes"))
    }
    // misses must exist in the simulation (gap coverage), hits must too
    assert(nHits > 0 && nHits < nProbes)
  }

  test("q130/q131 plans: single shuffle key (doc_id) windows, " +
    "no cartesian product") {
    val p130 = Lifecycle.q130Scd2History.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    val p131 = Lifecycle.q131PitLookup.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p130.contains("CartesianProduct"), p130)
    assert(!p131.contains("CartesianProduct"), p131)
    // text must collapse to md5 before the snapshot explode: no `text`
    // reference may survive above the scan's immediate projection. The
    // Generate node's printed argument list IS the set of columns that
    // cross the ×4 explode — assert it carries the fingerprint and not
    // text (a contains("Generate explode") alone would pass even if full
    // text were exploded ×4).
    val genLine = p130.linesIterator.find(_.contains("Generate explode"))
    assert(genLine.isDefined, p130)
    assert(genLine.get.contains("fp0"), genLine.get)
    assert(!genLine.get.contains("text#"),
      s"document text crosses the snapshot explode: ${genLine.get}")
  }

  test("q126 production shape: snapshots stored bucketed by doc_id diff " +
    "with NO exchange on either join side") {
    // The Scaladoc at Lifecycle.q126SnapshotDiff claims "writing both
    // snapshots bucketed by doc_id makes the diff shuffle-free" — this
    // materializes the two snapshot relations exactly that way and holds
    // the plan to it: a bucketed-scan full-outer SortMergeJoin whose only
    // exchange is the tiny per-source rollup.
    val base = graft.Tables(spark, sfDir, "documents").select(
      col("doc_id"), col("source"),
      (Mirror.hash60(col("doc_id").cast("string")) % 10).as("h"),
      (Mirror.hash60b(col("doc_id").cast("string")) % 4).as("h2"),
      md5(col("text").cast("binary")).as("fp"))
    base.filter(col("h") < 8)
      .select(col("doc_id"), col("source").as("o_source"),
        col("fp").as("o_fp"))
      .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("snap_old_bkt")
    base.filter(col("h") >= 2)
      .select(col("doc_id"), col("source").as("n_source"),
        when(col("h2") === 0, md5(concat(col("fp"), lit(":rev2"))
          .cast("binary"))).otherwise(col("fp")).as("n_fp"))
      .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("snap_new_bkt")
    val savedBroadcastThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = spark.table("snap_old_bkt")
        .join(spark.table("snap_new_bkt"), Seq("doc_id"), "full_outer")
        .select(coalesce(col("o_source"), col("n_source")).as("source"),
          when(col("o_fp").isNull, "added")
            .when(col("n_fp").isNull, "removed")
            .when(col("o_fp") =!= col("n_fp"), "changed")
            .otherwise("unchanged").as("change"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
      val rows = diff.collect()
      assert(rows.nonEmpty)
      // cross-check against the unbucketed q126 totals
      val q126 = Lifecycle.q126SnapshotDiff.fn(spark, sfDir).collect()
      val want = q126.map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_added") + r.getAs[Long]("n_removed") +
          r.getAs[Long]("n_changed") + r.getAs[Long]("n_unchanged"))).toMap
      assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == want)
      val plan = diff.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        plan)
      assert(plan.contains("Bucketed: true"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"diff join must be shuffle-free (1 rollup exchange only):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        savedBroadcastThreshold)
      spark.sql("DROP TABLE IF EXISTS snap_old_bkt")
      spark.sql("DROP TABLE IF EXISTS snap_new_bkt")
    }
  }

  test("q133: the composition's counts tie to the standalone operators " +
    "it composes (q126 delta, q72-style probe, q112/q121 inventory)") {
    val rows = Lifecycle.q133IncrementalBuild.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.nonEmpty)

    // 1. delta accounting == q126's classifier (same membership hashes)
    val q126 = Lifecycle.q126SnapshotDiff.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_added"), r.getAs[Long]("n_changed"))).toMap
    rows.foreach { case (src, r) =>
      val (a, c) = q126(src)
      assert(r.getAs[Long]("n_added") == a, s"$src n_added")
      assert(r.getAs[Long]("n_changed") == c, s"$src n_changed")
    }

    // 2. the dedup gate == a directly-run one-sided probe over the split
    val withHid = graft.Tables(spark, sfDir, "documents")
      .withColumn("hid",
        Mirror.hash60(col("doc_id").cast("string")) % 10)
    val live = withHid.filter(col("hid") >= 2)
    val matches = Dedup.incrementalMatches(
      live.filter(col("hid") >= 8), live.filter(col("hid") <= 7))
    val dupBySrc = matches
      .join(live.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_dup") == dupBySrc.getOrElse(src, 0L),
        s"$src n_dup")
    }
    // the gate must be non-trivial in the fixture: some dups, some kept
    assert(rows.values.map(_.getAs[Long]("n_dup")).sum > 0)
    assert(rows.values.map(_.getAs[Long]("n_added_kept")).sum > 0)

    // 3. base inventory == the funnel ROLLUP's kept tokens over the
    //    carried docs (funnelReport is the sequential-rule path — an
    //    independent formulation of the same keep decision)
    val baseKept = Quality.funnelReport(
        Quality.funnelMetrics(live.filter(col("hid") <= 7)))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kept_tokens")).toMap
    rows.foreach { case (src, r) =>
      assert(r.getAs[Long]("base_tokens") == baseKept.getOrElse(src, 0L),
        s"$src base_tokens")
    }

    // 4. waterfill invariants (q118's single round): per-source cap and
    //    a common uncapped quota
    val totals = rows.values.map(_.getAs[Long]("total_tokens")).toSeq
    val quota = totals.sum / 2 / rows.size
    rows.values.foreach { r =>
      val alloc = r.getAs[Long]("alloc_tokens")
      val total = r.getAs[Long]("total_tokens")
      assert(alloc == math.min(total, quota),
        s"${r.getAs[String]("source")} alloc")
    }
  }

  test("q133 plan: no cartesian product, and the probe's candidate join " +
    "runs on the band-hash equi-keys (delta-linear, never all-pairs)") {
    val df = Lifecycle.q133IncrementalBuild.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the LSH candidate join must be keyed on (band_idx, band_hash) —
    // the shape that stays an equi-join at 100 TB
    assert(plan.contains("band_hash"), plan)
    assert(df.collect().nonEmpty)
  }
}
