package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the tokenizer trainers' one-action-per-round job discipline:
  * a merge round is the argmax action alone (it materializes the
  * previous round's persisted generation as a side effect), with no
  * per-round eager count and — on the merges-only path — no final
  * re-segmentation job at all. A regression back to two actions per
  * round (or to rebuilding the unread final generation) roughly
  * doubles the scheduled job count, which is the measured floor of
  * the fresh-train bench queries (q135/q163) at small SF. */
class TrainerLoopSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"
  private val Rounds = 4 // BpeMerges == WpMerges == 4

  /** Scheduled-job count of `body`, listener-measured (the ScaleProbe
    * pattern); waits for the listener bus to drain before reading. */
  private def jobsOf[T](body: => T): (T, Int) = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        n.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = body
      var (stable, last) = (0, -1)
      while (stable < 5) {
        Thread.sleep(100)
        val now = n.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      (out, n.get())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("BPE merges-only training schedules one action per round " +
    "(plus the single full-width vocabulary materialization)") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val (merges, jobs) = jobsOf(TextAnalysis.bpeTrainMerges(docs))
    assert(merges.size == Rounds, s"expected $Rounds merges: $merges")
    // 1 vocab count + `Rounds` argmax actions, with slack for AQE
    // sub-jobs on the full-width vocab materialization. The old
    // two-actions-per-round loop + final rebuild scheduled 2×Rounds+1.
    assert(jobs <= Rounds + 4,
      s"BPE merges-only training scheduled $jobs jobs (want <= " +
        s"${Rounds + 4}; 2 actions/round would be ${2 * Rounds + 1})")
  }

  test("WordPiece merges-only training schedules one action per round") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val (merges, jobs) = jobsOf(TextAnalysis.wpTrainMerges(docs))
    assert(merges.size == Rounds, s"expected $Rounds merges: $merges")
    assert(jobs <= Rounds + 4,
      s"WordPiece merges-only training scheduled $jobs jobs (want <= " +
        s"${Rounds + 4}; 2 actions/round would be ${2 * Rounds + 1})")
  }

  test("unigram EM training schedules one job per segmentation pass") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val (pieceTable, jobs) = jobsOf(TextAnalysis.unigramTrain(docs))
    assert(pieceTable.columns.toSeq ==
      Seq("piece", "plen", "usage"))
    // 1 word-freq count + 1 fused seed/char collect + one usage job per
    // segmentation pass (2 prune rounds + the final), with slack for AQE
    // sub-jobs. The pre-native step-loop scheduled one job per consumed-
    // piece STEP per pass (~3× longest-word/avg-piece-len more).
    val passes = TextAnalysis.UniKeepK.size + 1
    assert(jobs <= passes + 6,
      s"unigram training scheduled $jobs jobs (want <= ${passes + 6})")
  }

  test("uni_segment matches a reference greedy leftmost-longest matcher") {
    import scala.jdk.CollectionConverters._
    val inventory = Seq("a", "b", "c", "d", "ab", "bcd", "abc", "cd")
    def ref(w: String): Seq[String] = {
      val maxLen = inventory.map(_.length).max
      val set = inventory.toSet
      val out = Seq.newBuilder[String]
      var i = 0
      var dead = false
      while (i < w.length && !dead) {
        val k = (math.min(maxLen, w.length - i) to 1 by -1)
          .find(k => set(w.substring(i, i + k)))
        k match {
          case Some(len) => out += w.substring(i, i + len); i += len
          case None => dead = true // unmatched char: oracle's NULL exit
        }
      }
      out.result()
    }
    val words =
      Seq("abcd", "abcdbcd", "dcba", "aaaa", "abxcd", "x", "cdab", "")
        .filter(_.nonEmpty)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = words.toDF("w")
      .select(col("w"),
        graft.functions.UniSegment.pieces(col("w"), inventory).as("p"))
      .collect()
      .map(r => r.getString(0) -> r.getList[String](1).asScala.toSeq)
      .toMap
    words.foreach { w =>
      assert(got(w) == ref(w), s"word '$w': ${got(w)} != ${ref(w)}")
    }
  }

  test("full training adds exactly the final-generation materialization " +
    "and returns it persisted") {
    val docs = graft.Tables(spark, sfDir, "documents")
    val ((vocab, merges), jobs) = jobsOf(TextAnalysis.bpeTrain(docs))
    try {
      assert(merges.size == Rounds)
      assert(jobs <= Rounds + 5,
        s"full BPE training scheduled $jobs jobs (want <= ${Rounds + 5})")
      assert(vocab.storageLevel.useMemory || vocab.storageLevel.useDisk,
        "trained vocabulary must come back persisted")
      // materialized: scanning it now must not schedule a shuffle storm
      val (_, scanJobs) = jobsOf(vocab.count())
      assert(scanJobs <= 2, s"final vocabulary was not materialized " +
        s"inside the training window ($scanJobs jobs to scan it)")
    } finally { vocab.unpersist(false); () }
  }

  test("fresh perplexity pipeline: bounded jobs, two text scans, " +
    "scan-free final action") {
    // q154's job-budget discipline (round-17 verdict item 3): the fresh
    // path is train (corpus scan 1 into the truncated model) + score
    // (corpus scan 2 into the truncated per-doc score table) + a tiny
    // histogram join-back. The FINAL action must not touch
    // documents.parquet at all — both corpus-scale subtrees are
    // materialized behind checkpoints before it runs (the pre-fix form
    // re-ran the scan + model joins TWICE inside the final job: the
    // score table fed both the report join and the bucket histogram
    // with no exchange reuse between them).
    val df = Quality.q154PerplexityTrainPipeline.fn(spark, sfDir)
    val (n, jobs) = jobsOf(df.count())
    assert(n > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "q154's final action must read only truncated intermediates, " +
        "never re-scan documents")
    // final action = doc-sized join + histogram window + sort: a small
    // fixed AQE stage budget. Re-running a corpus scan (or the model
    // training) inside it roughly doubles this.
    assert(jobs <= 8,
      s"fresh perplexity final action scheduled $jobs jobs (want <= 8)")
  }
}
