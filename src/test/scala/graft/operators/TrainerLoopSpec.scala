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
}
