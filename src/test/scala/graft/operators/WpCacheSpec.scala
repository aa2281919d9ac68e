package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** WordPiece tokenizer (q162/q163 + [[WpCache]]): the cached artifact is
  * row-identical to fresh training, the store publishes exactly once, and
  * the likelihood argmax genuinely differs from BPE's frequency argmax
  * where the two criteria disagree. */
class WpCacheSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("cached WordPiece model == freshly trained (q162 == q163), and " +
    "the second read resolves without publishing") {
    val tmp = java.nio.file.Files.createTempDirectory("wpcache")
    sys.props("graft.wpcache.dir") = tmp.toString
    try {
      val fresh = TextAnalysis.q163WordpieceTrainPipeline
        .fn(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(fresh.size == 4, s"expected 4 merge rounds, got ${fresh.size}")
      val before = ArtifactStore.published.get()
      val cached = TextAnalysis.q162WordpieceMerges
        .fn(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(ArtifactStore.published.get() == before + 1,
        "first q162 use must train-and-publish exactly once")
      assert(cached == fresh)
      val again = TextAnalysis.q162WordpieceMerges
        .fn(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(ArtifactStore.published.get() == before + 1,
        "warm store must resolve, not republish")
      assert(again == fresh)
    } finally {
      sys.props.remove("graft.wpcache.dir")
      ()
    }
  }

  test("likelihood argmax != frequency argmax when a rarer pair is more " +
    "predictive than the commonest one") {
    // 'aa' x100: pair (a,a) count 100, c(a)=200 -> score 100/40000=0.0025
    // 'xy' x30:  pair (x,y) count 30,  c(x)=c(y)=30 -> score 30/900=0.033
    val docs = (Seq.fill(100)("aa") ++ Seq.fill(30)("xy"))
      .toDF("text")
    val vocab = TextAnalysis.bpeVocab(docs)
    val bpe = TextAnalysis.bpeTopPair(vocab).get
    val wp = TextAnalysis.wpTopPair(vocab).get
    assert((bpe._1, bpe._2) == (("a", "a")),
      s"BPE must pick the most frequent pair: $bpe")
    assert((wp._2, wp._3) == (("x", "y")),
      s"WordPiece must pick the most predictive pair: $wp")
    assert(wp._4 == 30L && wp._5 == 30L && wp._6 == 30L)
  }
}
