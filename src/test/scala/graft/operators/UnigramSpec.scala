package graft.operators

import java.io.File

import graft.covid.SparkTestSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (q144/q145): the full training loop against an
  * INDEPENDENT driver-side reference implementation (seed → greedy
  * segment → count → prune ×2 → final count, in plain Scala collections),
  * plus the [[UnigramCache]] artifact contract (cached ≡ computed, second
  * read hits the store, kill switch restores inline training). */
class UnigramSpec extends AnyFunSuite with SparkTestSession
    with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private val localRoot =
    new File(sys.props("java.io.tmpdir"), "graft-unigramcache-spec")

  override def beforeAll(): Unit = {
    deleteRec(localRoot)
    sys.props("graft.unigramcache.dir") = "file:" + localRoot.getAbsolutePath
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    sys.props.remove("graft.unigramcache.dir")
    deleteRec(localRoot)
    super.afterAll()
  }

  private def deleteRec(f: File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  /** Plain-Scala reference of the whole trainer: the final piece table
    * AND the segmented vocabulary (w → n_pieces) under the final set. */
  private def reference(texts: Seq[String])
      : (Seq[(String, Long, Long)], Map[String, Long]) = {
    val wf: Map[String, Long] = texts
      .flatMap(_.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sub = scala.collection.mutable.Map.empty[String, Long]
    wf.foreach { case (w, f) =>
      for (i <- 0 until w.length; k <- 1 to 4 if i + k <= w.length)
        sub(w.substring(i, i + k)) = sub.getOrElse(w.substring(i, i + k), 0L) + f
    }
    val chars = sub.keys.filter(_.length == 1).toSeq.sorted
    val seed = sub.toSeq.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (-c, p) }.take(256).map(_._1)
    def segment(pieces: Set[String])
        : (Map[String, Long], Map[String, Long]) = {
      val u = scala.collection.mutable.Map.empty[String, Long]
      val np = scala.collection.mutable.Map.empty[String, Long]
      wf.foreach { case (w, f) =>
        var i = 0
        while (i < w.length) {
          val k = (4 to 1 by -1).find(k =>
            i + k <= w.length && pieces(w.substring(i, i + k))).get
          val p = w.substring(i, i + k)
          u(p) = u.getOrElse(p, 0L) + f
          np(w) = np.getOrElse(w, 0L) + 1L
          i += k
        }
      }
      (u.toMap, np.toMap)
    }
    var pieces = (chars ++ seed).toSet
    Seq(192, 128).foreach { keep =>
      val u = segment(pieces)._1
      pieces = (chars ++ u.toSeq.filter(_._1.length >= 2)
        .sortBy { case (p, c) => (-c, p) }.take(keep).map(_._1)).toSet
    }
    val (fin, np) = segment(pieces)
    (fin.toSeq.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, p.length.toLong, c) }, np)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("q145 training equals an independent driver-side reference over " +
    "the real corpus, and greedy matching is genuinely leftmost-longest") {
    val texts = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0)).toSeq
    val (want, wantVocab) = reference(texts)
    val got = rows(TextAnalysis.q145UnigramTrainPipeline.fn(spark, sfDir))
    assert(got == want, s"got ${got.size} pieces, want ${want.size}; " +
      s"first diff: ${got.zip(want).find { case (a, b) => a != b }}")
    // the segmented-vocabulary payload: per-word piece counts under the
    // final set equal the reference segmentation word for word
    val (_, vocabDf) = TextAnalysis
      .unigramTrainFull(graft.Tables(spark, sfDir, "documents"))
    val gotVocab = vocabDf.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotVocab == wantVocab,
      s"vocab drift: ${gotVocab.size} vs ${wantVocab.size} words")
    // non-vacuous: multi-char pieces must dominate usage (the tokenizer
    // actually learned subwords, it isn't falling back to characters)
    val multi = got.filter(_._2 > 1).map(_._3).sum
    val single = got.filter(_._2 == 1).map(_._3).sum
    assert(multi > single,
      s"multi-char usage $multi must exceed single-char $single")
  }

  test("q144 (cached) == q145 (bypass); second read resolves the " +
    "published artifact; kill switch restores inline training") {
    deleteRec(localRoot)
    val fresh = rows(TextAnalysis.q145UnigramTrainPipeline.fn(spark, sfDir))
    val before = ArtifactStore.published.get()
    val first = rows(TextAnalysis.q144UnigramPieces.fn(spark, sfDir))
    assert(first == fresh, "cached result must equal the fresh training")
    assert(ArtifactStore.published.get() == before + 1,
      "first q144 use must publish exactly one artifact")
    val second = rows(TextAnalysis.q144UnigramPieces.fn(spark, sfDir))
    assert(second == fresh)
    assert(ArtifactStore.published.get() == before + 1,
      "second q144 use must resolve, not republish")
    try {
      spark.conf.set("spark.graft.unigramcache", "false")
      assert(rows(TextAnalysis.q144UnigramPieces.fn(spark, sfDir)) == fresh,
        "kill switch must train inline to the identical table")
    } finally spark.conf.unset("spark.graft.unigramcache")
    deleteRec(localRoot)
  }
}
