package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("production avg centroid matches the oracle fold within 1e-9") {
    // the fold form buffers per-group lists (oracle-only); the avg form is
    // the scale path — they must agree to float-noise tolerance
    val exact = Similarity.all.find(_.name == "q25_embedding_centroid").get
      .fn(spark, sfDir)
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val approx = Similarity.centroidByPosApprox(spark, sfDir)
      .collect().map(r => (r.get(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - approx(k)) < 1e-9, s"$k: fold $v vs avg ${approx(k)}")
    }
  }

  test("production centroid mode (exact=false): Lloyd agrees to 1e-6, recall parity") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val exact = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
    spark.conf.set("spark.graft.centroids.exact", "false")
    try {
      val approx = Similarity.lloydCentroids(emb, Similarity.KmeansIters)
      assert(exact.map(_._1).toSeq == approx.map(_._1).toSeq)
      exact.zip(approx).foreach { case ((c, ev), (_, av)) =>
        assert(ev.length == av.length)
        ev.zip(av).foreach { case (x, y) =>
          assert(math.abs(x - y) < 1e-6, s"cell $c: fold $x vs avg $y")
        }
      }
      // recall parity: the approx-mean quantizer must clear the same
      // brute-force bar the exact one does (assignment flips from 1e-12
      // mean noise are possible but must not degrade retrieval)
      val bf = Similarity.q23AnnBruteforce.fn(spark, sfDir)
        .filter(col("rnk") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivf = Similarity.q48AnnKmeansIvf.fn(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (bf & ivf).size.toDouble / bf.size
      assert(recall >= 0.3, s"approx-mode recall $recall")
    } finally spark.conf.unset("spark.graft.centroids.exact")
  }

  test("native NearestCentroids(nprobe) equals a driver-side (d, cell) sort") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val rnd = new scala.util.Random(11)
    val cents = Array.tabulate(7)(k =>
      ((k + 1).toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val rows = emb.select(col("vec_id"), col("embedding"),
      graft.functions.NearestCentroids(col("embedding"), cents, 3).as("cells"),
      graft.functions.NearestCentroid(col("embedding"), cents).as("best"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val expected = cents.map { case (c, cv) =>
        var acc = 0.0
        var i = 0
        val n = math.min(cv.length, v.length)
        while (i < n) { val d = v(i) - cv(i); acc += d * d; i += 1 }
        (acc, c)
      }.sortBy(identity).take(3).map(_._2).toSeq
      assert(r.getSeq[Long](2) == expected, s"vec ${r.getLong(0)}")
      // probe 1 is exactly the single-cell assignment
      assert(r.getSeq[Long](2).head == r.getLong(3), s"vec ${r.getLong(0)}")
    }
  }

  test("native NearestCentroid equals the declarative least-of-structs spec") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // arbitrary deterministic centroids, including an exact-tie candidate
    val rnd = new scala.util.Random(7)
    val cents = Array.tabulate(8)(k =>
      ((k + 1).toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val both = emb.select(col("vec_id"),
      graft.functions.NearestCentroid(col("embedding"), cents).as("native"),
      Similarity.nearestCellLit(col("embedding"), cents).as("spec"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("batched PQ codebooks equal the per-subspace Lloyd loop bit-exactly") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val batched = Similarity.pqCodebooks(emb)
    (0 until Similarity.PqM).foreach { m =>
      val sub = slice(col("embedding"), m * Similarity.PqSubDim + 1,
        Similarity.PqSubDim)
      val solo = Similarity.lloydCentroids(
        emb.select(col("vec_id"), sub.as("embedding")), 1)
      assert(batched(m).map(_._1).toSeq == solo.map(_._1).toSeq, s"cells m=$m")
      batched(m).zip(solo).foreach { case ((_, bv), (_, sv)) =>
        assert(bv.toSeq == sv.toSeq, s"centroid values differ in subspace $m")
      }
    }
  }

  test("cached PQ codebooks equal a fresh batched train bit-exactly, " +
    "and the encode/decode round-trip preserves subspace + cell order") {
    val emb = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val fresh = Similarity.pqCodebooks(emb)
    Similarity.clearModelMemoForTest()
    val cached = Similarity.pqCodebooksCached(emb) // trains + memoizes
    val again = Similarity.pqCodebooksCached(emb) // pure memo hit
    Seq(cached, again).foreach { got =>
      assert(got.length == Similarity.PqM)
      (0 until Similarity.PqM).foreach { m =>
        assert(got(m).map(_._1).toSeq == fresh(m).map(_._1).toSeq,
          s"cell ids m=$m")
        got(m).zip(fresh(m)).foreach { case ((_, gv), (_, fv)) =>
          assert(gv.toSeq == fv.toSeq, s"centroids differ in subspace $m")
        }
      }
    }
  }

  test("trained k-means IVF (q48) probes multiple populated cells") {
    val out = Similarity.q48AnnKmeansIvf.fn(spark, sfDir)
      .collect()
    val perQuery = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.nonEmpty)
    // every query with any candidates returns at most 5, ranked 1..n
    assert(perQuery.values.forall(_ <= 5))
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
  }

  test("q48 recall vs brute force is non-trivial at nprobe=2 of K=8") {
    val bf = Similarity.q23AnnBruteforce.fn(spark, sfDir)
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.q48AnnKmeansIvf.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    // approximate by design; the quantizer must still beat random bucketing
    assert(recall >= 0.3, s"recall $recall")
  }

  test("q64 int8 quantization keeps recall@5 high vs exact brute force") {
    val bf = Similarity.q23AnnBruteforce.fn(spark, sfDir)
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.q64AnnInt8.fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & sq).size.toDouble / bf.size
    // 8-bit codes lose little: measured 0.96 at sf0.01 / min 0.8 per query
    assert(recall >= 0.7, s"recall $recall")
  }

  test("q68 two-stage PQ recall@5 beats its random baseline by 10x+") {
    val sf01 = "/root/testdata/sf0.01"
    // exact L2 ground truth, brute-forced on the driver (500 vectors)
    val vecs = graft.Tables(spark, sf01, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val truth = (0L until 16L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(c => (d2(vecs(q), vecs(c)), c)).take(5).toSet
    }.toMap
    val got = Similarity.q68AnnPq.fn(spark, sf01).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val recall = truth.keys.toSeq
      .map(q => (truth(q) & got(q)).size.toDouble / 5).sum / 16
    // measured 0.675 on the near-uniform fixture (its hardest case);
    // random 100-of-499 shortlists would land at ~0.2
    assert(recall >= 0.5, s"recall $recall")
  }

  test("q101: blocked contamination vs exact brute force — recall + score exactness") {
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (eval, train) = vecs.partition { case (id, _) => bucket(id) >= 95 }
    assert(eval.nonEmpty && train.nonEmpty)
    val evalM = eval.toMap
    // same op order as FloatVector.dot / the oracle fold: sequential sum
    // in double over float-promoted elements — bit-identical, so == holds
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    def sim(tv: Array[Float], ev: Array[Float]): Double =
      dot(tv, ev) / (nrm(tv) * nrm(ev))
    // exact ground truth: the brute force the pre-blocking q81 computed
    val want = train.map { case (id, tv) =>
      id -> eval.map { case (eid, ev) => (sim(tv, ev), eid) }
        .maxBy { case (s, eid) => (s, -eid) }
    }.toMap
    val trainM = train.toMap
    val got = Similarity.q101ContamBlocked.fn(spark, sfDir).collect()
    // contract: EVERY train vector surfaces exactly once, match or not
    assert(got.length == train.length)
    var hit = 0; var flagHit = 0; var flagWant = 0
    got.foreach { r =>
      val id = r.getLong(0)
      val (wSim, wEid) = want(id)
      if (wSim >= 0.35) flagWant += 1
      if (r.isNullAt(1)) {
        // no eval member in the probed cells — flag must be false
        assert(!r.getBoolean(3), s"train $id: null match but flagged")
      } else {
        val (eid, s, flag) = (r.getLong(1), r.getDouble(2), r.getBoolean(3))
        // reported score must be the EXACT cosine of the reported pair
        // (blocking changes which pair wins, never the score math) and
        // can only be <= the unblocked optimum
        assert(s == sim(trainM(id), evalM(eid)), s"train $id score")
        assert(s <= wSim + 1e-12, s"train $id: blocked beat exact?")
        assert(flag == (s >= 0.35), s"train $id flag")
        if (eid == wEid) hit += 1
        if (flag && wSim >= 0.35) flagHit += 1
      }
    }
    // blocker recall vs exact on the NEAR-UNIFORM sf0.001 fixture — the
    // hardest case for cell blocking (little cluster structure to block
    // on; random 3-of-8 cells would land at ~0.375 nearest-match).
    // Measured at ContamNProbe=3: nearest-match 0.557, contaminated-flag
    // 0.765 (13/17). The flag metric is the one decontamination lives on
    // (ANY >=0.35 eval neighbor found, not THE argmax); the fixture has
    // only 17 truly-contaminated vectors so each is ±0.06 of recall —
    // floors leave that granularity margin but catch a broken blocker.
    val recall = hit.toDouble / train.length
    val flagRecall =
      if (flagWant == 0) 1.0 else flagHit.toDouble / flagWant
    info(f"nearest-match recall $recall%.3f, flag recall $flagRecall%.3f" +
      s" ($flagWant contaminated in exact truth)")
    assert(recall >= 0.45, s"nearest-match recall $recall")
    assert(flagRecall >= 0.6, s"contamination recall $flagRecall")
    // the fixture must exercise both outcomes
    assert(got.exists(_.getBoolean(3)) && got.exists(!_.getBoolean(3)))
  }

  test("centroid model memo: distinct inputs never share a model") {
    def embOf(dir: String) = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // sf0.001 and sf0.01 embeddings have the identical SHAPE (500 rows,
    // same vec_ids) but different values — exactly the collision a
    // shape-keyed memo would hit (one bench session reads several SFs);
    // the file-path component of the memo key must keep them apart
    val c1 = Similarity.lloydCentroids(embOf("/root/testdata/sf0.001"),
      Similarity.KmeansIters)
    val c2 = Similarity.lloydCentroids(embOf("/root/testdata/sf0.01"),
      Similarity.KmeansIters)
    assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
    assert(!c1.zip(c2).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "different inputs must train different models")
    // a repeat call is memoized and, training being deterministic, equal
    val c1b = Similarity.lloydCentroids(embOf("/root/testdata/sf0.001"),
      Similarity.KmeansIters)
    assert(c1.zip(c1b).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("q101 plan: no cross join, no corpus-sized broadcast nested loop") {
    val plan = Similarity.q101ContamBlocked.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q81 adaptive: exact branch on a benchmark-sized eval split — " +
    "recall 1.0 vs brute force; broadcast, never a shuffled cartesian") {
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    val vecs = graft.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (eval, train) = vecs.partition { case (id, _) => bucket(id) >= 95 }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val want = train.map { case (id, tv) =>
      id -> eval.map { case (eid, ev) =>
        (dot(tv, ev) / (nrm(tv) * nrm(ev)), eid)
      }.maxBy { case (s, eid) => (s, -eid) }
    }.toMap
    assert(Similarity.contamUseExact(spark, sfDir),
      "fixture eval split must select the exact branch")
    val got = Similarity.q81SemanticContamination.fn(spark, sfDir).collect()
    assert(got.length == train.length)
    got.foreach { r =>
      val id = r.getLong(0)
      val (wSim, wEid) = want(id)
      // the exact branch IS the brute force: argmax, score and flag all
      // equal, bit for bit — the ~24% blocked-path false negatives from
      // the round-7 advice are gone at this scale
      assert(r.getLong(1) == wEid, s"train $id argmax")
      assert(r.getDouble(2) == wSim, s"train $id score")
      assert(r.getBoolean(3) == (wSim >= 0.35), s"train $id flag")
    }
    // the cross product must ride the few-MB eval broadcast (an intended
    // BroadcastNestedLoopJoin), never a shuffled CartesianProduct
    val plan = Similarity.q81SemanticContamination.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q81 adaptive: forcing the threshold to 0 flips to the blocked " +
    "branch (≡ q101)") {
    try {
      spark.conf.set("spark.graft.contam.exactmax", "0")
      val forced = Similarity.q81SemanticContamination.fn(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      val blocked = Similarity.q101ContamBlocked.fn(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(forced == blocked)
    } finally spark.conf.unset("spark.graft.contam.exactmax")
  }
}
