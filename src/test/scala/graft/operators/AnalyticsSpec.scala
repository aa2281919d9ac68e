package graft.operators

import graft.Tables
import graft.covid.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit checks for the events-analytics and shard-export queries (q84-q88):
  * each distributed formulation is verified against a direct (driver-side or
  * single-window) recomputation on the sf0.001 fixture.
  */
class AnalyticsSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  test("q84: bucket-offset global index equals the single-window form") {
    val got = Corpus.q84BalancedShards.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the textbook global row_number the distributed form must reproduce
    val expected = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), Mirror.hash60(col("text")).as("h"))
      .withColumn("global_pos",
        (row_number().over(Window.orderBy(col("h"), col("doc_id"))) - 1)
          .cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, pos) =>
      assert(got(id)._1 == pos, s"doc $id")
      assert(got(id)._2 == pos >> 6, s"doc $id shard")
    }
    // positions are a permutation of 0..N-1 => every shard but the last is full
    val positions = got.values.map(_._1).toSeq.sorted
    assert(positions == (0L until positions.size.toLong))
    val byShard = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    val lastShard = byShard.keys.max
    byShard.foreach { case (s, n) =>
      if (s < lastShard) assert(n == 64, s"shard $s") else assert(n <= 64)
    }
  }

  test("q85: rolling 7-day distinct users equals brute-force recount") {
    val got = Stats.q85RollingActiveUsers.fn(spark, sfDir)
      .collect()
      .map(r => r.getDate(0).toLocalDate -> (r.getLong(1), r.getLong(2)))
      .toMap
    val userDays = Tables(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = userDays.map(_._2).distinct
    assert(got.keySet == days.toSet)
    days.foreach { d =>
      val dau = userDays.filter(_._2 == d).map(_._1).distinct.size.toLong
      val wau = userDays.filter { case (_, ud) =>
        !ud.isAfter(d) && !ud.isBefore(d.minusDays(6))
      }.map(_._1).distinct.size.toLong
      assert(got(d) == ((dau, wau)), s"day $d")
    }
  }

  test("q86: BPE pair counts equal a driver-side recount") {
    val texts = Tables(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ", -1).filter(_.nonEmpty).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    })
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = TextAnalysis.q86BpePairCounts.fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q87: funnel stages are monotone and stage 1 is exact") {
    val rows = Stats.q87FunnelStages.fn(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(1, 2, 3))
    assert(rows(1) >= rows(2) && rows(2) >= rows(3))
    val viewers = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows(1) == viewers)
  }

  test("q89: chunking covers every word exactly and strides correctly") {
    val texts = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Corpus.q89DocChunks.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val chunks = byDoc(id).sortBy(_._2)
      // chunk count = number of stride starts <= len
      assert(chunks.size == (ws.length - 1) / 30 + 1, s"doc $id")
      chunks.foreach { case (_, cid, nw, h) =>
        val expect = ws.slice(cid * 30, cid * 30 + 40)
        assert(nw == expect.length, s"doc $id chunk $cid")
        // fingerprint matches a driver-side recompute of the same slice
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(expect.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(h == java.lang.Long.parseLong(md5.take(15), 16),
          s"doc $id chunk $cid")
      }
      // full coverage: every word index falls in some chunk
      assert(chunks.map(c => c._2 * 30 + c._3).max >= ws.length)
    }
  }

  test("q90: transition matrix equals a driver-side recount") {
    val events = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3)))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    def us(t: java.sql.Timestamp) =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events.groupBy(_._1).values.foreach { evs =>
      evs.sortBy(e => (us(e._2), e._3)).map(_._4)
        .sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
    }
    val got = Stats.q90EventTransitions.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == counts.keySet)
    counts.foreach { case (k, n) =>
      assert(got(k)._1 == n, s"$k")
      val total = counts.filter(_._1._1 == k._1).values.sum
      assert(got(k)._2 == n.toDouble / total.toDouble, s"$k")
    }
  }

  test("q92: every event lands in exactly len/slide hopping windows") {
    val nEvents = Tables(spark, sfDir, "events").count()
    val windowed = Relational.q92HoppingWindow.fn(spark, sfDir).collect()
    // 10-min windows every 5 min => each event is counted exactly twice
    assert(windowed.map(_.getLong(2)).sum == 2 * nEvents)
    // window starts are 5-minute aligned
    windowed.foreach { r =>
      assert(r.getTimestamp(0).getTime % (5 * 60 * 1000) == 0, r)
    }
  }

  test("q93: outlier flags equal a driver-side exact recount") {
    val vecs = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray))
    // centroids: per (label, pos) left fold over vec_id order, / n
    val byLabel = vecs.groupBy(_._2)
    val cents = byLabel.map { case (lbl, vs) =>
      val sorted = vs.sortBy(_._1)
      val dim = sorted.head._3.length
      lbl -> Array.tabulate(dim) { p =>
        sorted.foldLeft(0.0)((acc, v) => acc + v._3(p).toDouble) /
          sorted.length.toDouble
      }
    }
    // dist2: left fold over pos of (x - c)^2
    val dist = vecs.map { case (id, lbl, emb) =>
      val c = cents(lbl)
      val d = emb.indices.foldLeft(0.0) { (acc, p) =>
        val diff = emb(p).toDouble - c(p); acc + diff * diff
      }
      (id, lbl, d)
    }
    val expected = byLabel.keys.flatMap { lbl =>
      val ds = dist.filter(_._2 == lbl).sortBy(t => (t._3, t._1))
      val n = ds.length
      val thr = ds((19 * n + 19) / 20 - 1)._3
      ds.map(t => t._1 -> (t._3, t._3 > thr))
    }.toMap
    val got = Similarity.q93EmbeddingOutliers.fn(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (id, (d, o)) =>
      assert(got(id) == ((d, o)), s"vec $id")
    }
  }

  test("q94: size distribution is consistent with the q59 labeling") {
    val dist = Corpus.q94ClusterSizeDist.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = Tables(spark, sfDir, "documents").count()
    // every document is in exactly one cluster; removals = docs - clusters
    assert(dist.map(_._3).sum == nDocs)
    dist.foreach { case (size, nc, nd, rem) =>
      assert(nd == size * nc && rem == (size - 1) * nc)
    }
    // cross-check against q59's per-doc comp_size column
    val q59Sizes = Corpus.q59DedupComponents.fn(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).distinct // (component, size)
    val expected = q59Sizes.groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    assert(dist.map(d => d._1 -> d._2).toMap == expected)
  }

  test("q96-q98: artifact-consumer reports agree with q59's clustering") {
    val q59 = Corpus.q59DedupComponents.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // q96: one medoid per multi-member cluster, member of that cluster
    val clusters = q59.filter(_._3 >= 2).groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toMap
    val medoids = Corpus.q96MedoidSurvivor.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(medoids.map(_._1).toSet == clusters.keySet)
    medoids.foreach { case (comp, mid, n, deg) =>
      assert(clusters(comp).contains(mid))
      assert(n == clusters(comp).size)
      assert(deg >= 1 && deg < n) // degree counts OTHER members matched
    }
    // q98: per-source doc shrinkage must total q59's survivor count
    val shrink = Corpus.q98DedupShrinkage.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(shrink.map(_._2).sum == q59.length)
    assert(shrink.map(_._3).sum == q59.count(_._4))
    shrink.foreach { case (_, db, da, tb, ta, frac) =>
      assert(da <= db && ta <= tb)
      assert(frac == ta.toDouble / tb.toDouble)
    }
  }

  test("q99: banding S-curve estimates are monotone in bands, within [0,1]") {
    val rows = Dedup.q99LshParamSweep.fn(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((2, 8), (4, 4), (8, 2), (16, 1)))
    assert(rows.map(_._3).distinct.size == 1) // same pair set throughout
    rows.foreach { case (_, _, n, est) =>
      assert(n > 0 && est > 0.0 && est <= 1.0)
    }
    // splitting the same 16 hashes into more, shorter bands can only
    // raise collision probability (proved: 2j^8 <= 2j^4 on [0,1])
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
    // the verified pairs all sit at jaccard >= 0.5, where 4x4 banding is
    // designed to catch nearly everything — sanity floor
    assert(rows.find(t => t._1 == 4).get._4 >= 0.9)
  }

  test("q88: cohort retention covers every user at week 0") {
    val rows = Stats.q88CohortRetention.fn(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (cw, wno, n) =>
      assert(wno >= 0 && n > 0)
      // cohort weeks are Monday-truncated
      assert(cw.getDayOfWeek == java.time.DayOfWeek.MONDAY)
    }
    val week0 = rows.filter(_._2 == 0L).map(_._3).sum
    val allUsers = Tables(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    // every user is active in their own first week by definition
    assert(week0 == allUsers)
  }
}
