package graft.operators

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q132 integer PageRank: full value parity against an independent
  * imperative implementation (MessageDigest + arrays, no Spark), mass
  * accounting, and the scale-shape pins (bounded top-k, no cartesian).
  * Oracle parity is the driver gate's job; this proves the distributed
  * loop against a second, structurally different implementation. */
class GraphSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  /** Imperative PageRank over the same synthetic graph. */
  private def model(n: Int): Array[Long] = {
    val out = Array.fill(n)(List.empty[Int])
    (0 until n).foreach { d =>
      (1 to 3).foreach { k =>
        val t = (h60(s"$d:link:$k") % n).toInt
        if (t != d) out(d) = t :: out(d)
      }
    }
    var r = Array.fill(n)(1000000L)
    (1 to 5).foreach { _ =>
      val next = Array.fill(n)(150000L)
      (0 until n).foreach { d =>
        val deg = out(d).size
        if (deg > 0) {
          val c = (r(d) * 17) / (deg * 20)
          out(d).foreach(t => next(t) += c)
        }
      }
      r = next
    }
    r
  }

  test("q132: distributed ranks equal the imperative model's top-100, " +
    "and the model's totals account for damping + dangling leakage") {
    val n = graft.Tables.metaCount(spark, sfDir, "documents").toInt
    val r = model(n)
    val expTop = (0 until n).map(d => (r(d), d.toLong))
      .sortBy { case (rank, d) => (-rank, d) }.take(100)
      .map { case (rank, d) => (d, rank) }
    val got = Graph.q132Pagerank.fn(spark, sfDir).collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[Long]("rank_micro")))
      .toSeq
    assert(got == expTop, s"first diff: ${got.zip(expTop).find(p => p._1 != p._2)}")
    // ranks must actually differentiate (a degenerate uniform graph would
    // make the top-100 vacuous)
    assert(r.distinct.length > 10)
    // total mass ≤ teleport + damped initial mass (floor division and
    // dangling nodes only ever LOSE mass, never create it)
    assert(r.sum <= n * 1000000L)
  }

  test("q132 plan: bounded TakeOrdered head, no cartesian product") {
    val plan = Graph.q132Pagerank.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def h60b(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(15, 30), 16)

  /** Imperative q134: sink-aware graph + per-round dangling-mass
    * redistribution. Returns (final ranks, per-round ideal-vs-actual mass
    * loss, edge count, dangling count). */
  private def modelDangling(n: Int)
      : (Array[Long], Seq[Long], Long, Int) = {
    val out = Array.fill(n)(List.empty[Int])
    (0 until n).foreach { d =>
      if (h60b(s"$d:sink") % 5 != 0) {
        (1 to 3).foreach { k =>
          val t = (h60(s"$d:link:$k") % n).toInt
          if (t != d) out(d) = t :: out(d)
        }
      }
    }
    val nEdges = out.map(_.size.toLong).sum
    val dangling = (0 until n).filter(out(_).isEmpty)
    var r = Array.fill(n)(1000000L)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to 5).foreach { _ =>
      val dangSum = dangling.map(r(_)).sum
      val share = dangSum * 17L / (20L * n)
      val next = Array.fill(n)(150000L + share)
      (0 until n).foreach { d =>
        val deg = out(d).size
        if (deg > 0) {
          val c = (r(d) * 17) / (deg * 20)
          out(d).foreach(t => next(t) += c)
        }
      }
      // ideal damped total vs the integer-floored actual
      val ideal = n * 150000L + r.sum * 17L / 20L
      r = next
      losses += (ideal - r.sum)
    }
    (r, losses.toSeq, nEdges, dangling.size)
  }

  test("q134: distributed ranks equal the sink-aware imperative model's " +
    "top-100; dangling mass is redistributed, not leaked") {
    val n = graft.Tables.metaCount(spark, sfDir, "documents").toInt
    val (r, losses, nEdges, nDang) = modelDangling(n)
    // the fixture must exercise the term: ~20% sinks, none trivial
    assert(nDang > n / 10, s"only $nDang dangling nodes of $n")
    val expTop = (0 until n).map(d => (r(d), d.toLong))
      .sortBy { case (rank, d) => (-rank, d) }.take(100)
      .map { case (rank, d) => (d, rank) }
    val got = Graph.q134PagerankDangling.fn(spark, sfDir).collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[Long]("rank_micro")))
      .toSeq
    assert(got == expTop,
      s"first diff: ${got.zip(expTop).find(p => p._1 != p._2)}")
    // MASS CONSERVATION: each round's loss vs the ideal damped total is
    // only floor truncation — strictly less than one micro-unit per edge
    // (contribution floors) plus one per node (share floor). q132's leak
    // is the ENTIRE dangling mass (~20% of the graph's rank) instead.
    losses.foreach { loss =>
      assert(loss >= 0 && loss < nEdges + n,
        s"round loss $loss outside floor bound ${nEdges + n}")
    }
    // and the redistribution is material: the q132-style leak per round
    // (0.85 × dangling mass ≈ 0.17 × total) dwarfs the floor bound
    assert(losses.max < n * 150000L / 100,
      "losses should be floor-sized, not dangling-mass-sized")
  }

  test("q134 plan: bounded TakeOrdered head, no cartesian product") {
    val plan = Graph.q134PagerankDangling.fn(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("contribution step under a ZIPFIAN dst distribution: partial " +
    "aggregation absorbs hub skew — plan-asserted and shuffle-measured") {
    // q132/q134's synthetic graph has uniform hash in-degree, but real
    // link graphs are power-law: a handful of hub pages receive a large
    // constant fraction of all edges, and the per-round groupBy(dst)
    // relies on MAP-SIDE partial aggregation to keep the hub's bucket
    // from concentrating the shuffle (the q71 salting note documents the
    // fallback if it ever doesn't). This pins both halves: the plan
    // carries partial_sum, and the MEASURED reduce-side shuffle is flat
    // and collapsed even though the raw edge distribution is 1000x skewed.
    val E = 100000L
    val N = 20000L
    // dst = floor(E / (i+1)) gives in-degree(v) ~ E/v^2 — a power law
    // where dst=1 alone receives HALF of all edges
    val edges = spark.range(0, E).select(
      (org.apache.spark.sql.functions.col("id") % N).as("src"),
      (org.apache.spark.sql.functions.expr(s"$E div (id + 1)") % N)
        .as("dst"),
      org.apache.spark.sql.functions.lit(1000000L).as("r"),
      org.apache.spark.sql.functions.lit(3L).as("outdeg"))
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val hottest = edges.groupBy(col("dst")).count()
      .orderBy(col("count").desc).limit(1).collect()(0).getLong(1)
    assert(hottest >= E * 2 / 5, s"fixture not skewed: hottest=$hottest")

    val savedCoalesce =
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          reads.synchronized {
            reads += ((t.stageId, m.shuffleReadMetrics.recordsRead)); ()
          }
      }
    }
    try {
      // keep all 32 reduce tasks — coalescing tiny post-shuffle partitions
      // would merge them and make per-task flatness vacuous
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val contribs = edges
        .select(col("dst"), expr("(r * 17) div (outdeg * 20)").as("c"))
        .groupBy(col("dst")).agg(fsum(col("c")).as("c"))
      spark.sparkContext.addSparkListener(listener)
      val nKeys = contribs.collect().length
      // listener events are delivered async — wait for the bus to drain
      var (stable, last) = (0, -1)
      while (stable < 5) {
        Thread.sleep(100)
        val now = reads.synchronized(reads.size)
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      val plan = contribs.queryExecution.executedPlan.toString
      assert(plan.contains("partial_sum"), plan)
      val perTask = reads.synchronized {
        val byStage = reads.groupBy(_._1)
        byStage(byStage.keys.max).map(_._2) // the final (reduce) stage
      }
      val total = perTask.sum
      // collapse: the hub's E/2 raw rows arrive as at most one partial
      // row per map partition — the whole reduce reads orders of
      // magnitude fewer rows than the edge count
      assert(total <= E / 10,
        s"map-side combine failed to collapse the hub: $total rows " +
          s"shuffled for $E edges ($nKeys keys)")
      // flatness: no reduce task is a hot bucket
      val mean = total.toDouble / perTask.size
      assert(perTask.max <= math.max(5 * mean, 64.0),
        s"skewed reduce: per-task reads ${perTask.sorted.reverse} " +
          s"(mean $mean)")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
        savedCoalesce)
    }
  }

  test("cadence variants are value-identical: q132 per-round truncation" +
    " == fused default; q134 fused share == observed default") {
    // the conf only changes job structure (fused single action vs one
    // action per round; in-plan broadcast share vs observed scalar) —
    // never values. Pin both non-default paths against the defaults.
    def rows(q: graft.QueryDef) = q.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_micro")))
      .toSeq
    val d132 = rows(Graph.q132Pagerank)
    val d134 = rows(Graph.q134PagerankDangling)
    spark.conf.set("spark.graft.pagerank.ckptEvery", "1")
    try assert(rows(Graph.q132Pagerank) == d132,
      "q132 per-round truncation diverged from the fused default")
    finally spark.conf.unset("spark.graft.pagerank.ckptEvery")
    spark.conf.set("spark.graft.pagerank.ckptEvery", "0")
    try assert(rows(Graph.q134PagerankDangling) == d134,
      "q134 fused in-plan share diverged from the observed default")
    finally spark.conf.unset("spark.graft.pagerank.ckptEvery")
  }

  test("q134's observed dangling sum works through RELIABLE checkpoint " +
    "(the cluster truncation posture)") {
    // spark.graft.cc.checkpointDir switches every loop truncation from
    // localCheckpoint to checkpoint(); the observe fuse must deliver its
    // metric through that action too, or cluster runs would hang on the
    // first round's Observation.get
    val ck = java.nio.file.Files.createTempDirectory("prreliable")
    spark.conf.set("spark.graft.cc.checkpointDir", ck.toString)
    try {
      val d = Graph.q134PagerankDangling.fn(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_micro")))
        .toSeq
      spark.conf.unset("spark.graft.cc.checkpointDir")
      val local = Graph.q134PagerankDangling.fn(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_micro")))
        .toSeq
      assert(d == local,
        "reliable-checkpoint loop diverged from localCheckpoint loop")
    } finally spark.conf.unset("spark.graft.cc.checkpointDir")
  }
}
