package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Corpus-management operators for a training-data pipeline: duplicate
  * clustering (connected components over the near-dup pair graph),
  * sequence packing, repetition filtering, and benchmark-contamination
  * detection. None exist in the reference — this is the 100 TB extension
  * surface next to [[Dedup]]/[[Similarity]]/[[TextAnalysis]].
  *
  * Scale design:
  *  - Connected components: pair detection (q19) yields EDGES, but dedup
  *    needs one survivor per duplicate CLUSTER — transitive closure. The
  *    implementation is iterative min-label propagation (the distributed
  *    algorithm GraphX-style engines run): per iteration one equi-join of
  *    the label table against the symmetrized edge list plus a min-agg,
  *    both shuffled on the vertex key. Iteration count = cluster diameter
  *    (near-dup clusters are shallow: a handful). Labels converge to the
  *    unique fixpoint (component = min doc_id reachable), so the result is
  *    deterministic regardless of execution order and the DuckDB oracle
  *    reproduces it with a recursive CTE.
  *  - Packing/repetition metrics: narrow per-row array ops or one
  *    explode+aggregate pass — no corpus-wide joins.
  *  - Contamination: inverted-index equi-join on hashed shingles (the q37
  *    posting-list shape) between the train split and the (small) held-out
  *    split — never an all-pairs comparison.
  */
object Corpus {
  import Mirror._

  /** Minimum-label propagation to the fixpoint. `edges` is an undirected
    * pair list (src < dst, one row per edge); returns (v, component) for
    * every vertex that appears in an edge, where component = min vertex id
    * reachable.
    *
    * Each iteration is two shuffles (join + min-agg) over the label table —
    * the data volume is O(vertices-in-edges), tiny relative to the corpus
    * (only near-dup members appear). Iteration count = propagation depth
    * (near-dup clusters are shallow: q59 converges in 3). `localCheckpoint`
    * truncates the growing loop lineage (on a cluster, prefer `checkpoint`
    * to a reliable store for fault tolerance); each round is ONE action —
    * the truncation job, whose observed metric is the convergence signal
    * — and the rounds run under the pinned loop profile ([[LoopConf]]:
    * width from the materialized pair count, AQE off inside the loop).
    *
    * Alternatives MEASURED on the q73 semantic graph (depth 22 at sf0.1,
    * a long cosine-threshold chain — the stress case) and rejected:
    * pointer jumping (label ← label(label)) only cut 22 rounds to 16 —
    * labels collapse onto near-min hubs immediately, so label-of-label
    * rarely knows more — and paid an extra materialization per round;
    * fusing 4..8 propagation steps per checkpoint didn't amortize
    * anything (round-7 finding, measured under session AQE where every
    * exchange is its own query-stage job; the round-16 LoopConf pin
    * removes that per-step fixed cost for the MATERIALIZED rounds, but
    * un-truncated fused label steps still re-execute reduce sides and
    * stayed slower). The published fix for deep graphs is neighborhood
    * CONTRACTION, not label chasing — implemented as the alternating
    * star algorithm ([[starComponents]]); the default `auto` mode runs
    * THIS loop first (shallow graphs — the common case — finish in 2-4
    * cheap rounds), hands the label-contracted quotient to a
    * driver-local union-find when it is bounded
    * ([[quotientComponents]]) and to star contraction otherwise
    * (see [[connectedComponents]]). */
  private[operators] def labelPropComponents(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    // Propagation depth = longest label chain; near-dup graphs are shallow
    // (q59: 3 rounds; q73's sf0.1 stress chain: 22), so a round count past
    // the bound means a pathological input (or a bug), not slow
    // convergence — fail loudly instead of looping silently for hours.
    val maxRounds =
      edges.sparkSession.conf.get("spark.graft.cc.maxRounds", "100").toInt
    val (labels, converged, _, _) = labelLoop(edges, src, dst, maxRounds)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds " +
          "(spark.graft.cc.maxRounds); the component graph is deeper " +
          "than any expected near-dup cluster — aborting instead of " +
          "looping unbounded")
    labels.select(col("v"), col("label").as("component"))
  }

  /** `spark.graft.cc.checkpointDir=<path>` switches loop lineage
    * truncation from localCheckpoint (executor-block storage — fast, but
    * an executor loss makes the truncated lineage UNRECOVERABLE and fails
    * the job) to reliable checkpoint() into that directory (HDFS/object
    * store on a cluster) — the fault-tolerance posture a 1000-executor,
    * hours-long run needs, where the probability of losing at least one
    * executor mid-loop approaches 1. Local single-JVM runs (tests, the
    * oracle gate) keep the default: no executor can be lost, and skipping
    * the filesystem round-trip is strictly faster. */
  private def ccTruncate(spark: SparkSession): DataFrame => DataFrame = {
    val ckDir = spark.conf.get("spark.graft.cc.checkpointDir", "")
    if (ckDir.nonEmpty) {
      spark.sparkContext.setCheckpointDir(ckDir)
      df => df.checkpoint()
    } else df => df.localCheckpoint()
  }

  /** Min-label propagation for at most `budget` rounds. Returns the label
    * table (v, label), whether it reached the fixpoint, and the rounds
    * spent. Each round is two shuffles (join + min-agg) over the label
    * table; the convergence `count` is the driver-side control signal,
    * same as MLlib's iterative jobs. */
  private def labelLoop(edges: DataFrame, src: String, dst: String,
      budget: Int): (DataFrame, Boolean, Int, DataFrame) = {
    val spark = edges.sparkSession
    val truncate = ccTruncate(spark)
    // checkpoint the DIRECTED pairs first: the union below reads the edge
    // pipeline (LSH + verify) twice, so materializing before symmetrizing
    // halves its executions; iterations then run off cached blocks only.
    // This is the only CORPUS-scale action — it runs at full session
    // width/adaptivity; the observed pair count then sizes the loop's
    // pinned profile ([[LoopConf]] — the label table is id+long rows,
    // tiny next to the pipeline that produced it).
    val pObs = Obs("cc_pairs")
    val p = truncate(edges.select(col(src).as("a"), col(dst).as("b"))
      .observe(pObs, count(lit(1)).as("n")))
    val nPairs = Obs.long(pObs, "n")
    val sym = p.union(p.select(col("b").as("a"), col("a").as("b")))
    LoopConf.pinned(spark, LoopConf.parts(spark, 2L * nPairs)) {
      val dbg = sys.env.contains("GRAFT_DEBUG_CC")
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = if (dbg) {
        val t1 = System.nanoTime()
        System.err.println(f"[cc]   $tag: ${(t1 - t0) / 1e9}%.3f s")
        t0 = t1
      }
      var labels = truncate(sym.select(col("a").as("v")).distinct()
        .select(col("v"), col("v").as("label")))
      lap("labels0")
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < budget) {
        rounds += 1
        val nbrMin = sym
          .join(labels.select(col("v").as("b"), col("label")), "b")
          .groupBy(col("a").as("v"))
          .agg(min(col("label")).as("nbr_min"))
        // the round's ONE job: the truncation materializes the new labels
        // and its observed metric is the convergence signal — no second
        // count action per round
        val obs = Obs("cc_chg")
        val next = truncate(labels
          .join(nbrMin, Seq("v"), "left")
          .select(col("v"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"),
            (coalesce(col("nbr_min"), col("label")) < col("label"))
              .as("chg"))
          .observe(obs,
            coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L))
              .as("n_chg")))
        changed = Obs.long(obs, "n_chg")
        lap(s"round $rounds (changed=$changed)")
        labels = next.select(col("v"), col("label"))
      }
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(
          s"[cc] label loop: $rounds rounds, converged=${changed == 0}")
      (labels, changed == 0, rounds, p)
    }
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14): each
    * cycle contracts every node's neighborhood onto its local minimum, so
    * chain length roughly HALVES per cycle — O(log² n) cycles worst case,
    * 2-4 in practice — where min-label propagation needs one round per hop
    * of graph DIAMETER. That asymptotic gap is the 100 TB point: a web- or
    * near-dup-graph chain thousands of hops deep is ~12 star cycles vs
    * thousands of propagation rounds, and per-node state stays bounded by
    * degree (no neighborhood-set blowup like Hash-to-Min's min node).
    * Measured on the q73 stress graph (depth 22 at sf0.1): 22 label rounds
    * → 4 star cycles.
    *
    * Both steps are one groupBy-min plus one equi-join on the vertex key
    * over the (tiny) edge list. Each step's output is the emission set
    * ALONE (the map-side rewrite of every edge), canonicalized to
    * (hi, lo) distinct rows:
    *  - large-star(u): every neighbor v > u re-attaches to
    *    m = min(N(u) ∪ u);
    *  - small-star(u): every neighbor v < u re-attaches to m, and u keeps
    *    its own (u, m) edge.
    * Connectivity is preserved by each step and the fixpoint is exactly
    * the disjoint union of stars centered at each component's minimum
    * (the paper's Theorem 1-2), so labels read off the final edges:
    * component(v) = min(v, its star center). Deterministic — every
    * operation is a min or a distinct over a deterministic set — hence the
    * same oracle fixpoint as [[labelPropComponents]] (CorpusSpec asserts
    * equality on chain/star/random graphs). */
  private[operators] def starComponents(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    val spark = edges.sparkSession
    val truncate = ccTruncate(spark)
    val maxRounds =
      spark.conf.get("spark.graft.cc.maxRounds", "100").toInt
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("b").as("a"), col("a").as("b")))
    // one star step: group each node's neighborhood, attach to the local
    // min, keep only the emitted (re-written) edges
    def step(e: DataFrame, large: Boolean): DataFrame = {
      val s = sym(e)
      val m = s.groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val attached = s.join(m, "a")
      val emitted =
        if (large)
          attached.filter(col("b") > col("a"))
            .select(col("b").as("u"), col("m").as("v"))
        else
          attached.filter(col("b") < col("a"))
            .select(col("b").as("u"), col("m").as("v"))
            .union(m.select(col("a").as("u"), col("m").as("v")))
      emitted.filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("a"),
          least(col("u"), col("v")).as("b"))
        .distinct()
    }
    // observed row count riding a truncation job — each star half-step
    // is ONE action (materialize + count), not two
    def truncCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = Obs("star_n")
      val t = truncate(df.observe(obs, count(lit(1)).as("n")))
      (t, Obs.long(obs, "n"))
    }
    // canonical (hi=a, lo=b) distinct edge set; checkpoint cuts the
    // LSH/cosine edge pipeline out of the loop lineage. This is the
    // only input-scale action — full session width/adaptivity; the
    // contraction cycles then run pinned to the edge-set's own size
    var (e, eCount) = truncCounted(edges
      .filter(col(src) =!= col(dst))
      .select(greatest(col(src), col(dst)).as("a"),
        least(col(src), col(dst)).as("b"))
      .distinct())
    // distinct sets: equal counts + empty one-sided difference ⇒ equal
    def unchanged(next: DataFrame, nextCount: Long, prev: DataFrame,
        prevCount: Long): Boolean =
      nextCount == prevCount && next.except(prev).isEmpty
    LoopConf.pinned(spark, LoopConf.parts(spark, 2L * eCount)) {
      val dbg = sys.env.contains("GRAFT_DEBUG_CC")
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = if (dbg) {
        val t1 = System.nanoTime()
        System.err.println(f"[cc]   star $tag: ${(t1 - t0) / 1e9}%.3f s")
        t0 = t1
      }
      var cycles = 0
      var converged = eCount == 0L
      while (!converged) {
        cycles += 1
        if (cycles > maxRounds)
          throw new IllegalStateException(
            s"starComponents did not converge in $maxRounds cycles " +
              "(spark.graft.cc.maxRounds) — aborting instead of looping " +
              "unbounded")
        val (l, lCount) = truncCounted(step(e, large = true))
        lap(s"cycle $cycles large")
        val (n, nCount) = truncCounted(step(l, large = false))
        lap(s"cycle $cycles small")
        // converged ⇔ BOTH steps were identities: the joint fixpoints of
        // large- and small-star are exactly the min-centered star
        // partitions (a cycle-level no-op is NOT enough — small-star
        // alone is identity on some non-star states, e.g. a
        // half-contracted chain)
        converged = unchanged(l, lCount, e, eCount) &&
          unchanged(n, nCount, l, lCount)
        lap(s"cycle $cycles conv-check")
        e = n
        eCount = nCount
      }
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(s"[cc] star converged in $cycles cycles")
      // fixpoint is disjoint min-centered stars: component = min(v,
      // center)
      sym(e).groupBy(col("a").as("v"))
        .agg(min(col("b")).as("mn"))
        .select(col("v"), least(col("v"), col("mn")).as("component"))
    }
  }

  /** Label-propagation budget of the `auto` mode before it escalates to
    * star contraction: one past q59's 3-round convergence, so every
    * shallow near-dup graph (the common case) finishes in the cheap loop
    * and only genuinely deep graphs pay the contraction machinery. */
  private val AutoLabelBudget = 4

  /** Driver-finish bound for the label-contracted quotient graph: when
    * the quotient has at most this many edges it is solved with an exact
    * union-find ON THE DRIVER instead of O(log d) more distributed star
    * cycles. This is the standard last step of multi-level contraction
    * (shrink distributedly until the remainder is bounded, then finish
    * locally — the same bounded-driver-state posture as the Lloyd and
    * dangling-mass scalars): each distributed round costs a fixed
    * planning/scheduling round-trip regardless of data size, so once the
    * remainder is megabyte-scale the driver solve is strictly faster —
    * measured at sf0.1, the q166 semantic quotient (hundreds of edges)
    * paid ~2.2 s for four star cycles a union-find does in microseconds.
    * 1M edges ≈ tens of MB of driver heap, far under any sane driver
    * budget; set 0 to force the distributed path. */
  private val DriverFinishMaxEdges = 1000000L

  /** Exact min-representative union-find over a bounded edge list —
    * component = min reachable vertex under the column type's ordering
    * (the same `<`/`least` ordering the distributed paths use), so the
    * result is bit-identical to [[starComponents]] on the same graph. */
  private def unionFind(edges: Array[(Any, Any)]): Map[Any, Any] = {
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: Long, b: Long) => a < b
      case (a: Int, b: Int) => a < b
      case (a: String, b: String) => a < b
      case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
        a.compareTo(b) < 0
      case _ => throw new IllegalArgumentException(
        s"unorderable component id type: ${x.getClass}")
    }
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // min root stays the representative
        if (lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val verts = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    verts.iterator.map(v => v -> find(v)).toMap
  }

  /** Component labels for the quotient graph: driver union-find when the
    * edge list is bounded ([[DriverFinishMaxEdges]], probed with a
    * limit-collect so an oversized quotient never lands on the driver),
    * distributed star contraction otherwise. Returns (label, component)
    * for every quotient vertex. */
  private def quotientComponents(quotient: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val spark = quotient.sparkSession
    val maxEdges = spark.conf
      .get("spark.graft.cc.driverFinishMaxEdges",
        DriverFinishMaxEdges.toString).toLong
    val probe = if (maxEdges > 0 && maxEdges < Int.MaxValue - 1)
      quotient.limit(maxEdges.toInt + 1).collect() else Array.empty[Row]
    if (maxEdges > 0 && probe.length <= maxEdges) {
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(
          s"[cc] quotient driver-finish: ${probe.length} edges")
      val comp = unionFind(probe.map(r => (r.get(0), r.get(1))))
      val idType = quotient.schema.fields(0).dataType
      val schema = StructType(Seq(StructField("label", idType),
        StructField("component", idType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          comp.toSeq.map { case (v, c) => Row(v, c) }, 1), schema)
    } else
      starComponents(quotient, "a", "b")
        .select(col("v").as("label"), col("component"))
  }

  /** Transitive closure of an undirected pair list → (v, component) with
    * component = min reachable vertex id, for every vertex appearing in an
    * edge. Dispatches on `spark.graft.cc.algo`:
    *
    *  - `auto` (default): min-label propagation for up to
    *    [[AutoLabelBudget]] rounds — near-dup graphs are almost always
    *    shallow, and a label round (2 small shuffles) is ~half the cost of
    *    a star cycle (measured at sf0.1: q59 converges in 3 label rounds
    *    at 1.2 s where star-only takes 2.2 s). If the budget doesn't
    *    converge, the LABEL-CONTRACTED quotient graph (each edge mapped
    *    through its endpoints' current labels, self-loops dropped — ≥4
    *    hops collapsed per quotient vertex) hands off to
    *    [[starComponents]], so total rounds are bounded by
    *    budget + O(log remaining-diameter), never the raw diameter.
    *  - `star`: pure alternating star contraction.
    *  - `label`: pure min-label propagation (rounds = graph diameter,
    *    bounded by `spark.graft.cc.maxRounds`).
    *
    * All three converge to the identical fixpoint — the quotient handoff
    * is sound because every vertex's running label is a member of its own
    * component (labels only ever move along edges), so contracting by
    * label preserves components and the component min survives as a
    * quotient vertex (the min's label is itself, fixed from round one).
    * The choice never affects results, only the round count. */
  private[graft] def connectedComponents(edges: DataFrame, src: String,
      dst: String): DataFrame =
    edges.sparkSession.conf.get("spark.graft.cc.algo", "auto") match {
      case "label" => labelPropComponents(edges, src, dst)
      case "star" => starComponents(edges, src, dst)
      case "auto" =>
        val budget = math.min(AutoLabelBudget,
          edges.sparkSession.conf.get("spark.graft.cc.maxRounds", "100")
            .toInt)
        val (labels, converged, _, pairs) = labelLoop(edges, src, dst,
          budget)
        if (converged) labels.select(col("v"), col("label").as("component"))
        else {
          // quotient graph: one row per surviving inter-label edge; the
          // star phase then runs on a graph whose vertex count is the
          // number of DISTINCT labels, not original vertices. Built from
          // the label loop's TRUNCATED pair table — rebuilding from
          // `edges` here would re-execute the whole upstream pair
          // pipeline (LSH banding + verification) a second time
          val la = labels.select(col("v").as("qa"), col("label").as("a"))
          val lb = labels.select(col("v").as("qb"), col("label").as("b"))
          val quotient = pairs
            .select(col("a").as("qa"), col("b").as("qb"))
            .join(la, "qa").join(lb, "qb")
            .filter(col("a") =!= col("b"))
            .select(col("a"), col("b"))
          val starLabels = quotientComponents(quotient)
          // vertices whose label has no surviving quotient edge converged
          // inside the budget — their label IS the component min
          labels.join(starLabels, Seq("label"), "left")
            .select(col("v"),
              coalesce(col("component"), col("label")).as("component"))
        }
      case other => throw new IllegalArgumentException(
        s"spark.graft.cc.algo=$other (expected auto, star, or label)")
    }

  /** Duplicate-cluster assignment: connected components over the verified
    * MinHash near-dup pairs (q19), extended to every document (non-members
    * are their own singleton component). `is_survivor` marks the canonical
    * doc per cluster (min doc_id) — the row set a dedup pipeline keeps.
    * This is the step that turns PAIRS into a dedup decision: pairwise
    * output alone under-deletes whenever duplicates chain (a~b, b~c but
    * a!~c), which the fixture exhibits (3-doc chains). */
  val q59DedupComponents = QueryDef(
    "q59_dedup_components",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v)
       |SELECT d.doc_id,
       |  COALESCE(c.component, d.doc_id) AS component,
       |  CAST(COUNT(*) OVER (PARTITION BY COALESCE(c.component, d.doc_id))
       |    AS BIGINT) AS comp_size,
       |  (d.doc_id = COALESCE(c.component, d.doc_id)) AS is_survivor
       |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
       |ORDER BY component, d.doc_id""".stripMargin) { (spark, dir) =>
    val comp = connectedComponents(
      Dedup.nearDupPairs(spark, dir), "doc_a", "doc_b")
    val labeled = Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .join(comp.select(col("v").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"))
    labeled
      .withColumn("comp_size",
        count(lit(1)).over(Window.partitionBy(col("component")))
          .cast(LongType))
      .withColumn("is_survivor", col("doc_id") === col("component"))
      .orderBy(col("component"), col("doc_id"))
  }

  /** Token budget per packed training sequence. */
  private val SeqTokens = 256L

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences by running token count, shard-local (partitioned by
    * `source`, ordered by doc_id). A doc lands in the sequence its
    * exclusive prefix sum falls in — contiguous-fill packing, the
    * deterministic streaming-friendly scheme (first-fit needs a sequential
    * scan; this is one window per shard). At 100 TB each source shard packs
    * independently in parallel; the window never sees more than one
    * shard's rows, so there is no global sort or single-partition window.
    * `seq_offset` = where the doc starts inside its sequence (sequences
    * can overflow the budget by at most one document's tail — the
    * convention that never splits a document). */
  val q60PackSequences = QueryDef(
    "q60_pack_sequences",
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    -- CAST: DuckDB widens a window SUM(BIGINT) to HUGEINT; the
       |    -- driver hash-compares values by dtype, so int128 != int64
       |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, n_tokens, cum_tokens,
       |  (cum_tokens - n_tokens) // $SeqTokens AS seq_id,
       |  cum_tokens - n_tokens
       |    - ((cum_tokens - n_tokens) // $SeqTokens) * $SeqTokens AS seq_offset
       |FROM c
       |ORDER BY source, doc_id""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // SeqTokens is a power of two, so the double division is exact and
      // the long cast is a true floor — bit-identical to DuckDB's `//`
      .withColumn("seq_id",
        ((col("cum_tokens") - col("n_tokens")) / SeqTokens).cast(LongType))
      .withColumn("seq_offset",
        col("cum_tokens") - col("n_tokens") - col("seq_id") * SeqTokens)
      .orderBy(col("source"), col("doc_id"))
  }

  private val TopWordMax = 0.12
  private val DupShingleMax = 0.05

  /** Repetition / quality metrics per document (the Gopher-style filter
    * family): distinct-word fraction, most-frequent-word fraction,
    * duplicate-shingle fraction, plus the keep decision. Set-size metrics
    * are narrow array ops (`array_distinct` is codegen, no lambda); only
    * the word-multiplicity max needs an explode + two hash aggregations
    * (map-side partials, same shape as q58's TF pass) — per-doc state is
    * O(1), so the pass survives any corpus size. All fractions are
    * int/int divides in double: bit-identical across engines. */
  val q61RepetitionMetrics = QueryDef(
    "q61_repetition_metrics",
    s"""WITH ws AS (SELECT doc_id, $sqlWords AS w,
       |    $sqlShingleGen AS sg FROM documents),
       |base AS (SELECT doc_id,
       |    len(w) AS n_words,
       |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_word_frac,
       |    CAST(list_max(list_transform(list_distinct(w),
       |        x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w)
       |      AS top_word_frac,
       |    (CAST(len(sg) AS DOUBLE) - len(list_distinct(sg))) / len(sg)
       |      AS dup_shingle_frac
       |  FROM ws)
       |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, distinct_word_frac,
       |  top_word_frac, dup_shingle_frac,
       |  (top_word_frac <= $TopWordMax AND dup_shingle_frac <= $DupShingleMax)
       |    AS keep
       |FROM base
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    repetitionTable(spark, dir).orderBy(col("doc_id"))
  }

  /** The q61 metric table (unordered) — shared with the q78 corpus-export
    * composition. */
  private def repetitionTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val base = docs
      .select(col("doc_id"), words(col("text")).as("w"),
        shingleGen(col("text")).as("sg"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        size(array_distinct(col("w"))).as("n_uniq"),
        size(col("sg")).as("n_sh"),
        size(array_distinct(col("sg"))).as("n_sh_uniq"))
    val top = docs
      .select(col("doc_id"), explode(words(col("text"))).as("wd"))
      .groupBy(col("doc_id"), col("wd")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(max(col("cnt")).as("top_cnt"))
    val nw = col("n_words").cast(DoubleType)
    base.join(top, "doc_id")
      .select(col("doc_id"),
        col("n_words").cast(LongType).as("n_words"),
        (col("n_uniq").cast(DoubleType) / nw).as("distinct_word_frac"),
        (col("top_cnt").cast(DoubleType) / nw).as("top_word_frac"),
        ((col("n_sh").cast(DoubleType) - col("n_sh_uniq")) /
          col("n_sh").cast(DoubleType)).as("dup_shingle_frac"))
      .withColumn("keep",
        col("top_word_frac") <= TopWordMax &&
          col("dup_shingle_frac") <= DupShingleMax)
  }

  private val ContamFracMin = 0.5

  /** Benchmark-contamination detection: flag training-split documents whose
    * distinct 3-shingle overlap with the held-out split (q53's
    * deterministic hash split: train = bucket < 80, held-out = bucket >=
    * 90) reaches [[ContamFracMin]] of their shingles — the n-gram-overlap
    * decontamination check an LLM pipeline runs before training.
    *
    * Shape: inverted-index equi-join on 60-bit HASHED shingles — only
    * (doc_id, hash) longs cross the shuffle, never shingle strings (q37's
    * lesson), and never a doc×doc comparison. The held-out side is
    * deduplicated to distinct hashes first, so the join output is bounded
    * by the training shingle volume; in production the eval set is small
    * and AQE broadcasts it at runtime — no explicit hint, per the
    * no-broadcast-of-corpus rule. */
  val q62Contamination = QueryDef(
    "q62_contamination",
    s"""WITH sh AS (SELECT doc_id, $sqlShingles3 AS s,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents),
       |train AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS sg
       |  FROM sh WHERE bucket < 80),
       |test AS (SELECT DISTINCT ${sqlHash60("sg")} AS h
       |  FROM (SELECT unnest(s) AS sg FROM sh WHERE bucket >= 90)),
       |hits AS (SELECT t.doc_id, COUNT(*) AS n_shared
       |  FROM (SELECT doc_id, ${sqlHash60("sg")} AS h FROM train) t
       |  JOIN test USING (h) GROUP BY t.doc_id),
       |tot AS (SELECT doc_id, CAST(any_value(n_sh) AS BIGINT) AS n_sh
       |  FROM train GROUP BY doc_id)
       |SELECT tot.doc_id AS doc_id, n_sh,
       |  CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
       |  COALESCE(n_shared, 0) / CAST(n_sh AS DOUBLE) AS contamination_frac
       |FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
       |WHERE COALESCE(n_shared, 0) / CAST(n_sh AS DOUBLE) >= $ContamFracMin
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    contaminationTable(spark, dir)
      .filter(col("contamination_frac") >= ContamFracMin)
      .orderBy(col("doc_id"))
  }

  /** Per-TRAIN-doc contamination fractions (unordered, unfiltered) —
    * shared by q62 and the q78 corpus-export composition. */
  private def contaminationTable(spark: SparkSession,
      dir: String): DataFrame = {
    val sh = Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("s"),
        (hash60(col("doc_id").cast(org.apache.spark.sql.types.StringType))
          % 100).as("bucket"))
    val train = sh.filter(col("bucket") < 80)
      .select(col("doc_id"), size(col("s")).as("n_sh"),
        explode(col("s")).as("sg"))
      .select(col("doc_id"), col("n_sh"), hash60(col("sg")).as("h"))
    val test = sh.filter(col("bucket") >= 90)
      .select(explode(col("s")).as("sg"))
      .select(hash60(col("sg")).as("h"))
      .distinct()
    val hits = train.join(test, "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    val tot = sh.filter(col("bucket") < 80)
      .select(col("doc_id"), size(col("s")).cast(LongType).as("n_sh"))
    tot.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sh"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast(DoubleType) /
          col("n_sh").cast(DoubleType)).as("contamination_frac"))
  }

  private val SampleK = 20

  /** Stratified exact-k sampling: k docs per stratum (`lang`), chosen by
    * md5-hash order — deterministic (reruns, repartitioning, and the
    * oracle all pick the same rows, unlike seed-based `sample`) and
    * uniform (the hash is effectively a random permutation of each
    * stratum). The textbook row_number-over-hash window is written here
    * EXACTLY in the shape [[graft.plans.TopKRewrite]] fires on: with
    * `GraftExtensions` injected, the optimizer replaces the per-stratum
    * sort with [[graft.plans.TopKPerKey]]'s bounded heaps — k rows of
    * state per stratum instead of a full sort of every stratum
    * (ScaleSpec asserts the rewritten plan). */
  val q63StratifiedSample = QueryDef(
    "q63_stratified_sample",
    s"""SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk FROM (
       |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
       |    ORDER BY ${sqlHash60("CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
       |  FROM documents)
       |WHERE rnk <= $SampleK
       |ORDER BY lang, rnk""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.StringType
    val w = Window.partitionBy(col("lang"))
      .orderBy(hash60(col("doc_id").cast(StringType)), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= SampleK)
      .select(col("doc_id"), col("lang"), col("rnk").cast(LongType).as("rnk"))
      .orderBy(col("lang"), col("rnk"))
  }

  // PII patterns restricted to syntax RE2 (DuckDB) and java.util.regex
  // interpret identically: ASCII classes, bounded repetition, \b word
  // boundaries — no lookaround (RE2 has none).
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val NumRe = "[0-9]+"

  /** PII / identifier scrubbing over the raw `props` payload: count then
    * redact emails, IPv4s, and digit runs (applied in that order, so the
    * digit rule can't eat an address's octets first). A pure narrow map —
    * regex per row, no shuffle — the cheapest possible shape at 100 TB.
    * Counts come from the PRE-redaction text; `events.props` carries digit
    * runs (JSON numbers), so the digit rule is exercised non-vacuously
    * while the email/IP rules prove out the machinery. */
  val q65PiiScrub = QueryDef(
    "q65_pii_scrub",
    s"""SELECT event_id,
       |  CAST(len(regexp_extract_all(props, '$EmailRe')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(props, '$Ipv4Re')) AS BIGINT) AS n_ip,
       |  CAST(len(regexp_extract_all(props, '$NumRe')) AS BIGINT) AS n_num,
       |  regexp_replace(regexp_replace(regexp_replace(props,
       |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'),
       |    '$NumRe', '<NUM>', 'g') AS scrubbed
       |FROM events
       |ORDER BY event_id""".stripMargin) { (spark, dir) =>
    val p = col("props")
    Tables(spark, dir, "events")
      .select(col("event_id"),
        regexp_count(p, lit(EmailRe)).cast(LongType).as("n_email"),
        regexp_count(p, lit(Ipv4Re)).cast(LongType).as("n_ip"),
        regexp_count(p, lit(NumRe)).cast(LongType).as("n_num"),
        regexp_replace(
          regexp_replace(regexp_replace(p, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          NumRe, "<NUM>").as("scrubbed"))
      .orderBy(col("event_id"))
  }

  /** Mixture resampling: up/down-weight sources by replicating documents
    * `n_copies` times (the epoch-mixing scheme LLM pipelines use to hit a
    * target data mix). Weights live in integer MILLI-units and the
    * fractional part becomes a copy with probability frac via hash
    * threshold — all integer arithmetic, so membership and copy counts are
    * a pure function of (source, doc_id): reproducible across engines,
    * reruns, and repartitioning. Here the per-source weight is derived
    * from a hash (0.5×–2.5×) to stand in for a config map; production
    * would join a literal weights table. Narrow map + explode of a
    * ≤3-element sequence: no shuffle at any corpus size. */
  val q66MixtureResample = QueryDef(
    "q66_mixture_resample",
    s"""WITH w AS (SELECT doc_id, source,
       |    500 + ${sqlHash60("source")} % 2000 AS w_milli,
       |    ${sqlHash60("concat('rep:', CAST(doc_id AS VARCHAR))")} % 1000
       |      AS frac_roll
       |  FROM documents),
       |n AS (SELECT doc_id, source,
       |    w_milli // 1000
       |      + CASE WHEN frac_roll < w_milli % 1000 THEN 1 ELSE 0 END
       |      AS n_copies
       |  FROM w)
       |SELECT doc_id, source, n_copies,
       |  CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_id
       |FROM n
       |ORDER BY doc_id, copy_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.StringType
    val w = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (lit(500L) + hash60(col("source")) % 2000L).as("w_milli"),
        (hash60(concat(lit("rep:"), col("doc_id").cast(StringType))) % 1000L)
          .as("frac_roll"))
      .select(col("doc_id"), col("source"),
        ((col("w_milli") / 1000L).cast(LongType) +
          when(col("frac_roll") < col("w_milli") % 1000L, 1L).otherwise(0L))
          .as("n_copies"))
    // sequence(1, 0) would COUNT DOWN in Spark (negative-step inference);
    // guard with an empty array so n_copies = 0 really drops the doc
    w.select(col("doc_id"), col("source"), col("n_copies"),
        explode(when(col("n_copies") >= 1,
          sequence(lit(1L), col("n_copies"))).otherwise(array()))
          .as("copy_id"))
      .orderBy(col("doc_id"), col("copy_id"))
  }

  /** Exact per-group percentiles (p50/p90/p99 of event value) by explicit
    * order-statistic selection: rank every row in its group, pick the
    * value at index ceil(p·n) computed in INTEGER arithmetic
    * ((p_num·n + p_den − 1) div p_den) — no float index math, no
    * interpolation, so the engines cannot disagree at boundaries (the
    * reason built-in continuous `percentile` isn't oracle-safe). One
    * shuffle + per-group sort, parallel across groups; for a 100 TB
    * single group you'd switch to the q43-style median machinery or an
    * approx sketch — this is the exact profiling tool for
    * many-moderate-groups data. Ties broken by event_id so the selected
    * row is unique. */
  val q67ExactPercentiles = QueryDef(
    "q67_exact_percentiles",
    """WITH r AS (SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, n,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
      |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
      |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99
      |FROM r
      |GROUP BY event_type, n
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val byType = Window.partitionBy(col("event_type"))
    val r = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn",
        row_number().over(byType.orderBy(col("value"), col("event_id")))
          .cast(LongType))
      .withColumn("n", count(lit(1)).over(byType))
    def at(num: Long, den: Long) =
      max(when(
        col("rn") === ((col("n") * num + (den - 1L)) / den).cast(LongType),
        col("value")))
    r.groupBy(col("event_type"), col("n"))
      .agg(at(1, 2).as("p50"), at(9, 10).as("p90"), at(99, 100).as("p99"))
      .orderBy(col("event_type"))
  }

  /** Percentile levels checked by [[q104ApproxPercentileBound]]:
    * (suffix, p as double, ceil-index numerator/denominator). */
  private val PctLevels = Seq(("50", 0.5, 1L, 2L), ("90", 0.9, 9L, 10L),
    ("99", 0.99, 99L, 100L))

  /** Sketch-percentile verification — q39's oracle-gating pattern applied
    * to the OTHER big approximate family: per event_type and p ∈
    * {.5, .9, .99}, the exact order-statistic value (q67's machinery)
    * plus `within_bound`, each engine's own verdict on whether ITS sketch
    * estimate (Spark percentile_approx at accuracy 10000, DuckDB
    * approx_quantile) lands within the sketch's RANK-error contract —
    * |rank(approx)/n − p| ≤ max(0.02, 1.5/n). Rank error, not value
    * error, is what a quantile sketch actually guarantees (a value bound
    * would be meaningless on skewed data), and rank-of-estimate is
    * computable exactly in plain SQL as count(value ≤ approx)/n. The
    * sketch estimates themselves differ engine to engine, so — as in
    * q39 — only the exact value and the boolean verdict are hashed.
    *
    * Scale shape: the exact side is q67's one shuffle + per-group sort
    * (parallel across groups); the sketch side is a map-side-combinable
    * agg; the rank-of-estimate pass is one broadcast-joined conditional
    * count. At 100 TB production keeps ONLY the sketch agg — the exact
    * column here is the verification harness. */
  val q104ApproxPercentileBound = QueryDef(
    "q104_approx_percentile_bound",
    s"""WITH r AS (SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY value, event_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events),
       |x AS (SELECT event_type, n,
       |${PctLevels.map { case (s, _, num, den) =>
          s"    MAX(CASE WHEN rn = ($num * n + ${den - 1}) // $den " +
            s"THEN value END) AS e$s"
        }.mkString(",\n")}
       |  FROM r GROUP BY event_type, n),
       |a AS (SELECT event_type,
       |${PctLevels.map { case (s, p, _, _) =>
          s"    approx_quantile(value, CAST($p AS FLOAT)) AS a$s"
        }.mkString(",\n")}
       |  FROM events GROUP BY event_type),
       |le AS (SELECT e.event_type,
       |${PctLevels.map { case (s, _, _, _) =>
          s"    SUM(CASE WHEN e.value <= a.a$s THEN 1 ELSE 0 END) AS le$s"
        }.mkString(",\n")}
       |  FROM events e JOIN a USING (event_type) GROUP BY e.event_type),
       |j AS (SELECT x.event_type, x.n,
       |    ${PctLevels.map { case (s, _, _, _) => s"x.e$s, le.le$s" }
          .mkString(", ")}
       |  FROM x JOIN le USING (event_type))
       |SELECT * FROM (
       |${PctLevels.map { case (s, p, _, _) =>
          s"SELECT event_type, CAST($p AS DOUBLE) AS p, n, " +
            s"e$s AS exact_value,\n" +
            s"  ABS(CAST(le$s AS DOUBLE) / CAST(n AS DOUBLE) " +
            s"- CAST($p AS DOUBLE))\n" +
            s"    <= GREATEST(CAST(0.02 AS DOUBLE), " +
            s"CAST(1.5 AS DOUBLE) / CAST(n AS DOUBLE)) AS within_bound " +
            s"FROM j"
        }.mkString("\nUNION ALL\n")})
       |ORDER BY event_type, p""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    val r = ev
      .withColumn("rn",
        row_number().over(byType.orderBy(col("value"), col("event_id")))
          .cast(LongType))
      .withColumn("n", count(lit(1)).over(byType))
    def at(num: Long, den: Long) =
      max(when(
        col("rn") === ((col("n") * num + (den - 1L)) / den).cast(LongType),
        col("value")))
    val exact = r.groupBy(col("event_type"), col("n"))
      .agg(PctLevels.map { case (s, _, num, den) =>
        at(num, den).as(s"e$s")
      }.head, PctLevels.tail.map { case (s, _, num, den) =>
        at(num, den).as(s"e$s")
      }: _*)
    val apx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(PctLevels.map { case (_, p, _, _) => lit(p) }: _*),
        lit(10000)).as("apx"))
    val le = ev.join(apx, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(PctLevels.zipWithIndex.map { case ((s, _, _, _), i) =>
        sum(when(col("value") <= col("apx")(i), 1L).otherwise(0L))
          .as(s"le$s")
      }.head, PctLevels.zipWithIndex.tail.map { case ((s, _, _, _), i) =>
        sum(when(col("value") <= col("apx")(i), 1L).otherwise(0L))
          .as(s"le$s")
      }: _*)
    def bound(s: String, p: Double) =
      abs(col(s"le$s").cast(DoubleType) / col("n").cast(DoubleType)
        - lit(p)) <=
        greatest(lit(0.02), lit(1.5) / col("n").cast(DoubleType))
    exact.join(le, Seq("event_type"))
      .select(col("event_type"), col("n"),
        explode(array(PctLevels.map { case (s, p, _, _) =>
          struct(lit(p).as("p"), col(s"e$s").as("exact_value"),
            bound(s, p).as("within_bound"))
        }: _*)).as("c"))
      .select(col("event_type"), col("c.p").as("p"), col("n"),
        col("c.exact_value").as("exact_value"),
        col("c.within_bound").as("within_bound"))
      .orderBy(col("event_type"), col("p"))
  }

  /** Winsorized robust moments per event_type — the outlier-robust
    * normalization pass a feature/mixing pipeline runs before weighting
    * metrics that heavy-tailed telemetry would otherwise dominate: exact
    * p05/p95 order statistics (q67's ceil-index machinery), the mean with
    * values CLAMPED into [p05, p95] (winsorized mean), the raw mean for
    * contrast, and how many rows each tail clipped.
    *
    * Shape at scale: one per-group sort for the order statistics (q67's
    * plan — parallel across event_type groups), then ONE more pass over
    * events with the group-level cut points joined back (a handful of
    * rows — AQE broadcasts it); the clamped mean is map-side combinable.
    * Both means go through [[Exact.davg]]'s fixed-scale decimal sum, so
    * the result is order-independent — stable under AQE re-planning and
    * partition count, and bit-equal to the oracle's mirrored cast chain. */
  val q107WinsorizedStats = QueryDef(
    "q107_winsorized_stats",
    s"""WITH r AS (SELECT event_type, value,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY value, event_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events),
       |x AS (SELECT event_type, n,
       |    MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS p05,
       |    MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS p95
       |  FROM r GROUP BY event_type, n)
       |SELECT e.event_type, x.n, x.p05, x.p95,
       |  ${Exact.sqlAvg("e.value", 4)} AS mean_raw,
       |  ${Exact.sqlAvg("GREATEST(LEAST(e.value, x.p95), x.p05)", 4)}
       |    AS mean_winsor,
       |  CAST(SUM(CASE WHEN e.value < x.p05 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_lo,
       |  CAST(SUM(CASE WHEN e.value > x.p95 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_hi
       |FROM events e JOIN x ON x.event_type = e.event_type
       |GROUP BY e.event_type, x.n, x.p05, x.p95
       |ORDER BY e.event_type""".stripMargin) { (spark, dir) =>
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
    val r = ev
      .withColumn("rn",
        row_number().over(byType.orderBy(col("value"), col("event_id")))
          .cast(LongType))
      .withColumn("n", count(lit(1)).over(byType))
    def at(num: Long, den: Long) =
      max(when(
        col("rn") === ((col("n") * num + (den - 1L)) / den).cast(LongType),
        col("value")))
    val x = r.groupBy(col("event_type"), col("n"))
      .agg(at(1, 20).as("p05"), at(19, 20).as("p95"))
    val clamped = greatest(least(col("value"), col("p95")), col("p05"))
    ev.join(x, "event_type")
      .groupBy(col("event_type"), col("n"), col("p05"), col("p95"))
      .agg(
        Exact.davg(col("value"), 4).as("mean_raw"),
        Exact.davg(clamped, 4).as("mean_winsor"),
        sum(when(col("value") < col("p05"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("value") > col("p95"), 1L).otherwise(0L)).as("n_hi"))
      .select(col("event_type"), col("n"), col("p05"), col("p95"),
        col("mean_raw"), col("mean_winsor"), col("n_lo"), col("n_hi"))
      .orderBy(col("event_type"))
  }

  /** Per-document n-gram NOVELTY — what fraction of a doc's distinct
    * 3-shingles appear for the FIRST time (min doc_id over the corpus,
    * doc_id = ingest order) in that doc. The marginal-contribution score a
    * curation pipeline uses to drop late near-copies and to read corpus
    * saturation (novelty decaying toward 0 = the source is mined out) —
    * the per-doc refinement of q97's source-level overlap matrix.
    * (Reference has only exact drop-duplicates, covid_streaming.py:153 —
    * this is the 100 TB extension surface.)
    *
    * Shape at scale: NO pair generation at all — first-owner is one
    * map-side-combinable `min` per shingle (the same explode + hash-agg
    * as the dedup signature pass), and per-doc novel counts are a second
    * count agg over the owner table (shingle-distinct sized, sublinear in
    * the corpus); the big exploded relation is never joined back. The
    * final per-doc join is doc-count sized. Novelty is an int/int double
    * division (bit-exact cross-engine); zero-shingle docs yield NULL in
    * both engines (when-without-otherwise / ELSE-less CASE). */
  val q105NgramNovelty = QueryDef(
    "q105_ngram_novelty",
    s"""WITH ws AS (SELECT doc_id, $sqlShingles3 AS sg FROM documents),
       |own AS (SELECT s, MIN(doc_id) AS owner
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM ws) GROUP BY s),
       |nov AS (SELECT owner AS doc_id, COUNT(*) AS n_novel
       |  FROM own GROUP BY owner)
       |SELECT w.doc_id, CAST(len(w.sg) AS BIGINT) AS n_shingles,
       |  CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       |  CASE WHEN len(w.sg) > 0
       |    THEN CAST(COALESCE(n.n_novel, 0) AS DOUBLE)
       |      / CAST(len(w.sg) AS DOUBLE) END AS novelty_frac
       |FROM ws w LEFT JOIN nov n USING (doc_id)
       |ORDER BY w.doc_id""".stripMargin) { (spark, dir) =>
    val ws = Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sg"))
    val own = ws
      .select(col("doc_id"), explode(col("sg")).as("s"))
      .groupBy(col("s")).agg(min(col("doc_id")).as("owner"))
    val nov = own.groupBy(col("owner").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    ws.join(nov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("sg")).cast(LongType).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(size(col("sg")) > 0,
          coalesce(col("n_novel"), lit(0L)).cast(DoubleType) /
            size(col("sg")).cast(DoubleType)).as("novelty_frac"))
      .orderBy(col("doc_id"))
  }

  /** Corpus SATURATION curve — q105's novelty signal aggregated over ten
    * ingest-order buckets (doc_id is the monotonic ingest id): new-shingle
    * rate per decile of the ingest timeline. The "marginal value of more
    * data from this pipe" curve — when the tail buckets' novelty rate
    * approaches zero, the source is mined out and further crawl budget is
    * wasted. Decile = integer range bucketing on doc_id (min/max come from
    * one tiny agg, broadcast back) — NOT a global row_number, so no
    * single-partition sort exists at any corpus size; both engines
    * compute the bucket as exact BIGINT floor-division.
    *
    * Shape at scale: q105's two hash aggs (owner = min per shingle, then
    * counts over the shingle-distinct owner table) plus two decile
    * rollups and a 10-row join. Novelty rate is an int/int double
    * division. */
  val q110SaturationCurve = QueryDef(
    "q110_saturation_curve",
    s"""WITH ws AS (SELECT doc_id, $sqlShingles3 AS sg FROM documents),
       |mm AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
       |db AS (SELECT (w.doc_id - mm.mn) * 10 // (mm.mx - mm.mn + 1)
       |      AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(w.sg)) AS BIGINT) AS n_shingles
       |  FROM ws w CROSS JOIN mm GROUP BY 1),
       |own AS (SELECT s, MIN(doc_id) AS owner
       |  FROM (SELECT doc_id, unnest(sg) AS s FROM ws) GROUP BY s),
       |ob AS (SELECT (o.owner - mm.mn) * 10 // (mm.mx - mm.mn + 1) AS bin,
       |    CAST(COUNT(*) AS BIGINT) AS n_novel
       |  FROM own o CROSS JOIN mm GROUP BY 1)
       |SELECT d.bin, d.n_docs, d.n_shingles,
       |  CAST(COALESCE(ob.n_novel, 0) AS BIGINT) AS n_novel,
       |  CASE WHEN d.n_shingles > 0
       |    THEN CAST(COALESCE(ob.n_novel, 0) AS DOUBLE)
       |      / CAST(d.n_shingles AS DOUBLE) END AS novelty_rate
       |FROM db d LEFT JOIN ob USING (bin)
       |ORDER BY d.bin""".stripMargin) { (spark, dir) =>
    val ws = Tables(spark, dir, "documents")
      .select(col("doc_id"), shingles3(col("text")).as("sg"))
    val mm = Tables(spark, dir, "documents")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val binOf = expr("((doc_id - mn) * 10) DIV (mx - mn + 1)")
    val db = ws.crossJoin(broadcast(mm))
      .groupBy(binOf.as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("sg")).cast(LongType)).as("n_shingles"))
    val ob = ws
      .select(col("doc_id"), explode(col("sg")).as("s"))
      .groupBy(col("s")).agg(min(col("doc_id")).as("owner"))
      .crossJoin(broadcast(mm))
      .groupBy(expr("((owner - mn) * 10) DIV (mx - mn + 1)").as("bin"))
      .agg(count(lit(1)).as("n_novel"))
    db.join(ob, Seq("bin"), "left")
      .select(col("bin"), col("n_docs"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_shingles") > 0,
          coalesce(col("n_novel"), lit(0L)).cast(DoubleType) /
            col("n_shingles").cast(DoubleType)).as("novelty_rate"))
      .orderBy(col("bin"))
  }

  /** Corpus-trained bigram language-model scoring: every document is scored
    * by the mean conditional probability of its word transitions,
    * P(w_i | w_{i-1}) = c(w_{i-1} w_i) / c_prefix(w_{i-1}), with counts
    * taken over the whole corpus — the classic cheap LM-quality signal
    * (fluent text scores high, shuffled/garbage text low) an LLM pipeline
    * computes before it can afford a neural perplexity pass.
    *
    * Shape at scale: bigrams are enumerated per row (array HOF, no
    * shuffle), then hashed to 60-bit longs BEFORE the two count
    * aggregations and the count-lookup joins, so only (doc_id, pos, long)
    * rows ever shuffle — q37's lesson. The count tables are
    * vocabulary-sized (sublinear in the corpus); Spark shuffles both
    * joins on the hash, and AQE broadcasts a small-vocabulary side at
    * runtime — no explicit hint, per the no-broadcast-of-corpus rule.
    * Probabilities avoid logs entirely (java.lang.Math.log and libm may
    * differ in the last ulp): each term is an int/int double division
    * (exactly rounded in both engines) and the per-doc mean is the
    * position-ordered fold — bit-exact, and the fold list is one double
    * per word of ONE document, so the buffer is bounded by document
    * length, not corpus size. */
  val q69BigramLm = QueryDef(
    "q69_bigram_lm",
    s"""WITH d AS (SELECT doc_id, $sqlWords AS w FROM documents
       |  WHERE len($sqlWords) >= 2),
       |b AS (SELECT doc_id, i AS pos,
       |    array_to_string(w[i:i+1], ' ') AS bg, w[i] AS pw
       |  FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM d)),
       |h AS (SELECT doc_id, pos, ${sqlHash60("bg")} AS h2,
       |    ${sqlHash60("pw")} AS h1 FROM b),
       |c2 AS (SELECT h2, COUNT(*) AS n2 FROM h GROUP BY h2),
       |c1 AS (SELECT h1, COUNT(*) AS n1 FROM h GROUP BY h1),
       |p AS (SELECT doc_id, pos, CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p
       |  FROM h JOIN c2 USING (h2) JOIN c1 USING (h1)),
       |g AS (SELECT doc_id, list(p ORDER BY pos) AS ps FROM p GROUP BY doc_id)
       |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_bigrams,
       |  ${sqlFoldSum("ps")} / CAST(len(ps) AS DOUBLE) AS avg_p
       |FROM g
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    // native bigram generator (one split, one StringBuilder per bigram —
    // the interpreted transform/element_at HOF was this pipeline's floor,
    // same lesson as ShingleGen); the prefix word for the h1 count key is
    // recovered from the bigram itself, so the words array never rides
    // along past the explode
    val rows = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(bigramGen(col("text"))).as(Seq("pos0", "bg")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        hash60(col("bg")).as("h2"),
        hash60(substring_index(col("bg"), " ", 1)).as("h1"))
    val c2 = rows.groupBy(col("h2")).agg(count(lit(1)).as("n2"))
    val c1 = rows.groupBy(col("h1")).agg(count(lit(1)).as("n1"))
    val p = rows.join(c2, "h2").join(c1, "h1")
      .select(col("doc_id"), col("pos"),
        (col("n2").cast(DoubleType) / col("n1").cast(DoubleType)).as("p"))
    p.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), size(col("ps")).cast(LongType).as("n_bigrams"),
        (foldSum(transform(col("ps"), s => s.getField("p")))
          / size(col("ps")).cast(DoubleType)).as("avg_p"))
      .orderBy(col("doc_id"))
  }

  /** Corpus datasheet: the per-source summary table a data curator reads
    * before mixing sources — document and token volume, length spread,
    * language diversity, and exact-duplicate rate (the q18 key). One
    * hash-aggregation pass over narrow per-row columns plus a distinct-key
    * count; every metric is exact-integer or an int/int double division,
    * so the sheet is engine-reproducible. At 100 TB this is the nightly
    * one-pass reporting job: partial aggregates map-side, no joins. */
  val q76SourceDatasheet = QueryDef(
    "q76_source_datasheet",
    s"""SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(len($sqlWords)) AS BIGINT) AS total_tokens,
       |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
       |  COUNT(DISTINCT lang) AS n_langs,
       |  COUNT(DISTINCT (lang, n_chars)) AS n_exact_keys,
       |  1.0 - COUNT(DISTINCT (lang, n_chars)) / CAST(COUNT(*) AS DOUBLE)
       |    AS dup_rate
       |FROM documents
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(words(col("text")))).cast(LongType).as("total_tokens"),
        min(col("n_chars")).cast(LongType).as("min_chars"),
        max(col("n_chars")).cast(LongType).as("max_chars"),
        (sum(col("n_chars")).cast(DoubleType)
          / count(lit(1)).cast(DoubleType)).as("mean_chars"),
        countDistinct(col("lang")).as("n_langs"),
        // struct-wrapped: multi-arg countDistinct DROPS rows where any
        // component is null (Spark semantics) while DuckDB's row-value
        // COUNT(DISTINCT (a, b)) counts them; the struct is itself
        // non-null, so null components group as values in BOTH engines —
        // the null-safe mirror of the oracle's composite distinct
        countDistinct(struct(col("lang"), col("n_chars")))
          .as("n_exact_keys"),
        (lit(1.0) - countDistinct(struct(col("lang"), col("n_chars")))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType))
          .as("dup_rate"))
      .orderBy(col("source"))
  }

  /** The corpus-export decision — the pipeline's END PRODUCT: one row per
    * document with every gate's verdict and the final keep flag a training
    * run consumes. Composes the deterministic hash split (q53), duplicate-
    * cluster survivorship (q19 pairs → q59 components), the Gopher-style
    * repetition filter (q61), and benchmark-contamination detection (q62),
    * with a first-failing-gate reason string. Each input is the SAME
    * shared core the standalone query runs (factored tables), so the
    * composition adds three id-keyed joins — at 100 TB those are the
    * cheap part; the expensive signals are computed once and reused
    * across reports. Gate order: split → dedup → repetition →
    * contamination (the cheap-to-expensive order a production pipeline
    * short-circuits in). */
  val q78TrainCorpus = QueryDef(
    "q78_train_corpus",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
       |bk AS (SELECT doc_id,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents),
       |ws AS (SELECT doc_id, $sqlWords AS w, $sqlShingleGen AS sg
       |  FROM documents),
       |rep AS (SELECT doc_id,
       |    (CAST(list_max(list_transform(list_distinct(w),
       |        x -> len(list_filter(w, y -> y = x)))) AS DOUBLE) / len(w)
       |       <= $TopWordMax
       |     AND (CAST(len(sg) AS DOUBLE) - len(list_distinct(sg))) / len(sg)
       |       <= $DupShingleMax) AS rep_keep
       |  FROM ws),
       |csh AS (SELECT doc_id, $sqlShingles3 AS s,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents),
       |ctrain AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS sg
       |  FROM csh WHERE bucket < 80),
       |ctest AS (SELECT DISTINCT ${sqlHash60("sg")} AS h
       |  FROM (SELECT unnest(s) AS sg FROM csh WHERE bucket >= 90)),
       |chits AS (SELECT t.doc_id, COUNT(*) AS n_shared
       |  FROM (SELECT doc_id, ${sqlHash60("sg")} AS h FROM ctrain) t
       |  JOIN ctest USING (h) GROUP BY t.doc_id),
       |ctot AS (SELECT doc_id, CAST(any_value(n_sh) AS BIGINT) AS n_sh
       |  FROM ctrain GROUP BY doc_id),
       |contam AS (SELECT ctot.doc_id,
       |    COALESCE(n_shared, 0) / CAST(n_sh AS DOUBLE) >= $ContamFracMin
       |      AS contaminated
       |  FROM ctot LEFT JOIN chits ON ctot.doc_id = chits.doc_id),
       |base AS (SELECT bk.doc_id, bk.bucket,
       |    (bk.doc_id = COALESCE(c.component, bk.doc_id)) AS is_survivor,
       |    rep.rep_keep,
       |    COALESCE(contam.contaminated, false) AS contaminated
       |  FROM bk
       |  JOIN rep ON rep.doc_id = bk.doc_id
       |  LEFT JOIN comp c ON c.doc_id = bk.doc_id
       |  LEFT JOIN contam ON contam.doc_id = bk.doc_id)
       |SELECT doc_id, bucket, is_survivor, rep_keep, contaminated,
       |  CASE WHEN bucket >= 80 THEN 'holdout'
       |       WHEN NOT is_survivor THEN 'duplicate'
       |       WHEN NOT rep_keep THEN 'repetitive'
       |       WHEN contaminated THEN 'contaminated'
       |       ELSE 'kept' END AS reason,
       |  (bucket < 80 AND is_survivor AND rep_keep AND NOT contaminated)
       |    AS keep
       |FROM base
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.StringType
    val bk = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        (hash60(col("doc_id").cast(StringType)) % 100).as("bucket"))
    val comp = CcCache.components(spark, dir)
    val surv = bk.select(col("doc_id"))
      .join(comp.select(col("v").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("doc_id") === coalesce(col("component"), col("doc_id")))
          .as("is_survivor"))
    val rep = repetitionTable(spark, dir)
      .select(col("doc_id"), col("keep").as("rep_keep"))
    val contam = contaminationTable(spark, dir)
      .select(col("doc_id"),
        (col("contamination_frac") >= ContamFracMin).as("contaminated"))
    bk.join(surv, "doc_id").join(rep, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("bucket"), col("is_survivor"),
        col("rep_keep"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .withColumn("reason",
        when(col("bucket") >= 80, "holdout")
          .when(!col("is_survivor"), "duplicate")
          .when(!col("rep_keep"), "repetitive")
          .when(col("contaminated"), "contaminated")
          .otherwise("kept"))
      .withColumn("keep",
        col("bucket") < 80 && col("is_survivor") && col("rep_keep") &&
          !col("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Span width (words) for substring-level dedup. 8 is wide enough that a
    * shared span means copied text, not common phrasing: at 3 words the
    * fixture's average duplicated-occurrence fraction is 0.64 (phrase-level
    * noise), at 8 it is 0.09 concentrated in 47/500 docs (real copies) and
    * widening further to 10 moves nothing (0.092 → 0.092). */
  private[operators] val SpanN = 8

  /** Substring-level duplication metrics (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" signal): per document, how
    * many of its [[SpanN]]-word spans also occur in ANOTHER document —
    * catching partially-copied text that document-level near-dup (q19)
    * under-detects and exact dedup (q18) misses entirely. Docs shorter than
    * [[SpanN]] words have no span and drop out (the [[graft.functions
    * .NGramGen]] empty-array convention).
    *
    * Scale shape: spans never leave their task as strings — each hashes to
    * one 60-bit long ([[Mirror.hash60]], the q37/q69 compact-key pattern),
    * and the first aggregation collapses to one row per (doc, span hash)
    * BEFORE anything shuffles. Document frequency is then a count over that
    * collapsed table (each row = one distinct doc carrying the span — no
    * countDistinct expand), and the final equi-join fans back out on the
    * span hash with AQE handling boilerplate-span skew. Total shuffle is
    * O(distinct spans per doc), linear in corpus size. */
  val q82SpanDedup = QueryDef(
    "q82_span_dedup",
    s"""WITH g AS (SELECT doc_id, unnest(CASE WHEN len($sqlWords) >= $SpanN
       |    THEN list_transform(range(1, len($sqlWords) - ${SpanN - 2}),
       |        i -> array_to_string(($sqlWords)[i:i+${SpanN - 1}], ' '))
       |    ELSE [] END) AS span FROM documents),
       |dg AS (SELECT doc_id, ${sqlHash60("span")} AS sh,
       |    COUNT(*) AS occ
       |  FROM g GROUP BY doc_id, ${sqlHash60("span")}),
       |df AS (SELECT sh, COUNT(*) AS nd FROM dg GROUP BY sh),
       |per AS (SELECT doc_id,
       |    CAST(SUM(occ) AS BIGINT) AS n_spans,
       |    CAST(SUM(CASE WHEN nd >= 2 THEN occ ELSE 0 END) AS BIGINT)
       |      AS dup_spans
       |  FROM dg JOIN df USING (sh) GROUP BY doc_id)
       |SELECT doc_id, n_spans, dup_spans,
       |  CAST(dup_spans AS DOUBLE) / CAST(n_spans AS DOUBLE) AS dup_frac
       |FROM per
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val docGram = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.NGramGen(col("text"), SpanN)).as("span"))
      .select(col("doc_id"), hash60(col("span")).as("sh"))
      .groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("occ"))
    val docFreq = docGram.groupBy(col("sh"))
      .agg(count(lit(1)).as("nd"))
    docGram.join(docFreq, "sh")
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_spans"),
        sum(when(col("nd") >= 2, col("occ")).otherwise(0L)).as("dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("dup_spans"),
        (col("dup_spans").cast(DoubleType) / col("n_spans").cast(DoubleType))
          .as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** Exact-substring dedup — the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" operator itself: find every MAXIMAL
    * span of ≥ [[SpanN]] tokens whose text also occurs elsewhere in the
    * corpus (another document OR another position of the same document) and
    * report its exact token range — the ranges that paper's suffix-array
    * pass cuts out of the training set. q82 reports per-document duplicated
    * FRACTIONS; this emits the spans.
    *
    * The suffix-array shape, Spark-first: a position is covered by a
    * repeated ≥N-token substring iff its N-token shingle occurs ≥2 times in
    * the corpus, and a maximal repeated span is a maximal RUN of
    * consecutive duplicated-shingle positions — so the whole operator is
    * positioned shingles → global occurrence counts → gaps-and-islands
    * span merge. No all-pairs anywhere:
    *  - shingles hash to 60-bit longs before anything shuffles (the q37
    *    compact-key rule), so the count agg and the frequency join move
    *    (doc_id, pos, long) rows only — O(tokens) total, linear in corpus;
    *  - the frequency table is distinct-shingle-sized (sublinear); the
    *    lookup join shuffles on the hash with AQE absorbing boilerplate
    *    skew, exactly q82's plan shape;
    *  - the run merge is a window PARTITIONED BY doc_id ordered by
    *    position — per-task state bounded by one document's length, never
    *    corpus-global (the pos − row_number gaps-and-islands identity,
    *    q56's pattern).
    * CorpusSpec proves the span merge equals a brute-force small-case
    * (every position's shingle counted corpus-wide, runs merged by hand).
    * Reference scope: file:line n/a — the reference has no dedup surface;
    * this is the LLM-pipeline extension tier. */
  /** q143's span subtree over an arbitrary positioned-shingle table
    * (doc_id, pos, sh): duplicated positions (global occurrence ≥ 2) →
    * per-doc gaps-and-islands run merge → (doc_id, start_pos, end_pos,
    * span_tokens). Shared by q143/q147 and the streaming
    * [[graft.streaming.SpanStream]], which maintains the positioned
    * table incrementally so the text is never re-tokenized. */
  private[graft] def mergedSpans(pos: DataFrame): DataFrame = {
    val freq = pos.groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
    islandSpans(pos.join(freq.filter(col("cnt") >= 2), "sh")
      .select(col("doc_id"), col("pos")))
  }

  /** The gaps-and-islands run merge alone, over any (doc_id, pos) table
    * of flagged [[SpanN]]-shingle start positions — shared by
    * [[mergedSpans]] (flag = globally duplicated) and q152 (flag =
    * present in the held-out split). */
  private[graft] def islandSpans(dup: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("a"), max(col("pos")).as("b"))
      .select(col("doc_id"), col("a").as("start_pos"),
        (col("b") + (SpanN - 1)).as("end_pos"),
        (col("b") + SpanN - col("a")).as("span_tokens"))
  }

  /** The positioned [[SpanN]]-shingle table of `documents` (doc_id, pos,
    * sh) — 1-based positions, 60-bit hashes, empty for docs shorter than
    * SpanN words. */
  private[graft] def positionedShingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(graft.functions.NGramGen(col("text"), SpanN))
          .as(Seq("pos0", "span")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"),
        hash60(col("span")).as("sh"))

  val q143SubstringSpans = QueryDef(
    "q143_substring_spans",
    s"""WITH d AS (SELECT doc_id, $sqlWords AS w FROM documents
       |  WHERE len($sqlWords) >= $SpanN),
       |g AS (SELECT doc_id, i AS pos,
       |    array_to_string(w[i:i+${SpanN - 1}], ' ') AS span
       |  FROM (SELECT doc_id, w,
       |        unnest(range(1, len(w) - ${SpanN - 2})) AS i FROM d)),
       |h AS (SELECT doc_id, pos, ${sqlHash60("span")} AS sh FROM g),
       |f AS (SELECT sh, COUNT(*) AS cnt FROM h GROUP BY sh),
       |dup AS (SELECT doc_id, pos FROM h JOIN f USING (sh)
       |  WHERE cnt >= 2),
       |isl AS (SELECT doc_id, pos, pos - row_number()
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM dup),
       |sp AS (SELECT doc_id, MIN(pos) AS a, MAX(pos) AS b
       |  FROM isl GROUP BY doc_id, isl)
       |SELECT doc_id, CAST(a AS BIGINT) AS start_pos,
       |  CAST(b + ${SpanN - 1} AS BIGINT) AS end_pos,
       |  CAST(b + $SpanN - a AS BIGINT) AS span_tokens
       |FROM sp
       |ORDER BY doc_id, start_pos""".stripMargin) { (spark, dir) =>
    mergedSpans(positionedShingles(Tables(spark, dir, "documents")))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** The excision plan q143's spans imply — the ACTION of Lee et al.
    * 2022's dedup: per document, how many tokens the merged repeated
    * spans cover (spans are maximal and disjoint after the run merge, so
    * the per-doc sum is exact, never double-counted) and what fraction of
    * the document a cut would remove. Every document with ≥ 1 token
    * appears (dup 0 when clean or too short to shingle) — the report a
    * pipeline reads to size the cut before committing to it, the
    * substring-level complement of q82's occurrence fractions.
    *
    * Shape: q143's subtree plus one per-doc rollup and a broadcast-free
    * left join on doc_id (both sides shuffle-partitioned by the key; the
    * span side is tiny). */
  val q147SpanExcision = QueryDef(
    "q147_span_excision",
    s"""WITH d AS (SELECT doc_id, $sqlWords AS w FROM documents
       |  WHERE len($sqlWords) >= $SpanN),
       |g AS (SELECT doc_id, i AS pos,
       |    array_to_string(w[i:i+${SpanN - 1}], ' ') AS span
       |  FROM (SELECT doc_id, w,
       |        unnest(range(1, len(w) - ${SpanN - 2})) AS i FROM d)),
       |h AS (SELECT doc_id, pos, ${sqlHash60("span")} AS sh FROM g),
       |f AS (SELECT sh, COUNT(*) AS cnt FROM h GROUP BY sh),
       |dup AS (SELECT doc_id, pos FROM h JOIN f USING (sh)
       |  WHERE cnt >= 2),
       |isl AS (SELECT doc_id, pos, pos - row_number()
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM dup),
       |sp AS (SELECT doc_id, MIN(pos) AS a, MAX(pos) AS b
       |  FROM isl GROUP BY doc_id, isl),
       |per AS (SELECT doc_id, SUM(b + $SpanN - a) AS dup_tokens
       |  FROM sp GROUP BY doc_id),
       |alldocs AS (SELECT doc_id, CAST(len($sqlWords) AS BIGINT)
       |    AS n_tokens FROM documents WHERE len($sqlWords) >= 1)
       |SELECT d.doc_id, d.n_tokens,
       |  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE) /
       |    CAST(d.n_tokens AS DOUBLE) AS dup_frac
       |FROM alldocs d LEFT JOIN per p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables(spark, dir, "documents")
    val per = mergedSpans(positionedShingles(docs))
      .groupBy(col("doc_id"))
      .agg(sum(col("span_tokens")).as("dup_tokens"))
    docs
      .select(col("doc_id"),
        size(words(col("text"))).cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          col("n_tokens").cast(DoubleType)).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** q152: exact-substring decontamination spans — q62's doc-level flag
    * upgraded to the ACTIONABLE report: every maximal run of ≥ [[SpanN]]
    * consecutive tokens in a TRAIN document (q62's split: bucket < 80)
    * whose [[SpanN]]-token windows all occur verbatim somewhere in the
    * HELD-OUT split (bucket ≥ 90) — the exact token ranges a pipeline
    * excises (or flags) before training so the eval set is not memorized
    * verbatim, the cross-split twin of q143's within-corpus spans and the
    * substring-level sharpening of q62's 3-shingle fraction.
    *
    * Shape at scale: the held-out side collapses to DISTINCT shingle
    * hashes first (eval sets are tiny in production — AQE broadcasts the
    * lookup side at runtime; no explicit hint, per the
    * no-broadcast-of-corpus rule), the train side streams positioned
    * (doc_id, pos, long) rows through one equi-join on the hash, and the
    * run merge is the q143 islands window — per-task state bounded by one
    * document. No strings past the tokenize, no all-pairs anywhere. */
  val q152ContamSpans = QueryDef(
    "q152_contam_spans",
    s"""WITH bk AS (SELECT doc_id, $sqlWords AS w,
       |    ${sqlHash60("CAST(doc_id AS VARCHAR)")} % 100 AS bucket
       |  FROM documents),
       |d AS (SELECT doc_id, w FROM bk
       |  WHERE bucket < 80 AND len(w) >= $SpanN),
       |g AS (SELECT doc_id, i AS pos,
       |    array_to_string(w[i:i+${SpanN - 1}], ' ') AS span
       |  FROM (SELECT doc_id, w,
       |        unnest(range(1, len(w) - ${SpanN - 2})) AS i FROM d)),
       |h AS (SELECT doc_id, pos, ${sqlHash60("span")} AS sh FROM g),
       |e AS (SELECT doc_id, w FROM bk
       |  WHERE bucket >= 90 AND len(w) >= $SpanN),
       |eg AS (SELECT array_to_string(w[i:i+${SpanN - 1}], ' ') AS span
       |  FROM (SELECT w, unnest(range(1, len(w) - ${SpanN - 2})) AS i
       |        FROM e)),
       |ev AS (SELECT DISTINCT ${sqlHash60("span")} AS sh FROM eg),
       |dup AS (SELECT doc_id, pos FROM h JOIN ev USING (sh)),
       |isl AS (SELECT doc_id, pos, pos - row_number()
       |    OVER (PARTITION BY doc_id ORDER BY pos) AS isl FROM dup),
       |sp AS (SELECT doc_id, MIN(pos) AS a, MAX(pos) AS b
       |  FROM isl GROUP BY doc_id, isl)
       |SELECT doc_id, CAST(a AS BIGINT) AS start_pos,
       |  CAST(b + ${SpanN - 1} AS BIGINT) AS end_pos,
       |  CAST(b + $SpanN - a AS BIGINT) AS span_tokens
       |FROM sp
       |ORDER BY doc_id, start_pos""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.types.StringType
    val bk = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        (hash60(col("doc_id").cast(StringType)) % 100).as("bucket"))
    val trainPos = positionedShingles(bk.filter(col("bucket") < 80))
    val evalSh = positionedShingles(bk.filter(col("bucket") >= 90))
      .select(col("sh")).distinct()
    islandSpans(trainPos.join(evalSh, "sh").select(col("doc_id"), col("pos")))
      .orderBy(col("doc_id"), col("start_pos"))
  }

  /** Shard size (docs) and bucket fan-out for the balanced-shard export.
    * Both powers of two so position→shard and hash→bucket are exact bit
    * shifts (no double division, whose 53-bit mantissa can't represent a
    * 60-bit hash). */
  private val ShardSizeLog2 = 6 // 64 docs per shard
  private val ShardBucketsLog2 = 5 // 32 range buckets

  /** Balanced training-shard assignment: every document gets a global
    * position in deterministic md5-hash order (a rerun-stable shuffle of
    * the corpus) and a fixed-size shard id — the step that turns a corpus
    * into N equal training files in a reproducible random order.
    *
    * The textbook form is `row_number() OVER (ORDER BY hash)` — a single
    * global sort whose window runs on ONE partition, the canonical
    * cluster-scale failure. This implementation never builds a global
    * window: the 60-bit hash's top [[ShardBucketsLog2]] bits are a RANGE
    * bucket (bucket-major order ≡ global hash order because the bucket is
    * a monotone function of the hash), per-bucket counts (a tiny agg —
    * [[ShardBucketsLog2]] rows of model state, the only driver-scale
    * window here) prefix-sum into bucket start offsets, and each bucket
    * ranks its own rows in parallel. global_pos = bucket offset + local
    * rank; shard = global_pos >> [[ShardSizeLog2]]. At 1000 executors the
    * per-bucket windows are the parallelism; md5 uniformity keeps buckets
    * balanced (raise the bucket count with the corpus). The oracle IS the
    * textbook global window, proving the distributed form bit-equal. */
  val q84BalancedShards = QueryDef(
    "q84_balanced_shards",
    s"""WITH h AS (SELECT doc_id, ${sqlHash60("text")} AS h FROM documents),
       |r AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY h, doc_id) - 1 AS global_pos
       |  FROM h)
       |SELECT doc_id, global_pos,
       |  global_pos >> $ShardSizeLog2 AS shard
       |FROM r
       |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val hashed = Tables(spark, dir, "documents")
      .select(col("doc_id"), hash60(col("text")).as("h"))
      .withColumn("bucket", shiftright(col("h"), 60 - ShardBucketsLog2))
    val offsets = hashed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(
          sum(col("cnt")).over(Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("off"))
    val ranked = hashed.withColumn("rn",
      row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))))
    ranked.join(broadcast(offsets), "bucket")
      .select(col("doc_id"),
        (col("off") + col("rn") - 1).as("global_pos"),
        shiftright(col("off") + col("rn") - 1, ShardSizeLog2).as("shard"))
      .orderBy(col("doc_id"))
  }

  /** Chunk width / stride (words) for the retrieval-style chunker: 40-word
    * chunks every 30 words = 25% overlap, the common RAG recipe shape. */
  private val ChunkW = 40
  private val ChunkS = 30

  /** Overlapping document chunking — the step that turns documents into
    * retrieval/training units (RAG indexing, context packing): fixed-width
    * word windows at a fixed stride, each identified by (doc_id, chunk_id)
    * and fingerprinted. Deterministic: chunk boundaries are pure word-index
    * arithmetic, so reruns and both engines produce identical chunks.
    *
    * Scale shape: a narrow map — split, per-row index sequence, slice,
    * hash; zero shuffle before the output sort, embarrassingly parallel at
    * any corpus size. Chunks leave the operator as 60-bit fingerprints plus
    * counts, not text, so downstream chunk-level joins (q77-style dedup,
    * inverted indexes) shuffle ids+longs only. Trailing chunks may be
    * shorter than [[ChunkW]] (suffix semantics, mirrored exactly in the
    * oracle's list slicing). */
  val q89DocChunks = QueryDef(
    "q89_doc_chunks",
    s"""WITH w AS (SELECT doc_id, $sqlWords AS ws FROM documents),
       |s AS (SELECT doc_id, ws,
       |    unnest(range(1, len(ws) + 1, $ChunkS)) AS start FROM w),
       |c AS (SELECT doc_id,
       |    CAST((start - 1) // $ChunkS AS INTEGER) AS chunk_id,
       |    array_to_string(ws[start : start + ${ChunkW - 1}], ' ')
       |      AS chunk,
       |    CAST(len(ws[start : start + ${ChunkW - 1}]) AS INTEGER)
       |      AS n_words
       |  FROM s)
       |SELECT doc_id, chunk_id, n_words,
       |  ${sqlHash60("chunk")} AS chunk_hash
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin) { (spark, dir) =>
    Tables(spark, dir, "documents")
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(1), size(col("ws")), lit(ChunkS)))
          .as("start"))
      .select(col("doc_id"),
        ((col("start") - 1) / ChunkS).cast("int").as("chunk_id"),
        slice(col("ws"), col("start"), lit(ChunkW)).as("cw"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("cw")).as("n_words"),
        hash60(array_join(col("cw"), " ")).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** The dedup report: duplicate-cluster size distribution over the q59
    * connected components — how many singletons, pairs, triples, … the
    * near-dup graph contains, with the document and removal counts each
    * bucket contributes. This is the summary a 100 TB dedup run prints to
    * justify its deletions (and the first place a too-aggressive
    * threshold shows up, as a fat tail of giant clusters).
    *
    * Scale shape: derived entirely from the component labeling (ids only
    * — text is never touched), then two shrinking aggregations: per-
    * component sizes (output = #clusters) and the size histogram (output
    * bounded by the LARGEST cluster size, a handful of rows at any
    * corpus scale). docs_removed = (size-1)·clusters is exact integer
    * math. */
  val q94ClusterSizeDist = QueryDef(
    "q94_cluster_size_dist",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
       |lab AS (SELECT COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
       |sz AS (SELECT component, COUNT(*) AS comp_size FROM lab
       |  GROUP BY component)
       |SELECT comp_size, COUNT(*) AS n_clusters,
       |  CAST(comp_size * COUNT(*) AS BIGINT) AS n_docs,
       |  CAST((comp_size - 1) * COUNT(*) AS BIGINT) AS docs_removed
       |FROM sz
       |GROUP BY comp_size
       |ORDER BY comp_size""".stripMargin) { (spark, dir) =>
    val comp = CcCache.components(spark, dir)
    Tables(spark, dir, "documents")
      .select(col("doc_id"))
      .join(comp.select(col("v").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(coalesce(col("component"), col("doc_id")).as("component"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("comp_size"))
      .groupBy(col("comp_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("comp_size"),
        col("n_clusters"),
        (col("comp_size") * col("n_clusters")).as("n_docs"),
        ((col("comp_size") - 1) * col("n_clusters")).as("docs_removed"))
      .orderBy(col("comp_size"))
  }

  /** Quality-aware survivor selection: per duplicate cluster, keep the
    * MEDOID — the member verified-similar to the most other members
    * (max degree in the near-dup graph, ties to the smaller doc_id) —
    * instead of q59's arbitrary min-id canonical. The "keep the best
    * copy" decision a real dedup pipeline makes: a hub document that
    * matched every variant is a better representative than whichever
    * variant happens to carry the smallest id. Degree is integer-exact
    * (no float aggregation), so the choice is bit-deterministic in both
    * engines.
    *
    * Scale shape: pure artifact consumer — reads the materialized pair
    * table ([[PairCache]]), one narrow explode for degrees (both
    * endpoints from ONE pass over the pairs, never a union that would
    * re-execute the source), the CC labels, and two windows over the
    * component partitioning. Output is O(clusters). */
  val q96MedoidSurvivor = QueryDef(
    "q96_medoid_survivor",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
       |deg AS (SELECT a AS doc_id, CAST(COUNT(*) AS BIGINT) AS degree
       |  FROM edges GROUP BY a),
       |m AS (SELECT c.component, c.doc_id, d.degree,
       |    row_number() OVER (PARTITION BY c.component
       |                       ORDER BY d.degree DESC, c.doc_id) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT)
       |      AS n_members
       |  FROM comp c JOIN deg d USING (doc_id))
       |SELECT component, doc_id AS medoid_id, n_members, degree
       |FROM m WHERE rn = 1
       |ORDER BY component""".stripMargin) { (spark, dir) =>
    val pairs = Dedup.nearDupPairs(spark, dir)
    val comp = CcCache.components(spark, dir)
    // both endpoints from one pass (explode, not union — the q83 lesson)
    val deg = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    comp.select(col("v").as("doc_id"), col("component"))
      .join(deg, "doc_id")
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("component")))
          .cast(LongType))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("component"))
          .orderBy(col("degree").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("component"), col("doc_id").as("medoid_id"),
        col("n_members"), col("degree"))
      .orderBy(col("component"))
  }

  /** Cross-source duplication matrix: which providers' corpora overlap —
    * near-dup pairs bucketed by the (unordered) source pair, with each
    * bucket's share of all pairs. The report that drives licensing /
    * acquisition decisions ("source B is 80% re-hosted source A") and
    * flags scraped mirrors before they double-count in training.
    *
    * Scale shape: artifact consumer — the pair table joins to the
    * documents' source column twice on doc_id (AQE broadcasts the tiny
    * pair side), collapses to at most |sources|² rows, and the share
    * denominator is a window total over that bounded result, never a
    * second pass over the pairs. */
  val q97SourceOverlap = QueryDef(
    "q97_source_overlap",
    s"""WITH ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |lab AS (SELECT least(da.source, db.source) AS source_a,
       |    greatest(da.source, db.source) AS source_b
       |  FROM pairs p
       |  JOIN documents da ON da.doc_id = p.doc_a
       |  JOIN documents db ON db.doc_id = p.doc_b),
       |g AS (SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM lab GROUP BY source_a, source_b)
       |SELECT source_a, source_b, n_pairs,
       |  CAST(n_pairs AS DOUBLE) / CAST(SUM(n_pairs) OVER () AS DOUBLE)
       |    AS frac
       |FROM g
       |ORDER BY n_pairs DESC, source_a, source_b""".stripMargin) { (spark, dir) =>
    val src = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    Dedup.nearDupPairs(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("frac", col("n_pairs").cast(DoubleType)
        / sum(col("n_pairs")).over(Window.partitionBy()).cast(DoubleType))
      .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
  }

  /** Dedup shrinkage report: per source, document and token counts
    * before/after near-dup survivorship (q59's min-id rule, singletons
    * kept) and the token-keep fraction — the "how much training data do
    * I actually have left per provider" accounting that sizes a training
    * run and prices a data source.
    *
    * Scale shape: one artifact-backed CC labeling, one narrow token
    * count per doc (size of the split — no shuffle), one LEFT join on
    * doc_id, one partial-pushed aggregation to |sources| rows. The
    * keep fraction is a single IEEE divide of two exact integer sums —
    * bit-exact cross-engine (no float accumulation). */
  val q98DedupShrinkage = QueryDef(
    "q98_dedup_shrinkage",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |pairs AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v),
       |lab AS (SELECT d.doc_id, d.source,
       |    CAST(len(${Mirror.sqlWords}) AS BIGINT) AS toks,
       |    (d.doc_id = COALESCE(c.component, d.doc_id)) AS surv
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
       |SELECT source, COUNT(*) AS docs_before,
       |  CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS docs_after,
       |  CAST(SUM(toks) AS BIGINT) AS tokens_before,
       |  CAST(SUM(CASE WHEN surv THEN toks ELSE 0 END) AS BIGINT)
       |    AS tokens_after,
       |  CAST(SUM(CASE WHEN surv THEN toks ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(toks) AS DOUBLE) AS token_keep_frac
       |FROM lab GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
    val comp = CcCache.components(spark, dir)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(Mirror.words(col("text"))).cast(LongType).as("toks"))
      .join(comp.select(col("v").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("source"), col("toks"),
        (col("doc_id") === coalesce(col("component"), col("doc_id")))
          .as("surv"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_before"),
        sum(when(col("surv"), 1).otherwise(0)).as("docs_after"),
        sum(col("toks")).as("tokens_before"),
        sum(when(col("surv"), col("toks")).otherwise(0L))
          .as("tokens_after"))
      .withColumn("token_keep_frac",
        col("tokens_after").cast(DoubleType)
          / col("tokens_before").cast(DoubleType))
      .orderBy(col("source"))
  }

  /** q140: leakage-free train/val/test split — the eval-hygiene step a
    * training pipeline runs AFTER near-dup clustering (q59) and BEFORE
    * materialization: hash-assign whole duplicate COMPONENTS to splits,
    * never individual documents, so no near-dup pair can straddle the
    * train/eval boundary (the contamination-by-construction failure of
    * per-doc splits; cf. the dedup/decontamination discussion in Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"). The report grades BOTH policies on the same corpus: the
    * component split's `leak_pairs` is 0 by construction, while
    * `naive_leak_pairs` — the same pair set under a per-doc hash split —
    * counts every near-dup pair the naive policy tears across splits (a
    * pair leaking between two splits is counted in each, since both
    * sides' audits must list it).
    *
    * Determinism: split = hash60(assignment key) mod 10 (8/1/1) — a pure
    * function of (corpus, key), the q53/q63 discipline; all outputs are
    * integer counts.
    *
    * Shape at scale: components come from the q59 label propagation
    * (rounds = cluster diameter, shuffles on the vertex key); the split
    * label is a narrow map; the leak audit joins the O(pairs) artifact —
    * tiny next to the corpus — against the label table twice, keyed on
    * the doc PK. Singleton docs never enter the pair join at all. */
  val q140LeakageSplit = QueryDef(
    "q140_leakage_split",
    s"""WITH RECURSIVE ${Dedup.sqlNearDupBody},
       |p2 AS (${Dedup.sqlNearDupPairs}),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM p2
       |          UNION ALL SELECT doc_b, doc_a FROM p2),
       |reach(v, r) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.v = e.b),
       |comp AS (SELECT v AS doc_id, MIN(r) AS component FROM reach
       |  GROUP BY v),
       |lab AS (SELECT d.doc_id, d.source,
       |    CAST(len($sqlWords) AS BIGINT) AS toks,
       |    COALESCE(c.component, d.doc_id) AS component,
       |    CASE WHEN ${sqlHash60(
              "CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)")} % 10 < 8
       |         THEN 'train'
       |         WHEN ${sqlHash60(
              "CAST(COALESCE(c.component, d.doc_id) AS VARCHAR)")} % 10 = 8
       |         THEN 'val' ELSE 'test' END AS split,
       |    CASE WHEN ${sqlHash60("CAST(d.doc_id AS VARCHAR)")} % 10 < 8
       |         THEN 'train'
       |         WHEN ${sqlHash60("CAST(d.doc_id AS VARCHAR)")} % 10 = 8
       |         THEN 'val' ELSE 'test' END AS naive_split
       |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
       |per AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(toks) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components
       |  FROM lab GROUP BY split),
       |lk AS (SELECT la.split AS sa, lb.split AS sb,
       |    la.naive_split AS na, lb.naive_split AS nb
       |  FROM p2 JOIN lab la ON la.doc_id = p2.doc_a
       |          JOIN lab lb ON lb.doc_id = p2.doc_b),
       |leak_c AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS leak_pairs
       |  FROM (SELECT sa AS split FROM lk WHERE sa <> sb
       |        UNION ALL SELECT sb FROM lk WHERE sa <> sb)
       |  GROUP BY split),
       |leak_n AS (SELECT split,
       |    CAST(COUNT(*) AS BIGINT) AS naive_leak_pairs
       |  FROM (SELECT na AS split FROM lk WHERE na <> nb
       |        UNION ALL SELECT nb FROM lk WHERE na <> nb)
       |  GROUP BY split)
       |SELECT per.split, n_docs, n_tokens, n_components,
       |  COALESCE(leak_c.leak_pairs, CAST(0 AS BIGINT)) AS leak_pairs,
       |  COALESCE(leak_n.naive_leak_pairs, CAST(0 AS BIGINT))
       |    AS naive_leak_pairs
       |FROM per
       |LEFT JOIN leak_c ON leak_c.split = per.split
       |LEFT JOIN leak_n ON leak_n.split = per.split
       |ORDER BY per.split""".stripMargin) { (spark, dir) =>
    val pairs = Dedup.nearDupPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val comp = CcCache.components(spark, dir)
    def splitOf(key: Column): Column =
      when(pmod(hash60(key.cast(org.apache.spark.sql.types.StringType)),
        lit(10L)) < 8, "train")
        .when(pmod(hash60(key.cast(org.apache.spark.sql.types.StringType)),
          lit(10L)) === 8, "val")
        .otherwise("test")
    val lab = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast(LongType).as("toks"))
      .join(comp.select(col("v").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(col("component"), col("doc_id")).as("component"),
        splitOf(coalesce(col("component"), col("doc_id"))).as("split"),
        splitOf(col("doc_id")).as("naive_split"))
    val per = lab.groupBy(col("split")).agg(
      count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
      countDistinct(col("component")).as("n_components"))
    val lk = pairs
      .join(lab.select(col("doc_id").as("doc_a"), col("split").as("sa"),
        col("naive_split").as("na")), Seq("doc_a"))
      .join(lab.select(col("doc_id").as("doc_b"), col("split").as("sb"),
        col("naive_split").as("nb")), Seq("doc_b"))
    def leakOf(a: String, b: String, out: String): DataFrame = lk
      .filter(col(a) =!= col(b))
      .select(col(a).as("split"))
      .unionByName(lk.filter(col(a) =!= col(b))
        .select(col(b).as("split")))
      .groupBy(col("split")).agg(count(lit(1)).as(out))
    per
      .join(leakOf("sa", "sb", "leak_pairs"), Seq("split"), "left_outer")
      .join(leakOf("na", "nb", "naive_leak_pairs"), Seq("split"),
        "left_outer")
      .select(col("split"), col("n_docs"), col("n_tokens"),
        col("n_components"),
        coalesce(col("leak_pairs"), lit(0L)).as("leak_pairs"),
        coalesce(col("naive_leak_pairs"), lit(0L))
          .as("naive_leak_pairs"))
      .orderBy(col("split"))
  }

  val all: Seq[QueryDef] =
    Seq(q59DedupComponents, q60PackSequences, q61RepetitionMetrics,
      q62Contamination, q63StratifiedSample, q65PiiScrub,
      q66MixtureResample, q67ExactPercentiles, q69BigramLm,
      q76SourceDatasheet, q78TrainCorpus, q82SpanDedup, q84BalancedShards,
      q89DocChunks, q94ClusterSizeDist, q96MedoidSurvivor, q97SourceOverlap,
      q98DedupShrinkage, q104ApproxPercentileBound, q105NgramNovelty,
      q107WinsorizedStats, q110SaturationCurve, q140LeakageSplit,
      q143SubstringSpans, q147SpanExcision, q152ContamSpans)
}
