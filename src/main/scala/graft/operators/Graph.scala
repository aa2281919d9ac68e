package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Link-graph analytics for corpus curation. Web-scale training pipelines
  * rank crawl frontiers and weight sources by link authority (the
  * PageRank-family centrality signals used in CommonCrawl-derived corpus
  * work); this module adds the iterative propagate-and-aggregate operator
  * family — distinct from [[Corpus.connectedComponents]]'s min-label
  * convergence — in a form both engines compute bit-identically.
  *
  * Reference scope: the reference has no graph surface at all
  * (init-db/init.sql:9-110 — flat per-country aggregates); this is
  * 100 TB extension surface.
  *
  * Determinism strategy: ranks live in integer MICRO-units and every
  * per-edge contribution is floor((r * 17) / (outdeg * 20)) — integer
  * multiply + integral divide on non-negatives, so per-iteration sums are
  * order-independent and the engines cannot drift in ULPs the way a
  * float damping loop would. The 17/20 ratio IS the damping factor 0.85;
  * teleport mass is the exact integer 150000 = 0.15 in micro-units.
  */
object Graph {
  import Mirror._

  /** PageRank iteration count. Fixed (not convergence-driven): curation
    * wants a reproducible signal, and 5 damped rounds already separate
    * hubs from leaves; the loop shape is identical at any count. */
  private val Iters = 5

  /** Out-degree of the synthetic link graph before self-link removal. */
  private val OutLinks = 3

  /** Lineage truncation for the rank loop — same posture as the
    * connected-components loop (`spark.graft.cc.checkpointDir` switches
    * executor-local truncation to a reliable store for cluster runs). */
  private def truncate(spark: SparkSession): DataFrame => DataFrame = {
    val ckDir = spark.conf.get("spark.graft.cc.checkpointDir", "")
    if (ckDir.nonEmpty) {
      spark.sparkContext.setCheckpointDir(ckDir)
      df => df.checkpoint()
    } else df => df.localCheckpoint()
  }

  /** q132: integer PageRank over a deterministic synthetic link graph —
    * doc d links to hash60(d:link:k) mod N for k = 1..3 (self-links
    * dropped), N = corpus row count from parquet footers
    * ([[Tables.metaCount]] — no counting scan). Five damped iterations,
    * then the top-100 authorities.
    *
    * Shape at scale: the rank table is one row per node (ids + one long);
    * each iteration is the canonical distributed PageRank step — join
    * ranks to edges on src (both sides hash-partitioned by the same key
    * from the previous round's aggregations), per-edge integer
    * contribution, sum by dst — two shuffles of id+long rows per round,
    * never text. Edges are materialized once before the loop
    * (localCheckpoint; reliable checkpoint under the cluster conf) so the
    * 5 rounds don't re-derive them, and each round's rank table truncates
    * its lineage the same way the CC loop does. The final top-100 is a
    * TakeOrdered (bounded heap per partition + driver merge of 100-row
    * heads), not a global sort. Dangling nodes (all three links
    * self-directed) simply leak their mass — the standard simplification,
    * identical in both engines. */
  val q132Pagerank = QueryDef(
    "q132_pagerank", {
      val contribJoin = (prev: String) =>
        s"""SELECT e.dst, SUM((p.r * 17) // (e.outdeg * 20)) AS c
           |    FROM $prev p JOIN edges e ON p.doc_id = e.src
           |    GROUP BY e.dst""".stripMargin
      val steps = (1 to Iters).map { i =>
        s"""pr$i AS (
           |  SELECT n.doc_id, CAST(150000 + COALESCE(s.c, 0) AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    ${contribJoin(s"pr${i - 1}")}) s
           |  ON n.doc_id = s.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM documents),
         |links AS (
         |  SELECT d.doc_id AS src,
         |    ${sqlHash60("concat(CAST(d.doc_id AS VARCHAR), ':link:', " +
          "CAST(k.k AS VARCHAR))")} % (SELECT n FROM nn) AS dst
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(1, ${OutLinks + 1})) AS k) k),
         |e0 AS (SELECT src, dst FROM links WHERE src <> dst),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
         |edges AS (
         |  SELECT e.src, e.dst, g.outdeg FROM e0 e
         |  JOIN deg g ON e.src = g.src),
         |pr0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |$steps
         |SELECT doc_id, r AS rank_micro FROM pr$Iters
         |ORDER BY r DESC, doc_id LIMIT 100""".stripMargin
    }) { (spark, dir) =>
    val n = Tables.metaCount(spark, dir, "documents")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val trunc = truncate(spark)
    val links = docs
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(OutLinks))).as("k"))
      .select(col("src"),
        (hash60(concat(col("src").cast(StringType), lit(":link:"),
          col("k").cast(StringType))) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
    val deg = links.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // materialize once — five rounds reuse the edge table
    val edges = trunc(links.join(deg, Seq("src")))
    var ranks = docs.select(col("doc_id"), lit(1000000L).as("r"))
    for (_ <- 1 to Iters) {
      val contribs = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"),
          expr("(r * 17) div (outdeg * 20)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks = trunc(docs
        .join(contribs.withColumnRenamed("dst", "doc_id"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + coalesce(col("c"), lit(0L))).as("r")))
    }
    ranks.select(col("doc_id"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("doc_id")).limit(100)
  }

  /** q134: PageRank with dangling-mass redistribution — q132's loop plus
    * the standard correction q132 documents as its simplification: mass
    * arriving at nodes with no outlinks is returned to the graph instead
    * of leaking. The synthetic graph makes the term real: ~20% of docs are
    * SINKS (hash60b(d:sink) % 5 = 0 — crawl leaf pages) that receive links
    * but emit none, so every round carries substantial dangling mass.
    *
    * Per round: share = (Σ_dangling r · 17) // (20 · N) is added to every
    * node's teleport base alongside the damped in-link contributions. The
    * dangling sum is ONE scalar per round pulled to the driver (the
    * k-means Lloyd-loop pattern — bounded driver state, not corpus-scale
    * collect); the dangling id set itself is materialized once before the
    * loop as an anti-join of nodes against out-degrees and reused.
    *
    * Integer posture: ranks stay in micro-units; Σr fits a long up to
    * ~5·10^11 docs at this rank scale (9.2·10^18 / (17·10^6)) — beyond
    * that the driver-side sum switches to BigInt like q118's waterfill;
    * the per-edge and per-round floors are order-independent so both
    * engines stay bit-identical. Mass accounting: each round loses < 1
    * micro-unit per edge (contribution floor) + < 1 per node (share
    * floor) — GraphSpec pins the conservation bound; q132's leak is the
    * whole dangling mass instead.
    *
    * Shape at scale: identical to q132 — two id+long shuffles per round,
    * edges materialized once, lineage truncation per round, TakeOrdered
    * top-100 — plus one tiny aggregation job per round for the scalar. */
  val q134PagerankDangling = QueryDef(
    "q134_pagerank_dangling", {
      val contribJoin = (prev: String) =>
        s"""SELECT e.dst, SUM((p.r * 17) // (e.outdeg * 20)) AS c
           |    FROM $prev p JOIN edges e ON p.doc_id = e.src
           |    GROUP BY e.dst""".stripMargin
      val share = (prev: String) =>
        s"""COALESCE((SELECT (CAST(SUM(p.r) AS BIGINT) * 17)
           |      // (20 * (SELECT n FROM nn))
           |    FROM $prev p JOIN dang dg ON p.doc_id = dg.doc_id), 0)""".stripMargin
      val steps = (1 to Iters).map { i =>
        s"""pr$i AS (
           |  SELECT n.doc_id,
           |    CAST(150000 + ${share(s"pr${i - 1}")}
           |      + COALESCE(s.c, 0) AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN (
           |    ${contribJoin(s"pr${i - 1}")}) s
           |  ON n.doc_id = s.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH nodes AS (SELECT doc_id FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM documents),
         |links AS (
         |  SELECT d.doc_id AS src,
         |    ${sqlHash60("concat(CAST(d.doc_id AS VARCHAR), ':link:', " +
          "CAST(k.k AS VARCHAR))")} % (SELECT n FROM nn) AS dst
         |  FROM documents d
         |  CROSS JOIN (SELECT unnest(range(1, ${OutLinks + 1})) AS k) k
         |  WHERE ${sqlHash60b("concat(CAST(d.doc_id AS VARCHAR), ':sink')")}
         |    % 5 <> 0),
         |e0 AS (SELECT src, dst FROM links WHERE src <> dst),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM e0 GROUP BY src),
         |edges AS (
         |  SELECT e.src, e.dst, g.outdeg FROM e0 e
         |  JOIN deg g ON e.src = g.src),
         |dang AS (SELECT doc_id FROM nodes
         |  WHERE doc_id NOT IN (SELECT src FROM deg)),
         |pr0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |$steps
         |SELECT doc_id, r AS rank_micro FROM pr$Iters
         |ORDER BY r DESC, doc_id LIMIT 100""".stripMargin
    }) { (spark, dir) =>
    val n = Tables.metaCount(spark, dir, "documents")
    val docs = Tables(spark, dir, "documents").select(col("doc_id"))
    val trunc = truncate(spark)
    val links = docs
      .filter(hash60b(concat(col("doc_id").cast(StringType), lit(":sink")))
        % 5 =!= 0)
      .select(col("doc_id").as("src"),
        explode(sequence(lit(1), lit(OutLinks))).as("k"))
      .select(col("src"),
        (hash60(concat(col("src").cast(StringType), lit(":link:"),
          col("k").cast(StringType))) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
    val deg = links.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edges = trunc(links.join(deg, Seq("src")))
    val dang = trunc(docs.join(deg.select(col("src").as("doc_id")),
      Seq("doc_id"), "left_anti"))
    var ranks = docs.select(col("doc_id"), lit(1000000L).as("r"))
    for (_ <- 1 to Iters) {
      // one bounded scalar per round — the Lloyd-loop pattern
      val dangSum = ranks.join(dang, Seq("doc_id"))
        .agg(coalesce(sum(col("r")), lit(0L)))
        .collect()(0).getLong(0)
      val share = dangSum * 17L / (20L * n)
      val contribs = edges
        .join(ranks.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst"),
          expr("(r * 17) div (outdeg * 20)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks = trunc(docs
        .join(contribs.withColumnRenamed("dst", "doc_id"),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L + share) + coalesce(col("c"), lit(0L))).as("r")))
    }
    ranks.select(col("doc_id"), col("r").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("doc_id")).limit(100)
  }

  val all: Seq[QueryDef] = Seq(q132Pagerank, q134PagerankDangling)
}
