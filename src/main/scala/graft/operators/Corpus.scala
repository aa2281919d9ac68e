package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    * (only near-dup members appear). `localCheckpoint` truncates the
    * growing loop lineage (on a cluster, prefer `checkpoint` to a reliable
    * store for fault tolerance; the convergence `count` is the driver-side
    * control signal, same as MLlib's iterative jobs). */
  private[operators] def connectedComponents(edges: DataFrame, src: String,
      dst: String): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .localCheckpoint() // edge pipeline (LSH + verify) runs once, not per iteration
    var labels = sym.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(labels.select(col("v").as("b"), col("label")), "b")
        .groupBy(col("a").as("v"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"),
          (coalesce(col("nbr_min"), col("label")) < col("label"))
            .as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("v"), col("label"))
    }
    labels.select(col("v"), col("label").as("component"))
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

  val all: Seq[QueryDef] = Seq(q59DedupComponents)
}
