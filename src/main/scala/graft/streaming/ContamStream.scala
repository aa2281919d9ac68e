package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming decontamination: arriving (vec_id, embedding) rows are scored
  * against the STATIC eval-split index from batch q81 as they land,
  * instead of waiting for a batch decontamination sweep. Mirrors q81's
  * adaptive design (round-8): with a benchmark-sized eval split the
  * stream scores EXACTLY against the whole broadcast eval index
  * ([[hitsExact]] — recall 1.0, the common case); an outsized eval split
  * blocks through the trained quantizer cells ([[hits]] — the scale
  * path). [[exactMode]] makes the same metadata-count decision as batch
  * q81.
  *
  * Plan shape, both modes: narrow map on the stream side, then a
  * stream-static join against a bounded static side — completely
  * STATELESS, so it runs in append mode with no watermark and no state
  * store. Emitted rows are (vec_id, eval_id, sim) contamination HITS (one
  * per flagged train-vector × eval-neighbor above
  * [[Similarity.ContamThreshold]]); `distinct vec_id` over the hits
  * equals the same-mode batch contaminated set — ContamStreamSpec proves
  * that equivalence batch by batch for BOTH modes (exact vs q81, blocked
  * vs q101). */
object ContamStream {

  /** BLOCKED scorer: probe a (possibly streaming) (vec_id, embedding)
    * relation against the capped per-cell eval index; emit hits with
    * sim >= the q81 threshold. Stream-static equi-join on cell. */
  def hits(vecs: DataFrame, evalIdx: DataFrame,
      cents: Array[(Long, Array[Double])]): DataFrame = {
    import graft.functions.FloatVector
    Similarity.contamProbes(vecs, cents)
      .join(evalIdx, Seq("cell")) // stream-static equi-join, stateless
      .select(col("vec_id"), col("eval_id"),
        (FloatVector.dot(col("embedding"), col("ev"))
          / (col("nrm") * col("en"))).as("sim"))
      .filter(col("sim") >= Similarity.ContamThreshold)
  }

  /** EXACT scorer: every arriving vector against the ENTIRE broadcast
    * eval index (no quantizer, no cells) — recall 1.0; only for
    * benchmark-sized eval splits, exactly as batch q81's exact branch. */
  def hitsExact(vecs: DataFrame, evalRows: DataFrame): DataFrame = {
    import graft.functions.FloatVector
    vecs
      .select(col("vec_id"), col("embedding"),
        FloatVector.norm(col("embedding")).as("nrm"))
      .crossJoin(broadcast(evalRows))
      .select(col("vec_id"), col("eval_id"),
        (FloatVector.dot(col("embedding"), col("ev"))
          / (col("nrm") * col("en"))).as("sim"))
      .filter(col("sim") >= Similarity.ContamThreshold)
  }

  /** Batch q81's branch decision, for picking the stream scorer. */
  def exactMode(spark: SparkSession, dir: String): Boolean =
    Similarity.contamUseExact(spark, dir)

  /** Blocked-mode statics: the model + capped eval index, as batch
    * q81's blocked branch (and q101) build them. */
  def index(spark: SparkSession,
      dir: String): (Array[(Long, Array[Double])], DataFrame) =
    Similarity.contamIndex(spark, dir)

  /** Exact-mode static: all eval rows with norms — no training at all. */
  def exactIndex(spark: SparkSession, dir: String): DataFrame =
    Similarity.contamEvalRows(
      graft.Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")))
}
