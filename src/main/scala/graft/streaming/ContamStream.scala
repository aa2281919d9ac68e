package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming decontamination: arriving (vec_id, embedding) rows probe the
  * STATIC eval-split cell index from batch q81 — a stream-static
  * equi-join on the trained quantizer cell. This is the ingest-path form
  * of the contamination check: the benchmark index is built once (model +
  * capped eval index, both bounded), and every arriving corpus vector is
  * scored against only its probed cells' eval members as it lands,
  * instead of waiting for a batch decontamination sweep.
  *
  * Plan shape: narrow map + explode on the stream side (cells from the
  * broadcast centroid literals), then a stream-static inner join on
  * `cell` and a filter — completely STATELESS, so it runs in append mode
  * with no watermark and no state store; at scale the static side is a
  * benchmark index a broadcast join handles. Emitted rows are
  * (vec_id, eval_id, sim) contamination HITS (one per flagged
  * train-vector × eval-neighbor above [[Similarity.ContamThreshold]]);
  * `distinct vec_id` over the hits equals batch q81's contaminated set —
  * ContamStreamSpec proves that equivalence on the shared fixture, batch
  * by batch. */
object ContamStream {

  /** Score a (possibly streaming) (vec_id, embedding) relation against
    * the static eval index; emit hits with sim >= the q81 threshold. */
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

  /** Convenience: the model + index for `dir`, as batch q81 builds them. */
  def index(spark: SparkSession,
      dir: String): (Array[(Long, Array[Double])], DataFrame) =
    Similarity.contamIndex(spark, dir)
}
