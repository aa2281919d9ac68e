package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** An ad/content impression (left side of the attribution join). */
final case class Impression(imp_id: Long, imp_user: Long, imp_ts: Timestamp)

/** Stream-STREAM operators (SURVEY §2.9-T6 remainder; stream-static lives
  * in StreamJoinSpec): event-time join of two unbounded sources, and keyed
  * dedup bounded by the watermark.
  *
  * Scale notes: a stream-stream join buffers BOTH sides in the state store.
  * The two ingredients that keep that state bounded — and what this module
  * demonstrates — are (1) watermarks on both inputs and (2) an event-time
  * range in the join condition, which together let Spark evict any buffered
  * row once it can no longer match. Without either, state grows forever.
  * One hash exchange per side on the join key; RocksDB backend for spill.
  */
object StreamStream {

  /** Click attribution: each click joins the impression it followed within
    * `attributionWindow`, per user. Inner join — results emit as soon as
    * both sides arrive, late rows beyond `lateness` are dropped, and
    * buffered impressions are evicted `attributionWindow` past the
    * watermark. */
  /** @param joinType "inner" (matches emit immediately) or "left_outer"
    *   (additionally, an impression that attracted no click emits once with
    *   null click columns — but only after the watermark proves no
    *   in-window click can still arrive; outer results are necessarily
    *   watermark-delayed). */
  def attribute(impressions: Dataset[Impression], clicks: Dataset[Click],
      attributionWindow: String = "30 minutes",
      lateness: String = "10 minutes",
      joinType: String = "inner"): DataFrame =
    impressions.withWatermark("imp_ts", lateness)
      .join(clicks.withWatermark("ts", lateness),
        col("imp_user") === col("user_id") &&
          col("ts") >= col("imp_ts") &&
          col("ts") <= col("imp_ts") + expr(s"INTERVAL $attributionWindow"),
        joinType)
      .select(col("imp_id"), col("imp_user"), col("imp_ts"),
        col("ts").as("click_ts"), col("event_type"), col("value"))

  /** At-most-once per (user, event_type) within the watermark horizon:
    * `dropDuplicatesWithinWatermark` keeps dedup state only `lateness`
    * long — the bounded-state form of streaming dedup (plain
    * `dropDuplicates` on a stream accumulates keys forever). The first
    * arrival wins; re-deliveries (at-least-once sources re-sending on
    * retry) within the horizon are suppressed. */
  def dedupWithinWatermark(clicks: Dataset[Click],
      lateness: String = "10 minutes"): Dataset[Click] =
    clicks.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
}
