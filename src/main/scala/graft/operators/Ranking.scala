package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Global ranking without a single-partition window.
  *
  * `rank().over(Window.orderBy(...))` — the obvious form — moves EVERY row
  * through one task; it only survives when the input is known-small. This
  * operator computes the same rank distributed:
  *
  *  1. distributed `orderBy` (range-partitioned sort — no task sees more
  *     than its partition),
  *  2. `zipWithIndex()` for the global position (one extra lightweight job to
  *     count per-partition sizes — the documented cost of the pattern; the
  *     rows themselves never re-shuffle),
  *  3. `min(position)` per tie group joined back, restoring SQL `rank()`
  *     tie semantics (ties share the lowest position).
  *
  * The `.rdd` hop is deliberate: this is the genuine per-partition
  * imperative case (a global contiguous index) that the Dataset API cannot
  * express without collapsing to one partition.
  */
object Ranking {

  /** Append an IntegerType `rankCol` = SQL `rank()` by `metricCol`
    * descending. */
  def globalRankDesc(df: DataFrame, metricCol: String,
      rankCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(col(metricCol).desc)
    val positioned = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      },
      sorted.schema.add("__pos", LongType))
    val ranks = positioned
      .groupBy(col(metricCol))
      .agg(min(col("__pos")).cast(IntegerType).as(rankCol))
    positioned.drop("__pos")
      .join(ranks, Seq(metricCol))
      .select((df.columns.toIndexedSeq.map(col) :+ col(rankCol)): _*)
  }
}
