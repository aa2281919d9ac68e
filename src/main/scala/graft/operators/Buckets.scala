package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded bucket-local candidate-pair generation shared by the LSH-style
  * dedup paths (q19 minhash bands, q21 simhash blocks, q37 shingle posting
  * lists).
  *
  * Why a cap: pair expansion inside a bucket is O(b²). A degenerate hot
  * bucket — boilerplate documents sharing a band hash, or a stopword-like
  * shingle within a block — turns one task into a b² explosion. Capping the
  * per-bucket id list at [[MaxBucket]] bounds every task at
  * O(MaxBucket²) ≈ 5k pairs regardless of input skew. The cap is
  * deterministic (first `MaxBucket` ids in sorted order), so it is
  * oracle-expressible: the DuckDB mirror keeps rows with
  * `row_number() OVER (PARTITION BY bucket ORDER BY id) <= MaxBucket`,
  * which selects exactly the same ids.
  *
  * A bucket wide enough to hit the cap is, for near-dup purposes, a cluster
  * of mutual duplicates — dropping the tail loses (dup,dup) pairs a
  * transitive-closure step downstream recovers from the surviving 100.
  * The production alternative for q37-style posting lists is a
  * document-frequency cut (drop shingles appearing in > MaxBucket docs
  * entirely — they carry no discriminative signal); the cap keeps partial
  * signal instead and stays bit-mirrorable.
  *
  * Dropped-id volume is observable without an extra job via
  * `Dataset.observe` — listen for the `<metricName>` observation
  * (`dropped_ids` column) on a `QueryExecutionListener`.
  */
object Buckets {

  /** Per-bucket candidate-list width bound (README §perf prescribes O(100)
    * buckets; this enforces it). */
  val MaxBucket = 100

  /** Unordered candidate pairs `(p.a, p.b)` per bucket, bucket width capped
    * at [[MaxBucket]].
    *
    * @param df       input with one row per (bucket, item)
    * @param keys     bucket key column names
    * @param item     item column name (any orderable type; structs sort by
    *                 leading field — put the unique id first)
    * @param metricName unique-per-query name for the drop-count observation
    * @param distinctItems true when `df` may repeat (bucket, item) rows
    *                      (collect_set instead of collect_list)
    */
  def cappedPairs(df: DataFrame, keys: Seq[String], item: String,
      metricName: String, distinctItems: Boolean = false): DataFrame = {
    val gather =
      if (distinctItems) collect_set(col(item)) else collect_list(col(item))
    df.groupBy(keys.map(col): _*)
      .agg(sort_array(gather).as("all_items"))
      // the collect buffer is ids-only (8–16 B/row) so a hot bucket costs
      // MBs of sort-spillable state, not the b² pair blowup the cap removes
      .withColumn("n_dropped",
        greatest(size(col("all_items")) - lit(MaxBucket), lit(0)))
      .observe(metricName, sum(col("n_dropped")).as("dropped_ids"))
      .select(explode(Mirror.pairs(slice(col("all_items"), 1, MaxBucket)))
        .as("p"))
  }
}
