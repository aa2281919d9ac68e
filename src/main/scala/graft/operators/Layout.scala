package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout operators: multi-dimensional clustering keys for the
  * write path. At 100 TB the scan you AVOID is the cheapest operator in
  * the engine: parquet prunes partitions and row groups from min/max
  * stats, but stats only help if the layout puts related rows together —
  * a single-column sort gives one dimension locality and destroys the
  * other's. A Z-order (Morton) key interleaves the bits of two bucketized
  * dimensions so that a contiguous key range covers a bounded BOX in
  * (dim1, dim2) space, making BOTH single-dimension and box predicates
  * prunable from one layout (the technique behind clustering keys in
  * modern lakehouse table formats).
  *
  * The key here interleaves at NIBBLE granularity (4 bits at a time, two
  * 8-bit dimensions → one 16-bit key): locality holds at 16-bucket
  * resolution, and the whole key is closed-form integer arithmetic —
  * `(a÷16)·4096 + (b÷16)·256 + (a mod 16)·16 + (b mod 16)` — that both
  * engines floor identically on non-negative operands, so the key (and
  * q141's audit of it) is oracle-exact. Bit-level interleave would need
  * 8 shift/mask terms per dimension for one extra resolution doubling;
  * nibble granularity is where pruning benefit meets expression cost.
  *
  * LayoutSpec proves the pruning claim on real files: documents written
  * `partitionBy(zp)` (the key's high byte) are read back with a 2-D box
  * predicate touching exactly 1 partition and a 1-D band predicate
  * touching ≤16 of 256 — file-count metrics, not plan prose. */
object Layout {
  import Mirror._

  /** Nibble-interleaved Z-order key of two 8-bit bucket dimensions
    * (each must already be clamped to [0, 255]; non-negative required
    * for the div/mod closed form). z = a3 b3 a2 b2 in nibbles, i.e. the
    * high byte `zp = z div 256` fixes (a div 16, b div 16) — a 16×16
    * box of bucket space per partition. */
  def zKey2(a: Column, b: Column): Column =
    intDiv(a, lit(16L)) * 4096L + intDiv(b, lit(16L)) * 256L +
      pmod(a, lit(16L)) * 16L + pmod(b, lit(16L))

  /** DuckDB fragment mirroring [[zKey2]]. */
  def sqlZKey2(a: String, b: String): String =
    s"(($a) // 16) * 4096 + (($b) // 16) * 256 + " +
      s"(($a) % 16) * 16 + (($b) % 16)"

  /** q141's two clustering dimensions over `documents`: the source's
    * hash bucket (domain dimension — equality predicates) and the
    * length bucket (range predicates). Both 8-bit. */
  def docDims: (Column, Column) =
    (pmod(hash60(col("source")), lit(256L)),
      least(intDiv(col("n_chars"), lit(4L)), lit(255L)))

  private val sqlDa = s"${sqlHash60("source")} % 256"
  private val sqlDb = "LEAST(n_chars // 4, 255)"

  /** q141: Z-order layout audit — the write-path planning query run
    * BEFORE clustering a 100 TB table: bucketize the two dimensions,
    * compute the Morton key, and verify per key-partition (the high
    * byte `zp`, i.e. the file/partition a writer would route to) that
    * the layout delivers its promise: every partition covers exactly
    * ONE 16-wide band of each dimension (`da_hi`/`db_hi` constant —
    * emitted as min=max bounds), so any box or band predicate maps to
    * a contiguous, bounded partition set. Also reports row counts per
    * partition — the skew a layout planner must watch, since Z-order
    * trades perfect balance for locality.
    *
    * Shape at scale: one narrow map (hash + integer math) and a tiny
    * rollup — the audit never moves the corpus; the WRITE it plans is
    * one `repartitionByRange(zkey)` pass ([[graft.operators.Layout]]
    * Scaladoc; LayoutSpec materializes it at test scale and proves the
    * box/band pruning with file-count metrics). */
  val q141ZorderLayout = QueryDef(
    "q141_zorder_layout",
    s"""WITH d AS (SELECT $sqlDa AS da, $sqlDb AS db FROM documents),
       |z AS (SELECT da, db, ${sqlZKey2("da", "db")} AS zkey FROM d),
       |p AS (SELECT zkey // 256 AS zp, da, db FROM z)
       |SELECT zp, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(MIN(da) // 16 AS BIGINT) AS da_hi_min,
       |  CAST(MAX(da) // 16 AS BIGINT) AS da_hi_max,
       |  CAST(MIN(db) // 16 AS BIGINT) AS db_hi_min,
       |  CAST(MAX(db) // 16 AS BIGINT) AS db_hi_max
       |FROM p GROUP BY zp
       |ORDER BY zp""".stripMargin) { (spark, dir) =>
    val (da, db) = docDims
    Tables(spark, dir, "documents")
      .select(da.as("da"), db.as("db"))
      .select(col("da"), col("db"), zKey2(col("da"), col("db")).as("zkey"))
      .select(expr("zkey div 256").as("zp"), col("da"), col("db"))
      .groupBy(col("zp"))
      .agg(count(lit(1)).as("n_docs"),
        expr("min(da) div 16").cast(LongType).as("da_hi_min"),
        expr("max(da) div 16").cast(LongType).as("da_hi_max"),
        expr("min(db) div 16").cast(LongType).as("db_hi_min"),
        expr("max(db) div 16").cast(LongType).as("db_hi_max"))
      .orderBy(col("zp"))
  }

  val all: Seq[QueryDef] = Seq(q141ZorderLayout)
}
