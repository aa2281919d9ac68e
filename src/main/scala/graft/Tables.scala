package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * Always a plain parquet scan: Catalyst pushes filters/column pruning into
  * the scan, so callers should select/filter on the result rather than
  * pre-materializing. At cluster scale the same call works on a
  * directory-partitioned table unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects natively.
    // Read it as epoch-nanos long, then truncate to micros — exactly what
    // DuckDB (the oracle) does when it reads the same file, so both engines
    // see identical timestamp values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
