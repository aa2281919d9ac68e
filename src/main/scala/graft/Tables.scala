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

  /** Exact row count of `dir/name.parquet` from parquet FOOTER metadata —
    * the sizing path for model hyperparameters (q73/q81's corpus-scaled
    * quantizer K). A `df.count()` here would launch an extra full-corpus
    * job per invocation just to pick K; footers already carry the exact
    * row count, so this reads O(files) footers instead of O(rows) data.
    * Up to `distributeAbove` files the footers are read on the driver
    * (zero Spark jobs — the common case: one sizing call, few files); a
    * larger table fans the footer reads out as one tiny Spark job over
    * the file list (100 TB ≈ 10⁵ files — not a driver-side loop). */
  def metaCount(spark: SparkSession, dir: String, name: String,
      distributeAbove: Int = 64): Long = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir, s"$name.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val files: Seq[String] =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }.map(_.getPath.toString).toSeq
      else Seq(p.toString)
    if (files.length <= distributeAbove) files.map(footerRowCount).sum
    else
      spark.sparkContext
        .parallelize(files, math.max(1, files.length / 32))
        .map(footerRowCount).sum().toLong
  }

  /** Row count from one parquet footer. Runs driver- or executor-side;
    * builds a default Hadoop `Configuration` (fs.defaultFS etc. come from
    * core-site.xml on the executor classpath in a real deployment). */
  private def footerRowCount(file: String): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = new org.apache.hadoop.conf.Configuration()
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try r.getRecordCount finally r.close()
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The driver has generated events.ts under three parquet annotations
    // across rounds: TIMESTAMP(NANOS) (Spark rejects natively — read as
    // epoch-nanos long and truncate to micros), TIMESTAMP_LTZ (passes
    // through), and TIMESTAMP_NTZ(micros) (isAdjustedToUTC=false, which
    // Spark 4 loads as TimestampNTZType). Normalize every shape to
    // session-TZ TIMESTAMP here so downstream code (`unix_micros`,
    // window(), Row.getTimestamp) sees one type. The session timezone is
    // pinned UTC, so the NTZ→LTZ cast is value-preserving and matches what
    // DuckDB (the oracle) reads from the same file.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
}
