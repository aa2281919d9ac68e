package graft.covid

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (lazy, one JVM-wide instance). */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.instance
}

object SparkTestSession {
  lazy val instance: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
