package graft.operators

import graft.covid.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout ([[Layout]]): the key's box-locality arithmetic, and
  * the claim that actually matters at 100 TB — a 2-D box predicate over
  * a z-partitioned table READS ONE PARTITION, and a 1-D band reads ≤16
  * of 256, measured in scanned-file counts on real parquet, not plan
  * prose. */
class LayoutSpec extends AnyFunSuite with SparkTestSession {

  private val sfDir = "/root/testdata/sf0.001"

  private def zTable: DataFrame = {
    val (da, db) = Layout.docDims
    graft.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), da.as("da"), db.as("db"))
      .select(col("doc_id"), col("da"), col("db"),
        Layout.zKey2(col("da"), col("db")).as("zkey"))
      .withColumn("zp", expr("zkey div 256"))
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f.metrics("numFiles").value }
      .sum
  }

  test("zKey2: the key is a bijection of the nibble pairs and zp fixes " +
    "a 16x16 box of (da, db) space") {
    val rows = zTable.collect()
    rows.foreach { r =>
      val (a, b, z) = (r.getAs[Long]("da"), r.getAs[Long]("db"),
        r.getAs[Long]("zkey"))
      assert(z == (a / 16) * 4096 + (b / 16) * 256 + (a % 16) * 16 + b % 16)
      assert(r.getAs[Long]("zp") == (a / 16) * 16 + b / 16)
    }
    // q141's audit says the same thing from the rollup side
    Layout.q141ZorderLayout.fn(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("da_hi_min") == r.getAs[Long]("da_hi_max"))
      assert(r.getAs[Long]("db_hi_min") == r.getAs[Long]("db_hi_max"))
      assert(r.getAs[Long]("zp") ==
        r.getAs[Long]("da_hi_min") * 16 + r.getAs[Long]("db_hi_min"))
    }
  }

  test("a z-partitioned table prunes a 2-D box predicate to ONE " +
    "partition and a 1-D band to its 16, by scanned-file count") {
    val dir = java.nio.file.Files.createTempDirectory("zlay").toString
    zTable.write.mode("overwrite").partitionBy("zp").parquet(dir)
    val t = spark.read.parquet(dir)
    val total = scannedFiles(t.select(col("doc_id")))
    val nParts = t.select(col("zp")).distinct().count()
    assert(nParts > 16, s"fixture needs >16 partitions, got $nParts")

    // pick a populated box: a (da_hi, db_hi) cell with rows
    val probe = zTable.groupBy(col("zp")).count()
      .orderBy(col("count").desc).limit(1).collect()(0)
    val zp = probe.getAs[Long]("zp")
    val (daHi, dbHi) = (zp / 16, zp % 16)

    // box predicate (da in one 16-band AND db in one 16-band): the
    // z-mapping routes it to exactly one partition
    val box = t.filter(col("zp") === lit(daHi * 16 + dbHi))
    val boxFiles = scannedFiles(box)
    assert(boxFiles < total, s"box must prune: $boxFiles vs $total")
    // exactly the files physically inside that one partition directory
    val onDisk = new java.io.File(s"$dir/zp=$zp")
      .listFiles().count(_.getName.endsWith(".parquet")).toLong
    assert(boxFiles == onDisk, "box reads exactly its partition's files")
    // and the pruned read returns the same rows as a full-scan filter
    assert(box.count() ==
      zTable.filter(col("da") >= daHi * 16 && col("da") < daHi * 16 + 16
        && col("db") >= dbHi * 16 && col("db") < dbHi * 16 + 16).count())

    // 1-D band on the FIRST dimension: its 16 boxes are contiguous in
    // zp ([daHi*16, daHi*16+15]) — still a pruned range scan
    val band = t.filter(col("zp") >= daHi * 16 && col("zp") < (daHi + 1) * 16)
    val bandFiles = scannedFiles(band)
    assert(bandFiles < total, s"band must prune: $bandFiles vs $total")
    assert(band.count() ==
      zTable.filter(col("da") >= daHi * 16 && col("da") < daHi * 16 + 16)
        .count())
  }
}
