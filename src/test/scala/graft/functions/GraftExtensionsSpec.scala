package graft.functions

import graft.covid.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The registered SQL functions must resolve and agree with the declarative
  * specs. Uses registerInto on the shared session — the extension class
  * itself only runs at session build, and the suite-wide session may
  * already exist. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestSession {

  test("float_dot and md5_hash60 are callable from SQL") {
    GraftExtensions.registerInto(spark)
    val rows = spark.sql(
      """SELECT
        |  float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |  md5_hash60('hello') AS h1,
        |  md5_hash60b('hello') AS h2""".stripMargin).collect()
    assert(rows.head.getDouble(0) == 11.0)
    // cross-check against the declarative specs
    import org.apache.spark.sql.functions._
    import graft.operators.Mirror
    val spec = spark.range(1).select(
      Mirror.hash60Spec(lit("hello")).as("h1"),
      Mirror.hash60bSpec(lit("hello")).as("h2")).collect().head
    assert(rows.head.getLong(1) == spec.getLong(0))
    assert(rows.head.getLong(2) == spec.getLong(1))
  }

  test("shingles3_gen and simhash60 are callable from SQL") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT shingles3_gen('a b c d') AS sh, simhash60('a b c d') AS sim")
      .collect().head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    // signature equals the Column-API expression on the same input
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1)
      .select(SimHash60(lit("a b c d"))).collect().head.getLong(0)
    assert(r.getLong(1) == viaCol)
  }

  test("phash16 is callable from SQL and equals the Column-API expression") {
    GraftExtensions.registerInto(spark)
    val t = "zzzzaaaa" * 8
    val r = spark.sql(s"SELECT phash16('$t') AS p").collect().head
    import org.apache.spark.sql.functions._
    val viaCol = spark.range(1)
      .select(Phash16(lit(t))).collect().head.getLong(0)
    assert(r.getLong(0) == viaCol)
  }

  test("bigrams_gen is callable from SQL and a text pipeline runs in pure SQL") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql("SELECT bigrams_gen('a b c') AS bg").collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    // full SQL-surface parity: the same fingerprint/signature pipeline a
    // DataFrame user writes, expressed as plain SQL over a temp view
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("documents_sqltest")
    val viaSql = spark.sql(
      """SELECT doc_id, md5_hash60(text) AS fp,
        |  size(shingles3_gen(text)) AS n_sh, size(bigrams_gen(text)) AS n_bg,
        |  simhash60(text) AS sim
        |FROM documents_sqltest ORDER BY doc_id LIMIT 50""".stripMargin)
      .collect()
    import org.apache.spark.sql.functions._
    val viaCol = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), Md5Hash60.front(col("text")).as("fp"),
        size(ShingleGen(col("text"))).as("n_sh"),
        size(BigramGen(col("text"))).as("n_bg"),
        SimHash60(col("text")).as("sim"))
      .orderBy(col("doc_id")).limit(50).collect()
    assert(viaSql.map(_.toSeq).toSeq == viaCol.map(_.toSeq).toSeq)
  }

  test("url_canon / url_canon_pct / url_host are callable from SQL and " +
    "agree with the Column API") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT url_canon('http://WWW.H.com:80/%7eu/?utm_source=x&id=1#f')," +
        " url_canon_pct('http://h.com/%7eu/a%2fb?id=%6a')," +
        " url_host('https://u@www.www.H7.example.com/x')").collect().head
    assert(r.getString(0) == "http://h.com/%7eu?id=1")
    assert(r.getString(1) == "http://h.com/~u/a%2Fb?id=j")
    assert(r.getString(2) == "h7.example.com")
    // type-checked: a non-string argument is an analysis error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT url_canon_pct(42)").collect()
    }
    assert(e.getMessage.contains("url_canon_pct"))
  }

  test("wrong argument types fail at analysis, not execution") {
    GraftExtensions.registerInto(spark)
    // array<double> would silently getFloat() 8-byte-packed data — must be
    // an analysis error now that the functions are SQL-exposed
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT float_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .collect()
    }
    assert(e1.getMessage.contains("float_dot"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_hash60(42)").collect()
    }
    assert(e2.getMessage.contains("md5_hash60"))
  }
}
