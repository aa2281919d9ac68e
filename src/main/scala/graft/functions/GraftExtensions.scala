package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the native expressions as SQL functions:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   // or .withExtensions(new GraftExtensions)
  * spark.sql("SELECT float_dot(a, b), md5_hash60(s) FROM t")
  * }}}
  *
  * The Column API ([[FloatVector]], [[Md5Hash60]]) needs no registration;
  * this makes the same expressions reachable from pure SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator extension: the native per-key top-k planner strategy
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // optimizer rule: auto-rewrite row_number<=k window filters into it
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {

  private def checkArity(name: String, expected: Int,
      children: Seq[Expression]): Unit =
    if (children.size != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> expected.toString,
          "actualNum" -> children.size.toString,
          "docroot" -> ""))

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "4.0.0", "", "built-in")

  /** The registration triples, shared by the extension (session build time)
    * and [[registerInto]] (existing session). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      info("float_dot",
        "float_dot(a, b) - dot product of two float arrays in double, " +
          "index order; null for ragged inputs"),
      (children: Seq[Expression]) => {
        checkArity("float_dot", 2, children)
        FloatDotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("md5_hash60"),
      info("md5_hash60",
        "md5_hash60(s) - first 15 md5 hex chars of s as a 60-bit bigint"),
      (children: Seq[Expression]) => {
        checkArity("md5_hash60", 1, children)
        Md5Hash60(children.head, front = true)
      }),
    (FunctionIdentifier("md5_hash60b"),
      info("md5_hash60b",
        "md5_hash60b(s) - md5 hex chars 16..30 of s as a 60-bit bigint"),
      (children: Seq[Expression]) => {
        checkArity("md5_hash60b", 1, children)
        Md5Hash60(children.head, front = false)
      }),
    (FunctionIdentifier("shingles3_gen"),
      info("shingles3_gen",
        "shingles3_gen(text) - all 3-word shingles of text in order, " +
          "duplicates kept; shorter texts yield [text]"),
      (children: Seq[Expression]) => {
        checkArity("shingles3_gen", 1, children)
        ShingleGen(children.head)
      }),
    (FunctionIdentifier("simhash60"),
      info("simhash60",
        "simhash60(text) - 60-bit frequency-weighted simhash over " +
          "whitespace words (md5-derived word hashes)"),
      (children: Seq[Expression]) => {
        checkArity("simhash60", 1, children)
        SimHash60(children.head)
      }),
    (FunctionIdentifier("bigrams_gen"),
      info("bigrams_gen",
        "bigrams_gen(text) - all word bigrams of text in order, " +
          "duplicates kept; texts under 2 words yield []"),
      (children: Seq[Expression]) => {
        checkArity("bigrams_gen", 1, children)
        BigramGen(children.head)
      }),
    (FunctionIdentifier("phash16"),
      info("phash16",
        "phash16(text) - 16-bit block-mean perceptual hash over the " +
          "payload bytes (bit j set iff block j's mean > payload mean)"),
      (children: Seq[Expression]) => {
        checkArity("phash16", 1, children)
        Phash16(children.head)
      }),
    (FunctionIdentifier("pairs_gen"),
      info("pairs_gen",
        "pairs_gen(arr) - all index-ordered pairs (i < j) of arr as " +
          "(a, b) structs; n*(n-1)/2 rows, any element type"),
      (children: Seq[Expression]) => {
        checkArity("pairs_gen", 1, children)
        PairGen(children.head)
      }),
    (FunctionIdentifier("url_canon"),
      info("url_canon",
        "url_canon(s) - canonical URL: fragment/userinfo dropped, " +
          "scheme+host lowercased, www. stripped, default port dropped, " +
          "trailing path slashes stripped, utm_* params removed; " +
          "unparseable input returned unchanged"),
      (children: Seq[Expression]) => {
        checkArity("url_canon", 1, children)
        UrlCanon(children.head, hostOnly = false)
      }),
    (FunctionIdentifier("url_canon_pct"),
      info("url_canon_pct",
        "url_canon_pct(s) - url_canon plus RFC 3986 6.2.2 " +
          "percent-encoding normalization over path and query: escape " +
          "hex digits uppercased, escapes of unreserved characters " +
          "decoded; malformed escapes pass through"),
      (children: Seq[Expression]) => {
        checkArity("url_canon_pct", 1, children)
        UrlCanon(children.head, hostOnly = false, pctNorm = true)
      }),
    (FunctionIdentifier("url_host"),
      info("url_host",
        "url_host(s) - canonical host of a URL (lowercase, www. " +
          "stripped); '' for unparseable input"),
      (children: Seq[Expression]) => {
        checkArity("url_host", 1, children)
        UrlCanon(children.head, hostOnly = true)
      }),
    (FunctionIdentifier("multi_match"),
      info("multi_match",
        "multi_match(text, array('p1', ...)) - per-pattern leftmost " +
          "non-overlapping occurrence counts (the replace count) via one " +
          "Aho-Corasick pass; the pattern array must be foldable"),
      (children: Seq[Expression]) => {
        checkArity("multi_match", 2, children)
        val patsExpr = children(1)
        if (!patsExpr.foldable) throw new org.apache.spark.sql
          .AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" ->
            "multi_match: the pattern array must be a foldable literal"))
        def bad(what: String) = new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" -> s"multi_match: $what"))
        patsExpr.dataType match {
          case org.apache.spark.sql.types
            .ArrayType(org.apache.spark.sql.types.StringType, _) => ()
          case other => throw bad(
            "the pattern array must be ARRAY<STRING>, got " + other.sql)
        }
        val arr = patsExpr.eval().asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        if (arr == null) throw bad("the pattern array must not be null")
        val pats = (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) throw bad(s"null pattern at index $i")
          arr.getUTF8String(i).toString
        }
        MultiMatch(children.head, pats)
      }))

  /** Register into an already-built session (the extension path only runs
    * at session construction). */
  def registerInto(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
