package graft.operators

import graft.covid.SparkTestSession
import graft.functions.{GraftExtensions, UrlCanon, UrlCanonUtil}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization ([[graft.functions.UrlCanon]]) + the q159/q160
  * web-corpus stage-0 queries: adversarial inputs pin each documented
  * rule, idempotence holds over the full adversarial set, the SQL
  * registration works, and the executed plans carry the promised 100 TB
  * shape (join-free; canonicalization inside whole-stage codegen). */
class WebCorpusSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def canon(s: String): String = UrlCanonUtil.canonString(s)

  test("each canonicalization rule, pinned adversarially") {
    // fragment dropped
    assert(canon("https://Ex.com/a#sec") == "https://ex.com/a")
    // scheme + host lowercased; path case PRESERVED
    assert(canon("HTTPS://WWW.Ex.COM/Ab/C") == "https://ex.com/Ab/C")
    // userinfo dropped (with port and uppercase host behind it)
    assert(canon("http://user:pw@H.com:8080/x") == "http://h.com:8080/x")
    // userinfo ends at the LAST '@' (RFC 3986: '@' is legal inside
    // userinfo) — a first-'@' strip would leave '@'s in the host and
    // break idempotence (fuzzer-found)
    assert(canon("https://u@v@H.com/x") == "https://h.com/x")
    // ALL leading www. repetitions stripped (idempotence)
    assert(canon("https://www.www.h.com/a") == "https://h.com/a")
    // scheme-default ports dropped...
    assert(canon("http://h.com:80/a") == "http://h.com/a")
    assert(canon("https://h.com:443/a") == "https://h.com/a")
    // ...but only for the MATCHING scheme, and non-defaults survive
    assert(canon("http://h.com:443/a") == "http://h.com:443/a")
    assert(canon("https://h.com:80/a") == "https://h.com:80/a")
    assert(canon("ftp://h.com:21/a") == "ftp://h.com:21/a")
    // trailing slashes collapse; bare authority gets '/'
    assert(canon("https://h.com/a///") == "https://h.com/a")
    assert(canon("https://h.com") == "https://h.com/")
    assert(canon("https://h.com///") == "https://h.com/")
    // empty path + query keeps the query on '/'
    assert(canon("https://h.com?id=1") == "https://h.com/?id=1")
    // utm_* params dropped wherever they sit; order of the rest preserved
    assert(canon("https://h.com/p?utm_source=x&id=2&utm_b=3&z=4")
      == "https://h.com/p?id=2&z=4")
    assert(canon("https://h.com/p?utm_medium=a") == "https://h.com/p")
    // a parameter merely CONTAINING 'utm_' is kept
    assert(canon("https://h.com/p?xutm_a=1") == "https://h.com/p?xutm_a=1")
    // %-escapes pass through byte-for-byte (no decode, no re-case)
    assert(canon("https://h.com/p%20q/%2fz") == "https://h.com/p%20q/%2fz")
    // unparseable input: unchanged, empty host, never a throw
    Seq("not a url", "http//h.com", "://h.com", "1http://h.com", "")
      .foreach { bad =>
        assert(canon(bad) == bad, s"'$bad' must pass through")
        assert(UrlCanonUtil.hostString(bad) == "")
      }
    assert(UrlCanonUtil.hostString("HTTP://User@WWW.H.com:80/x") == "h.com")
  }

  test("canonicalization is idempotent over the adversarial set") {
    val urls = Seq(
      "https://Ex.com/a#sec", "HTTPS://WWW.Ex.COM/Ab/C",
      "http://user:pw@H.com:8080/x", "https://www.www.h.com/a",
      "http://h.com:80/a", "https://h.com:443/a", "http://h.com:443/a",
      "https://h.com/a///", "https://h.com", "https://h.com?id=1",
      "https://h.com/p?utm_source=x&id=2&utm_b=3&z=4",
      "https://h.com/p?utm_medium=a", "https://h.com/p%20q/%2fz",
      "not a url", "")
    urls.foreach { u =>
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent on '$u' -> '$once'")
    }
  }

  test("url_canon/url_host are SQL-callable; null-safe; type-checked") {
    GraftExtensions.registerInto(spark)
    val r = spark.sql(
      "SELECT url_canon('HTTP://WWW.H.com:80/a/?utm_medium=x#f') AS c, " +
        "url_host('HTTP://WWW.H.com:80/a/') AS h").collect().head
    assert(r.getString(0) == "http://h.com/a")
    assert(r.getString(1) == "h.com")
    val n = Seq[Option[String]](None).toDF("u")
      .select(UrlCanon.canon(col("u")), UrlCanon.host(col("u"))).collect()
    assert(n.head.isNullAt(0) && n.head.isNullAt(1))
    val e = intercept[Exception](
      spark.sql("SELECT url_canon(42)").collect())
    assert(e.getMessage.contains("string"),
      s"expected a type error, got: ${e.getMessage}")
  }

  test("q159: every raw URL is distinct, collapse is 16:1 per canonical " +
    "URL, and totals cover the corpus exactly once") {
    val rows = WebCorpus.q159UrlCanon.fn(spark, sfDir).collect()
    val nDocs = graft.Tables(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // the generator's four decoration bits guarantee 16 distinct raw
    // variants per content key, all collapsing to one canonical URL
    assert(rows.map(_.getAs[Long]("n_raw_urls")).sum == nDocs)
    // doc_ids are 0..n-1, so content keys (doc_id div 16) number
    // ceil(n/16) — collapse means EXACTLY one canonical URL per key
    val urls = rows.map(_.getAs[Long]("n_urls")).sum
    assert(urls == (nDocs + 15) / 16,
      s"expected ceil($nDocs/16) canonical URLs, got $urls")
  }

  test("q160: the cap bites, attrition balances, kept docs are the " +
    "longest per host") {
    val rows = WebCorpus.q160HostCap.fn(spark, sfDir).collect()
    rows.foreach { r =>
      val (n, kept, dropped) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))
      assert(kept == math.min(n, WebCorpus.HostCapK.toLong))
      assert(kept + dropped == n)
      // ranking is by n_chars DESC: mean kept chars >= mean dropped chars
      if (dropped > 0) {
        val ck = r.getAs[Long]("chars_kept")
        val cd = r.getAs[Long]("chars_dropped")
        assert(ck * dropped >= cd * kept,
          s"host ${r.getString(0)}: kept docs must be the longest")
      }
    }
    assert(rows.exists(_.getAs[Long]("n_dropped") > 0), "cap must bite")
  }

  test("q165: exactly one survivor per canonical URL; canonical dedup " +
    "strictly beats raw-URL dedup (the 16 cosmetic variants collapse)") {
    val rows = WebCorpus.q165UrlDedup.fn(spark, sfDir).collect()
    val docs = graft.Tables(spark, sfDir, "documents")
    val canon = WebCorpus.canonicalized(docs)
    val nDocs = docs.count()
    val nUrls = canon.select(col("url")).distinct().count()
    val nRaw = canon.select(col("raw_url")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("n_kept")).sum == nUrls,
      "survivor count must equal the distinct canonical-URL count")
    // raw-URL dedup would keep every cosmetic variant: strictly weaker
    assert(nUrls < nRaw,
      s"canonical dedup must collapse variants ($nUrls vs $nRaw raw)")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_docs"))
    }
  }

  test("plans: q159/q160 are join-free; url_canon sits inside " +
    "whole-stage codegen; q160 pays ONE corpus exchange (window and " +
    "rollup share the host partitioning)") {
    Seq(WebCorpus.q159UrlCanon, WebCorpus.q160HostCap).foreach { q =>
      val df = q.fn(spark, sfDir)
      df.collect() // finalize the adaptive plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("Join"), s"${q.name}: join-free expected\n$plan")
      assert(plan.contains("url_canon") || plan.contains("url_host"),
        s"${q.name}: native canonicalizer expected in the plan\n$plan")
      // canonicalization must not break codegen: the scan-side stage that
      // evaluates url_canon is a WholeStageCodegen span
      assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined,
        s"${q.name}: no codegen stage\n$plan")
    }
    val df160 = WebCorpus.q160HostCap.fn(spark, sfDir)
    df160.collect()
    val p160 = df160.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p160).length
    assert(hashEx == 1,
      s"q160: window + rollup must share one host exchange, got $hashEx\n" +
        p160)
  }

  test("percent-encoding normalization (RFC 3986 §6.2.2, opt-in): each " +
    "rule class, pinned adversarially") {
    import graft.functions.UrlCanonUtil.{canonString, pctNormalize}
    def pct(s: String) = canonString(s, pctNorm = true)
    // unreserved escapes decode, either hex case
    assert(pct("http://h.com/%7euser") == "http://h.com/~user")
    assert(pct("http://h.com/%7Euser") == "http://h.com/~user")
    assert(pct("http://h.com/a%41%62c") == "http://h.com/aAbc")
    // reserved escapes NEVER decode (decoding %2F would change which
    // resource is named) — hex uppercases only
    assert(pct("http://h.com/a%2fb") == "http://h.com/a%2Fb")
    assert(pct("http://h.com/a%2Fb") == "http://h.com/a%2Fb")
    assert(pct("http://h.com/p%20q") == "http://h.com/p%20q")
    // %25 ('%' itself) must not decode — that's the idempotence trap
    assert(pct("http://h.com/x%2541") == "http://h.com/x%2541")
    // malformed escapes pass through byte-for-byte
    assert(pct("http://h.com/a%g7") == "http://h.com/a%g7")
    assert(pct("http://h.com/a%") == "http://h.com/a%")
    assert(pct("http://h.com/a%2") == "http://h.com/a%2")
    // query side normalizes too, after utm filtering
    assert(pct("http://h.com/p?id=%6a&utm_source=%7e")
      == "http://h.com/p?id=j")
    // composes with the base rules (www strip, trailing slash, case)
    assert(pct("http://WWW.H.com/%7e/") == "http://h.com/~")
    // the default form leaves escapes byte-for-byte (opt-in means OPT-IN)
    assert(canonString("http://h.com/%7euser") == "http://h.com/%7euser")
    // raw normalizer on a non-URL string: same rules, no parse needed
    assert(pctNormalize("%7e%2f%g7%") == "~%2F%g7%")
  }
}
