package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract properties of `graft.Bench`'s ONE stdout
  * line (round-17 verdict item 1): the driver keeps only a ~3 KB tail
  * of stdout and json-parses the line out of it, so the line must (a)
  * be valid standalone JSON and (b) stay well under that window — the
  * r14-r17 `"parsed": null` artifacts were the 167-entry per-query map
  * blowing past the tail capture so the line arrived front-truncated.
  * The budget asserted here is < 1 KB at worst-case field widths.
  */
class BenchSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Worst-case-shaped inputs: every registered-suite-sized collection
    * at its maximum width, long query names, negative/failed entries. */
  private def worstCaseLine(): String = {
    val results = (1 to 200).map { i =>
      val name = f"q$i%03d_some_quite_long_query_family_name_here"
      name -> (if (i % 13 == 0) -1.0 else 1234.56789 / i)
    }
    // headline names must resolve for the queries map to be populated
    val withHeadline = results ++
      Bench.headlineNames.map(_ -> 1234.567)
    val outliers = results.take(40).map(_._1) // cap-to-5 is Bench's job
    val segs = Seq.fill(6)("1.234").mkString("[", ",", "]")
    Bench.compactLine(
      withHeadline, iters = 3, floorOutliers = outliers, segsJson = segs,
      artifactsPublished = 123456789L, warmSecsStr = "123.456",
      driftStr = "1.281", outPath = "bench_reading.json",
      sfDir = "/root/testdata/sf0.1")
  }

  test("stdout line is valid standalone JSON (driver json.loads contract)") {
    val line = worstCaseLine()
    val node = mapper.readTree(line)
    assert(node.isObject)
    assert(node.get("metric").asText() == "total")
    assert(node.get("unit").asText() == "sec")
    assert(node.get("value").isNumber)
    assert(node.get("nq").asInt() == 200 + Bench.headlineNames.size)
    assert(node.get("sentinel_drift").isNumber)
    assert(node.get("n_floor_outliers").asInt() == 40)
    assert(node.get("floor_outliers").size() == 5,
      "outlier names on stdout are capped at 5")
    assert(node.get("queries").size() == Bench.headlineNames.size,
      "stdout carries ONLY the fixed headline subset, never the full map")
    assert(node.get("reading").asText() == "bench_reading.json")
  }

  test("stdout line stays under 1 KB at worst-case field widths") {
    val line = worstCaseLine()
    assert(!line.contains('\n'))
    assert(line.length < 1024,
      s"compact line is ${line.length} bytes; the driver tail-captures " +
        "~3 KB and sbt adds its own trailer lines — keep this < 1 KB")
  }

  test("headline subset names are real registered queries") {
    val registered = SparkEntry.queries.keySet
    val missing = Bench.headlineNames.filterNot(registered)
    assert(missing.isEmpty,
      s"headlineNames not in SparkEntry.queries: ${missing.mkString(",")}")
  }
}
