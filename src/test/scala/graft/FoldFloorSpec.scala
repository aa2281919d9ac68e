package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-floor fold tool's tamper-proofness (round-16 verdict
  * item 1). `tools/fold_floor.py --selftest` proves, among other cases,
  * that min-merging a DEGRADED reading leaves the committed floor file
  * byte-identical — the property that makes the rounds-14/15/16
  * snapshot-overwrite footgun structurally impossible now that
  * `graft.Bench` writes raw readings to `bench_reading.json` and only
  * the fold tool touches `bench_result.json`.
  */
class FoldFloorSpec extends AnyFunSuite {

  test("fold_floor.py selftest passes (degraded fold is a byte-identical no-op)") {
    val script = new java.io.File("tools/fold_floor.py")
    assume(script.isFile, "tools/fold_floor.py not found from test cwd")
    import scala.sys.process._
    val out = new StringBuilder
    val rc = Process(Seq("python3", script.getPath, "--selftest"))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    assert(rc == 0, s"selftest failed:\n$out")
    assert(out.toString.contains("fold_floor selftest: OK"))
  }

  test("Bench raw output path is decoupled from the committed floor") {
    // the floor-overwrite footgun regresses if Bench's default outPath
    // ever points back at bench_result.json
    val text = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/main/scala/graft/Bench.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(text.contains(
      """sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_reading.json")"""),
      "Bench must default its raw reading to bench_reading.json")
  }
}
