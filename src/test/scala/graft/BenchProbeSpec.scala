package graft

import org.scalatest.funsuite.AnyFunSuite

/** The r14 environment probes (Bench.memProbe / Bench.jobProbe) return
  * sane, positive readings — they ship in every capture's calibration
  * metadata, so a broken probe would fail the round's bench artifact. */
class BenchProbeSpec extends AnyFunSuite {
  test("memProbe: positive, sub-minute, repeatable within an order of magnitude") {
    val a = Bench.memProbe()
    val b = Bench.memProbe()
    assert(a > 0.0 && a < 60.0, s"memProbe $a s")
    assert(b / a < 10.0 && a / b < 10.0, s"memProbe unstable: $a vs $b")
  }

  test("jobProbe: positive median latency, well under a second per trivial job") {
    val ms = Bench.jobProbe(TestSpark.spark)
    assert(ms > 0.0 && ms < 1000.0, s"jobProbe $ms ms")
  }

  test("calibrate is linear-ish in steps (probe scale sanity)") {
    val (full, _) = Bench.calibrate()
    val (half, _) = Bench.calibrate(Bench.ProbeSteps)
    assert(half < full, "50M-step probe must be cheaper than the 100M loop")
  }
}
