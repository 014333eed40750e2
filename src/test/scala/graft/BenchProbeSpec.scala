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

  test("jobWindowDirty: needs BOTH the ratio gate and the absolute excess") {
    // the r14 drift shape: session median 15.4 ms, inflated window 26.9 ms
    // — ratio 1.75 and excess 11.5 ms, exactly what the gate must flag
    assert(Bench.jobWindowDirty(26.9, 15.4))
    // quiet window at the same median
    assert(!Bench.jobWindowDirty(16.0, 15.4))
    // ms-scale jitter: ratio 1.67 but excess 4 ms — NOT dirty (the
    // JobQuietExcessMs floor, the false-dirty guard the verdict asked for)
    assert(!Bench.jobWindowDirty(10.0, 6.0))
    // large absolute excess but ratio under the gate (uniform session
    // load is PE's job, not this gate's)
    assert(!Bench.jobWindowDirty(140.0, 100.0))
  }

  test("controlAdjust: median of observed/reference over the pinned set") {
    // the committed r14 capture's control medians — the adjusted figure
    // this computes is the one SCALING.md's cross-round table reads
    val r14 = Map("q143_suffix_ranks" -> 9.662, "q176_top_pc" -> 3.249,
      "q170_ann_ivfpq" -> 4.171, "q_tpch_09" -> 2.068, "q_tpch_21" -> 1.900)
    val (ratio, ratios) = Bench.controlAdjust(r14)
    assert(ratios.size == 5)
    // median of {1.024, 1.090, 1.195, 1.938, 1.556} = 1.195 (q170)
    assert(math.abs(ratio - 4.171 / 3.489) < 1e-9, s"got $ratio")
    // robust to the two drift-casualty outliers: the median sits on the
    // central control, not the 1.94x q_tpch_09
    assert(ratio < 1.3)
  }

  test("controlAdjust: reference capture maps to ratio 1; empty/failed to 0") {
    val (unit, _) = Bench.controlAdjust(Bench.Controls)
    assert(math.abs(unit - 1.0) < 1e-12)
    val (none, rs) = Bench.controlAdjust(Map("q12_count_distinct" -> 1.0))
    assert(none == 0.0 && rs.isEmpty)
    // failed controls (median -1) are skipped, not ratioed
    val (one, rs1) = Bench.controlAdjust(
      Map("q143_suffix_ranks" -> -1.0, "q176_top_pc" -> 2.980))
    assert(rs1.size == 1 && math.abs(one - 1.0) < 1e-12)
  }
}
