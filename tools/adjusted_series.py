#!/usr/bin/env python
"""Cross-round control-adjusted bench series (r14 verdict #2).

For each committed capture given on the command line (default: the
r13/r14/r15 local captures), recomputes the pinned-control ratios
(same references as Bench.Controls) and prints raw total, PE,
job-probe, control ratio, and control_adjusted_total_sec — the
mechanical replacement for the manual drift forensics of rounds 10-14.

Keep CONTROLS in sync with Bench.Controls (BenchProbeSpec pins the
Scala side; this is the offline mirror for captures that predate the
in-capture emission).
"""
import json
import sys

CONTROLS = {
    "q143_suffix_ranks": 9.433,
    "q176_top_pc": 2.980,
    "q170_ann_ivfpq": 3.489,
    "q_tpch_09": 1.067,
    "q_tpch_21": 1.221,
}


def median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def main():
    paths = sys.argv[1:] or ["BENCH_r13_local.json", "BENCH_r14_local.json",
                             "BENCH_r15_local.json"]
    print("| capture | raw total (s) | PE | job ms | control ratio "
          "| adjusted (s) | per-control ratios |")
    print("|---|---|---|---|---|---|---|")
    for p in paths:
        try:
            d = json.load(open(p))
        except Exception as e:
            print(f"| {p} | — | — | — | — | — | unreadable: {e} |")
            continue
        qs = d["queries"]
        ratios = {k: qs[k] / ref for k, ref in CONTROLS.items()
                  if k in qs and qs[k] > 0}
        cr = median(ratios.values()) if ratios else 0.0
        adj = d["value"] / cr if cr else 0.0
        cal = d.get("calibration", {})
        per = " ".join(
            f"{(k.split('_')[0] if not k.startswith('q_') else k)}={v:.2f}"
            for k, v in sorted(ratios.items()))
        print(f"| {p} | {d['value']:.1f} | {cal.get('parallel_efficiency', '—')} "
              f"| {cal.get('job_probe_ms', '—')} | {cr:.3f} | {adj:.1f} | {per} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
