#!/usr/bin/env python
"""One-command sf0.1 gate run -> SF01_r{N}.json (r13 verdict #4).

SF01_GATES.md was one-shot prose evidence; this makes the scale-sensitive
subset a per-round recorded artifact like CORRECTNESS_rN: it runs
graft.Verify over the 20-gate subset at sf0.1, compares each result
against its DuckDB oracle with the same bounded checker the prose run
used (check_oracles_sf01.check_one), and writes SF01_r{N}.json with
per-gate status/rows/oracle seconds.

Usage: python tools/run_sf01_gates.py ROUND [SF_DIR [OUT_DIR]]
  ROUND    round number N -> writes SF01_r{N:02d}.json in the repo root
  SF_DIR   default /root/testdata/sf0.1
  OUT_DIR  Verify dump dir, default /tmp/verify_sf01_r{N}

Exit 0 iff every gate is green (the JSON records rc either way).
"""
import json
import os
import subprocess
import sys
import time

from check_oracles_sf01 import check_one

# The scale-sensitive subset (SF01_GATES.md): families whose PHYSICAL
# plans change with scale — AQE strategy flips, byte gates crossing
# thresholds, different candidate volumes.
GATES = [
    "q44_dedup_minhash_lsh", "q44b_dedup_minhash_shuffle",
    "q194_dedup_minhash_scaled",
    "q66_dedup_clusters", "q66b_dedup_clusters_dist",
    "q81_dedup_incremental", "q81b_dedup_incremental_semi",
    "q139_cjk_neardup",
    "q143_suffix_ranks", "q144_lcp_repeats",
    "q114_pagerank", "q124_label_prop",
    "q170_ann_ivfpq", "q170b_ann_ivfpq_shuffle",
    "q173_semantic_decontam", "q173b_semantic_decontam_shuffle",
    "q174_leakage_safe_split", "q193_dedup_transitivity",
    "q196_winnow_neardup", "q199_dedup_minhash_tokens",
    # r14 verdict #4: the profile decision is scale-sensitive by
    # construction (gram-universe coverage changes with the corpus); the
    # probe itself is bounded (2048 docs), so the gate costs ~nothing.
    "q202_dedup_profile",
    # r15 verdict #4 (added r16): the auto-built incremental index — the
    # probe decision AND the q81-shape incremental chain both flex with
    # scale, and the oracle's token chain is cheap next to q44's.
    "q205_dedup_index_auto",
]


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/verify_sf01_r{rnd}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    t0 = time.time()
    env = dict(os.environ, SPARK_GRAFT_ONLY=",".join(GATES))
    rc = subprocess.call(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        cwd=repo, env=env)
    verify_sec = round(time.time() - t0, 1)
    if rc != 0:
        print(f"[sf01] Verify failed rc={rc}", flush=True)

    gates, n_ok = {}, 0
    for name in GATES:
        r = check_one(name, sf_dir, out_dir)
        gates[name] = r
        n_ok += r["status"] == "ok"
        print(f"[sf01] {r['status']:4s} {name} ({r.get('rows', '?')} rows, "
              f"oracle {r.get('oracle_sec', '?')}s)", flush=True)

    artifact = {
        "n": rnd,
        "sf": sf_dir,
        "rc": 0 if (n_ok == len(GATES) and rc == 0) else 1,
        "passed": n_ok,
        "total": len(GATES),
        "verify_sec": verify_sec,
        "generated_by": f"python tools/run_sf01_gates.py {rnd}",
        "gates": gates,
    }
    path = os.path.join(repo, f"SF01_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[sf01] {n_ok}/{len(GATES)} green -> {path}", flush=True)
    return artifact["rc"]


if __name__ == "__main__":
    sys.exit(main())
