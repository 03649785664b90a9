"""Strong-scaling gap attribution via per-phase Amdahl fit (r8 dir. 4).

Every protocol session discloses strong@X raw efficiency well below
the weak column (r7: 0.574-0.683 at X=1M, 4c vs 16c) — the narrative
explanation has always been "fixed driver/job overhead dominates at
small per-core work", but no artifact attributed the gap to measured
serial floor. This tool does the fit:

- run interleaved repeats of (4c@1M, 16c@1M) build legs (bench.py
  --build-only, pinned cpusets, per-leg steal disclosed, same steal
  gate as the protocol sessions);
- take the min leg per config; the build manifest's per-phase timings
  (dedup_assign_ids / tokenize_write_docs / docs_stats /
  write_postings_and_side_tables) ride along in the bench JSON;
- fit T(n) = s + p/n per phase from the two points:
      p = (T_4 - T_16) * 16/3,   s = T_4 - p/4
  (s clamped at >= 0; two points determine the fit exactly, so this
  is attribution, not prediction);
- report per-phase serial seconds, the total serial fraction at 4c,
  the residual (build total minus phase sum = driver-side job gaps:
  scheduling, py4j, plan time), and the fitted-vs-measured strong
  efficiency.

The headline claim stays on the weak column; this artifact makes the
strong gap a measured property (serial floor s) instead of an
asserted one.

Writes BENCH/strong_scaling_attribution_r8.json.

Usage:
    python tools/strong_scaling_attribution.py [--turns 1000000]
        [--repeats 2] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import run_once  # noqa: E402  (gated leg runner)


def amdahl(t4: float, t16: float) -> dict:
    """Two-point fit of T(n) = s + p/n at n=4,16 (exact, 2 unknowns)."""
    p = (t4 - t16) * 16.0 / 3.0
    s = t4 - p / 4.0
    if s < 0:  # super-linear noise on a phase: all-parallel fit
        s, p = 0.0, t4 * 4.0
    return {"serial_sec": round(s, 2), "parallel_sec_total": round(p, 2),
            "serial_frac_at_4c": round(s / t4, 3) if t4 else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "strong_scaling_attribution_r8.json"))
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    runs = {4: [], 16: []}
    for _ in range(args.repeats):  # interleaved: same noise window
        for cores in (4, 16):
            runs[cores].append(run_once(cores, sf_dir, args.turns))
    best = {c: min(rs, key=lambda r: r["queries"]["index_build"])
            for c, rs in runs.items()}

    t4 = best[4]["queries"]["index_build"]
    t16 = best[16]["queries"]["index_build"]
    ph4, ph16 = best[4]["build_phases"], best[16]["build_phases"]
    phases = {}
    serial_total = 0.0
    for name in ph4:
        fit = amdahl(ph4[name], ph16.get(name, 0.0))
        phases[name] = {"sec_4c": ph4[name], "sec_16c": ph16.get(name),
                        **fit}
        serial_total += fit["serial_sec"]
    # residual: driver-side time between phases (job scheduling, py4j
    # round-trips, plan/codegen) — by construction it does not shrink
    # with cores, so it is counted as serial in full
    resid4 = round(t4 - sum(ph4.values()), 2)
    resid16 = round(t16 - sum(ph16.values()), 2)
    serial_total += max(0.0, resid16)

    eff_measured = round(t4 / t16 / 4.0, 3)
    s, p = serial_total, t4 - serial_total
    eff_fitted = round((s + p) / (s + p / 4.0) / 4.0, 3) if t4 else None

    out = {
        "what": "per-phase Amdahl fit of the 4c->16c strong-scaling gap "
                "at X turns (r8 directive 4): serial floor measured, "
                "not asserted",
        "turns": args.turns,
        "build_sec_4c": round(t4, 2),
        "build_sec_16c": round(t16, 2),
        "runs_sec_4c": [round(r["queries"]["index_build"], 2)
                        for r in runs[4]],
        "runs_sec_16c": [round(r["queries"]["index_build"], 2)
                         for r in runs[16]],
        "steal_pct_4c": [r.get("leg_steal_pct") for r in runs[4]],
        "steal_pct_16c": [r.get("leg_steal_pct") for r in runs[16]],
        "gated_attempts": {"4c": [r.get("gated_attempts", [])
                                  for r in runs[4]],
                           "16c": [r.get("gated_attempts", [])
                                   for r in runs[16]]},
        "gate_exhausted": any(r.get("gate_exhausted")
                              for rs in runs.values() for r in rs),
        "phases": phases,
        "residual_sec_4c (outside phases)": resid4,
        "residual_sec_16c (outside phases)": resid16,
        "serial_sec_total (phase fits + 16c residual)": round(
            serial_total, 2),
        "serial_frac_at_4c": round(serial_total / t4, 3),
        "strong_eff_measured (T4/T16/4)": eff_measured,
        "strong_eff_from_fit": eff_fitted,
        "note": "fit from two points is exact per phase; the check is "
                "whether the per-phase serial seconds are PLAUSIBLE "
                "(stage-constant work: parquet commit, driver-side "
                "manifest/marker writes, fixed job count) and whether "
                "the 16c residual (pure driver gaps) carries the rest",
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
