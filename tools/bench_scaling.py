"""Two-parallelism scaling run (north rule: ≥0.8 efficiency N→4N).

No real cluster exists in this sandbox, so the two "cluster sizes" are
two local parallelism levels on the same input: local[8] vs local[32]
(N and 4N cores), each a fresh subprocess running ``bench.py
--build-only``. Writes BENCH/BASELINE.md with throughput at both levels
and the scaling efficiency  eff = (T_N / T_4N) / 4.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--cores", str(cores), "--sf-dir", sf_dir, "--build-only"],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo, hi = 8, 32
    r_lo = run(lo, sf_dir)
    r_hi = run(hi, sf_dir)
    t_lo = r_lo["queries"]["index_build"]
    t_hi = r_hi["queries"]["index_build"]
    speedup = t_lo / t_hi
    eff = speedup / (hi / lo)
    result = {
        "sf_dir": sf_dir,
        "n_turns": r_lo["n_turns"],
        f"build_sec_local[{lo}]": round(t_lo, 2),
        f"build_sec_local[{hi}]": round(t_hi, 2),
        f"turns_per_sec_local[{lo}]": r_lo["build_turns_per_sec"],
        f"turns_per_sec_local[{hi}]": r_hi["build_turns_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as f:
        f.write("# BENCH baseline — konlspark\n\n")
        f.write("## Scaling-efficiency evidence (north rule: ≥0.8, N→4N)\n\n")
        f.write("No real cluster in this sandbox; the two cluster sizes are "
                "two local parallelism levels on the same input "
                f"(`local[{lo}]` vs `local[{hi}]`), fresh JVM each.\n\n")
        f.write("| metric | value |\n|---|---|\n")
        for k, v in result.items():
            f.write(f"| {k} | {v} |\n")
        f.write(f"\nefficiency = (T_{lo} / T_{hi}) / ({hi}/{lo}) "
                f"= {result['scaling_efficiency']}\n")
        f.write("\n## Reference baseline (BASELINE.md)\n\n")
        f.write("Reference indexes ~1.4M Korean wiki titles in ~280 s "
                "(~5,000 docs/s, single process, Apple M1 Max).\n")
        f.write(f"This engine at sf_dir={sf_dir}: "
                f"{r_hi['build_turns_per_sec']} turns/s build throughput at "
                f"local[{hi}] (includes full block compression + BM25 "
                "metadata the reference does not compute).\n")


if __name__ == "__main__":
    main()
