"""Quiet-band launch probe (r6/r7 scaling protocol).

One RAW (ungated, single-shot) 16c@4M build leg with pinned-cpuset
steal measurement, appended to BENCH/probe_log_r8.jsonl. The session
launch rule (declared in BENCH/BASELINE.md): launch only when the
probe lands <= 52 s (r4 quiet band 46-50 s + ~5% drift).

Usage: python tools/probe_window.py [note]
Exit code 0 if the probe passes the launch band, 1 otherwise.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scaling import REPO, _cpuset_stat  # noqa: E402

LAUNCH_BAND_SEC = 52.0
CORES = 16
TURNS = 4_000_000


def main() -> None:
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{max(6, int(CORES * 1.5))}g"
    cmd = ["taskset", "-c", f"0-{CORES - 1}", sys.executable,
           os.path.join(REPO, "bench.py"), "--cores", str(CORES),
           "--sf-dir", sf_dir, "--build-only", "--turns", str(TURNS)]
    st0, tot0 = _cpuset_stat(CORES)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    st1, tot1 = _cpuset_stat(CORES)
    steal = round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"probe leg failed rc={out.returncode}")
    build_sec = round(json.loads(lines[-1])["queries"]["index_build"], 2)
    passed = build_sec <= LAUNCH_BAND_SEC
    rec = {
        "utc": datetime.datetime.now(datetime.timezone.utc
                                     ).strftime("%Y-%m-%dT%H:%M"),
        "probe": f"{CORES}c@{TURNS // 1_000_000}M build",
        "build_sec": build_sec,
        "steal_pct": steal,
        "note": note or ("at band; launchable" if passed
                         else "above band; session withheld"),
    }
    log = os.path.join(REPO, "BENCH", "probe_log_r8.jsonl")
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    raise SystemExit(0 if passed else 1)


if __name__ == "__main__":
    main()
