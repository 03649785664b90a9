"""Probe-driven scaling-session launcher (r7 protocol).

The r6 failure mode was window SUPPLY: one launchable probe in six
hours, found by manual probing in contiguous blocks. This watcher
spreads probes across the whole round and launches a full gated
scaling session (2 repeats/leg, per the pre-declared r7 amendment) the
moment a probe passes the ≤52 s band — no human in the loop between
"window opened" and "session running".

Coordination: the builder touches REPO/.bench_busy while running its
own CPU-heavy foreground work; the watcher idles while that marker
exists (same-guest load is invisible to the steal gate, so the marker
is the only defense against self-contamination).

After the first valid session, if the band still holds, one full
bench.py run is recorded to BENCH/bench_r7_local_best.json (the r4
precedent: a quiet-window record alongside the driver's own
potentially-contaminated BENCH_r7.json).

Stops after MAX_SESSIONS sessions or when killed.

Usage: python tools/session_watcher.py [probe_interval_sec]
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUSY = os.path.join(REPO, ".bench_busy")
MAX_SESSIONS = 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(msg: str) -> None:
    now = datetime.datetime.now(datetime.timezone.utc).strftime("%H:%M:%S")
    print(f"[{now}] {msg}", flush=True)


def session_paths() -> list:
    return sorted(glob.glob(os.path.join(REPO, "BENCH",
                                         "session_r7_s*.json")))


def run_session() -> None:
    n = len(session_paths()) + 1
    out_path = os.path.join(REPO, "BENCH", f"session_r7_s{n}.json")
    log(f"launching gated session r7-s{n} (repeats=2)")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
         SF_DIR, "1000000", "2", "4"],
        capture_output=True, text=True)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        log(f"session FAILED rc={out.returncode}: {out.stderr[-1500:]}")
        return
    rec = json.loads(lines[-1])
    rec["session"] = f"r7-s{n}"
    rec["utc"] = datetime.datetime.now(
        datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"session r7-s{n} done: weak raw "
        f"{rec.get('weak: scaling_efficiency (raw)')} / norm "
        f"{rec.get('weak: scaling_efficiency (clock-normalized)')}"
        f"{' INVALID (gate exhausted)' if rec.get('invalid') else ''}")


def record_local_best() -> None:
    path = os.path.join(REPO, "BENCH", "bench_r7_local_best.json")
    if os.path.exists(path):
        return
    log("band still open — recording quiet-window bench_r7_local_best")
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = SF_DIR
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode == 0 and lines:
        rec = json.loads(lines[-1])
        rec["utc"] = datetime.datetime.now(
            datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        log(f"local best recorded: value {rec['value']} "
            f"steal {rec['steal_pct']}%")
    else:
        log(f"local-best bench failed rc={out.returncode}")


def main() -> None:
    interval = int(sys.argv[1]) if len(sys.argv) > 1 else 660
    while len(session_paths()) < MAX_SESSIONS:
        if os.path.exists(BUSY):
            log("builder busy marker present — skipping probe")
            time.sleep(interval)
            continue
        probe = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "probe_window.py"),
             "watcher probe"],
            capture_output=True, text=True)
        log(f"probe: {probe.stdout.strip().splitlines()[-1] if probe.stdout else probe.stderr[-200:]}")
        if probe.returncode == 0 and not os.path.exists(BUSY):
            run_session()
            # one quiet-window bench record, only if the band held
            verify = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "probe_window.py"),
                 "post-session probe"],
                capture_output=True, text=True)
            log(f"post-session probe rc={verify.returncode}")
            if verify.returncode == 0:
                record_local_best()
        time.sleep(interval)
    log("max sessions reached — watcher exiting")


if __name__ == "__main__":
    main()
