"""Probe-driven scaling-session launcher (r7 protocol, r8 run).

The r6 failure mode was window SUPPLY: one launchable probe in six
hours, found by manual probing in contiguous blocks. This watcher
spreads probes across the whole round and launches a full gated
scaling session (2 repeats/leg, per the pre-declared r7 amendment) the
moment a probe passes the ≤52 s band — no human in the loop between
"window opened" and "session running".

Coordination (two markers, fixing the r7 TOCTOU the judge flagged):

- REPO/.bench_busy — touched by the BUILDER while running its own
  CPU-heavy foreground work; the watcher idles while it exists
  (same-guest load is invisible to the steal gate, so the marker is
  the only defense against self-contamination).
- REPO/.watcher_session — created by THIS watcher for the duration of
  a session (probe pass → session JSON written), so the builder can
  check it before starting heavy work. While a session is running the
  watcher polls for .bench_busy every few seconds; if the builder
  marker appears MID-session the leg is contaminated invisibly to the
  steal gate, so the session subprocess is killed and its partial
  output discarded (logged, nothing recorded).

After the first valid session, if the band still holds, one full
bench.py run is recorded to BENCH/bench_r8_local_best.json (the r4
precedent: a quiet-window record alongside the driver's own
potentially-contaminated BENCH_r8.json).

Stops after MAX_SESSIONS sessions or when killed.

Usage: python tools/session_watcher.py [probe_interval_sec]
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUSY = os.path.join(REPO, ".bench_busy")
SESSION_MARKER = os.path.join(REPO, ".watcher_session")
ROUND = "r8"
# r7 ran to its 4-session cap and the judge asked for the cap raised
# (directive 3: keep pooling; ≥2 valid sessions/round keeps the pooled
# median honest)
MAX_SESSIONS = 8
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(msg: str) -> None:
    now = datetime.datetime.now(datetime.timezone.utc).strftime("%H:%M:%S")
    print(f"[{now}] {msg}", flush=True)


def session_paths() -> list:
    return sorted(glob.glob(os.path.join(REPO, "BENCH",
                                         f"session_{ROUND}_s*.json")))


def run_session() -> None:
    n = len(session_paths()) + 1
    out_path = os.path.join(REPO, "BENCH", f"session_{ROUND}_s{n}.json")
    log(f"launching gated session {ROUND}-s{n} (repeats=2)")
    # r8 ADVICE fixes: (1) output goes to temp FILES, not PIPEs — an
    # undrained 64KB pipe buffer would block the child (and with it
    # proc.poll()) once stderr exceeds it, hanging the watcher;
    # (2) start_new_session=True so the abort can kill the WHOLE
    # process tree (taskset -> bench.py -> Spark JVM) — proc.kill()
    # alone orphaned the in-flight leg, which kept hammering the CPUs
    # the abort exists to free.
    out_f = tempfile.NamedTemporaryFile("w+", delete=False,
                                        prefix="watcher_out_")
    err_f = tempfile.NamedTemporaryFile("w+", delete=False,
                                        prefix="watcher_err_")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "bench_scaling.py"),
         SF_DIR, "1000000", "2", "4"],
        stdout=out_f, stderr=err_f, text=True, start_new_session=True)
    # poll for the builder's busy marker: a builder starting heavy
    # foreground work mid-session contaminates legs invisibly to the
    # steal gate (same-guest load) — kill and discard, record nothing
    while proc.poll() is None:
        if os.path.exists(BUSY):
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            log(f"session {ROUND}-s{n} ABORTED: builder busy marker "
                "appeared mid-session — partial run discarded "
                "(whole process group killed)")
            return
        time.sleep(5)
    proc.wait()
    for f in (out_f, err_f):
        f.flush()
        f.seek(0)
    out_txt, err_txt = out_f.read(), err_f.read()
    for f in (out_f, err_f):
        f.close()
        os.unlink(f.name)
    lines = [ln for ln in out_txt.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        log(f"session FAILED rc={proc.returncode}: {err_txt[-1500:]}")
        return
    rec = json.loads(lines[-1])
    rec["session"] = f"{ROUND}-s{n}"
    rec["utc"] = datetime.datetime.now(
        datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"session {ROUND}-s{n} done: weak raw "
        f"{rec.get('weak: scaling_efficiency (raw)')} / norm "
        f"{rec.get('weak: scaling_efficiency (clock-normalized)')}"
        f"{' INVALID (gate exhausted)' if rec.get('invalid') else ''}")


def record_local_best() -> None:
    path = os.path.join(REPO, "BENCH", f"bench_{ROUND}_local_best.json")
    if os.path.exists(path):
        return
    log(f"band still open — recording quiet-window bench_{ROUND}_local_best")
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
        # own marker up for probe + session + post-probe, so the
        # builder sees the whole watcher-active span, not just the
        # session body
        with open(SESSION_MARKER, "w") as f:
            f.write(str(os.getpid()))
        try:
            probe = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "probe_window.py"),
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
        finally:
            if os.path.exists(SESSION_MARKER):
                os.unlink(SESSION_MARKER)
        time.sleep(interval)
    log("max sessions reached — watcher exiting")


if __name__ == "__main__":
    main()
