"""Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency N→4N).

No real cluster exists in this sandbox, so the two "cluster sizes" are
two pinned CPU allocations on one host running the same job:

- N  = ``taskset -c 0-(n-1)``  + ``local[n]``
- 4N = ``taskset -c 0-(4n-1)`` + ``local[4n]``

Protocol (each point is the MIN of ``repeats`` fresh-JVM runs,
INTERLEAVED round-robin across the four configs — the host is a shared
VM whose neighbor load holds for tens of minutes, so back-to-back
repeats of one config all land in one noise window; interleaving gives
every config a sample of every window, and per-round ratio pairing is
reported alongside):

- pinned cpusets (without pinning, the small run's Python workers
  spill onto the idle cores and silently use the whole box);
- shuffle dirs on tmpfs (session.py) — removes virtio-disk jitter;
- driver memory CONSTANT PER CORE (cores × 1.5 GiB): the honest
  cluster-growth model gives 4N executors 4× the aggregate memory;
- 3 shuffle partitions per core (one straggler costs 1/(3·cores) of a
  stage, not 1/cores);
- **host-speed calibration**: this guest reports a static nominal
  /proc/cpuinfo MHz, so the all-core clock drop is measured instead of
  read — ``repeats`` rounds of a fixed single-thread CPU workload
  (sha256 over a buffer) run n-way parallel on the same cpuset; the
  per-copy slowdown from N-way to 4N-way load is the effective
  per-core-speed ratio c = s_4N/s_N. A PERFECT system shows raw
  speedup 4·c, so clock-normalized efficiency = raw_eff / c. Both raw
  and normalized numbers are reported.
- **memory-bandwidth calibration** (r5): the sha256 workload is
  cache-resident, so c only catches CLOCK contention — r5's sessions
  showed 16c legs 20–40% slow while c stayed ≈0.95, i.e. the noise is
  bandwidth/scheduler-shaped. A second fixed workload (streaming
  256 MiB numpy copies, far beyond LLC) run n-way parallel on the same
  cpusets, interleaved N/4N, measures the per-copy bandwidth ratio
  b = bw_4N/bw_N (capped at 1.0). This is ALSO the cluster-model
  correction: a real 4N-executor cluster has 4× the memory
  controllers, while this sandbox serves the whole 4N cpuset from one
  shared memory system — a per-core bandwidth loss no real N→4N
  growth would see. bandwidth-normalized efficiency = raw_eff / b is
  reported as a THIRD disclosed column; raw and clock-normalized
  numbers are unchanged.

Scaling shapes (four measured points: {N, 4N} × {X, 4X} turns):

- **strong @ X and @ 4X**: same input at both sizes — raw eff =
  (T_N / T_4N) / 4, reported at BOTH input sizes because strong
  efficiency is problem-size-dependent (Amdahl: the build has ~8 s of
  size-independent driver/job overhead, so at X=1M turns a 16-core run
  is overhead-bound; at 4X the compute dominates — the larger size is
  the representative one for the 10^12-turn target, the smaller is
  reported for transparency);
- **weak**: input grows with the cluster (4× executors ingest 4×
  turns — the honest cluster-growth model) — raw eff =
  T_N(X) / T_4N(4X).

Usage: python tools/bench_scaling.py [sf_dir] [turns] [repeats] [n_lo]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CAL_SNIPPET = r"""
import hashlib, json, multiprocessing as mp, sys, time

def work(_):
    buf = b"x" * (1 << 20)
    t0 = time.perf_counter()
    for _ in range(400):
        buf = hashlib.sha256(buf).digest() + buf[:-32]
    return time.perf_counter() - t0

if __name__ == "__main__":
    n = int(sys.argv[1])
    with mp.Pool(n) as p:
        times = p.map(work, range(n))
    print(json.dumps(times))
"""


_BW_SNIPPET = r"""
import json, multiprocessing as mp, sys, time

def work(_):
    import numpy as np
    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MiB >> LLC
    b = np.empty_like(a)
    np.copyto(b, a)  # touch pages before timing
    t0 = time.perf_counter()
    for _ in range(4):
        np.copyto(b, a)
    return time.perf_counter() - t0

if __name__ == "__main__":
    n = int(sys.argv[1])
    with mp.Pool(n) as p:
        times = p.map(work, range(n))
    print(json.dumps(times))
"""


def _calibrate_once(path: str, cores: int) -> float:
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, path,
         str(cores)],
        capture_output=True, text=True, check=True)
    return statistics.median(json.loads(out.stdout))


def calibrate_pair(lo: int, hi: int, samples: int = 6,
                   snippet: str = _CAL_SNIPPET) -> tuple:
    """Min per-copy seconds of the fixed workload at lo-way and hi-way
    parallelism. Samples INTERLEAVED (lo,hi,lo,hi,…) so bursty host
    steal hits both configs symmetrically; min-of-samples drops the
    stolen rounds."""
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(snippet)
        path = f.name
    lo_t, hi_t = [], []
    for _ in range(samples):
        lo_t.append(_calibrate_once(path, lo))
        hi_t.append(_calibrate_once(path, hi))
    os.unlink(path)
    return min(lo_t), min(hi_t)


def _cpuset_stat(cores: int) -> tuple:
    """Sum (steal, total) jiffies over cpu0..cpu{cores-1} from /proc/stat.

    The guest exposes hypervisor steal time per cpu; sampled before and
    after each leg this yields the steal fraction ON THE PINNED CORES
    DURING THE LEG — direct attribution for noise windows that the
    burst calibrations miss (r5-s8 measured c=0.986 / b=0.963 while the
    16c leg ran 40% over its quiet-window band: contention that only a
    sustained many-thread workload experiences)."""
    steal = total = 0
    with open("/proc/stat") as f:
        for line in f:
            p = line.split()
            if p[0].startswith("cpu") and p[0] != "cpu":
                idx = int(p[0][3:])
                if idx < cores:
                    vals = list(map(int, p[1:]))
                    steal += vals[7]
                    total += sum(vals)
    return steal, total


# Pre-declared steal gate (r6, per the r5 verdict): a leg whose pinned
# cpuset saw hypervisor steal above this fraction during the run is a
# contaminated measurement — retry it (up to GATE_MAX_RETRIES), keeping
# every rejected attempt's timing + steal%% disclosed in the session
# record. The threshold is declared HERE, before any r6 session ran.
GATE_STEAL_PCT = 2.0
GATE_MAX_RETRIES = 2

# Declared protocol scale: a session whose X is below this is a smoke /
# instrumentation run and must not overwrite the headline evidence file.
PROTOCOL_TURNS = 1_000_000


def run_once(cores: int, sf_dir: str, turns: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{max(6, int(cores * 1.5))}g"
    cmd = ["taskset", "-c", f"0-{cores - 1}",
           sys.executable, os.path.join(REPO, "bench.py"),
           "--cores", str(cores), "--sf-dir", sf_dir, "--build-only",
           "--turns", str(turns)]
    # one retry: a transient leg failure (JVM OOM-kill under neighbor
    # pressure, /dev/shm blip) must not kill a 25-minute session; the
    # child's stderr is surfaced either way instead of being swallowed
    # inside CalledProcessError
    gated = []  # rejected (steal-contaminated) attempts, disclosed
    fail_budget = 1
    gate_budget = GATE_MAX_RETRIES
    while True:
        st0, tot0 = _cpuset_stat(cores)
        out = subprocess.run(cmd, capture_output=True, text=True, env=env)
        st1, tot1 = _cpuset_stat(cores)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if out.returncode != 0 or not lines:
            print(f"leg FAILED (rc={out.returncode}) "
                  f"{cores}c/{turns}t:\n{out.stderr[-3000:]}",
                  file=sys.stderr)
            if fail_budget > 0:
                fail_budget -= 1
                continue
            raise SystemExit(f"scaling leg failed twice: {cores}c/{turns}t")
        r = json.loads(lines[-1])
        r["leg_steal_pct"] = round(
            100.0 * (st1 - st0) / max(1, tot1 - tot0), 2)
        if r["leg_steal_pct"] > GATE_STEAL_PCT:
            if gate_budget > 0:
                gate_budget -= 1
                gated.append(
                    {"sec": round(r["queries"]["index_build"], 2),
                     "steal_pct": r["leg_steal_pct"]})
                print(f"leg GATED (steal {r['leg_steal_pct']}% > "
                      f"{GATE_STEAL_PCT}%) {cores}c/{turns}t — retrying",
                      file=sys.stderr)
                continue
            # budget exhausted: the returned leg is itself above the
            # gate — mark it so the session record is machine-readably
            # invalid-by-construction (r6 ADVICE: detecting exhaustion
            # used to require correlating steal lists with retry counts)
            r["gate_exhausted"] = True
        r["gated_attempts"] = gated
        return r


def interleaved_rounds(configs: list, sf_dir: str, repeats: int) -> dict:
    """Run every (cores, turns) config once per ROUND, rounds × repeats.

    The host shows SUSTAINED noise windows (neighbor VM load holds for
    tens of minutes): running each config's repeats back-to-back puts
    different configs in different windows and corrupts their ratios.
    Interleaving lets (a) min-per-config pick each config's quietest
    round and (b) per-round ratio pairing cancel sustained noise."""
    results = {cfg: [] for cfg in configs}
    for _ in range(repeats):
        for cfg in configs:
            results[cfg].append(run_once(cfg[0], sf_dir, cfg[1]))
    out = {}
    for cfg, runs in results.items():
        best = min(runs, key=lambda r: r["queries"]["index_build"])
        best["all_runs_sec"] = [round(r["queries"]["index_build"], 2)
                                for r in runs]
        best["all_runs_steal_pct"] = [r.get("leg_steal_pct") for r in runs]
        # grouped per accepted leg (repeat i's rejected attempts at
        # index i), not flattened — keeps per-leg attribution
        best["all_gated_attempts"] = [r.get("gated_attempts", [])
                                      for r in runs]
        best["any_gate_exhausted"] = any(
            r.get("gate_exhausted") for r in runs)
        out[cfg] = best
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    hi = lo * 4

    cal_lo, cal_hi = calibrate_pair(lo, hi)
    # c = s_4N/s_N; capped at 1.0 — a measured c > 1 is unphysical
    # sampling noise, and capping keeps the normalization CONSERVATIVE
    # (it can then only leave the raw number unchanged, never raise it)
    c = min(1.0, cal_lo / cal_hi)
    bw_lo, bw_hi = calibrate_pair(lo, hi, snippet=_BW_SNIPPET)
    b = min(1.0, bw_lo / bw_hi)

    configs = [(lo, turns), (hi, turns), (lo, turns * 4), (hi, turns * 4)]
    by_cfg = interleaved_rounds(configs, sf_dir, repeats)
    r_lo, r_hi = by_cfg[(lo, turns)], by_cfg[(hi, turns)]
    r_lo4, r_hi4 = by_cfg[(lo, turns * 4)], by_cfg[(hi, turns * 4)]

    t_lo = r_lo["queries"]["index_build"]
    t_hi = r_hi["queries"]["index_build"]
    t_lo4 = r_lo4["queries"]["index_build"]
    t_hi4 = r_hi4["queries"]["index_build"]
    strong_eff_x = t_lo / t_hi / 4
    strong_eff_4x = t_lo4 / t_hi4 / 4
    weak_eff = t_lo / t_hi4  # 4x data on 4x cores in the same time → 1.0
    # per-round pairing (both runs of a ratio share the same noise
    # window): the best round is the quietest-window estimate
    rounds = range(len(r_lo["all_runs_sec"]))
    per_round = {
        "strong @X per-round eff": [
            round(r_lo["all_runs_sec"][i] / r_hi["all_runs_sec"][i] / 4, 3)
            for i in rounds],
        "strong @4X per-round eff": [
            round(r_lo4["all_runs_sec"][i] / r_hi4["all_runs_sec"][i] / 4, 3)
            for i in rounds],
        "weak per-round eff": [
            round(r_lo["all_runs_sec"][i] / r_hi4["all_runs_sec"][i], 3)
            for i in rounds],
    }

    result = {
        # protocol generations (r7 directive 6): v1 = r3-r5 sessions
        # (no steal gate; 3 single-shot legs), v2 = r6 (2% steal gate +
        # disclosed retries, 3 repeats/leg), v3 = r7+ (gate + 2
        # repeats/leg + gate_exhausted/invalid markers). Pooled-median
        # claims in BENCH/BASELINE.md break down by generation so the
        # headline can't lean on ungated early sessions.
        "protocol_version": 3,
        "sf_dir": sf_dir,
        "turns_X": r_lo["n_turns"],
        "turns_4X": r_hi4["n_turns"],
        f"calibration: per-copy sec {lo}-way": round(cal_lo, 3),
        f"calibration: per-copy sec {hi}-way": round(cal_hi, 3),
        "calibration: per-core speed ratio c = s_4N/s_N": round(c, 3),
        f"calibration: membw per-copy sec {lo}-way": round(bw_lo, 3),
        f"calibration: membw per-copy sec {hi}-way": round(bw_hi, 3),
        "calibration: per-core bandwidth ratio b = bw_4N/bw_N": round(b, 3),
        f"build_sec local[{lo}] @X": round(t_lo, 2),
        f"build_sec local[{hi}] @X": round(t_hi, 2),
        f"build_sec local[{lo}] @4X": round(t_lo4, 2),
        f"build_sec local[{hi}] @4X": round(t_hi4, 2),
        f"runs local[{lo}] @X": r_lo["all_runs_sec"],
        f"runs local[{hi}] @X": r_hi["all_runs_sec"],
        f"runs local[{lo}] @4X": r_lo4["all_runs_sec"],
        f"runs local[{hi}] @4X": r_hi4["all_runs_sec"],
        f"steal_pct local[{lo}] @X": r_lo["all_runs_steal_pct"],
        f"steal_pct local[{hi}] @X": r_hi["all_runs_steal_pct"],
        f"steal_pct local[{lo}] @4X": r_lo4["all_runs_steal_pct"],
        f"steal_pct local[{hi}] @4X": r_hi4["all_runs_steal_pct"],
        "steal_gate_pct": GATE_STEAL_PCT,
        # invalid-by-construction under the declared gate-exhaustion
        # rule: some leg's accepted measurement exceeded the steal gate
        # after retries ran out (disclosed below either way)
        "invalid": any(by_cfg[cfg].get("any_gate_exhausted")
                       for cfg in configs),
        "gated_retries": {
            f"local[{lo}] @X": r_lo["all_gated_attempts"],
            f"local[{hi}] @X": r_hi["all_gated_attempts"],
            f"local[{lo}] @4X": r_lo4["all_gated_attempts"],
            f"local[{hi}] @4X": r_hi4["all_gated_attempts"],
        },
        "strong @X: scaling_efficiency (raw)": round(strong_eff_x, 3),
        "strong @X: scaling_efficiency (clock-normalized)": round(
            strong_eff_x / c, 3),
        "strong @4X: scaling_efficiency (raw)": round(strong_eff_4x, 3),
        "strong @4X: scaling_efficiency (clock-normalized)": round(
            strong_eff_4x / c, 3),
        "strong @4X: scaling_efficiency (bandwidth-normalized)": round(
            strong_eff_4x / b, 3),
        "weak: scaling_efficiency (raw)": round(weak_eff, 3),
        "weak: scaling_efficiency (clock-normalized)": round(weak_eff / c, 3),
        "weak: scaling_efficiency (bandwidth-normalized)": round(
            weak_eff / b, 3),
        **per_round,
        "best-round efficiencies (strong@X, strong@4X, weak)": [
            max(per_round["strong @X per-round eff"]),
            max(per_round["strong @4X per-round eff"]),
            max(per_round["weak per-round eff"])],
        f"weak: turns_per_sec local[{lo}]": r_lo["build_turns_per_sec"],
        f"weak: turns_per_sec local[{hi}]": r_hi4["build_turns_per_sec"],
        f"phases: best local[{lo}] @X": r_lo.get("build_phases", {}),
        f"phases: best local[{hi}] @X": r_hi.get("build_phases", {}),
        f"phases: best local[{lo}] @4X": r_lo4.get("build_phases", {}),
        f"phases: best local[{hi}] @4X": r_hi4.get("build_phases", {}),
    }
    print(json.dumps(result))

    # raw session dump — BENCH/BASELINE.md is the CURATED multi-session
    # summary (this host's cross-session noise means a single protocol
    # session must not silently replace the headline). Smoke-scale runs
    # (turns below the declared 1M protocol scale) go to a SEPARATE file
    # so an instrumentation test can never overwrite the headline
    # evidence artifact (r5 ADVICE: a 20k-turn smoke run did exactly
    # that).
    smoke = turns < PROTOCOL_TURNS
    result["smoke_run"] = smoke
    md = os.path.join(REPO, "BENCH",
                      "last_smoke_run.md" if smoke else
                      "last_protocol_run.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as f:
        f.write("# BENCH baseline — konlspark\n\n")
        if smoke:
            f.write("**SMOKE RUN** — turns_X below the declared 1M "
                    "protocol scale; job-floor-dominated, NOT scaling "
                    "evidence.\n\n")
        f.write("## Scaling-efficiency evidence (north rule: ≥0.8, N→4N)\n\n")
        f.write(__doc__.split("Usage:")[0].strip() + "\n\n")
        f.write("| metric | value |\n|---|---|\n")
        for k, v in result.items():
            f.write(f"| {k} | {v} |\n")
        f.write(
            "\n**Normalization math.** The calibration workload is pure "
            "single-thread CPU; its per-copy time at n-way parallelism "
            "measures the effective per-core speed s_n under n-way load "
            "(guest /proc MHz is static, so the all-core clock drop can "
            "only be measured, not read). Perfect 4× scaling on this "
            "host yields raw speedup 4·(s_4N/s_N), hence normalized "
            "efficiency = raw / (s_4N/s_N). The membw calibration "
            "streams 256 MiB numpy copies (far beyond LLC) n-way "
            "parallel: b = bw_4N/bw_N measures the per-core bandwidth "
            "lost to serving the whole 4N cpuset from ONE shared "
            "memory system — a loss a real N→4N cluster (4× memory "
            "controllers) does not see — plus any neighbor bandwidth "
            "load in the window; bandwidth-normalized efficiency = "
            "raw / b.\n")
        f.write("\n## Reference baseline (repo BASELINE.md)\n\n")
        f.write("Reference indexes ~1.4M Korean wiki titles (~9-word docs) "
                "in ~280 s (~5,000 docs/s, single process, Apple M1 Max).\n")
        f.write(f"This engine: {r_hi4['build_turns_per_sec']} turns/s at "
                f"local[{hi}] on ~30-word transcript turns — including "
                "dedup, dense id assignment, delta+varint block "
                "compression and BM25 block-max metadata, none of which "
                "the reference computes.\n")


if __name__ == "__main__":
    main()
