"""A/B: positional postings cost/benefit at bench scale.

Builds the same synthetic corpus twice — store_positions off/on —
INTERLEAVED over ``repeats`` rounds (min-of-N per config; same
shared-VM noise discipline as bench.py), then times the contiguous
phrase query on the recompute path (plain index) vs the stored path
(positional index) and reports the index-size delta.

Usage: python tools/bench_positions_ab.py [turns] [repeats] [cores]
Writes BENCH/positions_ab_r{tag}.json (tag from argv[4], default r6).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    tag = sys.argv[4] if len(sys.argv) > 4 else "r6"

    from konlspark import build, corpus
    from konlspark.query import SearchEngine
    from konlspark.session import get_spark

    spark = get_spark("konlspark-pos-ab", cores=cores,
                      shuffle_partitions=3 * cores)
    tdf = corpus.spark_make_transcripts(
        spark, turns, turns_per_conv=20, seed=42,
        num_partitions=max(8, cores)).cache()
    tdf.count()
    # warm the python workers so round 1 isn't a cold-start outlier
    build.build_index(spark, corpus.spark_transcripts(
        spark, corpus.make_transcripts(5000, seed=1)), "/tmp/pos_ab_warm")
    shutil.rmtree("/tmp/pos_ab_warm", ignore_errors=True)

    roots = {False: "/tmp/pos_ab_plain", True: "/tmp/pos_ab_pos"}
    build_ts: dict = {False: [], True: []}
    for _ in range(repeats):
        for flag, root in roots.items():
            shutil.rmtree(root, ignore_errors=True)
            t0 = time.time()
            build.build_index(spark, tdf, root, store_positions=flag)
            build_ts[flag].append(time.time() - t0)

    sizes = {flag: dir_bytes(os.path.join(root, "postings"))
             for flag, root in roots.items()}
    engs = {flag: SearchEngine(spark, root)
            for flag, root in roots.items()}

    phrases = [["마법", "특별"], ["같은", "비스크"], ["spark", "query"]]
    q_ts: dict = {"recompute": [], "stored": []}
    results = {}
    # warm both plan shapes once
    for ph in phrases:
        a = [r["doc_id"] for r in engs[False].search_phrase_contiguous(
            ph, use_positions=False).collect()]
        b = [r["doc_id"] for r in engs[True].search_phrase_contiguous(
            ph, use_positions=True).collect()]
        assert a == b, (ph, "stored != recompute")
        results[" ".join(ph)] = len(a)
    for _ in range(repeats):
        t0 = time.time()
        for ph in phrases:
            engs[False].search_phrase_contiguous(
                ph, use_positions=False).collect()
        q_ts["recompute"].append(time.time() - t0)
        t0 = time.time()
        for ph in phrases:
            engs[True].search_phrase_contiguous(
                ph, use_positions=True).collect()
        q_ts["stored"].append(time.time() - t0)

    out = {
        "turns": turns,
        "cores": cores,
        "repeats": repeats,
        "build_sec_plain": round(min(build_ts[False]), 2),
        "build_sec_positions": round(min(build_ts[True]), 2),
        "build_overhead_ratio": round(
            min(build_ts[True]) / min(build_ts[False]), 3),
        "postings_bytes_plain": sizes[False],
        "postings_bytes_positions": sizes[True],
        "postings_size_ratio": round(sizes[True] / sizes[False], 3),
        "phrase_sec_recompute_3q": round(min(q_ts["recompute"]), 3),
        "phrase_sec_stored_3q": round(min(q_ts["stored"]), 3),
        "phrase_match_counts": results,
        "parity": "stored == recompute on all phrases",
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", f"positions_ab_{tag}.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    for root in roots.values():
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
