"""Attribute d4 (MinHash-LSH + verify) time across its three stages.

d4's sf0.1 floor has sat at 14-19s across rounds; this tool answers
WHERE the time goes, and A/Bs the one plausible cut — computing 16
hash lanes from 8 md5 calls by splitting each 128-bit digest into two
60-bit halves (same uniformity, half the md5 work) — under the tuned
bench session, interleaved min-of-N, per this repo's measurement
policy (single-shot timings and untuned ad-hoc sessions both produce
inverted conclusions on this box).

Stage attribution by nested-plan differencing:
  sig    = t(signatures.count())           — shingle explode + k x md5 + groupBy
  bands  = t(cands.count()) - sig          — band hash + self-join exchange
  verify = t(full d4.count()) - t(cands)   — exact-Jaccard semi-join pass

Usage: python tools/profile_d4.py [--sf-dir /root/testdata/sf0.1]
           [--cores 32] [--reps 3]
Writes BENCH/profile_d4_r5.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        REPO, "BENCH", "profile_d4_r5.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from konlspark import contract
    from konlspark.ops import dedup
    from konlspark.session import get_spark

    spark = get_spark("konlspark-prof-d4", cores=args.cores,
                      shuffle_partitions=3 * args.cores)
    docs = contract._spread(
        contract._read(spark, args.sf_dir, "documents")).cache()
    n_docs = docs.count()

    def split_signatures(df, n_hashes=16):
        """A/B variant: 16 lanes from 8 md5 calls — lane 2i = int64 of
        hex chars 1-15 of md5(seed_i || shingle), lane 2i+1 = chars
        16-30 of the SAME digest (statistically independent halves of
        one 128-bit digest)."""
        ex = (df.select(F.col("doc_id").alias("id"),
                        dedup._shingles(F.col("text"), 3).alias("sh"))
              .select("id", F.explode("sh").alias("shingle")))
        cols = []
        for i in range(n_hashes // 2):
            d = F.md5(F.concat(F.lit(f"s{i}:"), F.col("shingle")))
            cols.append(F.min(F.conv(F.substring(d, 1, 15), 16, 10)
                              .cast("long")).alias(f"mh{2 * i}"))
            cols.append(F.min(F.conv(F.substring(d, 16, 15), 16, 10)
                              .cast("long")).alias(f"mh{2 * i + 1}"))
        return ex.groupBy("id").agg(*cols)

    plans = {
        "sig16": lambda: dedup.minhash_signatures(
            docs, n=3, n_hashes=16).count(),
        "sig16_split8md5": lambda: split_signatures(docs).count(),
        "cands": lambda: dedup.minhash_lsh_pairs(
            docs, n=3, n_hashes=16, bands=8, verify_threshold=0.0).count(),
        "full_d4": lambda: dedup.minhash_lsh_pairs(
            docs, n=3, n_hashes=16, bands=8, verify_threshold=0.5).count(),
    }
    # warm every plan shape once (codegen JIT), then interleave reps
    results = {}
    for name, fn in plans.items():
        results[name] = fn()
    times: dict[str, list] = {k: [] for k in plans}
    for _rep in range(args.reps):
        for name, fn in plans.items():
            t0 = time.time()
            fn()
            times[name].append(round(time.time() - t0, 3))
    best = {k: min(v) for k, v in times.items()}
    out = {
        "n_docs": n_docs,
        "cores": args.cores,
        "reps": args.reps,
        "rows": results,
        "min_sec": best,
        "all_sec": times,
        "attribution": {
            "signatures": best["sig16"],
            "band_exchange": round(best["cands"] - best["sig16"], 3),
            "verify_join": round(best["full_d4"] - best["cands"], 3),
        },
        "split_md5_speedup_vs_sig16": round(
            best["sig16"] / best["sig16_split8md5"], 3)
        if best["sig16_split8md5"] else None,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
