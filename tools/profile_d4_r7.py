"""A/B (r7): 16 md5 calls/shingle vs 8 wide md5 calls (hi/lo 60-bit
halves) for the MinHash signature pass — the r6 verify fix moved d4's
bottleneck back to signature + band exchange, so the judge ordered this
re-measure (it was rejected in r5 on a different pipeline shape).

Interleaved min-of-N at sf0.1/32c over the driver documents table:
 - sig-only: the 16-lane signature aggregation, both lane layouts;
 - d4 end-to-end (LSH pairs + 0.4 Jaccard verify), both layouts.
The two layouts are DIFFERENT (both valid) MinHash schemes, so pair
counts may differ slightly; both are reported, not asserted equal —
the verify threshold pins semantics either way. Writes
BENCH/profile_d4_r7.json. Repo policy: the wide layout ships (engine +
DuckDB oracle together) only if it wins here.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _wide_minhash_cols(n_hashes):
    """n_hashes lanes from n_hashes/2 md5 calls: lane 2j = first 15 hex
    chars of md5(seed_j || shingle), lane 2j+1 = chars 17..31 — two
    disjoint 60-bit halves of one digest. Same shape is writable in
    DuckDB (substr(md5(...), 17, 15))."""
    cols = []
    for i in range(n_hashes):
        j, half = divmod(i, 2)
        off = 1 if half == 0 else 17
        cols.append(
            F.min(F.conv(F.substring(
                F.md5(F.concat(F.lit(f"s{j}:"), F.col("shingle"))),
                off, 15), 16, 10).cast("long")).alias(f"mh{i}"))
    return cols


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from konlspark.contract import _read, _spread
    from konlspark.ops import dedup
    from konlspark.session import get_spark

    spark = get_spark("konlspark-d4ab-r7", cores=32, shuffle_partitions=32)
    docs = _spread(_read(spark, sf_dir, "documents")).cache()
    docs.count()

    narrow_cols = dedup._minhash_cols

    def with_cols(fn, cols_fn):
        dedup._minhash_cols = cols_fn
        try:
            return fn()
        finally:
            dedup._minhash_cols = narrow_cols

    def sig_count():
        # materialize the signature table (count forces the full agg)
        return dedup.minhash_signatures(docs).count()

    def d4():
        return dedup.minhash_lsh_pairs(docs, verify_threshold=0.4).count()

    # warm both plan shapes
    pairs = {"narrow": with_cols(d4, narrow_cols),
             "wide": with_cols(d4, _wide_minhash_cols)}
    with_cols(sig_count, narrow_cols)
    with_cols(sig_count, _wide_minhash_cols)

    ts: dict = {k: [] for k in
                ["sig_narrow", "sig_wide", "d4_narrow", "d4_wide"]}
    for _ in range(reps):
        for name, fn, cols in [
                ("sig_narrow", sig_count, narrow_cols),
                ("sig_wide", sig_count, _wide_minhash_cols),
                ("d4_narrow", d4, narrow_cols),
                ("d4_wide", d4, _wide_minhash_cols)]:
            t0 = time.time()
            with_cols(fn, cols)
            ts[name].append(round(time.time() - t0, 3))

    out = {
        "sf_dir": sf_dir,
        "repeats": reps,
        "pairs_narrow": pairs["narrow"],
        "pairs_wide": pairs["wide"],
        **{f"{k}_sec": round(min(v), 3) for k, v in ts.items()},
        **{f"{k}_all": v for k, v in ts.items()},
        "sig_speedup": round(min(ts["sig_narrow"]) / min(ts["sig_wide"]), 3),
        "d4_speedup": round(min(ts["d4_narrow"]) / min(ts["d4_wide"]), 3),
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "profile_d4_r7.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
