"""A/B: exploded-count verify (r5) vs array-intersect verify (r6).

Interleaved min-of-N at sf0.1/32c over the driver documents table,
identical-output assertion on both d4 (LSH+verify) and d1 (shingle
Jaccard). Writes BENCH/profile_d4_r6.json. Repo policy: the r6 shape
ships only if this wins with identical pairs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _old_jaccard(ex, sizes, cands, threshold):
    """The r5 exploded-count verify, verbatim (kept here for the A/B)."""
    inter = (
        cands
        .join(ex.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(ex.select(F.col("id").alias("id_b"), F.col("shingle")),
              ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}),
                   "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}),
              "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from konlspark.contract import _read, _spread
    from konlspark.ops import dedup
    from konlspark.session import get_spark

    spark = get_spark("konlspark-d4ab", cores=32, shuffle_partitions=32)
    docs = _spread(_read(spark, sf_dir, "documents")).cache()
    docs.count()

    def d4_new():
        return dedup.minhash_lsh_pairs(docs, verify_threshold=0.4)

    def d4_old():
        cands = dedup.minhash_lsh_pairs(docs, verify_threshold=0.0)
        base = docs.select(F.col("doc_id").alias("id"),
                           dedup._shingles(F.col("text"), 3).alias("sh"))
        sizes = base.select("id", F.size("sh").alias("n_sh"))
        ex = base.select("id", F.explode("sh").alias("shingle"))
        return _old_jaccard(ex, sizes, cands, 0.4)

    def d1_new():
        return dedup.shingle_pairs_jaccard(docs, threshold=0.5)

    def d1_old():
        base = docs.select(F.col("doc_id").alias("id"),
                           dedup._shingles(F.col("text"), 3).alias("sh"))
        ex = base.select("id", F.explode("sh").alias("shingle"))
        rare = (ex.groupBy("shingle").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= 10000))
        ex_rare = ex.join(rare.select("shingle"), "shingle")
        cands = (
            ex_rare.alias("a").join(
                ex_rare.alias("b"),
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"))
            .distinct())
        sizes = base.select("id", F.size("sh").alias("n_sh"))
        return _old_jaccard(ex, sizes, cands, 0.5)

    variants = {"d4_old": d4_old, "d4_new": d4_new,
                "d1_old": d1_old, "d1_new": d1_new}

    # identical-output assertion first (also warms every plan shape)
    pairs = {}
    for name, fn in variants.items():
        pairs[name] = sorted((r["id_a"], r["id_b"], r["jaccard"])
                             for r in fn().collect())
    assert pairs["d4_old"] == pairs["d4_new"], "d4 outputs differ"
    assert pairs["d1_old"] == pairs["d1_new"], "d1 outputs differ"

    times = {k: [] for k in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            fn().collect()
            times[name].append(round(time.time() - t0, 3))

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "pairs": {"d4": len(pairs["d4_new"]), "d1": len(pairs["d1_new"])},
        "identical_outputs": True,
        "min_sec": {k: min(v) for k, v in times.items()},
        "all_sec": times,
        "speedup": {
            "d4": round(min(times["d4_old"]) / min(times["d4_new"]), 3),
            "d1": round(min(times["d1_old"]) / min(times["d1_new"]), 3),
        },
        "note": "r6 array-intersect verify vs r5 exploded-count verify, "
                "interleaved min-of-%d; old shape inlined above verbatim."
                % reps,
    }
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "profile_d4_r6.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
