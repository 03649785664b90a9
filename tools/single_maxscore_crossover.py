"""Single-query MaxScore crossover (r9, r8 ADVICE item 3).

The r8 crossover fit (`BENCH/batch_maxscore_crossover_r8.json`) set
`MAXSCORE_MIN_NE_POSTINGS = 15M` from the BATCH pruned plan's overhead
(~2.2-2.5 s: stats + persist + broadcast + eager driver collect). The
same constant also gated the cheaper SINGLE-query pruned plan
(`bm25_topk` -> `_maxscore_topk`), whose overhead is one stats job and
(on the driver fast path) one small collect — so the single path was
over-gated several-fold past its own crossover.

This tool measures the single-query rare+head pair engaged-vs-exact,
interleaved min-of-N, on the SAME 1M-turn corpus the bench builds
(seed 42, cluster_rows=2000), asserts parity, and fits the single-path
crossover with the r8-measured overhead slope (0.173 s saved per M
non-essential postings — the decode+shuffle rate is a property of the
exact plan, not of who skips it). Writes
`BENCH/single_maxscore_crossover_r9.json`; the production constant
`MAXSCORE_MIN_NE_POSTINGS_SINGLE` cites it.

Usage: python tools/single_maxscore_crossover.py [turns] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R8_SLOPE_SEC_PER_M = 0.173  # BENCH/batch_maxscore_crossover_r8.json


def _host_steal():
    with open("/proc/stat") as f:
        vals = list(map(int, f.readline().split()[1:]))
    return vals[7], sum(vals)


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from konlspark import build, corpus
    from konlspark.query import SearchEngine
    from konlspark.session import get_spark

    cores = 32
    spark = get_spark("konlspark-sq-crossover", cores=cores,
                      shuffle_partitions=max(8, 3 * cores))
    tdf = corpus.spark_make_transcripts(
        spark, turns, turns_per_conv=20, seed=42, min_words=3,
        max_words=60, num_partitions=max(8, cores),
        cluster_rows=min(2000, max(1300, turns // 50))).cache()
    tdf.count()
    root = f"/tmp/konlspark_sqcross_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    build.build_index(spark, tdf, root)
    eng = SearchEngine(spark, root)
    head_term = (eng.token_dict.select("term", "df")
                 .orderBy(F.desc("df"), F.asc("term")).first()["term"])
    rh = ["topicmarker", head_term]
    meta = eng._term_meta(rh)
    ne_postings = meta[head_term]["df"]

    st0, tot0 = _host_steal()

    def exact():
        return [(r["doc_id"], round(r["score"], 6))
                for r in eng.bm25_topk(rh, k=10, use_wand=False).collect()]

    def engaged():
        old_b = eng.MAXSCORE_MIN_NE_POSTINGS
        old_s = eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE
        eng.MAXSCORE_MIN_NE_POSTINGS = 0
        eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE = 0
        try:
            out = eng.bm25_topk(rh, k=10, use_wand=True)
            return [(r["doc_id"], round(r["score"], 6))
                    for r in out.collect()]
        finally:
            eng.MAXSCORE_MIN_NE_POSTINGS = old_b
            eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE = old_s

    # parity + engagement check (the engaged plan must actually be the
    # pruned one: _maxscore_topk returns non-None under dropped gates)
    old_b, old_s = (eng.MAXSCORE_MIN_NE_POSTINGS,
                    eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE)
    eng.MAXSCORE_MIN_NE_POSTINGS = eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE = 0
    try:
        idf_probe = eng._maxscore_topk(
            meta, {t: __import__("konlspark.oracle", fromlist=["bm25_idf"])
                   .bm25_idf(eng.n_docs, m["df"])
                   for t, m in meta.items()}, 10)
        engaged_plan = idf_probe is not None
    finally:
        eng.MAXSCORE_MIN_NE_POSTINGS, eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE \
            = old_b, old_s
    ex_rows, en_rows = exact(), engaged()
    assert ex_rows == en_rows, ("single MaxScore != exact", ex_rows, en_rows)

    t_ex, t_en = [], []
    for _ in range(reps):
        t0 = time.time()
        engaged()
        t_en.append(round(time.time() - t0, 3))
        t0 = time.time()
        exact()
        t_ex.append(round(time.time() - t0, 3))
    st1, tot1 = _host_steal()
    ex_min, en_min = min(t_ex), min(t_en)
    overhead = round(en_min - ex_min, 3)
    saved_per_m = R8_SLOPE_SEC_PER_M
    crossover = (ne_postings + max(0.0, overhead) / saved_per_m * 1e6
                 if overhead > 0 else ne_postings)
    out = {
        "turns": turns,
        "reps": reps,
        "rh_terms": rh,
        "ne_postings": int(ne_postings),
        "engaged_plan": bool(engaged_plan),
        "parity": True,
        "exact_all": t_ex,
        "engaged_all": t_en,
        "exact_min": ex_min,
        "engaged_min": en_min,
        "net_overhead_sec": overhead,
        "r8_slope_sec_per_M": saved_per_m,
        "fitted_crossover_ne_postings": int(crossover),
        "steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2),
        "note": ("single-path crossover = measured NE size + net "
                 "overhead / r8 decode-savings slope; the slope is the "
                 "exact plan's decode+shuffle rate, shared by both "
                 "paths. Gate constant MAXSCORE_MIN_NE_POSTINGS_SINGLE "
                 "should sit at or above the fitted crossover."),
    }
    path = os.path.join(REPO, "BENCH", "single_maxscore_crossover_r9.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
