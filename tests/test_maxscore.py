"""Distributed MaxScore (multi-term BM25 pruning): exactness vs the
unpruned path, candidate-restricted decode, and gate behavior."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def zipf_engine(spark, zipf_index):
    from konlspark.query import SearchEngine
    root, _ = zipf_index
    eng = SearchEngine(spark, root)
    # production gate: NE decode savings must beat the extra driver
    # jobs — irrelevant at fixture scale, so disable for these tests
    eng.MAXSCORE_MIN_NE_POSTINGS = 0
    eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE = 0
    return eng


def _terms_by_df(eng):
    rows = (eng.token_dict.select("term", "df")
            .orderBy(F.desc("df"), F.asc("term")).collect())
    return [(r["term"], r["df"]) for r in rows]


def _rare_and_head(eng, min_ratio=4):
    terms = _terms_by_df(eng)
    head_t, head_df = terms[0]
    # rarest term that still has >= 2 blocks at block_size 64 (so the
    # per-term k-th-block-max bound can exist for small k)
    for t, df in reversed(terms):
        if df >= 130 and head_df >= min_ratio * df:
            return (t, df), (head_t, head_df)
    pytest.skip("corpus lacks a rare/head pair")


def _topk(eng, tokens, k, use_wand):
    return [(r["doc_id"], round(r["score"], 9)) for r in
            eng.bm25_topk(tokens, k=k, use_wand=use_wand,
                          wand_min_postings=1).collect()]


def test_maxscore_equals_exact_rare_plus_head(zipf_engine):
    eng = zipf_engine
    (rare, _), (head, _) = _rare_and_head(eng)
    for k in (1, 3, 10):
        assert _topk(eng, [rare, head], k, True) == \
            _topk(eng, [rare, head], k, False), (rare, head, k)


def test_maxscore_equals_exact_three_terms(zipf_engine):
    eng = zipf_engine
    terms = _terms_by_df(eng)
    head = terms[0][0]
    mid = terms[len(terms) // 3][0]
    rare = next(t for t, df in reversed(terms) if df >= 130)
    assert _topk(eng, [rare, mid, head], 10, True) == \
        _topk(eng, [rare, mid, head], 10, False)


@pytest.fixture(scope="module")
def clustered_engine(spark, tmp_root):
    """4000 docs: 'head' in every doc, 'rare' clustered in the first 200
    — the sparse-candidate regime where MaxScore's range semi-join
    actually skips head blocks (at 100 TB, ANY selective term is sparse
    relative to head block spans; the tiny zipf fixture is too dense)."""
    import datetime

    import pandas as pd

    from konlspark import build, corpus
    from konlspark.query import SearchEngine
    n = 4000
    ts = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    fillers = ["alpha", "beta", "gamma", "delta", "epsilon"]
    pdf = pd.DataFrame({
        "conv_id": [f"c{i // 20:06d}" for i in range(n)],
        "turn_idx": pd.array([i % 20 for i in range(n)], dtype="int32"),
        "role": ["user"] * n,
        "text": [("rareterm headterm " if i < 200 else "headterm ")
                 + f"{fillers[i % 5]} u{i}"  # u{i} keeps texts unique
                 for i in range(n)],
        "tool": [""] * n,
        "ts": [ts] * n,
    })
    root = f"{tmp_root}/maxscore_idx"
    build.build_index(spark, corpus.spark_transcripts(spark, pdf), root,
                      block_size=16)  # rare df 200 -> 13 blocks >= k=10
    eng = SearchEngine(spark, root)
    eng.MAXSCORE_MIN_NE_POSTINGS = 0
    eng.MAXSCORE_MIN_NE_POSTINGS_SINGLE = 0  # see zipf_engine
    return eng


def test_maxscore_path_taken_and_prunes(clustered_engine):
    """The internal split must exist for a rare+head query, the kept NE
    blocks must be a strict subset, and results must equal exact."""
    from konlspark.oracle import bm25_idf
    eng = clustered_engine
    meta = eng._term_meta(["rareterm", "headterm"])
    idf = {t: bm25_idf(eng.n_docs, m["df"]) for t, m in meta.items()}
    out = eng._maxscore_topk(meta, idf, 10)
    assert out is not None  # the split was found → pruned path used
    got = [(r["doc_id"], round(r["score"], 9)) for r in out.collect()]
    assert got == _topk(eng, ["rareterm", "headterm"], 10, False)
    # decode restriction: head blocks overlapping no candidate skipped
    cand = (eng._decode(eng._blocks_for({"rareterm": meta["rareterm"]}),
                        idf).select("doc_id").distinct())
    blocks_head = eng._blocks_for({"headterm": meta["headterm"]})
    n_all = blocks_head.count()
    kept = blocks_head.alias("b").join(
        cand.alias("c"),
        (F.col("c.doc_id") >= F.col("b.first_doc_id"))
        & (F.col("c.doc_id") <= F.col("b.last_doc_id")), "left_semi")
    n_kept = kept.count()
    # 200 clustered candidates / 4000 docs, 16-posting head blocks →
    # ~13 of ~250 head blocks survive
    assert n_kept < n_all / 4, (n_kept, n_all)
    persisted = getattr(out, "_konl_persisted", None)
    if persisted is not None:
        persisted.unpersist()


def test_maxscore_distributed_path_equals_exact(clustered_engine):
    """Force the large-candidate DataFrame path (driver bound = 0) —
    semi-join pruning must give identical results."""
    from konlspark.oracle import bm25_idf
    eng = clustered_engine
    old = eng.MAXSCORE_DRIVER_CANDIDATES
    eng.MAXSCORE_DRIVER_CANDIDATES = 0
    try:
        meta = eng._term_meta(["rareterm", "headterm"])
        idf = {t: bm25_idf(eng.n_docs, m["df"]) for t, m in meta.items()}
        out = eng._maxscore_topk(meta, idf, 10)
        assert out is not None
        got = [(r["doc_id"], round(r["score"], 9)) for r in out.collect()]
        assert got == _topk(eng, ["rareterm", "headterm"], 10, False)
        persisted = getattr(out, "_konl_persisted", None)
        if persisted is not None:
            persisted.unpersist()
    finally:
        eng.MAXSCORE_DRIVER_CANDIDATES = old


def test_symmetric_query_skips_maxscore(zipf_engine):
    """Two head terms (df ratio < MAXSCORE_MIN_DF_RATIO) must take the
    exact path — the r2 finding that symmetric queries cannot pay."""
    eng = zipf_engine
    terms = _terms_by_df(eng)
    t1, df1 = terms[0]
    t2, df2 = terms[1]
    if df1 >= eng.MAXSCORE_MIN_DF_RATIO * df2:
        pytest.skip("top-2 terms unexpectedly asymmetric")
    calls = []
    orig = eng._maxscore_topk
    eng._maxscore_topk = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    try:
        got = _topk(eng, [t1, t2], 10, True)
    finally:
        eng._maxscore_topk = orig
    assert calls == []  # pre-gate skipped the metadata job entirely
    assert got == _topk(eng, [t1, t2], 10, False)


def test_maxscore_handles_k_exceeding_candidates(zipf_engine):
    """k larger than the rare term's df: either a valid split with the
    full candidate set or a clean fallback — results must equal exact."""
    eng = zipf_engine
    (rare, rare_df), (head, _) = _rare_and_head(eng)
    k = min(rare_df + 50, 300)
    assert _topk(eng, [rare, head], k, True) == \
        _topk(eng, [rare, head], k, False)


def test_maxscore_paths_leak_no_resources(clustered_engine, spark):
    """Public bm25_topk callers get no unpersist handle, so BOTH
    MaxScore paths must release their persisted partials / candidate
    broadcast before returning (r3 ADVICE: long-lived engines
    accumulated one block-manager entry per rare+head query)."""
    from konlspark.oracle import bm25_idf
    eng = clustered_engine
    meta = eng._term_meta(["rareterm", "headterm"])
    idf = {t: bm25_idf(eng.n_docs, m["df"]) for t, m in meta.items()}

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    base = n_persisted()
    out = eng._maxscore_topk(meta, idf, 10)          # driver path
    assert out is not None and len(out.collect()) > 0
    assert n_persisted() == base
    assert getattr(out, "_konl_persisted", None) is None

    old = eng.MAXSCORE_DRIVER_CANDIDATES
    eng.MAXSCORE_DRIVER_CANDIDATES = 0               # force distributed
    try:
        out = eng._maxscore_topk(meta, idf, 10)
        assert out is not None and len(out.collect()) > 0
        assert n_persisted() == base
        assert getattr(out, "_konl_persisted", None) is None
    finally:
        eng.MAXSCORE_DRIVER_CANDIDATES = old


def test_per_term_block_stats_semantics(clustered_engine, spark):
    """The two-stage partial top-k must reproduce the old window
    semantics exactly: mw = max, nb = count, ms = max salt, kth = k-th
    largest block_max_w (min of all when a term has < k blocks), plus
    the r7 ride-along doc-id span lo = min first / hi = max last."""
    eng = clustered_engine
    rows = [
        # term a: 5 blocks across salts, known weights + doc spans
        ("a", 0, 0, 9.0, 0, 10), ("a", 0, 1, 7.0, 11, 20),
        ("a", 1, 0, 8.0, 2, 15), ("a", 1, 1, 3.0, 16, 30),
        ("a", 2, 0, 5.0, 5, 25),
        # term b: fewer blocks than k
        ("b", 0, 0, 2.0, 100, 110), ("b", 0, 1, 4.0, 111, 120),
        # term c: one block
        ("c", 0, 0, 1.5, 7, 7),
    ]
    blocks = spark.createDataFrame(
        rows, "term string, salt int, block_seq int, block_max_w double,"
        " first_doc_id long, last_doc_id long"
    ).repartition(5)  # spread rows over partitions: the two-stage merge
    spans = {"a": (0, 30), "b": (100, 120), "c": (7, 7)}
    for k, want in [
        (3, {"a": (9.0, 5, 2, 7.0), "b": (4.0, 2, 0, 2.0),
             "c": (1.5, 1, 0, 1.5)}),
        (1, {"a": (9.0, 5, 2, 9.0), "b": (4.0, 2, 0, 4.0),
             "c": (1.5, 1, 0, 1.5)}),
        (99, {"a": (9.0, 5, 2, 3.0), "b": (4.0, 2, 0, 2.0),
              "c": (1.5, 1, 0, 1.5)}),
    ]:
        out = eng._per_term_block_stats(blocks, k).collect()
        got = {r["term"]: (r["mw"], r["nb"], r["ms"], r["kth"])
               for r in out}
        assert got == want, (k, got, want)
        assert {r["term"]: (r["lo"], r["hi"]) for r in out} == spans, k
