"""Distributed index build — the write path (SURVEY §2.3, §3.1).

Rebuilds the reference write pipeline (``index.py:299-327``: hash →
dedup → id-assign → tokenize → invert) as Spark jobs designed for
10^12-turn scale:

- **tokenize**: one ``mapInPandas`` pass (Arrow batches, shared
  tokenizer — no per-row Python UDFs);
- **dedup (B2)**: window over ``text_hash`` keeping the first
  occurrence in stable ``(conv_id, turn_idx)`` order; losers become a
  CONFLICT side-output with the winner's doc id
  (reference ``index.py:301-305``);
- **doc-id assignment (B1)**: dense 1-based ids in stable
  ``(conv_id, turn_idx)`` order, computed scalably as
  range-repartition → per-partition counts → cumulative offsets →
  per-partition ``row_number`` — no single-task global window;
- **posting build (B3)**: explode → *salted* repartition-by-term
  (explicit skew split for head terms; AQE does not fix groupBy skew) →
  per-group sort → delta+varint block encoding (``codec``) with
  per-block max-score metadata for block-max WAND;
- **resumable segmented build (B8/B7)**: postings built per doc-id-range
  segment with a fingerprinted checkpoint + metrics (terms/sec,
  postings/partition, skew ratio) per segment, then merged with
  ``sortWithinPartitions`` segment merges.
"""

from __future__ import annotations


import time
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codec
from . import tokenizer as tk
from .catalog import IndexCatalog
from .oracle import BM25_B, BM25_K1

DEFAULT_BLOCK_SIZE = 128
# max postings routed to one reducer group for a single term before the
# term is salt-split. Tuned empirically: 50k gives ~4x more (term,salt)
# groups than 200k, which keeps the encode stage load-balanced (tail
# tasks bounded) with no measurable per-group overhead — 200k showed
# superlinear encode time growth at 4M+ turns (straggler groups)
DEFAULT_TARGET_POSTINGS_PER_SPLIT = 50_000
DEFAULT_N_BUCKETS = 32

_ANALYZED_EXTRA = (
    "text_hash string, tokens array<string>, tfs array<int>, "
    "doc_len int, first_pos array<int>"
)

POSTINGS_SCHEMA = (
    "term string, salt int, block_seq int, n int, "
    "first_doc_id long, last_doc_id long, doc_ids_delta binary, "
    "tfs binary, doc_lens binary, block_max_tf int, block_max_w double"
)

# opt-in positional postings (build_index(store_positions=True)): two
# extra binary columns per block — per-doc position counts + the
# delta+varint position stream (codec.encode_positions)
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", pos_counts binary, positions binary"


# ---------------------------------------------------------------------------
# Tokenize (P1-P4) — one Arrow pass
# ---------------------------------------------------------------------------

def _analyze_record_batch(batch) -> "object":
    """One Arrow batch → same batch + tokens/tfs/doc_len/first_pos.

    Hand-built ``ListArray``s (offsets + flat values): the pandas
    object-column → Arrow conversion that ``mapInPandas`` would do per
    element is the dominant cost of the whole build at 1M+ rows.
    """
    import itertools

    import pyarrow as pa

    texts = batch.column(batch.schema.get_field_index("text")).to_pylist()
    toks, ords_, tfs, lens = tk.analyze_series(texts)
    firsts = []
    for token_set, ordered in zip(toks, ords_):
        # first occurrence per token in the ordered morph stream,
        # aligned with `tokens`; -1 = whitespace-set-only token
        pos = {}
        for i, t in enumerate(ordered):
            if t not in pos:
                pos[t] = i
        firsts.append([pos.get(t, -1) for t in token_set])
    offsets = np.zeros(len(toks) + 1, dtype=np.int32)
    np.cumsum([len(x) for x in toks], out=offsets[1:])
    off_arr = pa.array(offsets)
    tokens_arr = pa.ListArray.from_arrays(
        off_arr,
        pa.array(list(itertools.chain.from_iterable(toks)), pa.string()))
    tfs_arr = pa.ListArray.from_arrays(
        off_arr,
        pa.array(np.fromiter(itertools.chain.from_iterable(tfs),
                             dtype=np.int32, count=int(offsets[-1]))))
    firsts_arr = pa.ListArray.from_arrays(
        off_arr,
        pa.array(np.fromiter(itertools.chain.from_iterable(firsts),
                             dtype=np.int32, count=int(offsets[-1]))))
    lens_arr = pa.array(np.asarray(lens, dtype=np.int32))
    return pa.RecordBatch.from_arrays(
        list(batch.columns) + [tokens_arr, tfs_arr, lens_arr, firsts_arr],
        names=list(batch.schema.names)
        + ["tokens", "tfs", "doc_len", "first_pos"])


def _analyzed_schema(schema: T.StructType) -> T.StructType:
    return T.StructType.fromDDL(
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema)
        + ", " + _ANALYZED_EXTRA.replace("text_hash string, ", ""))


def analyze_transcripts(df: DataFrame) -> DataFrame:
    """Add text_hash/tokens/tfs/doc_len/first_pos to a transcript DF."""
    if "text_hash" not in df.columns:
        df = df.withColumn("text_hash", F.sha2(F.col("text"), 256))
    out_schema = _analyzed_schema(df.schema)

    def fn(batches):
        for batch in batches:
            yield _analyze_record_batch(batch)

    return df.mapInArrow(fn, out_schema)


# ---------------------------------------------------------------------------
# Doc-id assignment (B1) — two-pass, no single-task window
# ---------------------------------------------------------------------------

def assign_doc_ids(df: DataFrame, order_cols: Tuple[str, ...] = ("conv_id", "turn_idx"),
                   num_partitions: Optional[int] = None,
                   start_id: int = 1,
                   dedup_keys: Optional[Tuple[str, ...]] = None) -> DataFrame:
    """Dense ids ``start_id..`` in global ``order_cols`` order.

    Range-repartition by the order key, count rows per partition (tiny
    collect), broadcast cumulative offsets back, then rank *within* each
    partition — every stage is parallel; the only driver-side data is
    one count per partition. The input is persisted so both passes see
    the same partitioning (repartitionByRange samples its boundaries).

    ``dedup_keys``: optional column tuple — among rows EQUAL on all of
    them, exactly one survives (see :func:`_prepare_ranked`).
    """
    ranged, b_off, out_schema, n_dropped, n_rows = _prepare_ranked(
        df, order_cols, num_partitions, start_id, dedup_keys=dedup_keys)
    out = ranged.mapInArrow(
        _make_rank_fn(b_off, out_schema, dedup_keys=dedup_keys), out_schema)
    # hand the persisted intermediate to the caller so it can unpersist
    # once downstream results are materialized (avoids cache leak)
    out._konl_persisted = ranged  # type: ignore[attr-defined]
    out._konl_n_rows = n_rows  # type: ignore[attr-defined]
    out._konl_max_id = start_id + n_rows - 1  # type: ignore[attr-defined]
    out._konl_n_dropped = n_dropped  # type: ignore[attr-defined]
    return out


def _dedup_carry_filter(batch, key_names, prev):
    """Drop rows equal to their predecessor on ``key_names`` (batch-
    boundary aware: ``prev`` is the last key tuple of the previous
    batch). Rows must arrive sorted by the keys (equal runs adjacent).
    Returns ``(filtered_batch, new_prev, n_dropped)``."""
    import pyarrow as pa
    import pyarrow.compute as pc
    n = batch.num_rows
    if n == 0:
        return batch, prev, 0
    cols = [batch.column(batch.schema.get_field_index(k)) for k in key_names]
    keep = np.ones(n, dtype=bool)
    if n > 1:
        eq = None
        for c in cols:
            a, b = c.slice(1), c.slice(0, n - 1)
            # null-safe equality (null == null → equal), matching the
            # countDistinct-over-struct semantics of the paired count
            # pass: pc.equal yields null when either side is null (a
            # null text → null sha2 text_hash), and `~None` raised
            # TypeError below, failing the whole build on one null key
            e = pc.fill_null(
                pc.or_kleene(pc.equal(a, b),
                             pc.and_(pc.is_null(a), pc.is_null(b))),
                False)
            eq = e if eq is None else pc.and_(eq, e)
        keep[1:] = ~eq.to_numpy(zero_copy_only=False)
    if prev is not None:
        first = tuple(c[0].as_py() for c in cols)
        if first == prev:
            keep[0] = False
    new_prev = tuple(c[n - 1].as_py() for c in cols)
    n_drop = int(n - keep.sum())
    if n_drop == 0:
        return batch, new_prev, 0
    return batch.filter(pa.array(keep)), new_prev, n_drop


def _prepare_ranked(df: DataFrame, order_cols, num_partitions, start_id,
                    dedup_keys: Optional[Tuple[str, ...]] = None):
    """Range-partition + sort + per-partition offsets (the two-pass
    half of doc-id assignment, shared by the plain and fused paths).

    ``dedup_keys``: when set, rows equal on ALL of them keep exactly one
    survivor — closing the duplicate-``(conv_id, turn_idx)`` hole where
    two input rows with identical key AND identical text both pass the
    winner-key dedup filter (no pure row expression can break that tie).
    The keys are appended to the within-partition sort so equal rows are
    adjacent and the rank pass drops run-repeats deterministically; the
    count pass counts the SAME survivors as ``countDistinct`` over the
    keys per partition — pure JVM (hash-distinct, no Python round-trip),
    and provably equal to what the rank pass emits (distinct key tuples
    per partition), so ids stay dense.

    Returns ``(ranged, b_off, out_schema, n_dup_dropped, n_rows)`` —
    ``n_rows`` is the post-dedup row count (ids are dense ``start_id ..
    start_id + n_rows - 1``, so callers need no count/max agg job).
    """
    spark = df.sparkSession
    parts = num_partitions or spark.conf.get("spark.sql.shuffle.partitions")
    sort_cols = list(order_cols) + [k for k in (dedup_keys or ())
                                    if k not in order_cols]
    ranged = (
        df.repartitionByRange(int(parts), *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_dropped = 0
    if dedup_keys is None:
        counts = {r["_pid"]: r["cnt"] for r in
                  ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    else:
        # survivor count per partition via the SAME adjacent-run filter
        # the rank pass applies (r9, VERDICT r8 directive 2): the old
        # countDistinct-over-struct formulation shuffled one wide
        # (conv_id, turn_idx, 64-char hash) row per distinct key —
        # ~n_rows rows, a second near-full exchange of the corpus keys
        # (~31 core-s at 1M turns). Rows are sorted by exactly the
        # dedup keys within each partition, so distinct == adjacent
        # runs, and counting through _dedup_carry_filter itself makes
        # count-vs-rank equality hold by shared code rather than by
        # argument (null-safe included). One narrow Arrow map pass,
        # zero shuffle, one output row per partition.
        keys = list(dedup_keys)

        def count_fn(batches):
            import pyarrow as pa
            prev, pid, cnt, tot = None, None, 0, 0
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                if pid is None:
                    pid = int(batch.column(
                        batch.schema.get_field_index("_pid"))[0].as_py())
                tot += batch.num_rows
                kept, prev, _ = _dedup_carry_filter(batch, keys, prev)
                cnt += kept.num_rows
            yield pa.RecordBatch.from_arrays(
                [pa.array([-1 if pid is None else pid], pa.int32()),
                 pa.array([cnt], pa.int64()), pa.array([tot], pa.int64())],
                names=["_pid", "cnt", "tot"])

        rows = (ranged.select("_pid", *keys)
                .mapInArrow(count_fn, "_pid int, cnt long, tot long")
                .collect())
        counts = {r["_pid"]: r["cnt"] for r in rows if r["_pid"] >= 0}
        n_dropped = sum(r["tot"] - r["cnt"] for r in rows)
    offsets, acc = {}, start_id - 1
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_off = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(
        [f for f in ranged.schema if f.name != "_pid"]
        + [T.StructField("doc_id", T.LongType(), False)])
    return ranged, b_off, out_schema, n_dropped, acc - (start_id - 1)


def _rank_batch(batch, pos, b_off, names):
    """Append dense doc ids to one sorted Arrow batch; returns
    (ranked_batch, next_pos)."""
    import pyarrow as pa
    n = batch.num_rows
    if pos is None:
        pid_idx = batch.schema.get_field_index("_pid")
        pos = b_off.value[int(batch.column(pid_idx)[0].as_py())]
    arrays = [batch.column(c) for c in names[:-1]]
    arrays.append(pa.array(np.arange(pos + 1, pos + 1 + n, dtype=np.int64)))
    return pa.RecordBatch.from_arrays(arrays, names=names), pos + n


def _make_rank_fn(b_off, out_schema, dedup_keys=None):
    names = [f.name for f in out_schema]
    keys = list(dedup_keys) if dedup_keys else None

    def rank_partition(batches) -> Iterator:
        # rows arrive in sorted order within the partition; ids are the
        # partition's cumulative offset + local position (no shuffle, no
        # window — a pure Arrow map stage over the persisted data)
        pos, prev = None, None
        for batch in batches:
            if keys:
                batch, prev, _ = _dedup_carry_filter(batch, keys, prev)
            if batch.num_rows == 0:
                continue
            out, pos = _rank_batch(batch, pos, b_off, names)
            yield out

    return rank_partition


# ---------------------------------------------------------------------------
# Dedup (B2) + docs table
# ---------------------------------------------------------------------------

# above this many distinct duplicated hashes the winner map is joined
# with a shuffle instead of broadcast (~50B/entry → ~100 MB broadcast)
DEDUP_BROADCAST_LIMIT = 2_000_000

_DEDUP_KEYS = ("conv_id", "turn_idx", "text_hash")


def dup_winner_map(hashed: DataFrame, key, hash_col: str = "text_hash",
                   only_dups: bool = True) -> DataFrame:
    """The narrow dedup decision shared by :func:`build_docs`,
    ``ingest.append_batch`` and ``ops.dedup.exact_dedup``: one map-side-
    combined aggregate over ``(hash, key)`` giving each hash's group
    size and first-occurrence winner key. Never shuffles full rows —
    survivors are selected by re-joining this (tiny, AQE-broadcastable
    once filtered to ``_n > 1``) map back onto the source scan.
    """
    agg = (hashed.groupBy(hash_col)
           .agg(F.count("*").alias("_n"), F.min(key).alias("_wk")))
    return agg.filter(F.col("_n") > 1) if only_dups else agg


def build_docs(transcripts: DataFrame,
               num_partitions: Optional[int] = None) -> Tuple[DataFrame, DataFrame]:
    """Dedup + assign ids + analyze (one fused Python stage).

    Returns ``(docs, losers)``: ``docs`` carries dense 1-based ``doc_id``
    over first-occurrence survivors; ``losers`` are the duplicate turns
    ``(conv_id, turn_idx, text_hash)`` — join them against the written
    docs table on ``text_hash`` to produce the reference's CONFLICT
    report with the winning doc id (``index.py:301-305``).

    Dedup shape: duplicates are SPARSE in real corpora, so the dedup
    decision never shuffles full rows. A narrow aggregate over
    ``(text_hash, conv_id, turn_idx)`` (map-side combined) finds hashes
    with >1 occurrence and their first-occurrence winner key; survivors
    are then a broadcast-filtered scan (or a narrow-key shuffle join
    past ``DEDUP_BROADCAST_LIMIT``). The only full-row shuffle in the
    whole docs path is the unavoidable range-repartition that gives
    dense ordered ids. (The previous shape — a row_number window over
    full rows by text_hash — shuffled and persisted the corpus twice.)

    ``(conv_id, turn_idx)`` SHOULD be unique in the input; when it is
    not, rows sharing both the key and the text (fully identical
    duplicates, which no pure row expression can tie-break) keep exactly
    ONE survivor via the deterministic adjacent-drop inside the ranked
    count/rank passes (``_prepare_ranked(dedup_keys=...)``), and the
    dropped copies are reported as CONFLICT losers; rows sharing the key
    with DIFFERENT texts both survive (they are distinct documents).
    The text-unique docs invariant holds unconditionally.
    """
    hashed = transcripts.withColumn("text_hash", F.sha2(F.col("text"), 256))
    key = F.struct(F.col("conv_id"), F.col("turn_idx"))
    # broadcast-vs-shuffle is left to AQE (adaptive.enabled in
    # session.py): the agg's shuffle stage gives AQE an exact size, so a
    # sparse-dup corpus gets a broadcast probe with NO extra driver
    # action, and a dup-heavy one falls back to a narrow-key shuffle join
    dup_winners = (dup_winner_map(hashed, key).select("text_hash", "_wk")
                   .persist(StorageLevel.MEMORY_AND_DISK))
    joined = hashed.join(dup_winners, "text_hash", "left")
    survivors = (joined.filter(F.col("_wk").isNull() | (key == F.col("_wk")))
                 .drop("_wk"))
    losers = (joined.filter(F.col("_wk").isNotNull() & (key != F.col("_wk")))
              .select("conv_id", "turn_idx", "text_hash"))

    # fused id-assignment + tokenization: ONE Python stage (one worker
    # set, one Arrow round-trip) instead of two chained map stages
    ranged, b_off, ids_schema, n_dropped, n_rows = _prepare_ranked(
        survivors, ("conv_id", "turn_idx"), num_partitions, 1,
        dedup_keys=_DEDUP_KEYS)
    names = [f.name for f in ids_schema]
    out_schema = _analyzed_schema(ids_schema)
    keys = list(_DEDUP_KEYS)

    def fused(batches) -> Iterator:
        pos, prev = None, None
        for batch in batches:
            batch, prev, _ = _dedup_carry_filter(batch, keys, prev)
            if batch.num_rows == 0:
                continue
            with_id, pos = _rank_batch(batch, pos, b_off, names)
            yield _analyze_record_batch(with_id)

    docs = ranged.mapInArrow(fused, out_schema)
    if n_dropped > 0:
        # fully-identical duplicate rows were dropped in the ranked pass
        # — surface each dropped copy in the CONFLICT report (one narrow
        # aggregate, run only on degenerate inputs)
        # survivorship mirror, null-safe (r4 ADVICE class): the main
        # path left-equi-joins on text_hash (NULL hash never matches →
        # _wk stays null → row survives), so the extra-loser condition
        # must be the SAME left join + (_wk IS NULL OR key == _wk) —
        # an inner join dropped null-text duplicate groups entirely
        key_cnt = (hashed.groupBy("text_hash", "conv_id", "turn_idx")
                   .agg(F.count("*").alias("_kc")).filter(F.col("_kc") > 1))
        extra = (key_cnt.join(dup_winners, "text_hash", "left")
                 .filter(F.col("_wk").isNull() | (key == F.col("_wk")))
                 .withColumn("_i", F.explode(
                     F.sequence(F.lit(2), F.col("_kc"))))
                 .select("conv_id", "turn_idx", "text_hash"))
        losers = losers.unionByName(extra)
    docs._konl_persisted = ranged  # type: ignore[attr-defined]
    docs._konl_persisted2 = dup_winners  # type: ignore[attr-defined]
    docs._konl_n_rows = n_rows  # type: ignore[attr-defined]
    docs._konl_max_id = n_rows  # ids are dense 1..n_rows
    return docs, losers


# ---------------------------------------------------------------------------
# Posting build (B3) — salted skew-split + block encoding
# ---------------------------------------------------------------------------

def _bm25_w(tfs: np.ndarray, doc_lens: np.ndarray, avgdl: float) -> np.ndarray:
    """idf-less BM25 term weight (idf applied at query time from df)."""
    tfs = tfs.astype(np.float64)
    return (tfs * (BM25_K1 + 1.0)) / (
        tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_lens.astype(np.float64) / avgdl)
    )


def explode_postings(docs: DataFrame) -> DataFrame:
    """docs → (term, doc_id, tf, doc_len) rows."""
    return (
        docs.select(
            "doc_id", "doc_len",
            F.explode(F.arrays_zip("tokens", "tfs")).alias("p"),
        )
        .select(
            F.col("p.tokens").alias("term"),
            "doc_id",
            F.col("p.tfs").alias("tf"),
            "doc_len",
        )
    )


def explode_postings_with_positions(docs: DataFrame) -> DataFrame:
    """docs → (term, doc_id, tf, doc_len, positions) rows.

    Positions are the token's occurrence indices in the SAME ordered
    morph stream the contiguous-phrase recompute path walks
    (``tk.tokenize_with_order(text)``) — stored-vs-recompute parity is
    exact by construction. A whitespace-set-only token (in ``tokens``
    but absent from the ordered stream) gets an empty list; neither
    path can phrase-match it. One extra Arrow tokenize pass over the
    docs — the documented cost of ``store_positions=True``.
    """
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            terms, ids, tfs, lens, poss = [], [], [], [], []
            for doc_id, dlen, text, toks, tfv in zip(
                    pdf["doc_id"], pdf["doc_len"], pdf["text"],
                    pdf["tokens"], pdf["tfs"]):
                pos: dict = {}
                for i, t in enumerate(tk.tokenize_with_order(text)):
                    pos.setdefault(t, []).append(i)
                for t, tf in zip(toks, tfv):
                    terms.append(t)
                    ids.append(doc_id)
                    tfs.append(tf)
                    lens.append(dlen)
                    poss.append(pos.get(t, []))
            yield pd.DataFrame({
                "term": terms,
                "doc_id": pd.Series(ids, dtype="int64"),
                "tf": pd.Series(tfs, dtype="int32"),
                "doc_len": pd.Series(lens, dtype="int32"),
                "positions": poss,
            })

    return docs.select("doc_id", "doc_len", "text", "tokens", "tfs") \
        .mapInPandas(fn, "term string, doc_id long, tf int, doc_len int, "
                         "positions array<int>")


def build_postings(docs: DataFrame, avgdl: float,
                   block_size: int = DEFAULT_BLOCK_SIZE,
                   target_per_split: int = DEFAULT_TARGET_POSTINGS_PER_SPLIT,
                   n_buckets: int = DEFAULT_N_BUCKETS,
                   exploded: Optional[DataFrame] = None,
                   term_df: Optional[DataFrame] = None,
                   store_positions: bool = False) -> DataFrame:
    """Blocked, compressed postings from a docs DF.

    Skew handling: term df is Zipfian; a plain ``groupBy(term)`` routes a
    head term's entire posting list to one reducer. We pre-compute df,
    broadcast-join the (tiny) head-term split counts, and salt with
    ``pmod(xxhash64(doc_id), n_splits)`` so no group exceeds
    ``target_per_split`` postings. Blocks from different salts of one
    term may overlap in doc-id range — readers never assume disjoint
    ranges (each doc appears in exactly one block per term).
    """
    if store_positions:
        # the shared tokens/tfs explode carries no positions — always
        # derive the positional explode, even when a plain `exploded`
        # was passed for the df computation
        exploded = explode_postings_with_positions(docs)
    elif exploded is None:
        exploded = explode_postings(docs)
    if term_df is None:
        # df per term: map-side partial agg keeps this cheap even on skew
        term_df = exploded.groupBy("term").agg(F.count("*").alias("df"))
    head = (
        term_df.filter(F.col("df") > target_per_split)
        .withColumn("n_splits",
                    F.ceil(F.col("df") / F.lit(target_per_split)).cast("int"))
        .select("term", "n_splits")
    )
    salted = (
        exploded.join(F.broadcast(head), "term", "left")
        .withColumn(
            "salt",
            F.when(F.col("n_splits").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64("doc_id"), F.col("n_splits")).cast("int")
            ),
        )
        .drop("n_splits")
    )

    def encode_group(key, pdf):
        term, salt = key
        pdf = pdf.sort_values("doc_id")
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        lens = pdf["doc_len"].to_numpy(dtype=np.int64)
        pos_col = (pdf["positions"].to_numpy() if store_positions else None)
        rows = []
        for seq, lo in enumerate(range(0, len(ids), block_size)):
            hi = min(lo + block_size, len(ids))
            b_ids, b_tfs, b_lens = ids[lo:hi], tfs[lo:hi], lens[lo:hi]
            d, t, ln = codec.encode_block(b_ids, b_tfs, b_lens)
            w = _bm25_w(b_tfs, b_lens, avgdl)
            row = (term, int(salt), seq, int(hi - lo),
                   int(b_ids[0]), int(b_ids[-1]), d, t, ln,
                   int(b_tfs.max()), float(w.max()))
            if store_positions:
                row += codec.encode_positions(list(pos_col[lo:hi]))
            rows.append(row)
        cols = [
            "term", "salt", "block_seq", "n", "first_doc_id", "last_doc_id",
            "doc_ids_delta", "tfs", "doc_lens", "block_max_tf", "block_max_w",
        ]
        if store_positions:
            cols += ["pos_counts", "positions"]
        return pd.DataFrame(rows, columns=cols)

    # NOTE (r3 measured): a one-shuffle variant — repartition the
    # exploded rows by (term_bucket, salt) + JVM sort + streaming
    # encode — was tried and REVERTED: (bucket, salt) has only
    # ~n_buckets·avg_salts distinct keys, which caps encode parallelism
    # and skews partitions (16c@4M: 44s → 52-68s). The two-shuffle
    # shape keeps thousands of (term, salt) keys for the expensive
    # encode stage; the second shuffle moves already-compressed blocks
    # (tiny) purely for write co-location.
    #
    # NOTE (r9 measured, second rejected variant): a streaming
    # mapInArrow encoder over repartition(term, salt) +
    # sortWithinPartitions (no per-group pandas conversion, vectorized
    # group-boundary detection) was built and A/B'd interleaved at 1M
    # turns/32c. Isolated it is steadier (4.4s vs 3.8-8.3s) but in the
    # full build its stage burns ~2x the JVM task CPU of
    # FlatMapGroupsInPandas (~95 vs ~41 core-s), crowding out the
    # concurrent token_dict/conflicts jobs: full-build postings phase
    # 10.1-12.7s vs 5.5-12.1s for applyInPandas. The per-group
    # overhead this would remove is small here (~7k groups — salt
    # splitting keeps groups at ~block size), so applyInPandas stays.
    postings = (
        salted.groupBy("term", "salt")
        .applyInPandas(encode_group,
                       POSTINGS_POS_SCHEMA if store_positions
                       else POSTINGS_SCHEMA)
        .withColumn("term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        # co-locate on (bucket, salt) before the partitionBy write:
        # blocks are compressed (cheap to move), file count stays
        # ~min(groups, shuffle.partitions) per bucket instead of
        # n_tasks*n_buckets, and write parallelism is not capped at
        # n_buckets the way a bucket-only repartition caps it
        .repartition(F.col("term_bucket"), F.col("salt"))
    )
    return postings


def build_token_dict(docs: Optional[DataFrame] = None,
                     term_df: Optional[DataFrame] = None) -> DataFrame:
    """term → (decomposed, df, term_bucket) — replaces the reference trie
    (``trie.py:139-154``): prefix search becomes a range predicate on the
    sorted ``decomposed`` column (SURVEY §2.4 Q6)."""

    @F.pandas_udf(T.StringType())
    def decompose_udf(s: pd.Series) -> pd.Series:
        return s.map(tk.decompose)

    if term_df is None:
        term_df = (docs.select(F.explode("tokens").alias("term"))
                   .groupBy("term").agg(F.count("*").alias("df")))
    return term_df.withColumn("decomposed", decompose_udf("term"))


# ---------------------------------------------------------------------------
# Full build (one-shot and segmented+resumable)
# ---------------------------------------------------------------------------

def build_index(spark: SparkSession, transcripts: DataFrame, root: str,
                block_size: int = DEFAULT_BLOCK_SIZE,
                target_per_split: int = DEFAULT_TARGET_POSTINGS_PER_SPLIT,
                n_buckets: Optional[int] = None,
                n_segments: int = 1,
                resume: bool = True,
                store_positions: bool = False) -> dict:
    """Build a queryable index at ``root``; returns the manifest.

    ``n_segments > 1`` builds postings per doc-id-range segment with a
    fingerprinted checkpoint each (resume skips committed segments),
    then merges segments into the final postings table.

    ``n_buckets`` defaults to ``max(32, cluster parallelism)`` — the
    bucket count caps posting-write parallelism (one file per bucket),
    so it must grow with the cluster, not stay pinned at 32.

    ``store_positions=True`` stores per-occurrence positions in the
    posting blocks (codec.encode_positions) and records it in the
    manifest; ``search_phrase_contiguous`` then verifies adjacency from
    stored positions instead of re-tokenizing candidate docs — at the
    100 TB target, a phrase of common morphs has a df(rarest)-bounded
    but still huge candidate set, and the per-doc Python re-tokenize
    becomes the floor the stored path removes. Appends and compaction
    inherit the flag from the manifest.
    """
    if n_buckets is None:
        n_buckets = max(DEFAULT_N_BUCKETS,
                        spark.sparkContext.defaultParallelism)
    cat = IndexCatalog(root)
    t0 = time.time()
    phases: dict = {}

    def mark(name: str, since: float) -> float:
        now = time.time()
        phases[name] = round(now - since, 2)
        return now

    import threading
    side_errs: List[BaseException] = []

    def _bg(fn) -> threading.Thread:
        def run():
            try:
                fn()
            except BaseException as e:  # re-raised on join below
                side_errs.append(e)
        th = threading.Thread(target=run, daemon=True)
        th.start()
        return th

    docs_lazy, losers = build_docs(transcripts)
    t = mark("dedup_assign_ids", t0)

    # write docs FIRST: tokenization runs exactly once, streamed straight
    # into the parquet write (no wide-row cache); every downstream pass
    # (explode, segments) re-reads the columnar file with column
    # pruning — cheaper than caching tokenized rows in the block manager.
    # Σ doc_len rides along as an observe() metric (r9, guide §1/VERDICT
    # r8 directive 2): the corpus-stats aggregation was its own scan job
    # (the docs_stats phase — 53% serial in the r8 Amdahl attribution);
    # CollectMetrics folds it into the very write pass that produces the
    # rows, so the phase collapses to a metric read.
    from pyspark.sql import Observation
    obs = Observation("docs_stats")
    (docs_lazy.observe(obs, F.sum("doc_len").alias("total_doc_len"))
     .write.mode("overwrite").parquet(cat.table_path("docs")))
    t = mark("tokenize_write_docs", t)
    docs = spark.read.parquet(cat.table_path("docs"))

    # CONFLICT report is independent of everything below — run it as a
    # concurrent job the moment the docs table exists
    def _write_conflicts() -> None:
        # null-hash losers exist only via the identical-(key, null-text)
        # extra path, and there the WINNER shares the key — so resolve
        # non-null losers by hash alone (unchanged equi-join) and null
        # ones by key; eqNullSafe keeps this a hash-joinable key
        dsel = docs.select(F.col("text_hash").alias("_dh"),
                           F.col("conv_id").alias("_dc"),
                           F.col("turn_idx").alias("_dt"),
                           F.col("doc_id").alias("conflict_doc_id"))
        cond = F.col("text_hash").eqNullSafe(F.col("_dh")) & (
            F.col("text_hash").isNotNull()
            | (F.col("conv_id").eqNullSafe(F.col("_dc"))
               & F.col("turn_idx").eqNullSafe(F.col("_dt"))))
        conflicts = (losers.join(dsel, cond)
                     .select("conv_id", "turn_idx", "conflict_doc_id"))
        conflicts.write.mode("overwrite").parquet(cat.table_path("conflicts"))

    side_threads = [_bg(_write_conflicts)]

    # explode once; term_df feeds token_dict AND the salting decision
    # (cached — whichever concurrent consumer runs first fills it, the
    # other reads the cache behind the block locks)
    exploded = explode_postings(docs)
    term_df = (exploded.groupBy("term").agg(F.count("*").alias("df"))
               .persist(StorageLevel.MEMORY_AND_DISK))

    # token_dict write is independent of the postings build AND of the
    # corpus stats — run it as a CONCURRENT job (Spark schedules jobs
    # from separate driver threads onto idle task slots) so its driver
    # barrier overlaps the stats agg + postings stage instead of
    # serializing before them
    def _write_token_dict() -> None:
        token_dict = build_token_dict(term_df=term_df).withColumn(
            "term_bucket",
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
        (token_dict.repartitionByRange(max(1, n_buckets // 4), "decomposed")
                   .sortWithinPartitions("decomposed")
                   .write.mode("overwrite").parquet(cat.table_path("token_dict")))

    side_threads.append(_bg(_write_token_dict))

    # n_docs / max_doc_id fall out of the ranked offsets (dense ids —
    # no count/max agg job); Σ doc_len was observed during the docs
    # write above, so no stats scan remains (obs.get returns instantly:
    # the write action already completed)
    n_docs = int(getattr(docs_lazy, "_konl_n_rows"))
    max_doc_id = int(getattr(docs_lazy, "_konl_max_id"))
    total_doc_len = float(obs.get["total_doc_len"] or 0.0)
    avgdl = (total_doc_len / n_docs) if n_docs else 1.0
    t = mark("docs_stats", t)

    build_metrics: List[dict] = []
    if n_segments <= 1:
        postings = build_postings(docs, avgdl, block_size,
                                  target_per_split, n_buckets,
                                  exploded=exploded, term_df=term_df,
                                  store_positions=store_positions)
        (postings.write.mode("overwrite").partitionBy("term_bucket")
                 .parquet(cat.table_path("postings")))
    else:
        seg_dirs = _build_segments(
            spark, cat, docs, avgdl, n_docs, max_doc_id, n_segments,
            block_size, target_per_split, n_buckets, resume, build_metrics,
            term_df=term_df, store_positions=store_positions)
        merge_segments(spark, seg_dirs, cat.table_path("postings"),
                       avgdl, block_size, n_buckets,
                       store_positions=store_positions)
    for th in side_threads:
        th.join()
    if side_errs:
        raise side_errs[0]
    t = mark("write_postings_and_side_tables", t)
    term_df.unpersist()
    for attr in ("_konl_persisted", "_konl_persisted2"):
        persisted = getattr(docs_lazy, attr, None)
        if persisted is not None:
            persisted.unpersist()
    manifest = {
        "format_version": 1,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "avgdl_built": avgdl,
        "total_doc_len": total_doc_len,
        "max_doc_id": max_doc_id,
        "next_part": 1,
        "tables": {"docs": ["docs"], "postings": ["postings"],
                   "token_dict": ["token_dict"], "tombstones": []},
        "n_buckets": n_buckets,
        "block_size": block_size,
        "bm25": {"k1": BM25_K1, "b": BM25_B},
        "build_seconds": time.time() - t0,
        "build_phases": phases,
        "n_segments": n_segments,
        "segment_metrics": build_metrics,
        "positions": store_positions,
    }
    cat.commit_manifest(manifest)
    return manifest


def _segment_fingerprint(n_docs: int, max_doc_id: int, seg: int,
                         n_segments: int, block_size: int,
                         store_positions: bool = False) -> str:
    pos = ":pos" if store_positions else ""
    return f"v1:{n_docs}:{max_doc_id}:{seg}/{n_segments}:bs{block_size}{pos}"


def _build_segments(spark, cat: IndexCatalog, docs: DataFrame, avgdl: float,
                    n_docs: int, max_doc_id: int, n_segments: int,
                    block_size: int, target_per_split: int, n_buckets: int,
                    resume: bool, metrics_out: List[dict],
                    term_df: Optional[DataFrame] = None,
                    store_positions: bool = False) -> List[str]:
    """Per-segment posting build with checkpoint + lineage + metrics."""
    seg_dirs = []
    bound = max_doc_id + 1
    for seg in range(n_segments):
        seg_id = f"segment={seg:05d}"
        seg_dir = cat.table_path(f"_segments/{seg_id}")
        seg_dirs.append(seg_dir)
        fp = _segment_fingerprint(n_docs, max_doc_id, seg, n_segments,
                                  block_size, store_positions)
        if resume and cat.segment_committed(seg_id, fp):
            continue
        t0 = time.time()
        lo = 1 + seg * bound // n_segments
        hi = 1 + (seg + 1) * bound // n_segments
        seg_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        # global term_df over-estimates per-segment df → at worst a few
        # extra salt splits for head terms; saves a per-segment agg pass
        postings = build_postings(seg_docs, avgdl, block_size,
                                  target_per_split, n_buckets,
                                  term_df=term_df,
                                  store_positions=store_positions)
        postings.write.mode("overwrite").parquet(seg_dir)
        agg = spark.read.parquet(seg_dir).groupBy(
            F.spark_partition_id().alias("_p")).agg(
            F.sum("n").alias("postings"), F.countDistinct("term").alias("terms"))
        rows = agg.collect()
        postings_per_part = [int(r["postings"]) for r in rows] or [0]
        n_postings = sum(postings_per_part)
        n_terms = sum(int(r["terms"]) for r in rows)
        elapsed = time.time() - t0
        mean_p = max(1.0, n_postings / max(1, len(postings_per_part)))
        entry = {
            "fingerprint": fp,
            "lineage": {"doc_id_range": [lo, hi], "input_docs_table": "docs"},
            "metrics": {
                "elapsed_sec": elapsed,
                "postings": n_postings,
                "terms": n_terms,
                "terms_per_sec": n_terms / elapsed if elapsed > 0 else 0.0,
                "postings_per_partition": postings_per_part,
                "skew_ratio": max(postings_per_part) / mean_p,
            },
        }
        cat.commit_segment(seg_id, entry)
        metrics_out.append({seg_id: entry})
    return seg_dirs


def merge_segments(spark: SparkSession, seg_dirs: List[str], out_path: str,
                   avgdl: float, block_size: int, n_buckets: int,
                   store_positions: bool = False) -> None:
    """B7: union segment posting blocks → repartition by (term, salt) →
    sortWithinPartitions → decode-concat-re-encode into final blocks.

    Segments hold disjoint doc-id ranges, so concatenating their decoded
    arrays in ``first_doc_id`` order is already globally sorted per term.
    Positional segments re-encode the per-doc position lists alongside.
    """
    union = spark.read.parquet(*seg_dirs)

    def merge_group(key, pdf):
        term, salt = key
        pdf = pdf.sort_values("first_doc_id")
        ids = np.concatenate([codec.decode_doc_ids(b) for b in pdf["doc_ids_delta"]])
        tfs = np.concatenate([codec.decode_varint(b).astype(np.int64)
                              for b in pdf["tfs"]])
        lens = np.concatenate([codec.decode_varint(b).astype(np.int64)
                               for b in pdf["doc_lens"]])
        order = np.argsort(ids, kind="stable")
        ids, tfs, lens = ids[order], tfs[order], lens[order]
        if store_positions:
            pos_all = [p for c, v in zip(pdf["pos_counts"], pdf["positions"])
                       for p in codec.decode_positions(c, v)]
            pos_all = [pos_all[i] for i in order]
        rows = []
        for seq, lo in enumerate(range(0, len(ids), block_size)):
            hi = min(lo + block_size, len(ids))
            d, t, ln = codec.encode_block(ids[lo:hi], tfs[lo:hi], lens[lo:hi])
            w = _bm25_w(tfs[lo:hi], lens[lo:hi], avgdl)
            row = (term, int(salt), seq, int(hi - lo),
                   int(ids[lo]), int(ids[hi - 1]), d, t, ln,
                   int(tfs[lo:hi].max()), float(w.max()))
            if store_positions:
                row += codec.encode_positions(pos_all[lo:hi])
            rows.append(row)
        cols = [
            "term", "salt", "block_seq", "n", "first_doc_id", "last_doc_id",
            "doc_ids_delta", "tfs", "doc_lens", "block_max_tf", "block_max_w",
        ]
        if store_positions:
            cols += ["pos_counts", "positions"]
        return pd.DataFrame(rows, columns=cols)

    merged = (
        union.repartition("term", "salt")
        .groupBy("term", "salt")
        .applyInPandas(merge_group,
                       POSTINGS_POS_SCHEMA if store_positions
                       else POSTINGS_SCHEMA)
        .withColumn("term_bucket",
                    F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )
    merged.write.mode("overwrite").partitionBy("term_bucket").parquet(out_path)
