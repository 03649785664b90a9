"""Posting-block codec: delta + LEB128 varint, numpy-vectorized.

The reference stores one KV row per posting
(``/root/reference/konlsearch/set.py:54-95`` via
``inverted_index.py:60-63``); at 10^12-turn scale that layout is
untenable, so per the north rule we store block-compressed columnar
postings: sorted doc-id deltas + term frequencies + doc lengths, varint
encoded into ``binary`` columns, 128 postings per block by default.

Everything here is pure numpy (no Python-per-posting loops — at most 10
vectorized rounds per encode/decode regardless of block size), so it can
run inside Arrow ``mapInPandas`` stages at full speed.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized; ≤10 rounds)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += (tmp > 0)
        tmp >>= _U7
    ends = np.cumsum(nb)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    idx = ends - nb  # start offset per value
    work = v.copy()
    remaining = nb.copy()
    while True:
        active = remaining > 0
        if not active.any():
            break
        byte = (work & _U0x7F).astype(np.uint8)
        byte = np.where(remaining > 1, byte | np.uint8(0x80), byte)
        out[idx[active]] = byte[active]
        idx += active
        work >>= _U7
        remaining -= active
    return out.tobytes()


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    # value index for each byte, then bit position within its varint
    vid = np.cumsum(is_end) - is_end
    pos = (np.arange(b.size) - starts[vid]).astype(np.uint64)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (_U7 * pos)
    return np.bitwise_or.reduceat(contrib, starts)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta-encode a strictly-increasing int64 doc-id array, then varint."""
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    deltas = np.empty(ids.size, dtype=np.uint64)
    deltas[0] = np.uint64(ids[0])
    if ids.size > 1:
        deltas[1:] = np.diff(ids).astype(np.uint64)
    return encode_varint(deltas)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    deltas = decode_varint(buf)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray,
                 doc_lens: np.ndarray) -> Tuple[bytes, bytes, bytes]:
    """Encode one posting block (sorted unique doc_ids + parallel arrays)."""
    return (
        encode_doc_ids(doc_ids),
        encode_varint(np.asarray(tfs, dtype=np.uint64)),
        encode_varint(np.asarray(doc_lens, dtype=np.uint64)),
    )


def decode_block(doc_ids_delta: bytes, tfs: bytes,
                 doc_lens: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (
        decode_doc_ids(doc_ids_delta),
        decode_varint(tfs).astype(np.int64),
        decode_varint(doc_lens).astype(np.int64),
    )


def encode_positions(pos_lists) -> Tuple[bytes, bytes]:
    """Encode per-doc occurrence-position lists for one posting block.

    Positional postings are the classic two-level layout (same family as
    the doc-id codec above): a varint array of per-doc position COUNTS,
    then every doc's positions delta-encoded (first absolute, then gaps)
    and varint-packed into one concatenated stream. Within-doc positions
    are strictly increasing, so gaps are small → ~1 byte/occurrence for
    typical turns. A token present only via the whitespace-set branch
    (tf floored at 1, not in the ordered morph stream) has count 0.
    """
    counts = np.fromiter((len(p) for p in pos_lists), dtype=np.uint64,
                         count=len(pos_lists))
    if counts.sum() == 0:
        return encode_varint(counts), b""
    flat = np.concatenate(
        [np.asarray(p, dtype=np.int64) for p in pos_lists if len(p)])
    # vectorized per-doc delta: subtract the previous element everywhere,
    # then restore each doc's FIRST position to its absolute value
    deltas = np.empty(flat.size, dtype=np.int64)
    deltas[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=deltas[1:])
    starts = np.concatenate(([0], np.cumsum(counts[counts > 0])[:-1]
                             .astype(np.int64)))
    deltas[starts] = flat[starts]
    return encode_varint(counts), encode_varint(deltas.astype(np.uint64))


def decode_positions(counts_buf: bytes, vals_buf: bytes) -> list:
    """Inverse of :func:`encode_positions` → list of int64 arrays,
    one per doc in block order (empty array for count-0 docs)."""
    counts = decode_varint(counts_buf).astype(np.int64)
    vals = decode_varint(vals_buf).astype(np.int64)
    bounds = np.cumsum(counts)
    starts = bounds - counts
    return [np.cumsum(vals[s:e]) for s, e in zip(starts, bounds)]
