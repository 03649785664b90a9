"""Property tests for the delta+varint posting-block codec (FIXTURES.md §3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from konlspark import codec


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.decode_varint(codec.encode_varint(arr)), arr)


@given(
    st.lists(st.integers(min_value=1, max_value=2**40), min_size=1,
             max_size=2000, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_doc_id_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(codec.decode_doc_ids(codec.encode_doc_ids(arr)), arr)


def test_empty_arrays():
    assert codec.encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert codec.decode_varint(b"").size == 0
    assert codec.decode_doc_ids(b"").size == 0


def test_block_roundtrip():
    rng = np.random.default_rng(42)
    ids = np.sort(rng.choice(10**9, size=128, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 100, size=128)
    lens = rng.integers(1, 500, size=128)
    d, t, ln = codec.encode_block(ids, tfs, lens)
    ids2, tfs2, lens2 = codec.decode_block(d, t, ln)
    assert np.array_equal(ids2, ids)
    assert np.array_equal(tfs2, tfs)
    assert np.array_equal(lens2, lens)


def test_compression_is_real():
    # dense ids → ~1 byte per delta, 8x better than raw int64
    ids = np.arange(1, 100001, dtype=np.int64)
    enc = codec.encode_doc_ids(ids)
    assert len(enc) < 0.15 * ids.nbytes


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 10000])
def test_block_boundaries(n):
    ids = np.arange(1, n + 1, dtype=np.int64) * 3
    assert np.array_equal(codec.decode_doc_ids(codec.encode_doc_ids(ids)), ids)
