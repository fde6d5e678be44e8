"""Posting codec round-trip properties (SURVEY.md §5.2-4), block boundaries
at 128 exercised — BasePostingsFormatTestCase analog."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    decode_postings,
    encode_posting_blocks,
)
from lucene_solr_spark.util.varint import decode_varints, encode_varints


def test_varint_empty():
    assert encode_varints(np.array([], dtype=np.int64)) == b""
    assert decode_varints(b"").size == 0


def test_varint_lucene_wire_format():
    # writeVInt examples: 127 → 0x7F; 128 → 0x80 0x01; 300 → 0xAC 0x02
    assert encode_varints(np.array([127])) == b"\x7f"
    assert encode_varints(np.array([128])) == b"\x80\x01"
    assert encode_varints(np.array([300])) == b"\xac\x02"
    assert encode_varints(np.array([0])) == b"\x00"


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out = decode_varints(encode_varints(arr))
    np.testing.assert_array_equal(out, arr)


@given(
    st.integers(min_value=1, max_value=400),       # n postings (crosses 128/256)
    st.integers(min_value=0, max_value=10**10),    # doc id base (big-scale ids)
    st.integers(min_value=0, max_value=999),       # seed
)
@settings(max_examples=60, deadline=None)
def test_posting_blocks_roundtrip(n, base, seed):
    rng = np.random.default_rng(seed)
    docs = base + np.cumsum(rng.integers(1, 1000, size=n))
    tfs = rng.integers(1, 20, size=n)
    norms = rng.integers(0, 256, size=n)
    pos = np.concatenate([
        np.sort(rng.choice(5000, size=int(t), replace=False)) for t in tfs
    ])
    blocks = encode_posting_blocks(docs, tfs, norms, pos)
    assert len(blocks) == -(-n // BLOCK_SIZE)
    d2, t2, p2 = decode_postings(blocks, with_positions=True)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    np.testing.assert_array_equal(p2, pos)
    # impact + skip metadata invariants
    k = 0
    for b in blocks:
        sl = slice(k, k + b["n"])
        assert b["first_doc"] == docs[sl.start]
        assert b["last_doc"] == docs[sl.stop - 1]
        assert b["max_tf"] == tfs[sl].max()
        assert b["min_norm"] == norms[sl].min()
        k += b["n"]


def test_posting_blocks_no_positions():
    docs = np.arange(10, 300, 2, dtype=np.int64)
    tfs = np.ones(len(docs), dtype=np.int64)
    norms = np.full(len(docs), 7)
    blocks = encode_posting_blocks(docs, tfs, norms, None)
    d2, t2 = decode_postings(blocks)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    assert all(b["pos_bytes"] == b"" for b in blocks)
