"""SmallFloat port tests (SURVEY.md §5.2-2): monotone, round-trip idempotent,
small lengths exact — mirroring Lucene's TestSmallFloat invariants."""

import numpy as np
import pytest

from lucene_solr_spark.util.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    encode_lengths,
    int_to_byte4,
)


def test_num_free_values():
    # Lucene: MAX_INT4 = longToInt4(Integer.MAX_VALUE) = 231 → 24 free values
    assert NUM_FREE_VALUES == 24


def test_small_lengths_exact():
    for i in range(NUM_FREE_VALUES + 17):  # 0..40 stay exact (24 free + 4-bit mantissa)
        assert byte4_to_int(int_to_byte4(i)) == i


def test_table_monotone_strict():
    assert len(LENGTH_TABLE) == 256
    assert np.all(np.diff(LENGTH_TABLE) > 0)


def test_round_trip_idempotent():
    for b in range(256):
        assert int_to_byte4(byte4_to_int(b)) == b


def test_encode_floor_semantics():
    # encoding rounds DOWN to the bucket lower bound
    for i in range(100_000):
        b = int_to_byte4(i)
        assert byte4_to_int(b) <= i
        if b < 255:
            assert byte4_to_int(b + 1) > i


def test_vectorized_encode_matches_scalar():
    rng = np.random.default_rng(42)
    lens = np.concatenate([
        np.arange(0, 2000),
        rng.integers(0, 2**31 - 1, size=5000),
    ])
    enc = encode_lengths(lens)
    scalar = np.array([int_to_byte4(int(x)) for x in lens], dtype=np.uint8)
    np.testing.assert_array_equal(enc, scalar)


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
