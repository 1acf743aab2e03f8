"""SmallFloat norm codec goldens (SURVEY.md §5 pattern 2, Appendix A.2)."""

import numpy as np
import pytest

from lucene_solr_ray.analysis.smallfloat import (
    LENGTH_TABLE,
    MAX_INT4,
    NUM_FREE_VALUES,
    _int_to_byte4_scalar,
    byte4_to_int,
    int_to_byte4,
)

# hand-computed golden values of the Lucene 8.x SmallFloat scheme:
# 0..23 exact (NUM_FREE_VALUES=24), then 4-bit-mantissa float
GOLDEN = {
    0: 0, 1: 1, 23: 23, 24: 24, 39: 39, 40: 40,
    41: 40,      # first lossy value: 41-24=17 → mantissa trunc → 40
    64: 50, 255: 70, 256: 70, 1000: 87, 4096: 103, 10**6: 167,
}
# decoded values of the lossy band (floor property: decode <= input)
GOLDEN_DECODE = {40: 40, 50: 64, 70: 248, 87: 984, 103: 3864, 167: 983064}


def test_constants():
    assert MAX_INT4 == 231
    assert NUM_FREE_VALUES == 24


def test_golden_encode():
    for v, code in GOLDEN.items():
        assert _int_to_byte4_scalar(v) == code, v
    for code, dec in GOLDEN_DECODE.items():
        assert int(byte4_to_int(np.array([code]))[0]) == dec, code


def test_table_monotone_and_starts_exact():
    assert (np.diff(LENGTH_TABLE) > 0).all()
    assert (LENGTH_TABLE[:40] == np.arange(40)).all()


def test_roundtrip_floor_property():
    xs = np.concatenate(
        [np.arange(0, 50_000), np.array([10**6, 2**26, 2**31 - 1])]
    )
    enc = int_to_byte4(xs)
    dec = byte4_to_int(enc)
    # decode(encode(x)) <= x, and re-encoding the decoded value is stable
    assert (dec <= xs).all()
    assert (byte4_to_int(int_to_byte4(dec)) == dec).all()


def test_vectorized_matches_scalar():
    xs = np.concatenate([np.arange(0, 3000), 2 ** np.arange(12, 31)])
    enc = int_to_byte4(xs)
    ref = np.array([_int_to_byte4_scalar(int(x)) for x in xs])
    assert (enc == ref).all()


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(np.array([-1]))
