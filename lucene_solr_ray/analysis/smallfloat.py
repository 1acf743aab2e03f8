"""Lossy small-float encoding of field lengths (norms), Lucene-8.x-exact.

Re-implements the semantics of ``SmallFloat.intToByte4`` / ``byte4ToInt``
(reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java,
branch_8x — designated by /root/reference/README.md:27-29; see SURVEY.md
Appendix A.2). A document's field length (token count) is compressed to one
byte: small values exact, larger values a 4-bit-mantissa floating point.
Monotone, so BM25 ranking by length survives the lossy encoding.

All functions are vectorized over numpy arrays; the 256-entry decode table
(``LENGTH_TABLE``) is precomputed at import.
"""

from __future__ import annotations

import numpy as np

__all__ = ["int_to_byte4", "byte4_to_int", "LENGTH_TABLE", "MAX_INT4", "NUM_FREE_VALUES"]


def _long_to_int4(i: int) -> int:
    """Scalar 4-bit-mantissa float encode of a non-negative int."""
    if i < 0:
        raise ValueError("only non-negative values accepted")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i  # subnormal
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit leading 1-bit
    encoded |= (shift + 1) << 3  # shift 0 is reserved for subnormals
    return encoded


def _int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits  # subnormal
    return (bits | 0x08) << shift


MAX_INT4 = _long_to_int4(2**31 - 1)  # 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24: lengths 0..23 are stored exactly


def _int_to_byte4_scalar(i: int) -> int:
    if i < 0:
        raise ValueError("only non-negative values accepted")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _long_to_int4(i - NUM_FREE_VALUES)


def _byte4_to_int_scalar(b: int) -> int:
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + _int4_to_long(i - NUM_FREE_VALUES)


# 256-entry decode table: LENGTH_TABLE[i] == byte4ToInt((byte) i).
LENGTH_TABLE = np.array([_byte4_to_int_scalar(i) for i in range(256)], dtype=np.int64)

# Vectorized encode: field lengths are bounded (maxTokenLength-split docs still
# have < 2^26 tokens in practice), so a searchsorted over the monotone decode
# table is both exact and fast. LENGTH_TABLE is strictly increasing from index
# 0, and intToByte4 maps x to the largest code whose decoded value is <= x.
_ENC_BOUNDARIES = LENGTH_TABLE  # monotone ascending


def int_to_byte4(lengths: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.intToByte4`` over an int array → uint8 norms."""
    arr = np.asarray(lengths)
    if arr.size and arr.min() < 0:
        raise ValueError("only non-negative values accepted")
    # code = index of the largest table entry <= length  (encode rounds down)
    codes = np.searchsorted(_ENC_BOUNDARIES, arr, side="right") - 1
    return codes.astype(np.uint8)


def byte4_to_int(codes: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.byte4ToInt``: uint8 norm codes → decoded lengths."""
    return LENGTH_TABLE[np.asarray(codes, dtype=np.uint8)]
