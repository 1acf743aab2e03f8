"""Multi-term query expansion over the sorted term dictionary:
Wildcard / Regexp / Fuzzy (SURVEY.md §2.3).

Re-creates the semantics of lucene/core/src/java/org/apache/lucene/search/
WildcardQuery.java, RegexpQuery.java, FuzzyQuery.java + AutomatonQuery's
"automaton ∩ term dictionary" walk (branch_8x) as vectorized scans of the
segment's sorted vocab — the sorted-term-blocks analog of intersecting a
term automaton with the term dict. Like PrefixQuery, all three rewrite to
CONSTANT SCORE (MultiTermQuery CONSTANT_SCORE_REWRITE; we do not
re-create FuzzyQuery's blended-freq scoring — documented deviation).

Scan costs are bounded: wildcard/fuzzy narrow the scan to the literal /
required prefix range first; regexp runs one RE2 kernel over the vocab
(vectorized C, ~50k terms per segment — microseconds)."""

from __future__ import annotations

import re
from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "wildcard_to_regex", "expand_wildcard", "expand_regexp", "expand_fuzzy",
    "levenshtein_batch",
]


def wildcard_to_regex(pattern: str) -> Tuple[str, str]:
    """(literal_prefix, full anchored regex) for a Lucene wildcard pattern
    (``*`` = any run, ``?`` = any single char)."""
    prefix = []
    for ch in pattern:
        if ch in "*?":
            break
        prefix.append(ch)
    rx = "".join(
        ".*" if ch == "*" else "." if ch == "?" else re.escape(ch) for ch in pattern
    )
    return "".join(prefix), f"^(?:{rx})$"


def _vocab_slice(reader, lo: int, hi: int) -> pa.Array:
    # zero-copy Arrow slice of the TermDict (no Python-str materialization)
    return reader.terms.slice(lo, hi)


def expand_wildcard(reader, pattern: str) -> np.ndarray:
    """Matching term ordinals: narrow by the literal prefix (sorted-dict
    range scan), then one vectorized RE2 match over the slice."""
    prefix, rx = wildcard_to_regex(pattern)
    lo, hi = reader.prefix_range(prefix) if prefix else (0, len(reader.terms))
    if lo >= hi:
        return np.empty(0, dtype=np.int64)
    hit = pc.match_substring_regex(_vocab_slice(reader, lo, hi), rx).to_numpy(
        zero_copy_only=False
    )
    return lo + np.nonzero(hit)[0]


def expand_regexp(reader, pattern: str) -> np.ndarray:
    """Anchored regexp over the whole vocab (RegexpQuery semantics: the
    pattern must match the ENTIRE term)."""
    if len(reader.terms) == 0:
        return np.empty(0, dtype=np.int64)
    hit = pc.match_substring_regex(
        _vocab_slice(reader, 0, len(reader.terms)), f"^(?:{pattern})$"
    ).to_numpy(zero_copy_only=False)
    return np.nonzero(hit)[0]


def levenshtein_batch(cands: np.ndarray, query: str) -> np.ndarray:
    """Plain Levenshtein distance of every candidate vs ``query``,
    vectorized across candidates (the DP rows loop over the short query
    and candidate width — a few hundred numpy ops total, no per-term
    Python)."""
    n = len(cands)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    lens = np.fromiter((len(c) for c in cands), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    C = np.zeros((n, L), dtype=np.uint32)
    for i, c in enumerate(cands):  # one pass to build the codepoint matrix
        b = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        C[i, : len(b)] = b
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (n, L + 1)).copy()
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        qi = q[i - 1]
        for j in range(1, L + 1):
            cost = (C[:, j - 1] != qi).astype(np.int64)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), prev[:, j - 1] + cost
            )
        prev = cur
    return prev[np.arange(n), lens]


def expand_fuzzy(reader, term: str, max_edits: int = 2, prefix_len: int = 0) -> np.ndarray:
    """FuzzyQuery expansion: terms within plain Levenshtein distance
    ``max_edits`` (no transpositions — deviation from Lucene's default
    Damerau automata, pinned by the SQL ``levenshtein()`` oracle), with an
    optional required exact prefix (FuzzyQuery prefixLength). Candidates
    are pre-filtered by the prefix range and the length band ±max_edits
    before the vectorized DP."""
    if prefix_len > 0:
        lo, hi = reader.prefix_range(term[:prefix_len])
    else:
        lo, hi = 0, len(reader.terms)
    if lo >= hi:
        return np.empty(0, dtype=np.int64)
    sl = reader.terms.slice(lo, hi)
    # vectorized length band over the Arrow slice; only the banded
    # candidates materialize as Python strs for the DP codepoint matrix
    lens = pc.utf8_length(sl).to_numpy(zero_copy_only=False).astype(np.int64)
    band = np.abs(lens - len(term)) <= max_edits
    idx = np.nonzero(band)[0]
    if len(idx) == 0:
        return np.empty(0, dtype=np.int64)
    cands = np.asarray(sl.take(pa.array(idx)).to_pylist(), dtype=object)
    d = levenshtein_batch(cands, term)
    return lo + idx[d <= max_edits]
