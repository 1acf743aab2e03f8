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
required prefix range first; regexp extracts the pattern's REQUIRED
PREFIX SET (top-level alternation branches, bounded group/char-class
expansion — the cheap core of Lucene's automaton ∩ term-dict
intersection, no full FST needed) and RE2-scans only the matching
sorted-vocab ranges, falling back to one full-vocab kernel when the
pattern is unbounded at position 0. ``SCAN_STATS`` counts scanned vs
total vocab terms so benches can show the narrowed path engaging."""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "wildcard_to_regex", "expand_wildcard", "expand_regexp", "expand_fuzzy",
    "levenshtein_batch", "regex_prefix_set", "regex_required_factor",
    "SCAN_STATS",
]

# per-process diagnostic: vocab narrowing effectiveness (reset at will).
# scanned_terms counts terms the EXPENSIVE anchored-RE2 kernel evaluated
# (after prefix-range narrowing and/or the required-factor prefilter);
# factor_calls counts unbounded patterns rescued by the factor prefilter.
SCAN_STATS = {"calls": 0, "scanned_terms": 0, "total_terms": 0, "factor_calls": 0}


def _split_toplevel_alt(p: str) -> List[str]:
    """Split on unescaped ``|`` at paren depth 0, outside char classes."""
    parts, cur = [], []
    depth, in_cls = 0, False
    i, n = 0, len(p)
    while i < n:
        c = p[i]
        if c == "\\" and i + 1 < n:
            cur.append(p[i : i + 2])
            i += 2
            continue
        if in_cls:
            cur.append(c)
            if c == "]":
                in_cls = False
        elif c == "[":
            in_cls = True
            cur.append(c)
            if i + 1 < n and p[i + 1] == "]":  # leading ] is a literal
                cur.append("]")
                i += 1
        elif c == "(":
            depth += 1
            cur.append(c)
        elif c == ")":
            depth -= 1
            cur.append(c)
        elif c == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    return parts


def _seq_prefixes(s: str, cap: int) -> Tuple[set, bool]:
    """(required prefixes, consumed_whole_sequence) for one alternation-free
    branch: walk literals / escaped literals / fully-literal groups / small
    char classes left to right; stop (returning the prefixes accumulated
    so far) at the first element that is optional, variable-width, or too
    complex. Every string the branch matches starts with one of the
    returned prefixes."""
    prefixes = {""}
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        alts: Optional[set] = None
        if c == "\\":
            # only escaped PUNCTUATION is a known literal; any alphanumeric
            # escape (\d \w \n \t \x41 A backrefs …) has non-literal
            # semantics — bail rather than mis-read it as the letter itself
            if i + 1 >= n or s[i + 1].isalnum():
                return prefixes, False
            alts = {s[i + 1]}
            j = i + 2
        elif c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if s[j] == "\\":
                    j += 1
                elif s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                return prefixes, False
            inner = s[i + 1 : j - 1]
            if inner.startswith("?:"):
                inner = inner[2:]
            elif inner.startswith("?"):
                return prefixes, False  # lookaround / named group: bail
            sub = set()
            for b in _split_toplevel_alt(inner):
                ps, full = _seq_prefixes(b, cap)
                if not full:
                    return prefixes, False  # partial branch: can't append
                sub |= ps
            alts = sub
        elif c == "[":
            j = i + 1
            if j < n and s[j] == "^":
                return prefixes, False
            members = []
            if j < n and s[j] == "]":
                members.append("]")
                j += 1
            while j < n and s[j] != "]":
                if s[j] == "\\" and j + 1 < n:
                    if s[j + 1].isalnum():  # \d \w \n \x… inside a class
                        return prefixes, False
                    members.append(s[j + 1])
                    j += 2
                    continue
                if j + 2 < n and s[j + 1] == "-" and s[j + 2] != "]":
                    lo_c, hi_c = ord(s[j]), ord(s[j + 2])
                    if hi_c - lo_c > 8 or hi_c < lo_c:
                        return prefixes, False
                    members.extend(chr(x) for x in range(lo_c, hi_c + 1))
                    j += 3
                    continue
                members.append(s[j])
                j += 1
            if j >= n:
                return prefixes, False
            j += 1
            alts = set(members)
        elif c in ".^$*+?{|)":
            return prefixes, False
        else:
            alts = {c}
            j = i + 1
        if j < n and s[j] in "*?{":
            # element optional or variable-count: prefix ends BEFORE it
            return prefixes, False
        new = {p + a for p in prefixes for a in alts}
        if len(new) > cap:
            return prefixes, False
        prefixes = new
        if j < n and s[j] == "+":
            # one occurrence consumed; further repeats vary → stop here
            return prefixes, False
        i = j
    return prefixes, True


def regex_prefix_set(pattern: str, cap: int = 32) -> Optional[List[str]]:
    """Required literal prefixes of an ANCHORED regexp — every matching
    string starts with one of them — or None when any alternation branch
    is unbounded at position 0 (full-vocab scan required). The bounded
    literal/branch extraction that stands in for Lucene's automaton ∩
    term-dictionary walk (reference: lucene/core/.../util/automaton/ +
    AutomatonQuery.java, branch_8x; SURVEY.md §2.3)."""
    out: set = set()
    for b in _split_toplevel_alt(pattern):
        ps, _full = _seq_prefixes(b, cap)
        if ps == {""}:
            return None
        out |= ps
    if len(out) > cap:
        return None
    return sorted(out)


def regex_required_factor(pattern: str) -> Optional[str]:
    """Longest literal substring REQUIRED by every string the (anchored)
    pattern matches, or None. The automaton-factor analog for patterns
    with no usable required prefix (e.g. ``.*foo.*`` → ``foo``): the
    cheap C substring kernel prefilters the vocab so the anchored RE2
    evaluates only candidate terms. Conservative: bails on top-level
    alternation, treats groups/classes/escape-classes as opaque run
    breakers, and drops any literal governed by an optional/variable
    quantifier — so the returned factor is always sound."""
    p, n = pattern, len(pattern)
    runs: List[str] = []
    cur: List[str] = []

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    def skip_quant(j: int) -> int:
        if j < n and p[j] in "*+?":
            return j + 1
        if j < n and p[j] == "{":
            k = p.find("}", j)
            return (k + 1) if k != -1 else n
        return j

    i = 0
    while i < n:
        c = p[i]
        piece: Optional[str] = None
        if c == "|":
            return None  # top-level alternation: no single required factor
        if c == "\\":
            if i + 1 < n and not p[i + 1].isalnum():
                piece, j = p[i + 1], i + 2
            else:
                flush()
                i = skip_quant(i + 2)
                continue
        elif c == "(":
            depth, j = 1, i + 1
            while j < n and depth:
                if p[j] == "\\":
                    j += 1
                elif p[j] == "(":
                    depth += 1
                elif p[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                return None
            flush()
            i = skip_quant(j)
            continue
        elif c == "[":
            j = i + 1
            if j < n and p[j] == "^":
                j += 1
            if j < n and p[j] == "]":
                j += 1
            while j < n and p[j] != "]":
                j += 2 if p[j] == "\\" else 1
            if j >= n:
                return None
            flush()
            i = skip_quant(j + 1)
            continue
        elif c in ".^$":
            flush()
            i = skip_quant(i + 1)
            continue
        elif c in "*+?{)":
            return None  # dangling quantifier / unbalanced: bail
        else:
            piece, j = c, i + 1
        # literal piece: a following quantifier decides whether it counts
        if j < n and p[j] in "*?{":
            flush()  # piece optional / variable-count: excluded
            i = skip_quant(j)
        elif j < n and p[j] == "+":
            cur.append(piece)  # required at least once, then run breaks
            flush()
            i = j + 1
        else:
            cur.append(piece)
            i = j
    flush()
    best = max(runs, key=len, default="")
    return best if len(best) >= 2 else None


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
    SCAN_STATS["calls"] += 1
    SCAN_STATS["scanned_terms"] += max(0, hi - lo)
    SCAN_STATS["total_terms"] += len(reader.terms)
    if lo >= hi:
        return np.empty(0, dtype=np.int64)
    hit = pc.match_substring_regex(_vocab_slice(reader, lo, hi), rx).to_numpy(
        zero_copy_only=False
    )
    return lo + np.nonzero(hit)[0]


def expand_regexp(reader, pattern: str) -> np.ndarray:
    """Anchored regexp (RegexpQuery semantics: the pattern must match the
    ENTIRE term). The required-prefix set narrows the scan to the merged
    sorted-vocab ranges of the prefixes; unbounded patterns scan the
    whole vocab with one RE2 kernel."""
    n = len(reader.terms)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    prefixes = regex_prefix_set(pattern)
    factor = None
    if prefixes:
        ranges = sorted(reader.prefix_range(p) for p in prefixes)
        merged: List[List[int]] = []
        for lo, hi in ranges:
            if lo >= hi:
                continue
            if merged and lo <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], hi)
            else:
                merged.append([lo, hi])
    else:
        # unbounded at position 0: fall back to a required-substring
        # prefilter (cheap C kernel) so the anchored RE2 only evaluates
        # candidate terms instead of the whole vocab
        merged = [[0, n]]
        factor = regex_required_factor(pattern)
    SCAN_STATS["calls"] += 1
    SCAN_STATS["total_terms"] += n
    rx = f"^(?:{pattern})$"
    outs = []
    for lo, hi in merged:
        sl = _vocab_slice(reader, lo, hi)
        base = lo
        if factor is not None:
            SCAN_STATS["factor_calls"] += 1
            pre = pc.match_substring(sl, factor).to_numpy(zero_copy_only=False)
            cand = np.nonzero(pre)[0]
            if len(cand) == 0:
                continue
            sl = sl.take(pa.array(cand))
            SCAN_STATS["scanned_terms"] += len(cand)
            hit = pc.match_substring_regex(sl, rx).to_numpy(zero_copy_only=False)
            outs.append(base + cand[np.nonzero(hit)[0]])
            continue
        SCAN_STATS["scanned_terms"] += hi - lo
        hit = pc.match_substring_regex(sl, rx).to_numpy(zero_copy_only=False)
        outs.append(base + np.nonzero(hit)[0])
    if not outs:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(outs)


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
    SCAN_STATS["calls"] += 1
    SCAN_STATS["scanned_terms"] += max(0, hi - lo)
    SCAN_STATS["total_terms"] += len(reader.terms)
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
