"""Brute-force reference for the sloppy-phrase minimal-window matcher —
test-only, O(n²·k) per doc. Repeats-aware like the engine matcher:
identical position lists are a REPEATED query term, and a covering
window needs multiplicity-many distinct positions of it (reference:
lucene/core/.../search/SloppyPhraseMatcher.java repeats groups,
branch_8x)."""

from __future__ import annotations

from collections import Counter
from typing import List

import numpy as np

__all__ = ["brute_force_window_count"]


def brute_force_window_count(pos_lists: List[np.ndarray], slop: int) -> int:
    """Count event indices `r` (over the union of the DISTINCT terms'
    positions, sorted) whose MINIMAL covering window ending at r contains
    every query term with its multiplicity and has width − k ≤ slop —
    the same definition sloppy_phrase_freq implements, evaluated naively
    with per-window recounts."""
    k = len(pos_lists)
    uniq: List[List[int]] = []
    mult: List[int] = []
    for p in pos_lists:
        lp = [int(x) for x in p]
        for ui, u in enumerate(uniq):
            if u == lp:
                mult[ui] += 1
                break
        else:
            uniq.append(lp)
            mult.append(1)
    events = sorted((p, u) for u, lst in enumerate(uniq) for p in lst)
    n = len(events)
    count = 0
    for r in range(n):
        starts = []
        for l in range(r + 1):
            c = Counter(events[j][1] for j in range(l, r + 1))
            if all(c.get(u, 0) >= m for u, m in enumerate(mult)):
                starts.append(events[l][0])
        if not starts:
            continue
        width = events[r][0] - max(starts) + 1
        if width - k <= slop:
            count += 1
    return count
