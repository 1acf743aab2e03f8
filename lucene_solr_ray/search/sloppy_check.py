"""Brute-force reference for the sloppy-phrase minimal-window matcher —
test-only, O(n²·k) per doc."""

from __future__ import annotations

from typing import List

import numpy as np

__all__ = ["brute_force_window_count"]


def brute_force_window_count(pos_lists: List[np.ndarray], slop: int) -> int:
    """Count event indices `r` (over the union of all term positions,
    sorted) whose MINIMAL covering window ending at r contains every term
    with width − k ≤ slop — the same definition sloppy_phrase_freq
    implements, evaluated naively with set scans."""
    k = len(pos_lists)
    events = sorted((int(p), i) for i, lst in enumerate(pos_lists) for p in lst)
    n = len(events)
    count = 0
    for r in range(n):
        starts = [
            events[l][0]
            for l in range(r + 1)
            if len({events[j][1] for j in range(l, r + 1)}) == k
        ]
        if not starts:
            continue
        width = events[r][0] - max(starts) + 1
        if width - k <= slop:
            count += 1
    return count
