"""Block-max WAND: top-k disjunction/conjunction with per-block skipping.

Re-creates the semantics of lucene/core/src/java/org/apache/lucene/search/
WANDScorer.java + MaxScoreCache.java + ImpactsDISI.java and the leapfrog
conjunction of ConjunctionDISI.java (branch_8x; SURVEY.md §2.7, Appendix
A.3). Pure optimization: MUST return results bit-identical to the
exhaustive scorer (tested by test_wand equivalence).

Upper bounds: each term's global bound is its weight ``w`` (monotone limit
of ``w - w/(1+freq*ni)``); each 128-doc block's bound is
``score(max_freq, min_norm)`` from the impact data — valid because the
score is monotone in freq and in the reciprocal norm factor, and float32
rounding is monotone. Sums of bounds are taken in float64 with a small
multiplicative margin, guaranteeing they dominate ANY float32 summation
order of true contributions (so skipping can never drop a true top-k hit;
it only occasionally evaluates a doc it didn't need to).

Per-doc scores of survivors are accumulated in float32 in QUERY TERM
ORDER — exactly like the exhaustive path — hence bit-identical output.
"""

from __future__ import annotations

import heapq
from typing import Dict, Sequence, Tuple

import numpy as np

from ..index.postings import BLOCK, decode_block
from ..index.segment import SegmentReader
from .similarity import Bm25Similarity

__all__ = ["score_query_wand"]

_MARGIN = 1.0 + 1e-5


class _TermIter:
    """Cursor over one term's posting blocks with skip/impact data."""

    __slots__ = (
        "qpos", "weight", "df", "blk_off", "blk_last", "blk_ub", "nblocks",
        "cur_block", "docids", "freqs", "pos", "cur", "post", "exhausted", "gub",
    )

    def __init__(self, qpos, reader: SegmentReader, ordinal: int, weight, sim, cache_inv):
        self.qpos = qpos
        self.weight = weight
        self.df = int(reader.df[ordinal])
        off, last, maxf, minn = reader.term_blocks(ordinal)
        self.blk_off = off
        self.blk_last = last.astype(np.int64)
        # per-block score upper bound: score(max_freq, min_norm), float64 + margin
        self.blk_ub = (
            sim.score_freqs(weight, maxf.astype(np.float32), minn, cache_inv).astype(np.float64)
            * _MARGIN
        )
        self.nblocks = len(off)
        self.post = reader.post
        self.gub = float(np.float64(weight)) * _MARGIN  # term-level upper bound
        self.cur_block = -1
        self.docids = None
        self.freqs = None
        self.pos = 0
        self.cur = -1
        self.exhausted = False
        self._load_block(0)
        self.cur = int(self.docids[0])

    def _load_block(self, b: int) -> None:
        deltas, freqs = decode_block(self.post, int(self.blk_off[b]))
        base = 0 if b == 0 else int(self.blk_last[b - 1])
        n_valid = self.df - b * BLOCK if b == self.nblocks - 1 else BLOCK
        self.docids = base + np.cumsum(deltas[:n_valid])
        self.freqs = freqs[:n_valid]
        self.cur_block = b
        self.pos = 0

    def advance(self, target: int) -> int:
        """Move to first docid >= target; returns it (or marks exhausted)."""
        if self.exhausted:
            return 1 << 62
        if target > int(self.blk_last[self.cur_block]):
            b = int(np.searchsorted(self.blk_last, target))
            if b >= self.nblocks:
                self.exhausted = True
                self.cur = 1 << 62
                return self.cur
            self._load_block(b)
        if self.cur < target or self.pos >= len(self.docids):
            self.pos = int(np.searchsorted(self.docids, target, side="left"))
            # target <= blk_last guarantees pos < len
        self.cur = int(self.docids[self.pos])
        return self.cur

    def next(self) -> int:
        self.pos += 1
        if self.pos >= len(self.docids):
            if self.cur_block + 1 >= self.nblocks:
                self.exhausted = True
                self.cur = 1 << 62
                return self.cur
            self._load_block(self.cur_block + 1)
        self.cur = int(self.docids[self.pos])
        return self.cur

    def freq(self) -> int:
        return int(self.freqs[self.pos])

    def block_ub_at(self, d: int) -> float:
        """Upper bound of the block that covers docid d (without decoding)."""
        b = self.cur_block
        if d > int(self.blk_last[b]):
            b = int(np.searchsorted(self.blk_last, d))
            if b >= self.nblocks:
                return 0.0
        return float(self.blk_ub[b])

    def block_last_at(self, d: int) -> int:
        b = self.cur_block
        if d > int(self.blk_last[b]):
            b = int(np.searchsorted(self.blk_last, d))
            if b >= self.nblocks:
                return 1 << 62
        return int(self.blk_last[b])


def _heap_result(heap, k) -> Tuple[np.ndarray, np.ndarray]:
    if not heap:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    items = sorted(heap, key=lambda t: (-t[0], -t[1]))  # score desc, docid asc
    docids = np.array([-d for _, d in items], dtype=np.int64)
    scores = np.array([s for s, _ in items], dtype=np.float32)
    return docids, scores


def _score_doc(f32, iters_at_doc) -> np.float32:
    """float32 sum of contributions in QUERY TERM ORDER (bit-identical to
    the exhaustive scatter-add)."""
    s = f32(0.0)
    for it, contrib in iters_at_doc:
        s = f32(s + contrib)
    return s


def score_query_wand(
    reader: SegmentReader,
    terms: Sequence[str],
    kind: str,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    f32 = np.float32
    iters = []
    for qpos, term in enumerate(terms):
        o = reader.lookup(term)
        if o < 0:
            if kind == "and":
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            continue
        iters.append(_TermIter(qpos, reader, o, weights[term], sim, cache_inv))
    if not iters:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

    heap: list = []  # (score, -docid); full ⇒ heap[0] is the current θ

    def contribution(it: _TermIter) -> np.float32:
        ni = cache_inv[reader.norms[it.cur]]
        w = it.weight
        return f32(w - w / (f32(1.0) + f32(it.freq()) * ni))

    deleted = reader.deleted  # liveDocs filter (tombstoned docs never score)

    def offer(docid: int, score: np.float32) -> None:
        if deleted is not None and deleted[docid]:
            return
        if len(heap) < k:
            heapq.heappush(heap, (score, -docid))
        elif score > heap[0][0]:
            heapq.heapreplace(heap, (score, -docid))

    if kind == "and":
        _conjunction(iters, terms, heap, k, offer, contribution, f32)
    else:
        _wand_or(iters, heap, k, offer, contribution, f32)
    return _heap_result(heap, k)


def _conjunction(iters, terms, heap, k, offer, contribution, f32):
    """Leapfrog intersection, lead = rarest term (ConjunctionDISI semantics)
    with block-max pruning once the heap is full."""
    iters_by_df = sorted(iters, key=lambda it: it.df)
    lead = iters_by_df[0]
    others = iters_by_df[1:]
    by_qpos = sorted(iters, key=lambda it: it.qpos)
    d = lead.cur
    while not lead.exhausted:
        matched = True
        for it in others:
            c = it.advance(d)
            if c != d:
                if it.exhausted:
                    return
                d = lead.advance(c)
                matched = False
                break
        if matched:
            # block-max prune: skip scoring when even the block bounds can't beat θ
            if len(heap) == k:
                ub = sum(it.block_ub_at(d) for it in iters)
                if ub <= float(heap[0][0]):
                    d = lead.next()
                    continue
            score = f32(0.0)
            for it in by_qpos:
                score = f32(score + contribution(it))
            offer(d, score)
            d = lead.next()


def _wand_or(iters, heap, k, offer, contribution, f32):
    """Block-max WAND disjunction (Ding & Suel BMW, Lucene WANDScorer)."""
    while True:
        live = [it for it in iters if not it.exhausted]
        if not live:
            return
        live.sort(key=lambda it: it.cur)
        theta = float(heap[0][0]) if len(heap) == k else float("-inf")

        # pivot: first prefix whose term-level ub sum exceeds θ
        acc = 0.0
        pivot_idx = -1
        for i, it in enumerate(live):
            acc += it.gub
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx < 0:
            return  # nothing can beat θ anymore
        pivot_doc = live[pivot_idx].cur
        # extend the pivot over iterators tied at pivot_doc (Ding & Suel BMW
        # pivot extension; Lucene WANDScorer's advanceAllTail analog) so the
        # block-ub test below accounts for EVERY term that can hit pivot_doc
        while pivot_idx + 1 < len(live) and live[pivot_idx + 1].cur == pivot_doc:
            pivot_idx += 1

        # block-max refinement over the prefix
        prefix = live[: pivot_idx + 1]
        block_ub = sum(it.block_ub_at(pivot_doc) for it in prefix)
        if block_ub <= theta:
            # skip: jump past the earliest block boundary among the prefix,
            # CLAMPED to the first non-prefix iterator's current docid — a
            # doc there may still gain contributions from prefix terms, so
            # the lead must not be advanced past it (BMW d' = min(boundary+1,
            # d_{pivot+1}); Lucene WANDScorer skip-target clamp)
            boundary = min(it.block_last_at(pivot_doc) for it in prefix)
            target = max(pivot_doc + 1, boundary + 1)
            if pivot_idx + 1 < len(live):
                target = min(target, live[pivot_idx + 1].cur)
            # advance the lead (smallest cur) — standard WAND advance choice
            prefix[0].advance(target)
            continue

        if live[0].cur == pivot_doc:
            # all prefix terms aligned on pivot? those == pivot contribute
            at_doc = [it for it in live if it.cur == pivot_doc]
            at_doc.sort(key=lambda it: it.qpos)
            score = f32(0.0)
            for it in at_doc:
                score = f32(score + contribution(it))
            offer(pivot_doc, score)
            for it in at_doc:
                it.next()
        else:
            # align: advance the lead to the pivot
            live[0].advance(pivot_doc)
