"""Distributed BPE vocabulary induction (byte-pair-encoding merge
training — Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the tokenizer-training step of a large-scale
training-data pipeline).

No reference analog (SURVEY.md training-data extensions; the reference's
analysis chain CONSUMES fixed vocabularies, it never trains one).

Scale shape — the published algorithm's own reduction, distributed:
1. The corpus collapses ONCE to a word-frequency table (distinct word,
   count) via the bucketed combiner+merge shuffle — the classic BPE
   optimization (GPT-2 trained its merges on word counts, not tokens),
   and the only pass that ever touches the corpus.
2. Each word becomes a symbol sequence (characters + an end-of-word
   sentinel appended to the final character, Sennrich's '</w>').
3. Per merge round over the (much smaller, materialized) word table:
   one vectorized pair-count pass (adjacent symbol pairs weighted by
   word count, pre-aggregated per block) → bucketed global sum → the
   single argmax pair reaches the driver (count desc, then
   lexicographic pair for a deterministic tie) → one vectorized
   map_batches pass rewrites the symbol sequences (greedy left-to-right
   non-overlapping, the reference semantics). K merges = K small
   shuffles over distinct-pair partials; corpus rows never move again.

Every per-round kernel is numpy over the flattened list-column buffers —
no Python per word. pytest pins the full merge SEQUENCE (pairs, counts,
and final segmentations) against a single-process reference
implementation of the published algorithm (tests/test_bpe.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import bucketed_agg, default_shuffle_partitions

__all__ = ["word_freq_table", "train_bpe", "bpe_encode", "bpe_reference",
           "segment_words"]

# end-of-word sentinel glued to the final character (Sennrich's
# end-of-word mark; chr-built so the angle brackets survive tooling)
EOW = chr(60) + '/w' + chr(62)


def word_freq_table(ds, text_col: str = "text",
                    num_partitions: Optional[int] = None):
    """Corpus → distinct (word, count) via per-block pre-aggregation +
    bucketed merge (one shuffle of partial rows, never token rows)."""
    def explode(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.coalesce(t[text_col], ""), " ")
        flat = pc.list_flatten(toks)
        out = pa.table({"word": flat}).filter(pc.not_equal(flat, ""))
        return out

    words = ds.map_batches(explode, batch_format="pyarrow")
    return bucketed_agg(words, "word", [("word", "count")], ["count"],
                        num_partitions=num_partitions)


def _to_symbols(t: pa.Table) -> pa.Table:
    """(word, count) → (syms: list<string>, count): characters with the
    EOW sentinel appended to the last one. Vectorized: one numpy
    object-array split per batch (strings are tiny; the per-word Python
    is a single list() call inside np.frompyfunc — the same budget every
    engine pays to split words into characters once)."""
    words = t["word"].to_pylist()
    counts = t["count"]
    syms, offsets = [], [0]
    for w in words:
        cs = list(w)
        cs[-1] = cs[-1] + EOW
        syms.extend(cs)
        offsets.append(len(syms))
    return pa.table({
        "syms": pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), pa.array(syms, type=pa.string())),
        "count": counts,
    })


def _flat(col):
    """ChunkedArray → one ListArray with offsets normalized to start at 0
    (a sliced list column's .offsets are absolute into .values — the
    evaluators-module pitfall)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy().astype(np.int64)
    vals = col.values
    if len(offs) and offs[0] != 0:
        vals = vals.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    else:
        vals = vals.slice(0, offs[-1] if len(offs) else 0)
    return offs, vals


_EMPTY_PAIRS = pa.table({"a": pa.array([], type=pa.string()),
                         "b": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())})


def _pairs_batch(t: pa.Table) -> pa.Table:
    """Adjacent-pair partial counts for one block, weighted by word count
    — pre-aggregated so the shuffle moves one row per distinct pair per
    block. All-Arrow: the (left, right) columns are zero-copy slices of
    the symbol buffer and the combine is one C++ hash aggregate."""
    offs, vals = _flat(t["syms"])
    m = len(vals)
    if m < 2:
        return _EMPTY_PAIRS
    counts = t["count"].to_numpy().astype(np.int64)
    lens = np.diff(offs)
    word_of = np.repeat(np.arange(len(lens)), lens)
    in_word = word_of[:-1] == word_of[1:]
    if not in_word.any():
        return _EMPTY_PAIRS
    part = pa.table({
        "a": vals.slice(0, m - 1),
        "b": vals.slice(1, m - 1),
        "c": pa.array(counts[word_of[:-1]]),
    }).filter(pa.array(in_word))
    return part.group_by(["a", "b"]).aggregate([("c", "sum")]).rename_columns(
        ["a", "b", "c"])


def _apply_merge_batch(t: pa.Table, a: str, b: str) -> pa.Table:
    """Rewrite symbol sequences replacing adjacent (a, b) → a+b, greedy
    left-to-right non-overlapping (the published semantics): within a run
    of chained candidates (possible only when a == b) alternate members
    starting from the left survive. Arrow/numpy kernels throughout."""
    offs, vals = _flat(t["syms"])
    m = len(vals)
    if m < 2:
        return t
    lens = np.diff(offs)
    n = len(lens)
    word_of = np.repeat(np.arange(n), lens)
    eq_a = pc.equal(vals, a).to_numpy(zero_copy_only=False)
    eq_b = pc.equal(vals, b).to_numpy(zero_copy_only=False)
    cand = np.zeros(m, dtype=bool)
    cand[:-1] = eq_a[:-1] & eq_b[1:] & (word_of[:-1] == word_of[1:])
    if not cand.any():
        return t
    if a == b:
        idx = np.arange(m)
        run_start = cand.copy()
        run_start[1:] &= ~cand[:-1]
        pos_in_run = idx - np.maximum.accumulate(np.where(run_start, idx, 0))
        keep = cand & (pos_in_run % 2 == 0)
    else:
        keep = cand
    drop = np.zeros(m, dtype=bool)
    drop[1:] = keep[:-1]
    merged = pc.if_else(pa.array(keep), pa.scalar(a + b), vals)
    out_vals = merged.filter(pa.array(~drop))
    new_lens = lens - np.bincount(word_of[drop], minlength=n)
    new_offs = np.concatenate(
        [[0], np.cumsum(new_lens)]).astype(np.int32)
    return pa.table({
        "syms": pa.ListArray.from_arrays(
            pa.array(new_offs), out_vals.combine_chunks()
            if isinstance(out_vals, pa.ChunkedArray) else out_vals),
        "count": t["count"],
    })


def train_bpe(ds, text_col: str = "text", num_merges: int = 50,
              num_partitions: Optional[int] = None):
    """Learn ``num_merges`` BPE merges over the corpus. Returns
    ``(merges_df, vocab_ds)``: merges_df a pandas DataFrame (step, left,
    right, pair_count) in learned order; vocab_ds the final (word, syms,
    count) Dataset (the trained segmentation of every distinct word)."""
    import pandas as pd

    wf = word_freq_table(ds, text_col, num_partitions=num_partitions)
    table = wf.map_batches(_to_symbols, batch_format="pyarrow").materialize()
    merges: List[Tuple[str, str, int]] = []
    for step in range(num_merges):
        counts = bucketed_agg(
            table.map_batches(_pairs_batch, batch_format="pyarrow"),
            ["a", "b"], [("c", "sum")], ["c"],
            num_partitions=num_partitions,
        )
        top = counts.sort(["c", "a", "b"],
                          descending=[True, False, False]).limit(1).take_all()
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        if c < 2:
            break  # nothing left worth merging (reference stop condition)
        merges.append((a, b, c))
        nxt = table.map_batches(
            lambda t, _a=a, _b=b: _apply_merge_batch(t, _a, _b),
            batch_format="pyarrow",
        ).materialize()
        table = nxt
    mdf = pd.DataFrame(
        [{"step": i, "left": a, "right": b, "pair_count": c}
         for i, (a, b, c) in enumerate(merges)]
    )
    return mdf, table


def segment_words(words, merges) -> List[List[str]]:
    """Apply a learned merge list to new words (driver-side helper for
    k ≪ N lookups; the distributed path is _apply_merge_batch)."""
    out = []
    for w in words:
        syms = list(w)
        if not syms:
            out.append([])
            continue
        syms[-1] = syms[-1] + EOW
        for a, b, _ in merges:
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        out.append(syms)
    return out


class _BpeEncodeStage:
    """Actor-pool encode stage: the learned merge list arrives ONCE per
    actor (object-store ref in the constructor, never re-shipped per
    batch); a word → piece-count cache lives across batches, so each
    DISTINCT word is segmented once per actor (Zipf bounds distinct
    words, not corpus size)."""

    def __init__(self, merges_ref):
        import ray

        merges = merges_ref
        if isinstance(merges_ref, ray.ObjectRef):
            merges = ray.get(merges_ref)
        self.merges = [(a, b) for a, b, *_ in merges]
        self.cache: dict = {"": 0}

    def _pieces(self, w: str) -> int:
        n = self.cache.get(w)
        if n is None:
            syms = list(w)
            syms[-1] = syms[-1] + EOW
            for a, b in self.merges:
                i, res = 0, []
                m = len(syms)
                while i < m:
                    if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            n = len(syms)
            self.cache[w] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        text_col, id_col = self._text_col, self._id_col
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(pc.coalesce(txt, ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        npieces = np.empty(len(vocab), dtype=np.int64)
        for i, w in enumerate(vocab):
            npieces[i] = self._pieces(w)
        per_word = npieces[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(vocab) else np.zeros(0, dtype=np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # sliced arrays carry a nonzero start
        cs = np.concatenate([[0], np.cumsum(per_word, dtype=np.int64)])
        doc_tok = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table({id_col: t[id_col],
                         "n_bpe_tokens": pa.array(doc_tok, type=pa.int64())})


def bpe_encode(ds, merges, text_col: str = "text", id_col: str = "doc_id",
               concurrency: Optional[int] = None, batch_size: int = 4096):
    """Apply learned BPE merges to the corpus — the tokenizer-APPLICATION
    half of the pipeline (train_bpe is the training half): per document,
    the subword token count under the trained vocabulary (the number an
    LLM data pipeline packs/budgets by). One streaming ``map_batches``
    pass, zero shuffle; ``merges`` ([(left, right, ...), ...] in learned
    order) is ``ray.put`` once and read per actor, never per batch.
    Per-batch work is a dictionary-encode (distinct words only) + a
    vectorized gather/segment-sum back to documents; the greedy-left
    chained-merge semantics are bit-identical to :func:`segment_words`
    (pinned in tests/test_bpe.py)."""
    import ray

    if concurrency is None:
        try:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        except Exception:
            concurrency = 4
    merges_ref = ray.put(list(merges))

    class Stage(_BpeEncodeStage):
        _text_col = text_col
        _id_col = id_col

    return ds.map_batches(
        Stage,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def bpe_reference(word_counts: dict, num_merges: int):
    """Single-process reference of the published algorithm (pytest
    ground truth): identical tie-break (count desc, then (a, b) asc) and
    greedy-left merge application."""
    from collections import Counter

    table = {}
    for w, c in word_counts.items():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        table[w] = (tuple(syms), c)
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in table.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((a, b, c))
        new = {}
        for w, (syms, cnt) in table.items():
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[w] = (tuple(res), cnt)
        table = new
    return merges, {w: list(s) for w, (s, _) in table.items()}
