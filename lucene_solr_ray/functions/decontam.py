"""Benchmark decontamination: flag corpus docs whose token n-grams overlap
a (small) benchmark set — the standard training-data hygiene pass (cf.
GPT-3/Gopher appendix decontamination: 8-gram/13-gram collision checks).

Ray shape (designed for the 100 TB case):
- the benchmark side is TINY relative to the corpus → its distinct
  n-grams are computed once and BROADCAST via ``ray.put`` (never a
  shuffle join);
- the corpus side is ONE streaming ``map_batches`` pass: per batch,
  vectorized n-gram construction (Arrow ``split_pattern`` →
  ``binary_join_element_wise`` over shifted flat token arrays — no
  Python loop over rows or windows), membership via ``pc.is_in`` against
  the broadcast set, per-doc DISTINCT-overlap counts via an Arrow
  group_by. Docs arrive whole inside a batch, so counts are complete
  map-side — the operator needs NO all-to-all at any scale.

The contract pipeline joins on the literal n-gram STRING so a DuckDB
oracle can reproduce it exactly; at petabyte scale the same pass can
substitute the u64 rolling-hash shingles from functions/dedup.py to skip
the string materialization (collision risk ~2⁻⁶⁴, same pipeline shape).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ngram_table", "decontaminate"]


def ngram_table(batch: pa.Table, n: int = 8, text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """(id, gram) rows: every consecutive-``n``-token window of each doc,
    gram = the space-joined token string. Fully vectorized: one flat token
    array, ``n`` shifted slices joined element-wise, window starts gathered
    per doc with offset arithmetic."""
    toks = pc.split_pattern(batch[text_col], " ")
    flat = pc.list_flatten(toks).cast(pa.string())
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    n_win = np.maximum(lens - (n - 1), 0)
    tot_w = int(n_win.sum())
    if tot_w == 0 or total < n:
        return pa.table({
            id_col: pa.array([], type=batch[id_col].type),
            "gram": pa.array([], type=pa.string()),
        })
    # flat start index of every valid window, doc by doc
    woff = np.zeros(len(n_win) + 1, dtype=np.int64)
    np.cumsum(n_win, out=woff[1:])
    starts = np.arange(tot_w, dtype=np.int64) - np.repeat(woff[:-1], n_win) \
        + np.repeat(off[:-1], n_win)
    parts = [flat.slice(k, total - (n - 1)) for k in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    grams = grams_all.take(pa.array(starts))
    ids = np.repeat(batch[id_col].to_numpy(), n_win)
    return pa.table({id_col: pa.array(ids, type=batch[id_col].type),
                     "gram": grams})


class _OverlapStage:
    """Actor: count each doc's DISTINCT n-grams present in the broadcast
    benchmark set (set deserialized once per actor, not per batch)."""

    def __init__(self, bench_ref, n: int):
        import ray

        bench = ray.get(bench_ref) if not isinstance(bench_ref, pa.Array) else bench_ref
        self.bench = bench
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ng = ngram_table(batch, n=self.n)
        if len(ng) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_overlap": pa.array([], type=pa.int64())})
        hit = ng.filter(pc.is_in(ng["gram"], value_set=self.bench))
        if len(hit) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "n_overlap": pa.array([], type=pa.int64())})
        distinct = hit.group_by(["doc_id", "gram"]).aggregate([])
        counts = distinct.group_by("doc_id").aggregate([("gram", "count")])
        return pa.table({
            "doc_id": counts["doc_id"].cast(pa.int64()),
            "n_overlap": counts["gram_count"].cast(pa.int64()),
        })


def decontaminate(docs_path: str, n: int = 8, bench_mod: int = 97,
                  concurrency: Optional[int] = None):
    """Dataset of (doc_id, n_overlap) for every NON-benchmark doc sharing
    ≥1 distinct n-gram with the benchmark slice (doc_id % bench_mod == 0 —
    a deterministic stand-in for a held-out eval set; swap in any small
    table of benchmark texts). Docs are whole per batch, so the result is
    complete without a shuffle."""
    import ray
    import ray.data

    def _mod_filter(want_bench: bool):
        def fn(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy() % bench_mod == 0
            return t.filter(pa.array(m if want_bench else ~m))
        return fn

    bench_ds = ray.data.read_parquet(
        docs_path, columns=["doc_id", "text"]
    ).map_batches(_mod_filter(True), batch_format="pyarrow")
    bench_grams = set()
    for b in bench_ds.map_batches(
        lambda t: ngram_table(t, n=n), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        bench_grams.update(b["gram"].to_pylist())
    bench_arr = pa.array(sorted(bench_grams), type=pa.string())
    bench_ref = ray.put(bench_arr)

    corpus = ray.data.read_parquet(
        docs_path, columns=["doc_id", "text"]
    ).map_batches(_mod_filter(False), batch_format="pyarrow")
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, ncpu))
    return corpus.map_batches(
        _OverlapStage,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
