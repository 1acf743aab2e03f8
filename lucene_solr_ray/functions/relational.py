"""Relational dataflow operators — the Solr streaming-expression surface
re-expressed as Ray Data compositions.

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/*
(branch_8x; SURVEY.md §2.8): pull-based sorted-tuple operators. The
load-bearing translation (SURVEY.md §3.3): where the reference guarantees
per-stream SORT ORDER so one-pass group/join/dedup work, Ray Data
guarantees HASH CO-PARTITIONING — so sorted-one-pass operators become
``groupby(...).map_groups`` / ``join`` and the sort moves to the edges.

Each helper names the stream class it re-creates. All results stream;
nothing materializes on the driver.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

__all__ = [
    "rollup", "facet_counts", "facet_top_terms", "top", "unique_stream", "having",
    "inner_join", "hash_join_broadcast", "semi_join_broadcast",
    "semi_join", "distinct", "broadcast_table", "left_outer_join", "cursor_page",
    "score_join", "block_join_parents", "graph_traverse",
    "collapse", "expand", "stats_component", "select_stream", "merge_union",
    "default_shuffle_partitions",
]


def default_shuffle_partitions(num_partitions: Optional[int] = None) -> int:
    """Cluster-derived shuffle fan-out for joins/groupbys: one partition per
    cluster CPU, floor 8 (so small test sessions still exercise multi-
    partition paths). A hardcoded small constant is correct at sf0.01 but
    serializes the all-to-all on a real cluster — the fan-out must grow
    with the cluster, not the code."""
    if num_partitions is not None:
        return num_partitions
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def _topn_per_key(t: pa.Table, keyl: List[str], sort_keys, n: int,
                  skip: int = 0) -> pa.Table:
    """Sort ``t`` by ``sort_keys`` (Arrow C++ stable sort — any dtype) and
    keep rows ranked [``skip``, ``skip + n``) of every distinct key
    combination, fully vectorized (dictionary-encoded key codes, one
    boundary diff, one cumulative-max rank; no per-group Python). Nulls
    count as a distinct key value. ``skip`` > 0 drops each group's leading
    rows (ExpandComponent: everything but the collapse winner)."""
    if t.num_rows == 0:
        return t
    t = t.sort_by(sort_keys)
    m = t.num_rows
    boundary = np.zeros(m, dtype=bool)
    boundary[0] = True
    for k in keyl:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        boundary[1:] |= codes[1:] != codes[:-1]
    if n == 1 and skip == 0:
        return t.filter(pa.array(boundary))
    idx = np.arange(m, dtype=np.int64)
    group_start = np.maximum.accumulate(np.where(boundary, idx, 0))
    rank = idx - group_start
    return t.filter(pa.array((rank >= skip) & (rank < skip + n)))


def _first_per_key(t: pa.Table, keyl: List[str], sort_keys) -> pa.Table:
    """:func:`_topn_per_key` with n=1 (first row per distinct key)."""
    return _topn_per_key(t, keyl, sort_keys, 1)


def bucketed_topn(ds, keys, order_cols: Sequence[str],
                  descending: Sequence[bool], n: int,
                  num_partitions: Optional[int] = None):
    """Top-``n``-rows-per-key for HIGH-CARDINALITY keys, row-preserving:
    the bucketed combiner+merge pattern (see bucketed_agg) applied to
    top-n selection. Map side: each block keeps only its local top-n per
    key (Arrow sort + vectorized rank mask) and tags a key-hash bucket,
    so the shuffle moves ≤ n rows per (block, key); merge side: one
    ``groupby(bucket)`` over ``P`` buckets re-sorts each bucket table in
    C++ and keeps the global top-n per key (a key lands entirely in one
    bucket, so the per-bucket merge is exact). Replaces the per-key
    ``map_groups(sort.head(n))`` pandas callables — at 1e8 groups that is
    an Arrow kernel per bucket instead of 1e8 Python calls. With no
    ``order_cols`` the winners are arbitrary-but-n rows per key."""
    keyl = [keys] if isinstance(keys, str) else list(keys)
    P = default_shuffle_partitions(num_partitions)
    sort_keys = [(k, "ascending") for k in keyl] + [
        (c, "descending" if d else "ascending")
        for c, d in zip(order_cols, descending)
    ]

    def part(t: pa.Table) -> pa.Table:
        t = _topn_per_key(t, keyl, sort_keys, n)
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keyl:
                h = h * np.uint64(0x100000001B3) ^ _key_bucket_hash(t[k])
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(P)).astype(np.int64))
        )

    def merge(g: pa.Table) -> pa.Table:
        # empty groups still drop _bucket so every block shares one schema
        # (a bare `return g` here emits schema-mismatch RefBundle warnings)
        return _topn_per_key(g.drop_columns(["_bucket"]), keyl, sort_keys, n)

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def bucketed_top1(ds, keys, order_cols: Sequence[str],
                  descending: Sequence[bool],
                  num_partitions: Optional[int] = None):
    """Best-row-per-key (:func:`bucketed_topn` with n=1) — UniqueStream /
    collapse first-wins semantics; with no ``order_cols`` the winner is an
    arbitrary-but-single row per key under hash partitioning."""
    return bucketed_topn(ds, keys, order_cols, descending, 1, num_partitions)


def bucketed_agg(ds, keys, aggs, out_names, num_partitions: Optional[int] = None):
    """Grouped aggregation for HIGH-CARDINALITY keys: per-block pyarrow
    combiner + bucket-grouped pyarrow merge — no per-key exchange (the
    rollup/cc round-4 pattern; Ray's keyed aggregate pays ~100 µs per
    input row in its sort exchange). ``aggs``: [(col, fn)] with fn in
    sum|min|max|count (count = ROW count, col ignored); exact for these
    mergeable fns. Output columns: keys + out_names (int64 counts)."""
    keyl = [keys] if isinstance(keys, str) else list(keys)
    P = default_shuffle_partitions(num_partitions)

    def part(t: pa.Table) -> pa.Table:
        work = t
        agg_list = []
        for col, fn in aggs:
            if fn == "count":
                if "_n" not in work.column_names:
                    work = work.append_column(
                        "_n", pa.array(np.ones(work.num_rows, dtype=np.int64))
                    )
                agg_list.append(("_n", "sum"))
            else:
                agg_list.append((col, fn))
        g = work.group_by(keyl).aggregate(agg_list)
        h = np.zeros(g.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keyl:
                h = h * np.uint64(0x100000001B3) ^ _key_bucket_hash(g[k])
        return g.append_column(
            "_bucket", pa.array((h % np.uint64(P)).astype(np.int64))
        )

    def pa_name(col, fn):
        return "_n_sum" if fn == "count" else f"{col}_{fn}"

    merge_in = [pa_name(c, f) for c, f in aggs]
    merge_fn = ["sum" if f in ("sum", "count") else f for _, f in aggs]

    def merge(g: pa.Table) -> pa.Table:
        # empty groups run the same (cheap) path so every block shares the
        # post-aggregate schema — no schema-mismatch RefBundle warnings
        agg = g.drop_columns(["_bucket"]).group_by(keyl).aggregate(
            list(zip(merge_in, merge_fn))
        )
        return agg.select(
            keyl + [f"{n}_{f}" for n, f in zip(merge_in, merge_fn)]
        ).rename_columns(keyl + list(out_names))

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def rollup(ds, keys: Sequence[str], aggs: Dict[str, Sequence[str]]):
    """RollupStream (…/io/stream/RollupStream.java ~250 LoC): grouped
    partial+final aggregation. ``aggs``: {col: [fn, ...]} with fn in
    sum|min|max|mean|count|std.

    Shape: an EXPLICIT map-side combiner — every block pre-reduces to one
    row per distinct key via ``pyarrow.Table.group_by`` (a C++ hash agg),
    and only those partials enter the native groupby. Ray's aggregate
    runs a sort-based exchange whose cost scales with INPUT ROWS
    (~100 µs/row measured: 600k replicated window rows cost 60 core-s in
    AggregateMap+Reduce at sf0.1); the combiner makes the exchange scale
    with blocks × distinct keys instead, which is what a 100-TB rollup
    needs. ``std`` keeps the native path (Welford partials aren't worth
    hand-merging); mean divides the partial sum by the NON-NULL count, so
    null semantics match Ray/SQL aggregates."""
    if any("std" in fnames for fnames in aggs.values()):
        fns = {"sum": Sum, "min": Min, "max": Max, "mean": Mean, "std": Std}
        agg_objs = []
        for col, fnames in aggs.items():
            for f in fnames:
                if f == "count":
                    agg_objs.append(Count(alias_name=f"count_{col}"))
                else:
                    agg_objs.append(fns[f](col, alias_name=f"{f}_{col}"))
        return ds.groupby(list(keys)).aggregate(*agg_objs)

    keyl = list(keys)
    partial_specs = set()
    need_n = False
    for col, fnames in aggs.items():
        for f in fnames:
            if f == "sum":
                partial_specs.add((col, "sum"))
            elif f in ("min", "max"):
                partial_specs.add((col, f))
            elif f == "mean":
                partial_specs.add((col, "sum"))
                partial_specs.add((col, "count"))
            elif f == "count":
                need_n = True
            else:
                raise ValueError(f"rollup: unknown agg {f!r}")
    partial_specs = sorted(partial_specs)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch
        agg_list = list(partial_specs)
        if need_n:
            t = t.append_column(
                "_n", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )
            agg_list = agg_list + [("_n", "sum")]
        return t.group_by(keyl).aggregate(agg_list)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    # merge phase: Ray's keyed aggregate pays its per-row sort-exchange
    # cost per KEY, so high-cardinality rollups (e.g. user×window) stay
    # slow even after the combiner. Group by a HASH BUCKET of the key
    # tuple instead (~cluster-CPU buckets) and merge each bucket with one
    # pyarrow C++ hash agg — same co-partition guarantee, no per-key
    # exchange (the cc.py round-4 pattern).
    P = default_shuffle_partitions(None)
    merge_names = [f"{c}_{f}" for c, f in partial_specs] + (
        ["_n_sum"] if need_n else []
    )
    merge_fns = [{"sum": "sum", "count": "sum", "min": "min", "max": "max"}[f]
                 for _, f in partial_specs] + (["sum"] if need_n else [])

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for k in keyl:
                h = h * np.uint64(0x100000001B3) ^ _key_bucket_hash(t[k])
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(P)).astype(np.int64))
        )

    def merge_bucket(g: pa.Table) -> pa.Table:
        # empty groups run the same path: uniform post-aggregate schema
        agg = g.drop_columns(["_bucket"]).group_by(keyl).aggregate(
            list(zip(merge_names, merge_fns))
        )
        # pyarrow appends the fn to the output name ("x_sum" → "x_sum_sum");
        # restore the partial names so finalize stays uniform
        return agg.select(
            keyl + [f"{nm}_{fn}" for nm, fn in zip(merge_names, merge_fns)]
        ).rename_columns(keyl + merge_names)

    red = (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )

    def finalize(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keyl}
        for col, fnames in aggs.items():
            for f in fnames:
                if f == "sum":
                    cols[f"sum_{col}"] = t[f"{col}_sum"]
                elif f in ("min", "max"):
                    cols[f"{f}_{col}"] = t[f"{col}_{f}"]
                elif f == "mean":
                    cols[f"mean_{col}"] = pc.divide(
                        pc.cast(t[f"{col}_sum"], pa.float64()),
                        pc.cast(t[f"{col}_count"], pa.float64()),
                    )
                else:  # count
                    cols[f"count_{col}"] = t["_n_sum"]
        return pa.table(cols)

    return red.map_batches(finalize, batch_format="pyarrow")


def facet_counts(ds, col: str, topn: Optional[int] = None):
    """FacetComponent field-facet analog (solr/core/.../component/
    FacetComponent.java ~2,600 LoC): count per term, optionally top-N by
    (count desc, value asc) — the deterministic facet sort."""
    counts = ds.groupby(col).aggregate(Count(alias_name="count"))
    if topn is None:
        return counts
    return counts.sort(["count", col], descending=[True, False]).limit(topn)


def facet_top_terms(ds, col: str, topn: int = 10, overrequest: Optional[int] = None):
    """Two-phase distributed facet refinement (solr/core/.../component/
    FacetComponent.java, branch_8x; SURVEY.md §2.6): the reference's answer
    for top-N facets over HIGH-cardinality fields at scale, where an exact
    global (count, term) sort would shuffle the whole vocabulary.

    Phase 1 — overrequest: every block emits only its LOCAL top
    ``topn*1.5 + 10`` terms by count (Solr's facet.overrequest default),
    vectorized per block. Phase 2 — refine: the candidate union (small) is
    broadcast and EXACT global counts are computed for candidate terms
    only, then top-N by (count desc, term asc). The all-to-all therefore
    moves candidate-term rows, never the tail of the distribution.

    Exactness model (same as the reference's): a true global top-N term
    must appear in some block's local top-K' — holds for Zipf-ish skewed
    data (head terms lead every block); raise ``overrequest`` for flatter
    distributions."""
    k_shard = overrequest if overrequest is not None else int(topn * 1.5) + 10

    def local_top(batch: pa.Table) -> pa.Table:
        t = batch.select([col]).group_by(col).aggregate([(col, "count")])
        srt = t.sort_by([(f"{col}_count", "descending"), (col, "ascending")])
        return srt.slice(0, k_shard).select([col])

    cands = distinct(ds.map_batches(local_top, batch_format="pyarrow"), [col])
    cand_ref = broadcast_table(cands)
    refined = semi_join_broadcast_table(ds, cand_ref, on=col)
    return facet_counts(refined, col, topn=topn)


def semi_join_broadcast_table(ds, small_table_ref, on: str, anti: bool = False):
    """Filter rows whose ``on`` value is (not) present in a broadcast Arrow
    table's ``on`` column — the table-valued twin of semi_join_broadcast."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        small = (
            ray.get(small_table_ref)
            if not isinstance(small_table_ref, pa.Table)
            else small_table_ref
        )
        if small is None:
            return batch if anti else batch.slice(0, 0)
        mask = pc.is_in(batch[on], value_set=small[on].combine_chunks())
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def top(ds, keys: Sequence[str], descending: Sequence[bool], k: int):
    """RankStream / top() (…/io/stream/RankStream.java): k best by sort
    keys — Ray's distributed sort + limit (per-block top-k then merge)."""
    return ds.sort(list(keys), descending=list(descending)).limit(k)


def unique_stream(ds, col: str):
    """UniqueStream (…/io/stream/UniqueStream.java ~120 LoC): dedup by key,
    first wins — hash groupby replaces the sorted-stream one-pass (under
    hash partitioning "first" is an arbitrary single winner, exactly as
    the old per-group head(1) was). When the key is the ONLY column this
    is DISTINCT and runs as a native count aggregate; the row-preserving
    multi-column path is the bucketed combiner+merge top-1 (no per-key
    Python callable — the scale path for 1e8+ groups)."""
    try:
        only_col = ds.schema().names == [col]
    except Exception:
        only_col = False
    if only_col:
        return distinct(ds, [col])
    return bucketed_top1(ds, [col], [], [])


def _key_bucket_hash(k) -> np.ndarray:
    """Deterministic uint64 hash of a key column for bucket shuffles.
    Integer keys take a pure-numpy splitmix64 path (no Python per row);
    everything else goes through polars' vectorized hash kernel."""
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    if pa.types.is_integer(k.type):
        x = k.to_numpy(zero_copy_only=False).astype(np.uint64)
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))
    try:
        import polars as pl

        return pl.from_arrow(k.cast(pa.string())).hash(seed=7).to_numpy()
    except Exception:
        import zlib

        return np.fromiter(
            (zlib.crc32(str(v).encode()) for v in k.to_pylist()),
            dtype=np.uint64, count=len(k),
        )


def asof_join(ds_left, ds_right, key: str, ts_col: str,
              right_cols: Sequence[str], num_partitions: Optional[int] = None,
              direction: str = "backward"):
    """AS-OF join (task-brief custom operator; no reference analog — the
    classic time-series/attribution join): for every LEFT row, attach the
    RIGHT row of the same ``key`` with the greatest ``ts_col`` ≤ the left
    row's (direction="backward"; "forward" = smallest ≥).

    Partitioning assumption (documented per the brief): co-location by
    ``key`` hash. Both sides union into ONE dataset with a side tag and
    shuffle ONCE on ``bucket = hash(key) % P`` — P groups total, so the
    per-group callable runs P times, NOT once per key; inside a bucket a
    single vectorized ``pandas.merge_asof(by=key)`` handles every key at
    once after one sort. Skew is bounded by the largest bucket; salt the
    key into the bucket hash if one key dominates.

    Right columns are suffixed ``_r``; left rows without a match carry
    nulls (left-join semantics)."""

    def tag(side: int):
        def fn(batch: pa.Table, side=side) -> pa.Table:
            h = _key_bucket_hash(batch[key])
            P = default_shuffle_partitions(num_partitions)
            return batch.append_column(
                "_side", pa.array(np.full(batch.num_rows, side, dtype=np.int8))
            ).append_column("_bucket", pa.array((h % P).astype(np.int64)))
        return fn

    # input schemas are metadata (no execution); the tagged datasets' schemas
    # can be None when a side is empty, so derive union columns from these
    l_schema = ds_left.schema()
    r_schema = ds_right.schema()

    lt = ds_left.map_batches(tag(0), batch_format="pyarrow")
    rt = ds_right.map_batches(tag(1), batch_format="pyarrow")

    # align schemas for the union: add each other's missing columns as nulls
    l_names, r_names = set(l_schema.names), set(r_schema.names)

    def widen(missing, types):
        def fn(batch: pa.Table) -> pa.Table:
            for name in missing:
                batch = batch.append_column(
                    name, pa.nulls(batch.num_rows, type=types[name])
                )
            return batch.select(sorted(batch.column_names))
        return fn

    r_types = dict(zip(r_schema.names, r_schema.types))
    l_types = dict(zip(l_schema.names, l_schema.types))
    lt = lt.map_batches(widen(sorted(r_names - l_names), r_types), batch_format="pyarrow")
    rt = rt.map_batches(widen(sorted(l_names - r_names), l_types), batch_format="pyarrow")

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g._side == 0].drop(columns=["_side", "_bucket"])
        R = g[g._side == 1].drop(columns=["_side", "_bucket"])
        L = L.drop(columns=[c for c in right_cols if c in L.columns and c != ts_col and c != key])
        R = R[[key, ts_col] + [c for c in right_cols if c not in (key, ts_col)]]
        L = L.sort_values(ts_col, kind="mergesort")
        R = R.sort_values(ts_col, kind="mergesort")
        if len(L) == 0:
            # keep the output schema stable across buckets: empty left still
            # carries the right-side columns with their real dtypes
            for c in right_cols:
                if c not in L.columns:
                    L[c] = pd.Series(dtype=R[c].dtype)
            return L
        out = pd.merge_asof(
            L, R, on=ts_col, by=key, direction=direction, suffixes=("", "_r")
        )
        return out

    both = lt.union(rt)
    out = both.groupby("_bucket").map_groups(asof_bucket, batch_format="pandas")

    # pandas promotes int columns to float64 inside the null-widened union
    # groups; cast every surviving column back to its source arrow type
    want = dict(r_types)
    want.update(l_types)  # left wins for shared names (output rows are left rows)

    def restore_types(batch: pa.Table) -> pa.Table:
        cols = []
        for name in batch.column_names:
            col = batch[name]
            tgt = want.get(name)
            if tgt is not None and col.type != tgt:
                col = pc.cast(col, tgt)
            cols.append(col)
        return pa.table(dict(zip(batch.column_names, cols)))

    return out.map_batches(restore_types, batch_format="pyarrow")


def range_join(ds_left, val_col: str, ds_right, lo_col: str, hi_col: str,
               left_cols: Sequence[str], right_cols: Sequence[str],
               bucket_width: int):
    """Interval-containment RANGE join (task-brief custom operator; no
    equi-key): emit one row per (left row, right interval) pair with
    ``lo <= val < hi``. Columns ``left_cols`` + ``right_cols`` (disjoint)
    are carried through.

    Distribution: quantize the value domain into width-``bucket_width``
    buckets. A left row lands in exactly ONE bucket; a right interval is
    replicated to every bucket it overlaps (replication factor ≈
    interval_len / bucket_width + 1 — pick the width near the typical
    interval length). A matching pair meets in exactly one bucket (the
    left value's own), so no post-dedup. Per bucket everything is
    vectorized: sort left values once, each interval selects a CONTIGUOUS
    slice via two binary searches, pair emission is repeat/arange —
    O((L + R·match) log L) per bucket, never a cross product."""
    assert not (set(left_cols) & set(right_cols)), "left/right columns must be disjoint"
    W = int(bucket_width)

    def tag_left(batch: pa.Table) -> pa.Table:
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [c for c in dict.fromkeys([val_col, *left_cols])]
        return batch.select(keep).append_column(
            "_bucket", pa.array(v // W)
        ).append_column("_side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    def replicate_right(batch: pa.Table) -> pa.Table:
        lo = batch[lo_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = batch[hi_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = lo // W
        # last bucket a half-open [lo, hi) interval can touch
        b1 = np.maximum(hi - 1, lo) // W
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        buckets = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(offs, reps) \
            + np.repeat(b0, reps)
        keep = [c for c in dict.fromkeys([lo_col, hi_col, *right_cols])]
        out = batch.select(keep).take(pa.array(idx))
        return out.append_column("_bucket", pa.array(buckets)).append_column(
            "_side", pa.array(np.ones(len(idx), dtype=np.int8))
        )

    lt = ds_left.map_batches(tag_left, batch_format="pyarrow")
    rt = ds_right.map_batches(replicate_right, batch_format="pyarrow")

    l_keep = list(dict.fromkeys([val_col, *left_cols]))
    r_keep = list(dict.fromkeys([lo_col, hi_col, *right_cols]))
    l_types = {n: t for n, t in zip(ds_left.schema().names, ds_left.schema().types)
               if n in l_keep}
    r_types = {n: t for n, t in zip(ds_right.schema().names, ds_right.schema().types)
               if n in r_keep}

    def widen(missing, types):
        def fn(batch: pa.Table) -> pa.Table:
            for name in missing:
                batch = batch.append_column(name, pa.nulls(batch.num_rows, type=types[name]))
            return batch.select(sorted(batch.column_names))
        return fn

    lt = lt.map_batches(widen(sorted(set(r_keep) - set(l_keep)), r_types),
                        batch_format="pyarrow")
    rt = rt.map_batches(widen(sorted(set(l_keep) - set(r_keep)), l_types),
                        batch_format="pyarrow")

    out_cols = list(left_cols) + list(right_cols)

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        L = g[g._side == 0]
        R = g[g._side == 1]
        empty = pd.DataFrame({c: pd.Series(dtype=g[c].dtype) for c in out_cols})
        if len(L) == 0 or len(R) == 0:
            return empty
        v = L[val_col].to_numpy().astype(np.int64)
        order = np.argsort(v, kind="stable")
        vs = v[order]
        lo = R[lo_col].to_numpy().astype(np.int64)
        hi = R[hi_col].to_numpy().astype(np.int64)
        a = np.searchsorted(vs, lo, side="left")
        b = np.searchsorted(vs, hi, side="left")
        cnt = (b - a).clip(min=0)
        total = int(cnt.sum())
        if total == 0:
            return empty
        rep = np.repeat(np.arange(len(R), dtype=np.int64), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        flat = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt) + np.repeat(a, cnt)
        left_idx = order[flat]
        data = {c: L[c].to_numpy()[left_idx] for c in left_cols}
        data.update({c: R[c].to_numpy()[rep] for c in right_cols})
        return pd.DataFrame(data)

    both = lt.union(rt)
    out = both.groupby("_bucket").map_groups(match_bucket, batch_format="pandas")

    want = dict(r_types)
    want.update(l_types)

    def restore_types(batch: pa.Table) -> pa.Table:
        cols = []
        for name in batch.column_names:
            col = batch[name]
            tgt = want.get(name)
            if tgt is not None and col.type != tgt:
                col = pc.cast(col, tgt)
            cols.append(col)
        return pa.table(dict(zip(batch.column_names, cols)))

    return out.map_batches(restore_types, batch_format="pyarrow")


def session_windows(ds, key: str, ts_col: str, gap_us: int,
                    num_partitions: Optional[int] = None):
    """Gap-based sessionization (streaming session windows — absent from
    both the reference, SURVEY.md §2.10, and Ray Data): group each key's
    events into sessions split wherever the time gap to the previous event
    exceeds ``gap_us`` microseconds, and emit one row per session with
    ``(key, session_start, session_end, n_events)``.

    Partitioning assumption: co-location by ``key`` hash — ONE shuffle on
    ``bucket = hash(key) % P`` (P groups total, not one per key). Inside a
    bucket everything is vectorized: one lexsort by (key, ts), a diff for
    the gap breaks, cumsum for session ids, then a single pandas groupby
    (C path) for the per-session min/max/count. Skew is bounded by the
    hottest bucket; salt the key if one key dominates."""

    def tag(batch: pa.Table) -> pa.Table:
        h = _key_bucket_hash(batch[key])
        P = default_shuffle_partitions(num_partitions)
        return batch.select([key, ts_col]).append_column(
            "_bucket", pa.array((h % P).astype(np.int64))
        )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="mergesort")
        ts = g[ts_col].to_numpy()
        ts_us = ts.astype("datetime64[us]").astype(np.int64) if ts.dtype.kind == "M" \
            else ts.astype(np.int64)
        k = g[key].to_numpy()
        new_key = np.empty(len(g), dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        sid = np.cumsum(new_key | gap)
        out = (
            pd.DataFrame({key: k, "_sid": sid, "_ts": g[ts_col].to_numpy()})
            .groupby([key, "_sid"], sort=False)
            .agg(session_start=("_ts", "min"), session_end=("_ts", "max"),
                 n_events=("_ts", "size"))
            .reset_index()
            .drop(columns=["_sid"])
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("_bucket").map_groups(sessions, batch_format="pandas")


def stratified_sample(ds, strata_col: str, id_col: str, fracs: Dict[str, float],
                      default_frac: float = 0.0):
    """Per-stratum deterministic sampling — the training-data mixture
    rebalancing step (keep 50% of stratum A, 5% of stratum B, ...), built
    on the same Knuth multiplicative hash as the flat sampler so a SQL
    oracle reproduces it bit-exactly and re-runs are stable at any scale.
    One streaming filter pass: per batch, the stratum column maps to its
    threshold via Arrow ``index_in`` against the (tiny) fracs table, the
    id hashes vectorized, rows keep where hash < threshold[stratum]."""
    keys = list(fracs)
    thr = np.array(
        [int(f * (1 << 32)) for f in fracs.values()]
        + [int(default_frac * (1 << 32))],
        dtype=np.uint64,
    )
    key_arr = pa.array(keys)

    def samp(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch[strata_col], value_set=key_arr)
        idx = idx.fill_null(len(keys)).to_numpy(zero_copy_only=False).astype(np.int64)
        t = thr[idx]
        k = batch[id_col].to_numpy().astype(np.uint64)
        h = (k * np.uint64(2654435761)) % np.uint64(1 << 32)
        return batch.filter(pa.array(h < t))

    return ds.map_batches(samp, batch_format="pyarrow")


def having(ds, predicate_fn):
    """HavingStream: vectorized arrow predicate over aggregated rows."""
    return ds.map_batches(
        lambda t: t.filter(predicate_fn(t)), batch_format="pyarrow"
    )


def inner_join(ds_left, ds_right, on: Sequence[str], num_partitions: Optional[int] = None):
    """InnerJoinStream (…/io/stream/InnerJoinStream.java ~150 LoC): the
    reference sort-merge-joins co-sorted streams; here both sides hash-
    partition on the key (Ray 2.49 native Dataset.join)."""
    return ds_left.join(
        ds_right, join_type="inner", on=tuple(on),
        num_partitions=default_shuffle_partitions(num_partitions),
    )


def broadcast_table(ds, max_rows: int = 2_000_000):
    """Materialize a SMALL dataset as one Arrow table and ``ray.put`` it
    for broadcast probing. Hard row cap: a side that exceeds it must go
    through the shuffle join instead — broadcasting an unbounded side is
    the classic driver-OOM at scale."""
    import ray

    tabs, n = [], 0
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n += b.num_rows
        if n > max_rows:
            raise ValueError(
                f"broadcast side exceeds {max_rows} rows — use inner_join/"
                "semi_join (shuffle) for this side"
            )
        tabs.append(b)
    small = pa.concat_tables(tabs) if tabs else None
    return ray.put(small)


def hash_join_broadcast(ds, small_table_ref, on: str, select: Dict[str, str]):
    """HashJoinStream (…/io/stream/HashJoinStream.java ~300 LoC): the small
    side is read fully into memory — here broadcast via ``ray.put`` once
    (``broadcast_table``) and probed per batch with Arrow ``index_in`` +
    ``take`` (zero pandas round-trips; the plasma get is zero-copy).
    The small side MUST be unique on ``on`` — ``index_in`` returns only the
    FIRST match, so a duplicate-key small side would silently drop the
    row multiplication an inner join implies; enforced loudly below (once
    per task, cached across batches). ``select``: {small_col: out_name}
    columns to attach. Inner-join semantics."""
    import ray

    checked_ids: set = set()  # per-task memo (probe is pickled per task)

    def probe(batch: pa.Table) -> pa.Table:
        small = (
            ray.get(small_table_ref)
            if not isinstance(small_table_ref, pa.Table)
            else small_table_ref
        )
        if small is None:
            return batch.slice(0, 0)
        if id(small) not in checked_ids:
            n_distinct = pc.count_distinct(small[on]).as_py()
            if n_distinct != small.num_rows:
                raise ValueError(
                    f"hash_join_broadcast: small side has duplicate '{on}' keys "
                    f"({small.num_rows} rows, {n_distinct} distinct) — index_in "
                    "keeps only the first match; use inner_join for a "
                    "row-multiplying side"
                )
            checked_ids.add(id(small))
        idx = pc.index_in(batch[on], value_set=small[on])
        keep = idx.is_valid()
        batch = batch.filter(keep)
        idx = idx.filter(keep)
        for scol, out_name in select.items():
            batch = batch.append_column(out_name, pc.take(small[scol], idx))
        return batch

    return ds.map_batches(probe, batch_format="pyarrow")


def semi_join(ds_left, ds_right, on: str, right_on: Optional[str] = None,
              num_partitions: Optional[int] = None, anti: bool = False):
    """{!join} semi-join / complement() with BOTH sides distributed: Ray's
    native hash ``left_semi`` / ``left_anti`` join (no driver key-set —
    the right side is unbounded at scale). Duplicate right keys don't
    multiply rows (semi-join semantics)."""
    return ds_left.join(
        ds_right,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=default_shuffle_partitions(num_partitions),
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def distinct(ds, cols: Sequence[str]):
    """Distributed DISTINCT via hash groupby (map-side pre-agg + shuffle of
    keys only) — the dataset-native replacement for collecting a key set
    on the driver."""
    cols = list(cols)
    return ds.select_columns(cols).groupby(cols).count().drop_columns(["count()"])


def semi_join_broadcast(ds, key_set_ref, on: str, anti: bool = False):
    """JoinQParser {!join} semi-join analog (solr/core/.../search/
    JoinQParserPlugin.java ~600 LoC): keep rows whose key is in (semi) or
    not in (anti=ComplementStream) the broadcast key set."""
    import ray

    def filt(batch: pa.Table) -> pa.Table:
        keys = (
            ray.get(key_set_ref) if not isinstance(key_set_ref, (set, frozenset)) else key_set_ref
        )
        mask = pc.is_in(batch[on], value_set=pa.array(list(keys)))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def left_outer_join(ds_left, ds_right, on: str, right_on: Optional[str] = None,
                    num_partitions: Optional[int] = None):
    """LeftOuterJoinStream (…/io/stream/LeftOuterJoinStream.java ~150 LoC):
    native hash left-outer join; unmatched left rows keep nulls on the
    right columns."""
    return ds_left.join(
        ds_right, join_type="left_outer",
        num_partitions=default_shuffle_partitions(num_partitions),
        on=(on,), right_on=(right_on,) if right_on else None,
    )


def cursor_page(ds, sort_col: str, unique_col: str, k: int,
                cursor: Optional[tuple] = None, descending: bool = False):
    """cursorMark deep paging (solr/core/src/java/org/apache/solr/search/
    CursorMark.java ~300 LoC): KEYSET pagination — the cursor is the last
    row's (sort value, unique key); the next page filters strictly past it
    BEFORE the sort+limit, so page N costs the same as page 1 (offset
    pagination re-sorts and discards N·k rows). The sort order is totalized
    with the unique key, exactly like Solr requires the uniqueKey as the
    final sort field."""
    out = ds
    if cursor is not None:
        sv, uv = cursor

        def past_cursor(batch: pa.Table) -> pa.Table:
            s = batch[sort_col]
            u = batch[unique_col]
            if descending:
                strict = pc.less(s, sv)
            else:
                strict = pc.greater(s, sv)
            tie = pc.and_(pc.equal(s, sv), pc.greater(u, uv))
            return batch.filter(pc.or_(strict, tie))

        out = out.map_batches(past_cursor, batch_format="pyarrow")
    return out.sort([sort_col, unique_col], descending=[descending, False]).limit(k)


def collapse(ds, key: str, order_cols: Sequence[str], descending: Sequence[bool]):
    """CollapsingQParserPlugin / grouping top-1 (solr/core/.../search/
    CollapsingQParserPlugin.java ~2,900 LoC): keep the best row per group
    by the given order. Generic path (any dtypes) = the bucketed
    combiner+merge top-1 — Arrow sort per block/bucket, no per-key Python;
    ``collapse_packed`` remains the one-aggregate alternative when the
    order columns pack into one int64."""
    return bucketed_top1(ds, [key], list(order_cols), list(descending))


def collapse_packed(ds, key: str, pack_fn, unpack_fn, mode: str = "max"):
    """Native collapse: ``pack_fn(batch)`` appends an int64 ``_packed``
    column whose numeric order equals the collapse order (order columns
    bit-packed, best row = max/min); a native Max/Min per key replaces the
    per-group Python callable — at 1e8 groups that is the difference
    between an Arrow hash-agg and 1e8 Python calls. ``unpack_fn`` receives
    (key, _packed) rows and restores the winning row's columns. The packing
    must be collision-free within a group (e.g. include a unique id in the
    low bits) so exactly one row wins deterministically."""
    packed = ds.map_batches(pack_fn, batch_format="pyarrow").select_columns(
        [key, "_packed"]
    )
    agg_cls = Max if mode == "max" else Min
    out = packed.groupby(key).aggregate(agg_cls("_packed", alias_name="_packed"))
    return out.map_batches(unpack_fn, batch_format="pyarrow")


def expand(ds, key: str, order_cols: Sequence[str], descending: Sequence[bool],
           rows: int = 5, num_partitions: Optional[int] = None):
    """ExpandComponent (solr/core/src/java/org/apache/solr/handler/
    component/ExpandComponent.java ~800 LoC, branch_8x; SURVEY.md §2.6):
    the expanded section paired with :func:`collapse` — for each collapsed
    group, up to ``rows`` ADDITIONAL documents (the collapse winner
    excluded) in the group's sort order. Same bucketed combiner+merge
    shape as :func:`bucketed_topn` with n = rows + 1: the map side keeps
    each block's local top-(rows+1) per key (the winner may live in any
    block, so it must travel), the merge side takes the global
    top-(rows+1) per key and drops rank 0 — a key lands entirely in one
    bucket, so the winner drop is exact. Single-member groups emit
    nothing, matching Solr (the expand section omits groups with no other
    documents)."""
    keyl = [key]
    P = default_shuffle_partitions(num_partitions)
    sort_keys = [(key, "ascending")] + [
        (c, "descending" if d else "ascending")
        for c, d in zip(order_cols, descending)
    ]

    def part(t: pa.Table) -> pa.Table:
        t = _topn_per_key(t, keyl, sort_keys, rows + 1)
        h = _key_bucket_hash(t[key]) % np.uint64(P)
        return t.append_column("_bucket", pa.array(h.astype(np.int64)))

    def merge(g: pa.Table) -> pa.Table:
        return _topn_per_key(
            g.drop_columns(["_bucket"]), keyl, sort_keys, rows, skip=1
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def stats_component(ds, col: str):
    """StatsComponent (solr/core/.../component/StatsComponent.java ~700
    LoC): global min/max/sum/count/mean over one column."""
    return ds.aggregate(
        Min(col, alias_name=f"min_{col}"),
        Max(col, alias_name=f"max_{col}"),
        Sum(col, alias_name=f"sum_{col}"),
        Count(alias_name="count"),
        Mean(col, alias_name=f"mean_{col}"),
    )


def select_stream(ds, columns: Sequence[str], computed=None):
    """SelectStream: projection + computed columns (arrow expressions)."""
    out = ds
    if computed:
        def add(batch: pa.Table) -> pa.Table:
            for name, fn in computed.items():
                batch = batch.append_column(name, fn(batch))
            return batch
        out = out.map_batches(add, batch_format="pyarrow")
    return out.select_columns(list(columns) + list(computed or {}))


def merge_union(ds_a, ds_b, sort_keys: Optional[Sequence[str]] = None,
                descending: Optional[Sequence[bool]] = None):
    """MergeStream (…/io/stream/MergeStream.java ~150 LoC): sorted union —
    union + sort (order restored at the edge, per the §3.3 translation)."""
    u = ds_a.union(ds_b)
    if sort_keys:
        u = u.sort(list(sort_keys), descending=list(descending or [False] * len(sort_keys)))
    return u


def score_join(ds_from, ds_to, from_key: str, to_key: str, score_col: str,
               mode: str = "max", num_partitions: Optional[int] = None):
    """Score join (reference: lucene/join/src/java/org/apache/lucene/search/
    join/JoinUtil.java ~450 LoC, branch_8x; SURVEY.md §2.5): join the "to"
    side to the "from" side's per-key aggregated score (ScoreMode
    Max/Total/Avg → max/sum/mean). The global-ordinal machinery becomes a
    hash groupby on the join key + a hash join — same co-location, no
    ordinal map."""
    from ray.data.aggregate import Max, Mean, Sum

    agg = {"max": Max, "sum": Sum, "avg": Mean}[mode](
        score_col, alias_name=f"{mode}_{score_col}"
    )
    scored = ds_from.groupby(from_key).aggregate(agg)
    return ds_to.join(
        scored, join_type="inner",
        num_partitions=default_shuffle_partitions(num_partitions),
        on=(to_key,), right_on=(from_key,),
    )


def block_join_parents(ds_children, child_parent_key: str, parent_pred_fn,
                       score_col: str = None, mode: str = "max",
                       num_partitions: Optional[int] = None):
    """ToParentBlockJoinQuery analog (reference: lucene/join/.../
    ToParentBlockJoinQuery.java ~400 LoC; SURVEY.md §2.5): parents with at
    least one child matching the predicate, optionally scored by the
    children (max/sum). Lucene relies on index-contiguous doc blocks; here
    parent-key hash co-location replaces contiguity: filter children →
    groupby(parent key) aggregate — returns (parent_key[, score]) rows."""
    from ray.data.aggregate import Count, Max, Sum

    matched = ds_children.map_batches(
        lambda t: t.filter(parent_pred_fn(t)), batch_format="pyarrow"
    )
    if score_col is None:
        return matched.groupby(child_parent_key).aggregate(
            Count(alias_name="n_children")
        )
    agg = {"max": Max, "sum": Sum}[mode](score_col, alias_name=f"{mode}_{score_col}")
    return matched.groupby(child_parent_key).aggregate(agg)


def child_doc_transform(ds_parents, ds_children, parent_key: str,
                        child_parent_key: str, child_filter_fn=None,
                        child_order: Sequence[str] = (),
                        descending: Sequence[bool] = (),
                        limit: int = 10,
                        child_cols: Optional[Sequence[str]] = None,
                        num_partitions: Optional[int] = None):
    """[child] ChildDocTransformer analog (reference: solr/core/src/java/
    org/apache/solr/response/transform/ChildDocTransformerFactory.java
    ~300 LoC, branch_8x; SURVEY.md §2.2 document transformers): each
    parent result row returns with its matching children attached —
    flattened here to (parent cols + child cols) rows, at most ``limit``
    children per parent (the transformer's ``limit`` param), children
    chosen by ``child_order``/``descending`` (Solr returns index order;
    a sort spec is this engine's deterministic equivalent — make the
    last order column unique for a well-defined top-``limit`` set).

    Scale shape: ``childFilter`` prunes map-side, per-parent top-limit
    runs through the bucketed combiner+merge top-n (≤ limit rows per
    (block, parent) ever shuffle — never a full per-parent exchange),
    and the parent attach is ONE native hash join. Parents with no
    surviving child emit nothing (the flattened-table analog of an
    empty child list)."""
    if child_filter_fn is not None:
        ds_children = ds_children.map_batches(
            lambda t: t.filter(child_filter_fn(t)), batch_format="pyarrow"
        )
    else:
        # coerce to Arrow blocks so schema() below yields a pa.Schema
        # (pandas-block lineage reports a PandasBlockSchema instead)
        ds_children = ds_children.map_batches(
            lambda t: t, batch_format="pyarrow")
    if child_cols:
        ds_children = ds_children.select_columns(
            [child_parent_key, *child_cols])
    child_schema = ds_children.schema()  # pre-shuffle: blocks keep schema
    kept = bucketed_topn(
        ds_children, child_parent_key, list(child_order), list(descending),
        limit, num_partitions,
    )
    join_key = child_parent_key
    if join_key == parent_key:
        # Arrow hash join rejects identical key names across sides
        join_key = f"_{child_parent_key}__child"
        kept = kept.map_batches(
            lambda t, old=child_parent_key, new=join_key: t.rename_columns(
                [new if c == old else c for c in t.column_names]),
            batch_format="pyarrow",
        )
    # the attach set is bounded (≤ limit rows per parent — the join holds
    # it in hash tables anyway), so materializing to test emptiness is
    # cheap; a FULLY empty right side breaks Ray 2.49's hash join (0-row
    # blocks are dropped by the shuffle, so the per-partition aggregator
    # never learns the right schema: "No match for FieldRef")
    kept = kept.materialize()
    if kept.count() == 0:
        import ray.data as _rd

        par_base = getattr(
            ds_parents.map_batches(
                lambda t: t, batch_format="pyarrow").schema(),
            "base_schema", None)
        chi_base = getattr(child_schema, "base_schema", None)
        if isinstance(par_base, pa.Schema) and isinstance(chi_base, pa.Schema):
            chi_base = pa.schema([
                pa.field(join_key if f.name == child_parent_key else f.name,
                         f.type) for f in chi_base])
            lt = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in par_base],
                schema=par_base)
            rt = pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in chi_base],
                schema=chi_base)
            empty = lt.join(rt, keys=[parent_key], right_keys=[join_key],
                            join_type="inner")
            return _rd.from_arrow(empty)
        return ds_parents.limit(0)  # non-Arrow lineage: best-effort empty
    P = default_shuffle_partitions(num_partitions)
    # repartition heal: hash joins on map_groups lineage with empty
    # shuffle partitions fail schema resolution (see dedup.py:880)
    out = ds_parents.repartition(P).join(
        kept.repartition(P), join_type="inner", num_partitions=P,
        on=(parent_key,), right_on=(join_key,),
    )
    if join_key != child_parent_key:
        out = out.map_batches(
            lambda t: t.drop_columns([join_key])
            if join_key in t.column_names else t,
            batch_format="pyarrow",
        )
    return out


def graph_traverse(edges_ds_fn, from_col: str, to_col: str, start_keys,
                   max_hops: int = 2, num_partitions: Optional[int] = None,
                   broadcast_threshold: int = 1_000_000):
    """{!graph} traversal (reference: solr/core/src/java/org/apache/solr/
    search/join/GraphQuery.java ~350 LoC; SURVEY.md §2.5): iterative
    frontier expansion — each hop is one distributed semi-join of the edge
    table against the current frontier, then a distinct on the far column.
    ``edges_ds_fn`` is a zero-arg factory returning a fresh edges Dataset
    (each hop re-reads; at scale the edges would be a cached/materialized
    Dataset).

    Frontier routing is adaptive, mirroring the reference's own split
    (GraphQuery collects the frontier as an in-memory automaton/term set
    when it fits, else falls back to a filter query): a frontier below
    ``broadcast_threshold`` keys is broadcast once via the object store and
    each hop becomes one streaming filter pass over the edges — no
    all-to-all. A larger frontier stays fully distributed through a hash
    semi-join. The driver never materializes edge rows either way; the hop
    COUNT is the only driver-side state. Returns the distinct reachable
    ``to_col`` keys (including the start hop's targets)."""
    import ray.data as _rd

    start = _rd.from_items([{from_col: k} for k in start_keys])
    frontier = start
    frontier_n = len(start_keys)
    reachable = None
    for _ in range(max_hops):
        edges = edges_ds_fn()
        if frontier_n is not None and frontier_n <= broadcast_threshold:
            f_ref = broadcast_table(frontier)
            hop = semi_join_broadcast_table(edges, f_ref, on=from_col)
        else:
            hop = semi_join(
                edges, frontier, on=from_col, num_partitions=num_partitions
            )
        targets = distinct(hop, [to_col])
        reachable = targets if reachable is None else distinct(
            reachable.union(targets), [to_col]
        )
        # next frontier: the targets become sources
        frontier = targets.map_batches(
            lambda t: t.rename_columns([from_col]), batch_format="pyarrow"
        )
        frontier_n = None  # unknown until counted; count() below is cheap
        frontier = frontier.materialize()
        frontier_n = frontier.count()
    return reachable


def facet_pivot(ds, col_a: str, col_b: str, topn_a: int = 5, topn_b: int = 5):
    """facet.pivot (reference: solr/core/src/java/org/apache/solr/handler/
    component/PivotFacetProcessor.java ~600 LoC, branch_8x; SURVEY.md
    §2.6): nested two-level facet — top-N values of ``col_a`` by count,
    and within each the top-M ``col_b`` values.

    Scale shape: per-batch Arrow group_by([a,b]) pre-aggregates map-side,
    the shuffle moves one packed (a, b, partial_count) row per distinct
    pair per block (never data rows), and the final single-key groupby
    sums partials. The nested top-N selection runs on the tiny aggregated
    result. Returns a pandas DataFrame (col_a, col_b, count) ordered by
    (a-count desc, col_a asc, count desc, col_b asc)."""
    SEP = "\x1f"

    def pre(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([col_a, col_b])
            .group_by([col_a, col_b])
            .aggregate([([], "count_all")])
        )
        packed = pc.binary_join_element_wise(
            pc.cast(g[col_a], pa.string()), pc.cast(g[col_b], pa.string()), SEP
        )
        return pa.table({"pair": packed, "partial": g["count_all"]})

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("partial", alias_name="count"))
    )
    df = agg.to_pandas()  # ≤ |a|×|b| distinct pairs — the aggregated residue
    ab = df["pair"].str.split(SEP, n=1, expand=True)
    df = pd.DataFrame({col_a: ab[0], col_b: ab[1], "count": df["count"].astype("int64")})
    a_tot = (
        df.groupby(col_a)["count"].sum().sort_values(ascending=False)
        .reset_index()
        .sort_values(["count", col_a], ascending=[False, True], kind="mergesort")
    )
    keep_a = list(a_tot[col_a].head(topn_a))
    out = []
    for a in keep_a:
        sub = df[df[col_a] == a].sort_values(
            ["count", col_b], ascending=[False, True], kind="mergesort"
        ).head(topn_b)
        out.append(sub)
    res = pd.concat(out, ignore_index=True) if out else df.head(0)
    return res[[col_a, col_b, "count"]]


def facet_range(ds, col: str, start: float, end: float, gap: float):
    """facet.range (reference: solr/core/src/java/org/apache/solr/handler/
    component/RangeFacetProcessor.java ~400 LoC, branch_8x): counts per
    [start + i*gap, start + (i+1)*gap) bucket over [start, end). Bucket
    assignment is one vectorized floor-divide per batch; partial counts
    pre-aggregate map-side (value_counts) so the shuffle moves at most
    n_buckets rows per block. Returns (bucket_lo:float64, count:int64)
    for every bucket in range, zero-filled, ordered by bucket_lo."""
    n_buckets = int(np.ceil((end - start) / gap))

    def pre(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((v - start) / gap)
        m = (b >= 0) & (b < n_buckets)
        ids, cnt = np.unique(b[m].astype(np.int64), return_counts=True)
        return pa.table(
            {"bucket": pa.array(ids), "partial": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("partial", alias_name="count"))
    )
    df = agg.to_pandas()
    if "bucket" not in df.columns:  # every row fell outside [start, end)
        df = pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                           "count": pd.Series(dtype="int64")})
    full = pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64)})
    df = full.merge(df, on="bucket", how="left").fillna({"count": 0})
    return pd.DataFrame(
        {
            "bucket_lo": start + df["bucket"].to_numpy() * gap,
            "count": df["count"].astype("int64"),
        }
    )


def facet_intervals(ds, col: str, intervals):
    """facet.interval (reference: solr/core/src/java/org/apache/solr/
    request/IntervalFacets.java ~750 LoC, branch_8x): counts per EXPLICIT,
    possibly-OVERLAPPING interval — each interval is counted independently
    (the defining difference from facet.range's disjoint grid).
    ``intervals``: [(label, lo, hi, lo_inclusive, hi_inclusive), ...].
    One vectorized comparison pair per interval per batch; the shuffle
    moves ≤ len(intervals) partial rows per block. Returns
    (interval:str, count:int64) in the given order, zero-filled."""
    spec = [
        (str(lbl), float(lo), float(hi), bool(li), bool(hi_i))
        for (lbl, lo, hi, li, hi_i) in intervals
    ]

    def pre(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        labels, partial = [], []
        for lbl, lo, hi, li, hi_incl in spec:
            m = (v >= lo) if li else (v > lo)
            m &= (v <= hi) if hi_incl else (v < hi)
            c = int(np.count_nonzero(m))
            if c:
                labels.append(lbl)
                partial.append(c)
        return pa.table(
            {"interval": pa.array(labels, type=pa.string()),
             "partial": pa.array(np.asarray(partial, dtype=np.int64))}
        )

    df = (
        ds.map_batches(pre, batch_format="pyarrow")
        .groupby("interval")
        .aggregate(Sum("partial", alias_name="count"))
        .to_pandas()
    )
    if "interval" not in df.columns:
        df = pd.DataFrame({"interval": pd.Series(dtype=object),
                           "count": pd.Series(dtype="int64")})
    full = pd.DataFrame({"interval": [s[0] for s in spec]})
    df = full.merge(df, on="interval", how="left").fillna({"count": 0})
    return df.astype({"count": "int64"}).reset_index(drop=True)


def facet_heatmap(ds, lat_col: str, lon_col: str, box, rows: int,
                  cols: int):
    """facet.heatmap analog (reference: solr/core/src/java/org/apache/
    solr/handler/component/SpatialHeatmapFacets.java + lucene/spatial-
    extras .../prefix/HeatmapFacetCounter.java, branch_8x): per-grid-cell
    counts over a rectangular region. Solr derives the RPT grid level
    from distErrPct and returns ``counts_ints2D`` with ROW 0 AT THE TOP
    (maxY edge); we take explicit ``rows`` × ``cols`` and emit the same
    orientation as nonzero (grid_row, grid_col, n) tuples sorted
    row-major — the dense 2D array is a client-side reshape, so zero
    cells never cross the wire. One vectorized cell-assignment map pass
    (points outside the box drop map-side) + one bounded count shuffle
    (≤ rows*cols groups). Points exactly on the bottom/right box edge
    clamp into the last row/column (closed box on all sides)."""
    lat_lo, lat_hi, lon_lo, lon_hi = (float(v) for v in box)
    cell_h = (lat_hi - lat_lo) / rows
    cell_w = (lon_hi - lon_lo) / cols

    def cells(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lon = batch[lon_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        keep = ((lat >= lat_lo) & (lat <= lat_hi)
                & (lon >= lon_lo) & (lon <= lon_hi))
        lat, lon = lat[keep], lon[keep]
        r = np.minimum(np.floor((lat_hi - lat) / cell_h),
                       rows - 1).astype(np.int64)
        c = np.minimum(np.floor((lon - lon_lo) / cell_w),
                       cols - 1).astype(np.int64)
        return pa.table({"grid_row": pa.array(r), "grid_col": pa.array(c)})

    counted = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["grid_row", "grid_col"])
        .aggregate(Count("grid_row", ignore_nulls=False))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "grid_row": batch["grid_row"],
            "grid_col": batch["grid_col"],
            "n": pc.cast(batch["count(grid_row)"], pa.int64()),
        })

    return counted.map_batches(
        rename, batch_format="pyarrow").sort(["grid_row", "grid_col"])


def group_topk(ds, key: str, order_cols: Sequence[str],
               descending: Sequence[bool], n: int):
    """Result grouping, group.limit=n (reference: solr/core/src/java/org/
    apache/solr/search/Grouping.java ~1,000 LoC + lucene/grouping, branch
    _8x): top-``n`` rows per ``key`` group by sort order — collapse() is
    the n=1 case. The bucketed combiner+merge top-n (see bucketed_topn):
    each block keeps its local top-n per key, the shuffle moves ≤ n rows
    per (block, key) into P key-hash buckets, and one Arrow sort + rank
    mask per bucket finishes — no per-key Python callable (the old
    ``groupby(key).map_groups(head(n))`` ran one pandas call per key,
    the 1e8-group scale trap)."""
    return bucketed_topn(ds, [key], list(order_cols), list(descending), n)
