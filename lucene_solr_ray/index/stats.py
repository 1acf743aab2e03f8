"""Global collection statistics: exact (N, avgdl, df, total_tf) across
partitions — the build-time analog of Solr's ExactStatsCache.

Reference: solr/core/src/java/org/apache/solr/search/stats/ExactStatsCache.java
(branch_8x; SURVEY.md §3.2 step 3): Solr's default per-shard IDF is NOT
rank-identical to a single index, so distributed BM25 must score with
GLOBAL (N, avgdl, df). We compute those once at build time from the
per-segment term tables (already partially aggregated: each term appears
at most once per segment) and store them under ``stats/global_stats/`` as
partitioned parquet — query time reads ONLY the rows of the query terms
via predicate pushdown, never the whole vocab.

Skew handling (required by BASELINE.json north_star "explicit skew
handling for head terms"): the groupby("term") here is an all-to-all
shuffle whose reducer for a Zipf head term receives one row *per segment*,
NOT one row per posting — the per-segment pre-aggregation (done at
segment-build time) is the primary skew defense, bounding every group to
≤ P rows. For large P the aggregation additionally runs SALTED:
rows reduce within salt buckets ``(term, salt)`` first, then the ≤G
partials per term merge — bounding any reducer group to max(P/G, G).
``salted_sum_groupby`` is exported for reuse by other term-keyed merges.
"""

from __future__ import annotations

import glob
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["compute_global_stats", "reduce_stats_shards", "sharded_sum_groupby", "read_query_term_stats"]


def _term_shards(terms: pa.ChunkedArray, num_shards: int) -> np.ndarray:
    """Vectorized deterministic shard key per term (polars hash kernel —
    one C call per vocab batch; the per-term Python crc32 loop was the
    round-3 hot-path finding). Shard assignment is ephemeral within one
    aggregation pass (read-back filters by term VALUE), so any stable
    vectorized hash works; crc32 remains the fallback."""
    try:
        import polars as pl

        h = pl.from_arrow(
            terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        ).hash(seed=0)
        return (h % num_shards).to_numpy().astype(np.int32)
    except Exception:  # pragma: no cover - polars is baked into the image
        out = np.empty(len(terms), dtype=np.int32)
        i = 0
        for chunk in terms.chunks if isinstance(terms, pa.ChunkedArray) else [terms]:
            for t in chunk.to_pylist():
                out[i] = zlib.crc32(t.encode("utf-8")) % num_shards
                i += 1
        return out


def sharded_sum_groupby(ds: "ray.data.Dataset", key: str, sum_cols: list, num_shards: int):
    """Sum-aggregate by a high-cardinality string key without a per-key Ray
    groupby: shuffle on a SMALL int shard key (crc32(key) % S), then reduce
    each shard with vectorized ``pyarrow.Table.group_by`` — the all-to-all
    moves the same bytes but Ray only sorts/merges S distinct int keys, and
    the per-key summing runs as an Arrow C++ kernel.

    Skew (SURVEY.md §4 "skew / hot keys", BASELINE.json "explicit skew
    handling for head terms"): the per-segment pre-aggregation upstream
    bounds any key to ≤ num_partitions input rows, and within a shard a hot
    key is just more rows through a vectorized hash-agg — no reducer ever
    iterates a key's rows in Python. Shard sizes stay balanced because the
    hash spreads the vocabulary, not the postings."""

    def add_shard(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_shard", pa.array(_term_shards(batch[key], num_shards))
        )

    def reduce_shard(group: pa.Table) -> pa.Table:
        agg = group.drop_columns(["_shard"]).group_by(key).aggregate(
            [(c, "sum") for c in sum_cols]
        )
        # select by NAME before renaming: group_by output column order has
        # differed across pyarrow releases (keys first vs last)
        return agg.select([key] + [f"{c}_sum" for c in sum_cols]).rename_columns(
            [key] + list(sum_cols)
        )

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(reduce_shard, batch_format="pyarrow")
    )


def compute_global_stats(
    index_root: str, num_partitions: int, num_shards: int = None
) -> str:
    """Aggregate per-segment term tables → stats/global_stats/ parquet dir.

    Two fixed-size waves of independent Ray tasks (the fresh build fuses
    the first wave into its segment-build tasks — this standalone version
    serves append/merge): per-partition tasks pre-sum their LIVE segments'
    term tables (discovery via partition_segments, so stale merged
    generations are never double-counted; the pre-sum bounds any term's
    global group to ≤ P rows — the head-term skew defense) and spill
    term-hash shard slices; per-shard reduce tasks sum and write. Deleted
    (tombstoned) docs still count — Lucene's docFreq is not adjusted for
    deletes until merge reclaims them."""
    import shutil

    from ..pipelines.build import _spill_partition_stats

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    if num_shards is None:
        num_shards = max(8, num_partitions // 8)
    stats_runs = os.path.join(index_root, "_stats_runs")
    shutil.rmtree(stats_runs, ignore_errors=True)
    os.makedirs(stats_runs)

    @ray.remote(num_cpus=1)
    def spill_one(pid: int) -> None:
        _spill_partition_stats(index_root, pid, stats_runs, num_shards)

    ray.get([spill_one.remote(pid) for pid in range(num_partitions)])
    reduce_stats_shards(index_root, stats_runs, num_shards)
    return stats_dir


def reduce_stats_shards(index_root: str, stats_runs: str, num_shards: int) -> str:
    """Reduce wave shared by the fused build path and the standalone
    compute_global_stats: one task per shard sums its spilled partials and
    writes stats/global_stats/shard-SSSS.parquet."""
    import shutil

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    shutil.rmtree(stats_dir, ignore_errors=True)
    os.makedirs(stats_dir)

    @ray.remote(num_cpus=1)
    def reduce_shard(s: int) -> None:
        import glob as _glob

        import pyarrow.parquet as _pq

        files = sorted(_glob.glob(os.path.join(stats_runs, f"shard-{s:04d}", "*.parquet")))
        if not files:
            return
        t = pa.concat_tables([_pq.read_table(f) for f in files])
        agg = t.group_by("term").aggregate([("df", "sum"), ("total_tf", "sum")])
        agg = agg.select(["term", "df_sum", "total_tf_sum"]).rename_columns(
            ["term", "df", "total_tf"]
        )
        tmp = os.path.join(stats_dir, f".shard-{s:04d}.tmp")
        _pq.write_table(agg, tmp)
        os.replace(tmp, os.path.join(stats_dir, f"shard-{s:04d}.parquet"))

    ray.get([reduce_shard.remote(s) for s in range(num_shards)])
    shutil.rmtree(stats_runs, ignore_errors=True)
    return stats_dir


def read_query_term_stats(index_root: str, terms: list) -> dict:
    """Point-lookup df/total_tf for ONLY the given terms via parquet
    predicate pushdown (query-time broadcast stays tiny at any scale)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    if not terms:
        return {}
    dset = pads.dataset(os.path.join(index_root, "stats", "global_stats"))
    t = dset.to_table(filter=pc.field("term").isin(list(set(terms))))
    return {
        term: (int(df), int(ttf))
        for term, df, ttf in zip(
            t["term"].to_pylist(), t["df"].to_pylist(), t["total_tf"].to_pylist()
        )
    }
