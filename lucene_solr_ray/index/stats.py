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

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

__all__ = ["compute_global_stats", "salted_sum_groupby", "read_query_term_stats"]

SALT_THRESHOLD = 64  # segments; below this the plain pre-aggregated groupby wins


def salted_sum_groupby(ds: "ray.data.Dataset", key: str, sum_cols: list, groups: int):
    """Two-phase salted sum-aggregation: groupby((key, salt)) → groupby(key).

    The salt is a deterministic-per-row-content bucket (crc of the key and
    a row counter would both do — sums are commutative, so ANY row→salt
    assignment yields identical totals; we use a cycling counter, which
    spreads a hot key's rows evenly). Bounds reducer group size under
    head-key skew (SURVEY.md §4 "skew / hot keys")."""
    aggs = [Sum(c, alias_name=c) for c in sum_cols]

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = (np.arange(len(batch)) % groups).astype(np.int32)
        return batch.append_column("_salt", pa.array(salt))

    partial = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(*aggs)
        .drop_columns(["_salt"])
    )
    return partial.groupby(key).aggregate(*aggs)


def compute_global_stats(index_root: str, num_partitions: int, salt_groups: int = 16) -> str:
    """Aggregate per-segment term tables → stats/global_stats/ parquet dir.

    Runs as a Ray Data pipeline: read only (term, df, total_tf) columns of
    every segment's terms.parquet (column pruning at the read), shuffle by
    term, sum, write partitioned parquet (streamed, never materialized on
    the driver)."""
    seg_glob = sorted(glob.glob(os.path.join(index_root, "segments", "part-*", "terms.parquet")))
    stats_dir = os.path.join(index_root, "stats", "global_stats")

    ds = ray.data.read_parquet(seg_glob, columns=["term", "df", "total_tf"])
    if num_partitions > SALT_THRESHOLD:
        agg = salted_sum_groupby(ds, "term", ["df", "total_tf"], salt_groups)
    else:
        agg = ds.groupby("term").aggregate(
            Sum("df", alias_name="df"), Sum("total_tf", alias_name="total_tf")
        )

    import shutil

    if os.path.exists(stats_dir):
        shutil.rmtree(stats_dir)
    agg.write_parquet(stats_dir)
    return stats_dir


def read_query_term_stats(index_root: str, terms: list) -> dict:
    """Point-lookup df/total_tf for ONLY the given terms via parquet
    predicate pushdown (query-time broadcast stays tiny at any scale)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    dset = pads.dataset(os.path.join(index_root, "stats", "global_stats"))
    t = dset.to_table(filter=pc.field("term").isin(list(set(terms))))
    return {
        term: (int(df), int(ttf))
        for term, df, ttf in zip(
            t["term"].to_pylist(), t["df"].to_pylist(), t["total_tf"].to_pylist()
        )
    }
