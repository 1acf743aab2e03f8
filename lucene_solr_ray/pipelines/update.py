"""Update-path operations beyond append/merge: deleteByQuery.

Solr's ``<delete><query>…</query></delete>`` update (reference:
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java
#deleteByQuery + DeleteUpdateCommand, branch_8x; SURVEY.md §2.10 update
semantics): every doc matching the query is tombstoned in place — no
reindex, no segment rewrite. Search immediately excludes tombstoned docs;
term stats (df/N/avgdl) deliberately still include them until a merge
reclaims the space, exactly Lucene's docFreq-not-adjusted-for-deletes
behavior, so surviving docs' BM25 scores are unchanged.

Ray shape: the segment list is a Dataset; a DeleteByQueryStage actor pool
evaluates the query FULL (no top-k) per segment with the same broadcast
(weights, stats) context the searcher uses, and merges matched docids
into that segment's ``deletes.parquet`` with a rename-aside publish.
Each segment row is processed by exactly one task (batch_size=1), so
writes never race. Idempotent: re-running the same delete is a no-op.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state.manifest import (
    partition_segments,
    read_root_manifest,
    write_root_manifest,
)
from .query import prepare_search_context

__all__ = ["delete_by_query", "delete_by_id"]


class _DeleteByIdStage:
    """Actor: per segment, tombstone the broadcast url set's docs via
    O(row-group) docmap point lookups (the realtime-get discipline)."""

    def __init__(self, urls_ref):
        self.urls = ray.get(urls_ref) if not isinstance(urls_ref, list) else urls_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.segment import SegmentReader, add_deletes

        seg_dirs, matched, newly = [], [], []
        for row in batch.to_pylist():
            seg = row["seg_dir"]
            reader = SegmentReader(seg)
            docids = [
                d for d in (reader.docid_of_url(u) for u in self.urls)
                if d is not None
                and (reader.deleted is None or not reader.deleted[d])
            ]
            seg_dirs.append(seg)
            matched.append(len(docids))
            newly.append(add_deletes(seg, docids))
        return pa.table(
            {
                "seg_dir": pa.array(seg_dirs, type=pa.string()),
                "matched": pa.array(matched, type=pa.int64()),
                "new_tombstones": pa.array(newly, type=pa.int64()),
            }
        )


def delete_by_id(index_root: str, urls, concurrency=None) -> Dict[str, int]:
    """Solr ``deleteById`` analog (unique key = url): tombstone the given
    docs wherever they live. The url list is broadcast once; each segment
    resolves its members via docmap row-group point lookups. A url present
    in several generations is tombstoned in each (all versions deleted,
    Solr deleteById semantics). Idempotent."""
    urls = sorted(set(urls))
    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    urls_ref = ray.put(urls)
    parts = [
        {"seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    out = ds.map_batches(
        _DeleteByIdStage,
        fn_constructor_kwargs={"urls_ref": urls_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    ).to_pandas()
    result = {
        "matched": int(out["matched"].sum()),
        "new_tombstones": int(out["new_tombstones"].sum()),
    }
    root = read_root_manifest(index_root)
    ops = list(root.get("delete_ops", ()))
    ops.append({"ids": len(urls), **result, "ts": time.time()})
    root["delete_ops"] = ops
    write_root_manifest(index_root, root)
    return result


class DeleteByQueryStage:
    """Actor: per segment, match the delete query and tombstone the hits."""

    def __init__(self, ctx_ref):
        ctx = ray.get(ctx_ref) if not isinstance(ctx_ref, dict) else ctx_ref
        from ..search.similarity import similarity_from_config

        self.query = ctx["queries"][0]
        self.weights = ctx["weights"]
        self.sim = similarity_from_config(ctx.get("sim"))
        self.cache_inv = self.sim.norm_inverse_cache(ctx["avgdl"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.segment import SegmentReader, add_deletes
        from ..search.searcher import match_query_full

        seg_dirs, matched, newly = [], [], []
        for row in batch.to_pylist():
            seg = row["seg_dir"]
            reader = SegmentReader(seg)
            if reader.num_docs == 0:
                docids = np.empty(0, dtype=np.int64)
            else:
                docids = match_query_full(
                    reader, self.query, self.weights, self.cache_inv, self.sim
                )
            seg_dirs.append(seg)
            matched.append(len(docids))
            newly.append(add_deletes(seg, docids))
        return pa.table(
            {
                "seg_dir": pa.array(seg_dirs, type=pa.string()),
                "matched": pa.array(matched, type=pa.int64()),
                "new_tombstones": pa.array(newly, type=pa.int64()),
            }
        )


def delete_by_query(
    index_root: str,
    query: dict,
    sim_config: Optional[dict] = None,
    concurrency: Optional[Union[int, tuple]] = None,
) -> Dict[str, int]:
    """Tombstone every doc matching ``query`` (same query-spec dicts as
    ``search``, ``query_id`` optional). Returns
    {"matched": total live matches, "new_tombstones": newly deleted}
    and records the operation in the root manifest's ``delete_ops`` log."""
    q = dict(query)
    q.setdefault("query_id", 0)
    ctx = prepare_search_context(index_root, [q], k=1, method="exhaustive",
                                 sim_config=sim_config)
    P = ctx.pop("num_partitions")
    ctx_ref = ray.put(ctx)

    parts = [
        {"seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    out = ds.map_batches(
        DeleteByQueryStage,
        fn_constructor_kwargs={"ctx_ref": ctx_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    ).to_pandas()
    result = {
        "matched": int(out["matched"].sum()),
        "new_tombstones": int(out["new_tombstones"].sum()),
    }
    root = read_root_manifest(index_root)
    ops = list(root.get("delete_ops", ()))
    ops.append(
        {
            "query": {k: v for k, v in q.items() if k != "query_id"},
            **result,
            "ts": time.time(),
        }
    )
    root["delete_ops"] = ops
    write_root_manifest(index_root, root)
    return result
