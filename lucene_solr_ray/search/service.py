"""Persistent distributed searcher service — the SolrCloud query tier.

The Dataset-based ``pipelines.query.search`` re-creates one-shot scatter/
gather, but a search engine serves queries from LONG-LIVED warmed
searchers: Solr keeps a ``SolrIndexSearcher`` open per core and routes
every request to it (reference: solr/core/src/java/org/apache/solr/search/
SolrIndexSearcher.java + HttpShardHandler scatter, branch_8x; SURVEY.md
§2.4 "stateful stages", §3.2). This module is the Ray analog: a pool of
``@ray.remote`` searcher actors, each owning (and mmapping, once) a
disjoint shard of the index's segments, alive across any number of
``search()`` calls. This is the one place the Dataset API genuinely cannot
express the semantics — shared long-lived index state across calls — so
raw actors are used, as sanctioned for exactly this case.

Scatter/gather per call:
  queries → ray.put (ONE broadcast)
  each actor scores its shard (same kernels as the Dataset path:
  cached term contributions, WAND for huge partitions)
  → per-shard top-k candidate frames (tiny: ≤ k rows/query/shard)
  → driver merge with the same (score desc, url asc) tie-break.

Results are bit-identical to ``pipelines.query.search`` (asserted in
tests/test_index_search.py).

At cluster scale: one actor per core over the fleet; shard assignment is
round-robin by partition id (deterministic); replicas = spawn R pools and
round-robin calls across them.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd
import ray

from ..state.manifest import read_root_manifest, segment_dir
from .topk import merge_topk_all

__all__ = ["SearcherService"]


@ray.remote
class _ShardSearcher:
    """Owns a subset of segments; state loaded once, reused every call."""

    def __init__(self, index_root: str, partition_ids: List[int]):
        from ..index.segment import SegmentReader
        from ..state.manifest import partition_segments

        self.readers = []
        for pid in partition_ids:
            for seg in partition_segments(index_root, pid):
                r = SegmentReader(seg)
                if r.num_docs:
                    self.readers.append((pid, r))

    def warm(self) -> int:
        """Touch posting blobs so first query isn't cold-IO."""
        total = 0
        for _, r in self.readers:
            total += int(np.asarray(r.post[:: max(1, len(r.post) // 4096)]).sum())
        return total

    def search_batch(self, ctx: dict) -> pd.DataFrame:
        """Score every query against every owned segment; return candidate
        rows (query_id, partition_id, local_docid, url, score)."""
        from .searcher import SearcherStage

        stage = SearcherStage(ctx)
        import pyarrow as pa

        batch = pa.table(
            {
                "partition_id": pa.array([pid for pid, _ in self.readers], type=pa.int32()),
                "seg_dir": pa.array([r.seg_dir for _, r in self.readers], type=pa.string()),
            }
        )
        # reuse already-open readers instead of re-opening from disk
        stage._readers = {r.seg_dir: r for _, r in self.readers}
        out = stage(batch)
        return out.to_pandas()


class SearcherService:
    """Driver-side handle: spawn once, search many times."""

    def __init__(
        self,
        index_root: str,
        num_searchers: Optional[int] = None,
        warm: bool = True,
    ):
        self.index_root = index_root
        root = read_root_manifest(index_root)
        self.num_partitions = root["num_partitions"]
        if num_searchers is None:
            num_searchers = max(1, int(ray.cluster_resources().get("CPU", 4)) - 1)
        num_searchers = min(num_searchers, self.num_partitions)
        shards: List[List[int]] = [[] for _ in range(num_searchers)]
        for pid in range(self.num_partitions):
            shards[pid % num_searchers].append(pid)
        self.actors = [
            _ShardSearcher.remote(index_root, pids) for pids in shards if pids
        ]
        if warm:
            ray.get([a.warm.remote() for a in self.actors])

    def search(self, queries: List[dict], k: int = 10, method: str = "auto",
               sim_config: Optional[dict] = None) -> pd.DataFrame:
        """Same contract and bit-identical results as pipelines.query.search."""
        from ..pipelines.query import prepare_search_context

        ctx = prepare_search_context(self.index_root, queries, k, method, sim_config)
        ctx.pop("num_partitions", None)
        ctx_ref = ray.put(ctx)
        frames = ray.get([a.search_batch.remote(ctx_ref) for a in self.actors])
        cand = pd.concat([f for f in frames if len(f)], ignore_index=True) if frames else pd.DataFrame()
        if len(cand) == 0:
            return cand
        return merge_topk_all(cand, k)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
