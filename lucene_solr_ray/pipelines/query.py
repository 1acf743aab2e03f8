"""Distributed query pipeline: scatter to partition searchers, merge top-k.

The Ray-Data re-expression of Solr's distributed query (SURVEY.md §3.2;
reference trace: SearchHandler → stats phase (ExactStatsCache) → per-shard
GET_TOP_IDS with BM25+WAND → mergeIds → GET_FIELDS, branch_8x):

    queries + global stats  → ray.put (ONE broadcast, not per task)
    Dataset of partitions   → map_batches(SearcherStage actor pool)
    per-(query, partition) top-k rows
                            → groupby(query_id).map_groups(merge_topk)
    winner url lookup happens partition-side (docmap row-group reads)

Global (N, avgdl, df) come from the build-time stats table (the
ExactStatsCache behavior — per-shard IDF would NOT be rank-identical).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..index.stats import read_query_term_stats
from ..search.searcher import SearcherStage
from ..search.similarity import Bm25Similarity
from ..search.topk import merge_topk_group
from ..state.manifest import partition_segments, read_root_manifest

__all__ = ["search", "prepare_search_context"]


def prepare_search_context(
    index_root: str, queries: List[dict], k: int, method: str = "auto",
    sim_config: Optional[dict] = None,
) -> dict:
    """Resolve global stats for the query terms and precompute weights
    (the reference's stats phase + Weight creation, done once)."""
    root = read_root_manifest(index_root)
    n_docs = root["num_docs"]
    sum_dl = root["sum_dl"]
    sim = Bm25Similarity.from_config(sim_config)
    avgdl = sim.avgdl(sum_dl, max(n_docs, 1))

    # query terms pass through the index's analyzer chain (lowercase +
    # configured filters) — Lucene analyzes query text with the field
    # analyzer; a filter-dropped term (stopword) drops its clause
    from ..analysis.filters import build_filter_chain
    from ..analysis.tokenizer import lowercase

    chain = build_filter_chain((root.get("analyzer_spec") or {}).get("filters", []))

    def norm_term(t):
        t = lowercase(t)
        return chain(t) if chain is not None else t

    queries = [
        dict(
            q,
            terms=[nt for nt in (norm_term(t) for t in q["terms"]) if nt is not None]
            if q.get("kind") != "prefix"
            else [lowercase(t) for t in q["terms"]],
            **(
                {"exclude": [nt for nt in (norm_term(t) for t in q.get("exclude", ())) if nt is not None]}
                if q.get("exclude")
                else {}
            ),
        )
        for q in queries
    ]
    all_terms = sorted({t for q in queries for t in q["terms"]})
    stats = read_query_term_stats(index_root, all_terms)
    weights: Dict[str, np.floating] = {}
    for t in all_terms:
        df = stats.get(t, (0, 0))[0]
        weights[t] = sim.idf(df, n_docs)[()] if df > 0 else sim.dtype(0.0)
    return {
        "queries": queries,
        "weights": weights,
        "avgdl": float(avgdl),
        "k": k,
        "method": method,
        "sim": sim_config,
        "num_partitions": root["num_partitions"],
    }


def search(
    index_root: str,
    queries: List[dict],
    k: int = 10,
    method: str = "auto",
    concurrency: Optional[Union[int, tuple]] = None,
    as_dataset: bool = False,
    sim_config: Optional[dict] = None,
):
    """Run the fixed query set over the index.

    ``queries``: [{"query_id": int, "kind": "term"|"and"|"or",
                   "terms": [str, ...]}, ...]
    Returns a pandas DataFrame (query_id, rank, partition_id, local_docid,
    url, score:float32) sorted by (query_id, rank) — or the merged Dataset
    when ``as_dataset=True``.
    """
    ctx = prepare_search_context(index_root, queries, k, method, sim_config)
    P = ctx.pop("num_partitions")
    ctx_ref = ray.put(ctx)

    parts = [
        {"partition_id": pid, "seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    hits = ds.map_batches(
        SearcherStage,
        fn_constructor_kwargs={"ctx_ref": ctx_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )

    merged = hits.groupby("query_id").map_groups(
        lambda g: merge_topk_group(g, k), batch_format="pandas"
    )
    if as_dataset:
        return merged
    df = merged.to_pandas()
    if len(df) == 0:
        return df
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)
