"""Global top-k merge of per-partition heaps.

Re-creates the semantics of TopDocs.merge + QueryComponent.mergeIds
(reference: lucene/core/src/java/org/apache/lucene/search/TopDocs.java#merge,
solr/core/src/java/org/apache/solr/handler/component/QueryComponent.java,
branch_8x; SURVEY.md §2.7, §3.2 step 5): per-shard top-k lists merge into
the global list with a deterministic tie-break.

Deviation for partition-invariance (documented, SURVEY.md §4 "ordering"):
Lucene breaks score ties by (shardIndex, docID), which depends on the
sharding; we break by (score desc, url asc) — a data-derived total order —
so the SAME corpus yields the SAME merged top-k at ANY partition count
(the rank-identity gate requires identity across P=1 vs P=8). Within a
partition the collector's (score desc, local_docid asc) equals
(score desc, url asc) because local docIDs are assigned in url order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["merge_topk_group", "merge_topk_all"]


def merge_topk_group(group: pd.DataFrame, k: int) -> pd.DataFrame:
    """map_groups fn over groupby('query_id'): candidate rows
    (query_id, partition_id, local_docid, url, score) → global top-k with
    rank 1..k."""
    g = group.sort_values(
        ["score", "url"], ascending=[False, True], kind="mergesort"
    ).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
    return g


def merge_topk_all(cand: pd.DataFrame, k: int) -> pd.DataFrame:
    """Vectorized merge over ALL queries at once: one lexsort by
    (query_id asc, score desc, url asc), then per-query head-k via a
    cumulative rank — no per-group Python. Identical output to applying
    merge_topk_group per query (same total order)."""
    if len(cand) == 0:
        return cand
    urls = cand["url"].to_numpy()
    order = np.lexsort(
        (urls, -cand["score"].to_numpy().astype(np.float64), cand["query_id"].to_numpy())
    )
    g = cand.iloc[order].reset_index(drop=True)
    qid = g["query_id"].to_numpy()
    new_q = np.ones(len(g), dtype=bool)
    new_q[1:] = qid[1:] != qid[:-1]
    # rank within query = index - index_of_query_start + 1
    start = np.maximum.accumulate(np.where(new_q, np.arange(len(g)), 0))
    rank = np.arange(len(g)) - start + 1
    g["rank"] = rank.astype(np.int32)
    out = g[rank <= k].reset_index(drop=True)
    return out
