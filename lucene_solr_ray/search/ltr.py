"""Learning-to-rank rescoring of first-pass top-k.

LTR plugin analog (reference: solr/contrib/ltr/src/java/org/apache/solr/
ltr/LTRRescorer.java + FeatureLogger / LinearModel, branch_8x; SURVEY.md
§2.4 suggester/LTR row). The reference reranks only the top ``rerank_k``
of the first-pass query (rescoring window), extracting per-(query, doc)
features from the index and applying a model — here a LinearModel.

Ray-Data shape:
- first pass = the existing distributed `search()` (BM25 top rerank_k);
- feature extraction is a map_batches actor-pool stage over PARTITIONS:
  each actor opens its partition's SegmentReader(s) once, resolves its
  own candidates by docmap binary search (newest generation first,
  tombstone-aware), and probes postings for per-term tf — only
  (query_id, url, feature...) rows ever leave the partition, never text;
- the model is a handful of multiply-adds on the merged k×queries rows.

Features (FeatureLogger names in comments):
  bm25          first-pass score               (SolrFeature q score)
  log_dl        ln(1 + doc length)             (FieldLengthFeature)
  tf_sum        Σ term freq over query terms   (TermFreqFeature sum)
  matched_frac  matched terms / query terms    (coord / MatchCountFeature)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..pipelines.query import search
from ..state.manifest import partition_segments, read_root_manifest

__all__ = ["ltr_rerank", "DEFAULT_MODEL", "eval_trees"]

# weights chosen exactly representable in binary so engine and SQL agree
DEFAULT_MODEL = {
    "bias": 0.0,
    "w_bm25": 1.0,
    "w_log_dl": -0.25,
    "w_tf": 0.03125,
    "w_matched": 0.5,
}


def _extract_features(index_root: str, cand: pd.DataFrame, terms: List[str]):
    """Distributed per-partition feature probe. ``cand`` has (query_id,
    partition_id, url, score). Returns a DataFrame (query_id, url, dl,
    tf_sum, n_matched)."""
    by_pid: Dict[int, dict] = {}
    for pid, url in zip(cand["partition_id"], cand["url"]):
        by_pid.setdefault(int(pid), {})[url] = None  # ordered de-dup
    items = [
        {
            "partition_id": pid,
            "urls": list(urls),
            "seg_dirs": list(reversed(partition_segments(index_root, pid))),
        }
        for pid, urls in by_pid.items()
    ]
    terms_ref = ray.put(list(terms))

    def probe(batch: pa.Table) -> pa.Table:
        import bisect

        import pyarrow.parquet as _pq

        from ..index.segment import SegmentReader

        qterms = ray.get(terms_ref)
        out_url, out_dl, out_tf, out_nm = [], [], [], []
        for row in batch.to_pylist():
            pending = set(row["urls"])
            for seg in row["seg_dirs"]:  # newest generation first
                if not pending:
                    break
                r = SegmentReader(seg)
                dm = _pq.read_table(
                    seg + "/docmap.parquet", columns=["url", "local_docid"]
                )
                seg_urls = dm["url"].to_pylist()
                seg_ids = dm["local_docid"].to_numpy()
                found: Dict[str, int] = {}
                for u in list(pending):
                    i = bisect.bisect_left(seg_urls, u)
                    if i < len(seg_urls) and seg_urls[i] == u:
                        d = int(seg_ids[i])
                        if r.deleted is not None and r.deleted[d]:
                            continue  # tombstoned; owned by a newer gen
                        found[u] = d
                if not found:
                    continue
                pending -= set(found)
                docids = np.fromiter(found.values(), dtype=np.int64)
                tf_sum = np.zeros(len(docids), dtype=np.int64)
                n_match = np.zeros(len(docids), dtype=np.int64)
                for t in qterms:
                    o = r.lookup(t)
                    if o < 0:
                        continue
                    p = r.postings(o)
                    idx = np.searchsorted(p.docids, docids)
                    ok = (idx < len(p.docids)) & (
                        p.docids[np.minimum(idx, len(p.docids) - 1)] == docids
                    )
                    tf_sum[ok] += p.freqs[idx[ok]]
                    n_match[ok] += 1
                for u, d, tf, nm in zip(found, docids, tf_sum, n_match):
                    out_url.append(u)
                    out_dl.append(int(r.dl[d]))
                    out_tf.append(int(tf))
                    out_nm.append(int(nm))
        return pa.table(
            {
                "url": pa.array(out_url, type=pa.string()),
                "dl": pa.array(out_dl, type=pa.int64()),
                "tf_sum": pa.array(out_tf, type=pa.int64()),
                "n_matched": pa.array(out_nm, type=pa.int64()),
            }
        )

    feats = (
        ray.data.from_items(items)
        .map_batches(probe, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    return feats


def eval_trees(model: dict, feats: Dict[str, np.ndarray]) -> np.ndarray:
    """MultipleAdditiveTreesModel scoring (reference: solr/contrib/ltr/
    src/java/org/apache/solr/ltr/model/MultipleAdditiveTreesModel.java,
    branch_8x — the LambdaMART ensemble): score = Σ tree.weight ×
    leaf(tree, x), branching LEFT when feature ≤ threshold (the
    reference's ``<=``). Vectorized: each node evaluates once over the
    whole candidate batch (np.where over both subtrees — fine for the
    shallow trees LTR ships).

    ``model``: {"type": "trees", "trees": [{"weight": w, "root": node},
    ...]} with node = {"feature": name, "threshold": t, "left": node,
    "right": node} | {"value": v}. Feature names are the FeatureLogger
    set (bm25, log_dl, tf_sum, matched_frac)."""
    n = len(next(iter(feats.values())))

    def ev(node) -> np.ndarray:
        if "value" in node:
            return np.full(n, float(node["value"]), dtype=np.float64)
        f = feats[node["feature"]]
        return np.where(f <= float(node["threshold"]),
                        ev(node["left"]), ev(node["right"]))

    out = np.zeros(n, dtype=np.float64)
    for tree in model["trees"]:
        out += float(tree.get("weight", 1.0)) * ev(tree["root"])
    return out


def ltr_rerank(
    index_root: str,
    queries: List[dict],
    model: Optional[dict] = None,
    k: int = 10,
    rerank_k: int = 50,
    sim_config: Optional[dict] = None,
) -> pd.DataFrame:
    """Rerank each query's BM25 top ``rerank_k`` with the model — the
    LinearModel (default) or a MultipleAdditiveTreesModel when
    ``model["type"] == "trees"``. Returns (query_id, rank, url, score2)
    sorted by (query_id, rank); ties break on url asc —
    partition-invariant like the first pass."""
    trees = (model or {}).get("type") == "trees"
    m = model if trees else dict(DEFAULT_MODEL, **(model or {}))
    first = search(index_root, queries, k=rerank_k, sim_config=sim_config)
    if len(first) == 0:
        return pd.DataFrame(columns=["query_id", "rank", "url", "score2"])
    terms = sorted({t for q in queries for t in q["terms"]})
    feats = _extract_features(
        index_root, first[["query_id", "partition_id", "url", "score"]], terms
    )
    df = first.merge(feats, on="url", how="left")
    # every candidate came from the index, so features must resolve
    assert not df["dl"].isna().any(), "feature probe missed a candidate"
    n_terms = max(len(terms), 1)
    if trees:
        feats = {
            "bm25": df["score"].to_numpy(np.float64),
            "log_dl": np.log(1.0 + df["dl"].to_numpy(np.float64)),
            "tf_sum": df["tf_sum"].to_numpy(np.float64),
            "matched_frac": df["n_matched"].to_numpy(np.float64) / n_terms,
        }
        df["score2"] = eval_trees(m, feats)
    else:
        # float64 expression mirrors the SQL oracle term-for-term,
        # left-assoc
        df["score2"] = (
            m["bias"]
            + m["w_bm25"] * df["score"].astype(np.float64)
            + m["w_log_dl"] * np.log(1.0 + df["dl"].to_numpy(np.float64))
            + m["w_tf"] * df["tf_sum"].to_numpy(np.float64)
            + m["w_matched"] * (df["n_matched"].to_numpy(np.float64)
                                / n_terms)
        )
    df = df.sort_values(
        ["query_id", "score2", "url"], ascending=[True, False, True],
        kind="mergesort",
    )
    df["rank"] = df.groupby("query_id").cumcount() + 1
    out = df[df["rank"] <= k][["query_id", "rank", "url", "score2"]]
    return out.reset_index(drop=True)
