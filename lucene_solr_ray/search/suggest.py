"""Term suggester over the index's global term statistics.

Analog of Solr's TermsComponent / suggest surface backed by term
frequency (reference: solr/core/src/java/org/apache/solr/handler/
component/TermsComponent.java + solr/core/.../spelling/suggest/
SuggestComponent.java with a DocumentDictionary weight, branch_8x;
SURVEY.md §2 suggester row). Lucene's production suggesters are
FST-compiled; the Ray-Data-native equivalent keeps the dictionary AS the
distributed stats table and answers prefix lookups with a pruned scan:

- the dictionary is ``stats/global_stats/*.parquet`` (term, df, total_tf)
  written at build time — no extra artifact to maintain;
- a prefix becomes the sort-range filter ``prefix <= term < prefix⁺``
  pushed into ``read_parquet`` so parquet row-group statistics skip
  non-matching groups at the storage layer;
- each block emits its local top-k per prefix (map-side prune), and the
  driver merges the tiny (blocks × prefixes × k) residue.

Weights: ``total_tf`` (collection frequency, FreeTextSuggester-style) or
``df`` (document frequency, TermsComponent terms.sort=count semantics).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["suggest", "terms_regex"]


def terms_regex(
    index_root: str,
    pattern: str,
    limit: int = 20,
    sort: str = "index",
    min_df: int = 1,
) -> pd.DataFrame:
    """TermsComponent ``terms.regex`` listing (reference: solr/core/.../
    component/TermsComponent.java, branch_8x): dictionary terms fully
    matching ``pattern``, ``sort="index"`` (term asc, terms.sort=index) or
    ``"count"`` (df desc then term asc, terms.sort=count), first ``limit``.
    One streaming pass over the distributed stats table with the RE2
    ``match_substring_regex`` kernel (anchored) — both this and the DuckDB
    oracle run RE2, so semantics agree by construction. Each block emits
    its local top-``limit``; the driver merges the tiny residue."""
    import ray.data

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    anchored = f"^(?:{pattern})$"
    keys = ([("term", "ascending")] if sort == "index"
            else [("df", "descending"), ("term", "ascending")])

    def local(batch: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(batch["term"], anchored)
        if min_df > 1:
            m = pc.and_(m, pc.greater_equal(batch["df"], min_df))
        sub = batch.filter(m)
        if sub.num_rows > limit:
            sub = sub.take(pc.select_k_unstable(sub, limit, keys))
        return sub.select(["term", "df", "total_tf"])

    res = ray.data.read_parquet(stats_dir).map_batches(
        local, batch_format="pyarrow").to_pandas()
    asc = [True] if sort == "index" else [False, True]
    cols = ["term"] if sort == "index" else ["df", "term"]
    res = res.sort_values(cols, ascending=asc, kind="mergesort").head(limit)
    res = res.reset_index(drop=True)
    res.insert(0, "rank", np.arange(1, len(res) + 1, dtype=np.int64))
    return res


def _prefix_upper(prefix: str) -> str:
    """Smallest string greater than every string with this prefix."""
    b = bytearray(prefix.encode("utf-8"))
    while b and b[-1] == 0xFF:
        b.pop()
    if not b:
        return ""  # unbounded
    b[-1] += 1
    return bytes(b).decode("utf-8", errors="ignore")


def suggest(
    index_root: str,
    prefixes: List[str],
    k: int = 10,
    weight: str = "total_tf",
    min_df: int = 1,
    match: str = "prefix",
) -> pd.DataFrame:
    """Top-``k`` completions per lookup string, ordered by ``weight`` desc
    then term asc (deterministic across partitionings). Returns a
    DataFrame of (prefix, rank, term, df, total_tf).

    ``match="prefix"`` is the TermsComponent/FST shape (the lookup range
    is pushed into read_parquet so row-group stats prune at the storage
    layer). ``match="infix"`` is the AnalyzingInfixSuggester analog
    (reference: lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java,
    branch_8x — matches anywhere in the suggestion): no range pushdown
    exists for a substring, so every dictionary block is scanned with the
    ``match_substring`` C kernel — still one streaming pass over the
    stats table, never a driver-side dictionary."""
    import ray.data

    if weight not in ("total_tf", "df"):
        raise ValueError("weight must be 'total_tf' or 'df'")
    if match not in ("prefix", "infix"):
        raise ValueError("match must be 'prefix' or 'infix'")
    stats_dir = os.path.join(index_root, "stats", "global_stats")
    if match == "prefix":
        lo = min(prefixes)
        hi = _prefix_upper(max(prefixes))
        flt = pc.field("term") >= lo
        if hi:
            flt = flt & (pc.field("term") < hi)
        ds = ray.data.read_parquet(stats_dir, filter=flt)
    else:
        ds = ray.data.read_parquet(stats_dir)

    plist = list(prefixes)

    def local_topk(batch: pa.Table) -> pa.Table:
        outs = []
        for pid, p in enumerate(plist):
            if match == "infix":
                m = pc.match_substring(batch["term"], p)
            else:
                up = _prefix_upper(p)
                m = pc.greater_equal(batch["term"], p)
                if up:
                    m = pc.and_(m, pc.less(batch["term"], up))
            if min_df > 1:
                m = pc.and_(m, pc.greater_equal(batch["df"], min_df))
            sub = batch.filter(m)
            if sub.num_rows == 0:
                continue
            sub = sub.append_column(
                "prefix_id", pa.array(np.full(sub.num_rows, pid, dtype=np.int32))
            )
            idx = pc.select_k_unstable(
                sub, k, [(weight, "descending"), ("term", "ascending")]
            )
            outs.append(sub.take(idx))
        if not outs:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                    "total_tf": pa.array([], type=pa.int64()),
                    "prefix_id": pa.array([], type=pa.int32()),
                }
            )
        t = pa.concat_tables(outs)
        return t.select(["term", "df", "total_tf", "prefix_id"])

    res = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if "prefix_id" not in res.columns:  # every block came back empty
        res = pd.DataFrame(columns=["term", "df", "total_tf", "prefix_id"])
    rows = []
    for pid, p in enumerate(plist):
        sub = res[res["prefix_id"] == pid]
        sub = sub.sort_values(
            [weight, "term"], ascending=[False, True], kind="mergesort"
        ).head(k)
        for r, (_, row) in enumerate(sub.iterrows(), start=1):
            rows.append(
                {
                    "prefix": p, "rank": r, "term": row["term"],
                    "df": int(row["df"]), "total_tf": int(row["total_tf"]),
                }
            )
    return pd.DataFrame(rows, columns=["prefix", "rank", "term", "df", "total_tf"])
