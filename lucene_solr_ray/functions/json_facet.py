"""JSON Facet API executor.

Solr's json.facet DSL (reference: solr/core/src/java/org/apache/solr/
search/facet/FacetRequest.java + FacetField*.java + SlotAcc.java ~900,
branch_8x; SURVEY.md §2.6 "JSON Facet aggs" row) — a nested spec of
terms/range facets with per-bucket statistic aggregations:

    json_facet(orders, {
        "by_status": {
            "type": "terms", "field": "o_orderstatus", "limit": 3,
            "facet": {
                "avg_price": "avg(o_totalprice)",
                "by_prio": {"type": "terms", "field": "o_orderpriority",
                             "limit": 2},
            },
        },
    })

Execution shape (the SlotAcc partial+final contract, Ray-Data-native):
- ONE ``groupby(field).aggregate(Count, Sum, ...)`` per facet computes
  the bucket counts AND every sibling stat in a single shuffle;
- a nested terms facet issues ONE ``groupby([field, subfield])`` for ALL
  parent buckets together (never a query per bucket — the refinement
  anti-pattern), then slices the tiny aggregated residue per bucket;
- buckets order by (count desc, value asc), Solr's default sort.

Returns the Solr-response-shaped nested dict: ``{"count": N, name:
{"buckets": [{"val": ..., "count": ..., stat: ...}, ...]}}``.
"""

from __future__ import annotations

import re
from typing import Dict

import pandas as pd
from ray.data.aggregate import Count, Max, Mean, Min, Quantile, Std, Sum

__all__ = ["json_facet"]

_AGG_RE = re.compile(r"^(sum|avg|min|max|stddev|unique)\((\w+)\)$")
_PCT_RE = re.compile(r"^percentile\((\w+),(\d+(?:\.\d+)?)\)$")
_AGG_CLS = {"sum": Sum, "avg": Mean, "min": Min, "max": Max, "stddev": Std}


def _split_spec(facet: Dict):
    """Partition a facet dict into (stat aggs, nested facets). Stat values:
    ("<fn>", col) for plain aggs, ("unique", col) for exact distinct,
    ("percentile", col, p) for quantiles."""
    stats, nested = {}, {}
    for name, sub in (facet or {}).items():
        if isinstance(sub, str):
            compact = sub.replace(" ", "")
            m = _AGG_RE.match(compact)
            if m:
                stats[name] = (m.group(1), m.group(2))
                continue
            m = _PCT_RE.match(compact)
            if not m:
                raise ValueError(f"unsupported agg {sub!r}")
            stats[name] = ("percentile", m.group(1), float(m.group(2)))
        elif isinstance(sub, dict) and sub.get("type") == "terms":
            nested[name] = sub
        else:
            raise ValueError(f"unsupported facet spec {name!r}: {sub!r}")
    return stats, nested


def _terms_level(ds, spec: Dict, parent_field=None):
    """One groupby for this level (and one per nested terms facet).
    Returns (buckets DataFrame keyed by [parent?]field, nested results)."""
    field = spec["field"]
    limit = int(spec.get("limit", 10))
    stats, nested = _split_spec(spec.get("facet"))
    keys = ([parent_field] if parent_field else []) + [field]
    aggs = [Count(alias_name="count")]
    uniques = {}
    for name, st in stats.items():
        if st[0] == "unique":
            uniques[name] = st[1]
        elif st[0] == "percentile":
            # UniqueAgg/PercentileAgg analogs (solr/core/.../facet/
            # UniqueAgg.java, PercentileAgg.java, branch_8x). The Quantile
            # aggregate collects the bucket's values (exact, linear
            # interpolation = SQL quantile_cont); for buckets too large to
            # collect, the mergeable t-digest (functions/sketches.py) is
            # the constant-memory alternative.
            aggs.append(Quantile(st[1], q=st[2] / 100.0, alias_name=name))
        else:
            aggs.append(_AGG_CLS[st[0]](st[1], alias_name=name))
    df = ds.groupby(keys).aggregate(*aggs).to_pandas()
    for name, col in uniques.items():
        # exact distinct without value collection: one groupby over the
        # distinct (keys, col) pairs, then a native count per key — both
        # shuffles move only distinct combinations
        pairs = ds.groupby(keys + [col]).aggregate(Count(alias_name="_c"))
        u = pairs.groupby(keys).aggregate(Count(alias_name=name)).to_pandas()
        df = df.merge(u, on=keys, how="left")
        df[name] = df[name].fillna(0).astype("int64")
    # Solr default bucket sort: count desc, value asc (within parent)
    df = df.sort_values(
        ([parent_field] if parent_field else []) + ["count", field],
        ascending=([True] if parent_field else []) + [False, True],
        kind="mergesort",
    )
    if parent_field:
        df = df.groupby(parent_field, sort=False).head(limit)
    else:
        df = df.head(limit)
    sub_results = {}
    for name, sub in nested.items():
        # one shuffle for ALL parent buckets of this nested facet
        sub_results[name] = _terms_level(ds, sub, parent_field=field)
    return df.reset_index(drop=True), stats, sub_results


def _to_buckets(df, field, stats, sub_results, parent_val=None, parent_field=None):
    out = []
    for _, row in df.iterrows():
        b = {"val": row[field], "count": int(row["count"])}
        for name, st in stats.items():
            b[name] = int(row[name]) if st[0] == "unique" else float(row[name])
        for name, (sdf, sstats, ssub) in sub_results.items():
            sfield = [c for c in sdf.columns if c not in
                      ("count", *sstats) and c != field][0]
            sel = sdf[sdf[field] == row[field]]
            b[name] = {
                "buckets": _to_buckets(sel, sfield, sstats, ssub)
            }
        out.append(b)
    return out


def json_facet(ds, spec: Dict) -> Dict:
    """Execute a json.facet spec over the Dataset; see module doc."""
    out: Dict = {"count": ds.count()}
    for name, facet in spec.items():
        if not (isinstance(facet, dict) and facet.get("type") == "terms"):
            raise ValueError("top-level entries must be terms facets")
        df, stats, subs = _terms_level(ds, facet)
        out[name] = {"buckets": _to_buckets(df, facet["field"], stats, subs)}
    return out
