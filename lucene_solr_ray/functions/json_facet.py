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

_AGG_RE = re.compile(
    r"^(sum|avg|min|max|stddev|unique|sumsq|variance|missing|countvals)\((\w+)\)$"
)
_PCT_RE = re.compile(r"^percentile\((\w+),(\d+(?:\.\d+)?)\)$")
_AGG_CLS = {"sum": Sum, "avg": Mean, "min": Min, "max": Max, "stddev": Std}


def _plan_aggs(stats, aggs, uniques):
    """Expand stat specs into Ray aggregate objects + a post-processing
    plan (SlotAcc partial+final contract: sumsq/variance/missing/countvals
    reduce to Sum/Count partials — reference solr/core/.../search/facet/
    SlotAcc.java VarianceAgg/CountValsAgg/MissingAgg, branch_8x). Returns
    (sq_cols needed, finishers run on the aggregated frame)."""
    sq_cols = set()
    finishers = []
    for name, st in stats.items():
        kind, col = st[0], st[1]
        if kind == "unique":
            uniques[name] = col
        elif kind == "percentile":
            aggs.append(Quantile(col, q=st[2] / 100.0, alias_name=name))
        elif kind == "sumsq":
            sq_cols.add(col)
            aggs.append(Sum(f"__sq_{col}", alias_name=name))
        elif kind == "variance":
            # var_samp from exact partials: (Σx² − (Σx)²/n) / (n−1) — the
            # SQL oracle uses the same expression so float64 results match
            sq_cols.add(col)
            aggs.append(Sum(f"__sq_{col}", alias_name=f"__v_sq_{name}"))
            aggs.append(Sum(col, alias_name=f"__v_s_{name}"))
            aggs.append(Count(col, ignore_nulls=True, alias_name=f"__v_n_{name}"))

            def fin_var(df, name=name):
                n = df[f"__v_n_{name}"].astype("float64")
                s = df[f"__v_s_{name}"].astype("float64")
                sq = df[f"__v_sq_{name}"].astype("float64")
                import numpy as _np

                with _np.errstate(invalid="ignore", divide="ignore"):
                    df[name] = _np.where(
                        n > 1, (sq - s * s / n) / (n - 1), _np.nan
                    )  # var_samp of a 1-row bucket is NULL (oracle parity)
                return df.drop(columns=[f"__v_sq_{name}", f"__v_s_{name}",
                                        f"__v_n_{name}"])

            finishers.append(fin_var)
        elif kind == "missing":
            aggs.append(Count(col, ignore_nulls=False, alias_name=f"__m_all_{name}"))
            aggs.append(Count(col, ignore_nulls=True, alias_name=f"__m_v_{name}"))

            def fin_missing(df, name=name):
                df[name] = (df[f"__m_all_{name}"] - df[f"__m_v_{name}"]).astype("int64")
                return df.drop(columns=[f"__m_all_{name}", f"__m_v_{name}"])

            finishers.append(fin_missing)
        elif kind == "countvals":
            aggs.append(Count(col, ignore_nulls=True, alias_name=name))
        else:
            aggs.append(_AGG_CLS[kind](col, alias_name=name))
    return sq_cols, finishers


def _with_squares(ds, sq_cols):
    if not sq_cols:
        return ds
    cols = sorted(sq_cols)

    def add_sq(t):
        import numpy as np
        import pyarrow as pa

        for c in cols:
            if f"__sq_{c}" in t.column_names:
                continue  # nested facet levels plan the same square twice
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            t = t.append_column(f"__sq_{c}", pa.array(v * v))
        return t

    return ds.map_batches(add_sq, batch_format="pyarrow")


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
        elif isinstance(sub, dict) and sub.get("type") in ("terms", "query"):
            nested[name] = sub
        else:
            raise ValueError(f"unsupported facet spec {name!r}: {sub!r}")
    return stats, nested


_OPS = {
    "==": "equal", "!=": "not_equal", "<": "less", "<=": "less_equal",
    ">": "greater", ">=": "greater_equal",
}


def _apply_query(ds, q):
    """Filter the Dataset by a query-facet predicate: one comparison dict
    ``{"col", "op", "value"}`` or a list of them (AND). Vectorized Arrow
    kernels per batch; ``in`` uses ``pc.is_in``, ``contains`` a substring
    match (Solr q= on a string field analog)."""
    preds = q if isinstance(q, list) else [q]

    def fn(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        mask = None
        for p in preds:
            col, op, val = p["col"], p["op"], p["value"]
            if op == "in":
                m = pc.is_in(t[col], value_set=pa.array(val))
            elif op == "contains":
                m = pc.match_substring(t[col], val)
            else:
                m = getattr(pc, _OPS[op])(t[col], val)
            mask = m if mask is None else pc.and_(mask, m)
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def _query_level(ds, spec: Dict) -> Dict:
    """Query facet (reference: solr/core/.../search/facet/FacetQuery.java,
    branch_8x): ONE bucket — docs matching the sub-query — carrying count,
    sibling stats, and nested facets computed over the filtered stream."""
    sub = _apply_query(ds, spec["q"])
    stats, nested = _split_spec(spec.get("facet"))
    preds = spec["q"] if isinstance(spec["q"], list) else [spec["q"]]
    # Ray 2.49's column-less global Count() merges nondeterministically
    # to 0 when a block is empty (a filter often leaves one) — count a
    # concrete column with ignore_nulls=False instead
    aggs = [Count(preds[0]["col"], ignore_nulls=False, alias_name="count")]
    uniques = {}
    sq_cols, finishers = _plan_aggs(stats, aggs, uniques)
    sub = _with_squares(sub, sq_cols)
    # multi-consumer input: materialize once so the filter isn't re-run
    # per aggregate/nested facet (diamond lineage re-executes otherwise)
    if uniques or nested:
        sub = sub.materialize()
    row = sub.aggregate(*aggs)
    if finishers:
        import pandas as _pd

        rdf = _pd.DataFrame([row])
        for fin in finishers:
            rdf = fin(rdf)
        row = rdf.iloc[0].to_dict()
    out: Dict = {"count": int(row["count"] or 0)}
    import math

    for name, st in stats.items():
        if st[0] == "unique":
            continue
        v = row.get(name)
        if st[0] in ("missing", "countvals"):
            out[name] = int(v) if v is not None else 0
        elif v is None or (isinstance(v, float) and math.isnan(v)):
            out[name] = None  # e.g. var_samp of a <2-row bucket
        else:
            out[name] = float(v)
    for name, col in uniques.items():
        pairs = sub.groupby([col]).aggregate(Count(alias_name="_c"))
        out[name] = int(pairs.count())
    for name, sspec in nested.items():
        if sspec.get("type") == "query":
            out[name] = _query_level(sub, sspec)
        else:
            df, sstats, ssub = _terms_level(sub, sspec)
            out[name] = {"buckets": _to_buckets(df, sspec["field"], sstats, ssub)}
    return out


def _terms_level(ds, spec: Dict, parent_field=None):
    """One groupby for this level (and one per nested terms facet).
    Returns (buckets DataFrame keyed by [parent?]field, nested results)."""
    field = spec["field"]
    limit = int(spec.get("limit", 10))
    stats, nested = _split_spec(spec.get("facet"))
    keys = ([parent_field] if parent_field else []) + [field]
    # UniqueAgg/PercentileAgg analogs (solr/core/.../facet/UniqueAgg.java,
    # PercentileAgg.java, branch_8x). Quantile collects the bucket's values
    # (exact, linear interpolation = SQL quantile_cont); for buckets too
    # large to collect, the mergeable t-digest (functions/sketches.py) is
    # the constant-memory alternative.
    aggs = [Count(alias_name="count")]
    uniques = {}
    sq_cols, finishers = _plan_aggs(stats, aggs, uniques)
    ds = _with_squares(ds, sq_cols)
    df = ds.groupby(keys).aggregate(*aggs).to_pandas()
    for fin in finishers:
        df = fin(df)
    for name, col in uniques.items():
        # exact distinct without value collection: one groupby over the
        # distinct (keys, col) pairs, then a native count per key — both
        # shuffles move only distinct combinations
        pairs = ds.groupby(keys + [col]).aggregate(Count(alias_name="_c"))
        u = pairs.groupby(keys).aggregate(Count(alias_name=name)).to_pandas()
        df = df.merge(u, on=keys, how="left")
        df[name] = df[name].fillna(0).astype("int64")
    # bucket options (FacetField.java request params, branch_8x):
    # ``mincount`` prunes sparse buckets, ``sort`` orders by count / a
    # sibling stat / the bucket value ("index"), ``offset`` pages. Default
    # sort: count desc, value asc.
    mincount = int(spec.get("mincount", 0))
    if mincount > 0:
        df = df[df["count"] >= mincount]
    extras = {}
    if spec.get("numBuckets"):
        # distinct bucket count BEFORE limit/offset (FacetField numBuckets)
        if parent_field:
            raise ValueError("numBuckets is supported on top-level facets")
        extras["numBuckets"] = int(len(df))
    sort_spec = str(spec.get("sort", "count desc")).split()
    sort_key = sort_spec[0]
    if len(sort_spec) > 1:
        sort_desc = sort_spec[1].lower() != "asc"
    else:
        # Solr FacetRequest default direction: asc for "index", desc else
        sort_desc = sort_key != "index"
    if sort_key == "index":
        sort_cols, asc = [field], [not sort_desc]
    elif sort_key == "count":
        sort_cols, asc = ["count", field], [not sort_desc, True]
    else:
        if sort_key not in df.columns:
            raise ValueError(f"facet sort key {sort_key!r} is not a sibling stat")
        sort_cols, asc = [sort_key, field], [not sort_desc, True]
    df = df.sort_values(
        ([parent_field] if parent_field else []) + sort_cols,
        ascending=([True] if parent_field else []) + asc,
        kind="mergesort",
    )
    offset = int(spec.get("offset", 0))
    if limit < 0:
        limit = len(df)  # Solr limit:-1 = unlimited
    if parent_field:
        grp = df.groupby(parent_field, sort=False)
        df = grp.head(offset + limit)
        if offset:
            df = df.groupby(parent_field, sort=False).apply(
                lambda g: g.iloc[offset:]
            ).reset_index(drop=True)
    else:
        df = df.iloc[offset:offset + limit]
    sub_results = {}
    for name, sub in nested.items():
        if sub.get("type") == "query":
            # nested query facet: ONE filtered groupby(parent field) serves
            # every parent bucket (FacetQuery under FacetField — never a
            # query per bucket)
            sub_results[name] = ("query",) + _query_under_parent(ds, field, sub)
        else:
            # one shuffle for ALL parent buckets of this nested facet
            sub_results[name] = ("terms",) + _terms_level(
                ds, sub, parent_field=field
            )[:3]
    return df.reset_index(drop=True), stats, sub_results, extras


def _query_under_parent(ds, parent_field: str, spec: Dict):
    """Nested query facet under a terms facet: filter once, aggregate per
    parent value. Returns (DataFrame keyed by parent_field, stats)."""
    sub = _apply_query(ds, spec["q"])
    stats, nested = _split_spec(spec.get("facet"))
    if nested:
        raise ValueError("facets nested under a terms>query chain are unsupported")
    aggs = [Count(alias_name="count")]
    uniques = {}
    sq_cols, finishers = _plan_aggs(stats, aggs, uniques)
    sub = _with_squares(sub, sq_cols)
    if uniques:
        sub = sub.materialize()
    df = sub.groupby([parent_field]).aggregate(*aggs).to_pandas()
    for fin in finishers:
        df = fin(df)
    for name, col in uniques.items():
        pairs = sub.groupby([parent_field, col]).aggregate(Count(alias_name="_c"))
        u = pairs.groupby([parent_field]).aggregate(Count(alias_name=name)).to_pandas()
        df = df.merge(u, on=[parent_field], how="left")
        df[name] = df[name].fillna(0).astype("int64")
    return df, stats


def _to_buckets(df, field, stats, sub_results, parent_val=None, parent_field=None):
    out = []
    for _, row in df.iterrows():
        b = {"val": row[field], "count": int(row["count"])}
        for name, st in stats.items():
            if st[0] in ("unique", "missing", "countvals"):
                b[name] = int(row[name])
            else:
                v = float(row[name])
                b[name] = None if pd.isna(v) else v
        for name, sub in sub_results.items():
            if sub[0] == "query":
                _, qdf, qstats = sub
                sel = qdf[qdf[field] == row[field]]
                if len(sel) == 0:
                    qb = {"count": 0}
                    for qn, qst in qstats.items():
                        qb[qn] = (0 if qst[0] in ("unique", "missing",
                                                  "countvals") else None)
                else:
                    r = sel.iloc[0]
                    qb = {"count": int(r["count"])}
                    for qn, qst in qstats.items():
                        qb[qn] = (int(r[qn]) if qst[0] in ("unique", "missing", "countvals")
                                  else float(r[qn]))
                b[name] = qb
                continue
            _, sdf, sstats, ssub = sub
            sfield = [c for c in sdf.columns if c not in
                      ("count", *sstats) and c != field][0]
            sel = sdf[sdf[field] == row[field]]
            b[name] = {
                "buckets": _to_buckets(sel, sfield, sstats, ssub)
            }
        out.append(b)
    return out


def json_facet(ds, spec: Dict) -> Dict:
    """Execute a json.facet spec over the Dataset; see module doc.

    The facet domain is consumed MULTIPLE times (the domain count, one
    groupby per facet level, filtered sub-facets) and Ray re-executes the
    whole upstream pipeline per consumer (diamond lineage) — so pin the
    domain blocks once up front. The domain is a post-filter projection of
    only the faceted/statted columns (callers prune at the read), and
    blocks spill to the object store — the analog of Solr holding the
    base docset; measured 2.1 s → ~0.9 s on the sf0.1 query-facet bench."""
    ds = ds.materialize()
    # count() on materialized blocks is metadata-only (no extra pass)
    out: Dict = {"count": ds.count()}
    for name, facet in spec.items():
        if not (isinstance(facet, dict) and facet.get("type") in ("terms", "query")):
            raise ValueError("top-level entries must be terms or query facets")
        if facet["type"] == "query":
            out[name] = _query_level(ds, facet)
            continue
        df, stats, subs, extras = _terms_level(ds, facet)
        entry = {"buckets": _to_buckets(df, facet["field"], stats, subs)}
        entry.update(extras)
        if facet.get("allBuckets"):
            # one ungrouped aggregate over the whole domain (FacetField
            # allBuckets: stats across every doc regardless of bucket)
            a_stats, _ = _split_spec(facet.get("facet"))
            a_aggs = [Count(facet["field"], ignore_nulls=False,
                            alias_name="count")]
            a_uniq = {}
            a_sq, a_fin = _plan_aggs(a_stats, a_aggs, a_uniq)
            a_ds = _with_squares(ds, a_sq)
            row = a_ds.aggregate(*a_aggs)
            if a_fin:
                rdf = pd.DataFrame([row])
                for fin in a_fin:
                    rdf = fin(rdf)
                row = rdf.iloc[0].to_dict()
            ab = {"count": int(row["count"] or 0)}
            for sname, st in a_stats.items():
                if st[0] == "unique":
                    pairs = ds.groupby([st[1]]).aggregate(Count(alias_name="_c"))
                    ab[sname] = int(pairs.count())
                elif st[0] in ("missing", "countvals"):
                    ab[sname] = int(row.get(sname) or 0)
                else:
                    v = row.get(sname)
                    ab[sname] = None if v is None or pd.isna(v) else float(v)
            entry["allBuckets"] = ab
        out[name] = entry
    return out
