"""eval() / executor() stream analogs (SURVEY.md §2.8).

Reference semantics ([8x] solr/solrj/src/java/org/apache/solr/client/
solrj/io/stream/EvalStream.java ~150 LoC and ExecutorStream.java ~250
LoC, branch_8x):

- ``eval(stream)`` reads the FIRST tuple from an underlying stream,
  compiles the streaming expression found in its ``expr_s`` field, and
  emits THAT expression's tuples.
- ``executor(stream)`` reads EVERY tuple, compiles each tuple's
  ``expr_s`` expression, and runs them on a worker thread pool (Solr
  discards the inner results; ours streams them back tagged by the
  tuple id — a documented extension that makes the operator checkable,
  and requires all expressions in one run to share an output schema).

Expressions here are a compact JSON table-expression language (the
StreamExpressionParser analog — ours is data, not a grammar):

    {"table": "orders",
     "where":   [["o_orderpriority", "==", "1-URGENT"], ...],
     "groupby": ["o_orderstatus"],                    # optional
     "aggs":    {"n": ["count"],
                 "sum_price_c": ["sum_cents", "o_totalprice"],
                 "max_price_c": ["max_cents", "o_totalprice"]},
     "having":  [["n", ">=", 100]],  # optional; post-aggregate filter on
                                     # agg OUTPUT columns (HavingStream)
     "sort":    [["o_orderstatus", "asc"]],           # optional
     "limit":   20}                                   # optional

Money aggregates are integer cents (``round(x*100)`` → int64) so results
are bit-comparable against a SQL oracle.

Two runners with identical semantics:

- ``run_expr_dataset``  — full Ray Data engine (streaming, distributed);
  what ``eval_stream`` uses, since eval promotes ONE expression to a
  first-class pipeline.
- ``run_expr_arrow``    — single-task pyarrow.dataset flavor with filter
  /column pushdown; what each ``executor_stream`` worker runs. This is
  the Solr shape too: executor runs each inner expression to completion
  on one worker. SCALE NOTE: executor is for MANY selective jobs (the
  pushdown prunes row groups); an expression that scans the full corpus
  belongs in eval()/a daemon, not a single executor slot.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

def _in_values(vals) -> list:
    """IN-list value set with SQL zero semantics: Arrow's is_in hashes
    floats BITWISE, so -0.0 and 0.0 are distinct members — SQL (and
    pc.equal) equate them. Any float zero in the set expands to both
    signs so membership matches SQL regardless of which zero the column
    or the literal carries."""
    out = list(vals)
    if any(isinstance(v, float) and v == 0.0 for v in out):
        out.extend([0.0, -0.0])
    return out


_WHERE_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    # set / pattern / null predicates (the {!terms}, SQL LIKE and SQL
    # IS [NOT] NULL shapes; the /sql planner in functions/sql.py lowers
    # IN, LIKE, BETWEEN and IS NULL onto these — val is ignored for the
    # null tests)
    "in": lambda arr, vals: pc.is_in(
        arr, value_set=pa.array(_in_values(vals))),
    "like": lambda arr, pat: pc.match_like(arr, pat),
    "is_null": lambda arr, _=None: pc.is_null(arr),
    "not_null": lambda arr, _=None: pc.is_valid(arr),
}
# ops expressible as pyarrow.dataset scan-filter expressions (row-group
# stats pruning); "like" has no expression kernel and filters post-scan
_PUSHDOWN_OPS = {"==", "!=", "<", "<=", ">", ">=", "in",
                 "is_null", "not_null"}

_AGG_NAMES = {"count", "sum_cents", "min_cents", "max_cents",
              "sum", "min", "max"}


def _check_clause(w) -> None:
    if len(w) == 2 and w[0] == "or":
        # ["or", [conj, conj, ...]] — disjunction of conjunctions, each
        # conj a list of triples (the /sql WHERE lowers OR trees to this
        # DNF shape); one clause slot in the AND list
        for conj in w[1]:
            for t in conj:
                if len(t) != 3 or t[1] not in _WHERE_OPS:
                    raise ValueError(f"bad or-branch predicate: {t!r}")
        return
    if len(w) != 3 or w[1] not in _WHERE_OPS:
        raise ValueError(f"bad where clause: {w!r}")


def _validate(spec: dict) -> dict:
    if not isinstance(spec, dict) or "table" not in spec:
        raise ValueError(f"bad table expression: {spec!r}")
    for w in spec.get("where", []):
        _check_clause(w)
    for out, a in spec.get("aggs", {}).items():
        if a[0] not in _AGG_NAMES:
            raise ValueError(f"unknown agg {a[0]!r} for {out!r}")
    having = spec.get("having", [])
    if having and not spec.get("aggs"):
        raise ValueError("having requires aggs (it filters aggregate "
                         "outputs; use where for row predicates)")
    for h in having:
        if len(h) != 3 or h[1] not in _WHERE_OPS:
            raise ValueError(f"bad having clause: {h!r}")
    return spec


def _needed_columns(spec: dict, sf_dir: Optional[str] = None) -> list:
    # "columns": explicit projection for plain (no-agg) expressions —
    # the /sql SELECT list; group/where/agg columns are unioned in
    cols = list(spec.get("columns", []))
    for g in spec.get("groupby", []):
        if g not in cols:
            cols.append(g)

    def _clause_cols(w):
        if len(w) == 2 and w[0] == "or":
            return [t[0] for conj in w[1] for t in conj]
        return [w[0]]

    for w in spec.get("where", []):
        for c in _clause_cols(w):
            if c not in cols:
                cols.append(c)
    for a in spec.get("aggs", {}).values():
        if len(a) > 1 and a[1] not in cols:
            cols.append(a[1])
    if not cols and sf_dir is not None:
        # bare count(*): anchor on the narrowest-available first column
        # (metadata-only schema read, no data IO)
        import pyarrow.parquet as pq

        cols = [pq.read_schema(
            os.path.join(sf_dir, f"{spec['table']}.parquet")).names[0]]
    return cols


def _cents(arr: pa.ChunkedArray) -> pa.ChunkedArray:
    """House cents convention (entry_queries._cents / _SQL_CENTS):
    floor(x*100 + 0.5) — NOT banker's rounding, so the SQL oracle's
    FLOOR(col*100.0 + 0.5) matches bit-exactly."""
    x = pc.multiply(pc.cast(arr, pa.float64()), 100.0)
    return pc.cast(pc.floor(pc.add(x, 0.5)), pa.int64())


def _clause_mask(tab: pa.Table, w):
    if len(w) == 2 and w[0] == "or":
        mask = None
        for conj in w[1]:
            m = None
            for col, op, val in conj:
                mm = _WHERE_OPS[op](tab[col], val)
                m = mm if m is None else pc.and_kleene(m, mm)
            mask = m if mask is None else pc.or_kleene(mask, m)
        return mask
    col, op, val = w
    return _WHERE_OPS[op](tab[col], val)


def _filter_table(tab: pa.Table, spec: dict) -> pa.Table:
    for w in spec.get("where", []):
        tab = tab.filter(_clause_mask(tab, w))
    return tab


def _agg_arrow(tab: pa.Table, spec: dict) -> pa.Table:
    """Aggregate a (filtered) Arrow table per the spec — the executor
    worker flavor. Output columns: groupby keys + agg out-names."""
    keys = list(spec.get("groupby", []))
    aggs = spec.get("aggs", {})
    # precompute cents columns so group_by can aggregate them natively
    work = {}
    gspecs, gnames = [], []
    for out, a in aggs.items():
        if a[0] == "count":
            anchor = keys[0] if keys else tab.column_names[0]
            # mode="all": count rows, not valid values — parity with the
            # Dataset runner's Count(anchor, ignore_nulls=False)
            gspecs.append((anchor, "count", pc.CountOptions(mode="all")))
            gnames.append(out)
            continue
        col = a[1]
        base = a[0].split("_")[0]  # sum / min / max
        src = col
        if a[0].endswith("_cents"):
            src = f"__c_{col}"
            if src not in work:
                work[src] = _cents(tab[col])
        gspecs.append((src, base))
        gnames.append(out)
    for name, arr in work.items():
        tab = tab.append_column(name, arr)
    if keys:
        gt = tab.group_by(keys).aggregate(gspecs)
        # arrow names results "<col>_<agg>"; rename positionally
        ren = {f"{g[0]}_{g[1]}": n for g, n in zip(gspecs, gnames)}
        gt = gt.rename_columns(
            [ren.get(c, c) for c in gt.column_names])
        out_cols = keys + gnames
        gt = gt.select(out_cols)
    else:
        row = {}
        for g, out in zip(gspecs, gnames):
            src, base = g[0], g[1]
            if base == "count":
                row[out] = [tab.num_rows]
            else:
                v = getattr(pc, base)(tab[src]).as_py()
                row[out] = [v if v is not None else 0]
        gt = pa.table(
            {k: pa.array(v, type=pa.int64()) if isinstance(v[0], int)
             else pa.array(v) for k, v in row.items()})
    return gt


def _sort_limit_arrow(tab: pa.Table, spec: dict) -> pa.Table:
    srt = spec.get("sort")
    if srt:
        tab = tab.sort_by(
            [(c, "ascending" if d == "asc" else "descending")
             for c, d in srt])
    lim = spec.get("limit")
    if lim is not None:
        tab = tab.slice(0, int(lim))
    return tab


def run_expr_arrow(sf_dir: str, spec: dict) -> pa.Table:
    """Single-worker runner: pyarrow.dataset scan with column + filter
    pushdown (row groups whose stats exclude the predicate never load),
    then vectorized aggregate/sort/limit."""
    import pyarrow.dataset as pads

    spec = _validate(spec)
    dset = pads.dataset(os.path.join(sf_dir, f"{spec['table']}.parquet"))

    def expr(col, op, val):
        if op not in _PUSHDOWN_OPS:
            return None  # e.g. LIKE: no scan expression
        if op == "in":
            return pads.field(col).isin(_in_values(val))
        if op == "is_null":
            return pads.field(col).is_null()
        if op == "not_null":
            return pads.field(col).is_valid()
        return _WHERE_OPS[op](pads.field(col), val)

    def clause_expr(w):
        if len(w) == 2 and w[0] == "or":
            branches = []
            for conj in w[1]:
                e = None
                for t in conj:
                    te = expr(*t)
                    if te is None:
                        return None  # any LIKE inside → whole clause post
                    e = te if e is None else e & te
                branches.append(e)
            out = branches[0]
            for b in branches[1:]:
                out = out | b
            return out
        return expr(*w)

    filt, post = None, []
    for w in spec.get("where", []):
        f = clause_expr(w)
        if f is None:
            post.append(w)
            continue
        filt = f if filt is None else filt & f
    tab = dset.to_table(columns=_needed_columns(spec, sf_dir), filter=filt)
    for w in post:
        tab = tab.filter(_clause_mask(tab, w))
    if spec.get("aggs"):
        tab = _agg_arrow(tab, spec)
        for col, op, val in spec.get("having", []):
            # HavingStream analog: filter on aggregate OUTPUT columns
            tab = tab.filter(_WHERE_OPS[op](tab[col], val))
    return _sort_limit_arrow(tab, spec)


def run_expr_dataset(sf_dir: str, spec: dict):
    """Full-engine runner (eval flavor): Ray Dataset pipeline — pruned
    read, vectorized filter, map-side cents, native groupby aggregate."""
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    spec = _validate(spec)
    path = os.path.join(sf_dir, f"{spec['table']}.parquet")
    cols = _needed_columns(spec, sf_dir)
    ds = ray.data.read_parquet(path, columns=cols)
    keys = list(spec.get("groupby", []))
    aggs = spec.get("aggs", {})

    cents_cols = sorted({
        a[1] for a in aggs.values()
        if a[0].endswith("_cents") and len(a) > 1})

    def prep(batch: pa.Table) -> pa.Table:
        batch = _filter_table(batch, spec)
        for col in cents_cols:
            batch = batch.append_column(f"__c_{col}", _cents(batch[col]))
        return batch

    ds = ds.map_batches(prep, batch_format="pyarrow")

    ray_aggs, ray_names, out_names = [], [], []
    for out, a in aggs.items():
        if a[0] == "count":
            anchor = keys[0] if keys else cols[0]
            ray_aggs.append(Count(anchor, ignore_nulls=False))
            ray_names.append(f"count({anchor})")
        else:
            base = a[0].split("_")[0]
            src = f"__c_{a[1]}" if a[0].endswith("_cents") else a[1]
            cls = {"sum": Sum, "min": Min, "max": Max}[base]
            ray_aggs.append(cls(src))
            ray_names.append(f"{base}({src})")
        out_names.append(out)

    if ray_aggs:
        agg_ds = (ds.groupby(keys).aggregate(*ray_aggs) if keys
                  else ds.aggregate(*ray_aggs))
        if not keys:
            # global aggregate returns a dict — lift to a 1-row table.
            # count/cents results pin to int64; everything else keeps the
            # engine's type (a float sum/min/max stays float64)
            row = agg_ds
            cols = {}
            for out, rn in zip(out_names, ray_names):
                v = row[rn]
                if "__c_" in rn or rn.startswith("count("):
                    cols[out] = pa.array(
                        [int(v) if v is not None else 0], type=pa.int64())
                elif isinstance(v, (int, np.integer)):
                    cols[out] = pa.array([int(v)], type=pa.int64())
                else:
                    cols[out] = pa.array(
                        [float(v) if v is not None else None],
                        type=pa.float64())
            ds = ray.data.from_arrow(pa.table(cols))
        else:
            def rename(batch: pa.Table) -> pa.Table:
                cols = {k: batch[k] for k in keys}
                for out, rn in zip(out_names, ray_names):
                    arr = batch[rn]
                    # cents/count aggregates are integer results; pin the
                    # dtype so both runners (and the SQL oracle) agree
                    if "__c_" in rn or rn.startswith("count("):
                        arr = pc.cast(arr, pa.int64())
                    cols[out] = arr
                return pa.table(cols)

            ds = agg_ds.map_batches(rename, batch_format="pyarrow")

        having = spec.get("having", [])
        if having:
            def post(batch: pa.Table) -> pa.Table:
                for col, op, val in having:
                    batch = batch.filter(_WHERE_OPS[op](batch[col], val))
                return batch

            ds = ds.map_batches(post, batch_format="pyarrow")

    srt = spec.get("sort")
    if srt:
        ds = ds.sort([c for c, _ in srt],
                     descending=[d != "asc" for _, d in srt])
    lim = spec.get("limit")
    if lim is not None:
        ds = ds.limit(int(lim))
    return ds


def eval_stream(meta_ds, sf_dir: str, expr_col: str = "expr_s"):
    """EvalStream analog: read the FIRST tuple of ``meta_ds``, compile
    the JSON table expression in ``expr_col``, emit its tuples through
    the full Dataset engine."""
    first = meta_ds.limit(1).take(1)
    if not first:
        raise ValueError("eval(): underlying stream is empty")
    spec = json.loads(first[0][expr_col])
    return run_expr_dataset(sf_dir, spec)


class _ExecutorWorker:
    """Actor-pool worker: one stored expression per row, run to
    completion via the pushdown pyarrow runner (the Solr thread-pool
    analog — each inner expression is single-worker by design)."""

    def __init__(self, sf_dir: str, expr_col: str, id_col: str):
        self.sf_dir = sf_dir
        self.expr_col = expr_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for row_id, expr in zip(
                batch[self.id_col].to_pylist(),
                batch[self.expr_col].to_pylist()):
            res = run_expr_arrow(self.sf_dir, json.loads(expr))
            res = res.append_column(
                "expr_id",
                pa.array([int(row_id)] * res.num_rows, type=pa.int64()))
            outs.append(res.select(["expr_id"] + [
                c for c in res.column_names if c != "expr_id"]))
        if not outs:
            return pa.table({"expr_id": pa.array([], type=pa.int64())})
        return pa.concat_tables(outs)


def executor_stream(meta_ds, sf_dir: str, expr_col: str = "expr_s",
                    id_col: str = "id", concurrency: int = 4):
    """ExecutorStream analog: run EVERY tuple's expression in parallel
    (actor pool, small batches so jobs spread), streaming results back
    tagged ``expr_id``. All expressions in one run must share an output
    schema (documented extension — Solr discards inner results). The
    pool is capped at cluster CPUs − 1 so the read/sort task pool never
    starves at tiny CPU budgets (BASELINE §7.2 actor-floor deadlock)."""
    import ray

    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    concurrency = max(1, min(int(concurrency), ncpu - 1))
    return meta_ds.map_batches(
        _ExecutorWorker,
        fn_constructor_args=(sf_dir, expr_col, id_col),
        batch_format="pyarrow",
        batch_size=2,
        concurrency=concurrency,
    )
