"""Parallel SQL handler analog (SURVEY.md §2.8; [8x] solr/core/src/java/
org/apache/solr/handler/sql/ — SolrSchema/SolrTable/SolrAggregate +
CalciteSolrDriver behind the /sql handler, branch_8x).

Solr 8's ``/sql`` endpoint parses a SQL subset with Apache Calcite and
compiles it onto streaming expressions (search/rollup/facet streams in
``aggregationMode=map_reduce``). Same two-layer shape here, Ray-Data
-first — the "streaming expressions" the planner targets are the JSON
table expressions that eval()/executor() already run (streams.py):

    parse_sql(sql)              SQL text → plan dict (dialect below)
    sql_query(sf_dir, sql)      parse → bind literals against the
                                parquet schema → run_expr_dataset →
                                one vectorized SELECT-list projection

Supported dialect (the /sql map_reduce surface):

    SELECT [DISTINCT] item [, item ...]
        item: * (alone)
            | col [AS alias]
            | COUNT(*) | COUNT(DISTINCT col) [AS alias]
            | SUM|MIN|MAX|AVG ( col ) [AS alias]
    FROM table
    [WHERE bool]
        bool: pred | bool AND bool | bool OR bool | ( bool )
              (standard precedence; lowered to DNF, <=64 OR branches)
        pred: col (= | <> | != | < | <= | > | >=) literal
            | col IN ( literal [, literal ...] )
            | col LIKE 'pattern'
            | col BETWEEN literal AND literal
            | col IS [NOT] NULL
    [GROUP BY col [, col ...]]
    [HAVING pred [AND pred ...]]        -- over aggregate ALIASES
    [ORDER BY key [ASC|DESC] [, ...]]   -- output columns/aliases
    [LIMIT n]

COUNT(DISTINCT col) runs the two-phase distinct pipeline (native
groupby then per-key count — the map_reduce 'unique' metric shape) and
must be the query's only aggregate. Like Solr's handler, subqueries /
joins / expressions in the SELECT list are out of dialect (Solr routes
the rest of SQL to Calcite row-at-a-time; our users reach the richer
operators directly through the relational/streams APIs).

Exactness notes (the oracle discipline): COUNT, SUM/MIN/MAX over
integer columns, and MIN/MAX over floats are order-independent and
hash-exact vs DuckDB. AVG over an integer column is one double
division of exact integer partials (also exact). SUM/AVG over a float
column accumulates in float64 block-by-block and is documented
approximate — contracts avoid it; use the cents idiom (streams.py)
when a money aggregate must be bit-comparable.
"""
from __future__ import annotations

import os
import re
from typing import Any, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_sql", "sql_query"]

_KEYWORDS = {
    "select", "distinct", "from", "where", "and", "or", "group", "by",
    "having", "order", "limit", "as", "asc", "desc", "in", "like",
    "between", "is", "not", "null",
    "count", "sum", "min", "max", "avg",
}

_TOKEN_RE = re.compile(r"""
    \s*(?:
        (?P<str>'(?:[^']|'')*')
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<id>[A-Za-z_][A-Za-z_0-9.$#]*)
      | (?P<op><>|!=|<=|>=|=|<|>)
      | (?P<punct>[(),*])
    )""", re.VERBOSE)


def _tokenize(sql: str) -> List[Tuple[str, Any]]:
    out, pos = [], 0
    sql = sql.strip().rstrip(";")
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m or m.end() == pos:
            raise ValueError(f"SQL syntax error at: {sql[pos:pos+30]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            t = m.group("num")
            out.append(("num", float(t) if ("." in t or "e" in t.lower())
                        else int(t)))
        elif m.group("id") is not None:
            t = m.group("id")
            low = t.lower()
            out.append(("kw", low) if low in _KEYWORDS else ("id", t))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            out.append(("punct", m.group("punct")))
    return out


class _P:
    """Minimal recursive-descent cursor over the token list."""

    def __init__(self, toks):
        self.toks, self.i = toks, 0

    def peek(self, kind=None, val=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind is not None and k != kind:
            return None
        if val is not None and v != val:
            return None
        return v

    def take(self, kind, val=None):
        got = self.peek(kind, val)
        if got is None:
            here = self.toks[self.i] if self.i < len(self.toks) else "<end>"
            raise ValueError(
                f"SQL parse error: expected {val or kind}, got {here}")
        self.i += 1
        return got

    def accept(self, kind, val=None):
        if self.peek(kind, val) is None:
            return False
        self.i += 1
        return True

    def done(self):
        return self.i >= len(self.toks)


_SQL_OPS = {"=": "==", "<>": "!=", "!=": "!=",
            "<": "<", "<=": "<=", ">": ">", ">=": ">="}
_AGG_FNS = ("count", "sum", "min", "max", "avg")


def _parse_select_item(p: _P) -> dict:
    if p.accept("punct", "*"):
        return {"kind": "star", "alias": "*"}
    fn = None
    for f in _AGG_FNS:
        if p.peek("kw", f) is not None:
            # aggregate only when followed by "(" — else it's a bare
            # identifier that collides with a keyword (rare; quoted
            # idents are out of dialect)
            if p.i + 1 < len(p.toks) and p.toks[p.i + 1] == ("punct", "("):
                fn = f
                p.take("kw", f)
                break
    if fn is not None:
        p.take("punct", "(")
        if fn == "count":
            if p.accept("kw", "distinct"):
                fn = "count_distinct"
                col = p.take("id")
            else:
                p.take("punct", "*")
                col = None
        else:
            col = p.take("id")
        p.take("punct", ")")
        alias = p.take("id") if p.accept("kw", "as") else (
            "count(*)" if fn == "count" else f"{fn}({col})")
        return {"kind": "agg", "fn": fn, "col": col, "alias": alias}
    col = p.take("id")
    alias = p.take("id") if p.accept("kw", "as") else col
    return {"kind": "col", "col": col, "alias": alias}


def _parse_literal(p: _P):
    v = p.peek("str")
    if v is not None:
        p.take("str")
        return v
    return p.take("num")


def _parse_pred(p: _P) -> list:
    """One SQL predicate → a LIST of engine triples (BETWEEN expands to
    two; everything else is one)."""
    col = p.take("id")
    if p.accept("kw", "in"):
        p.take("punct", "(")
        vals = [_parse_literal(p)]
        while p.accept("punct", ","):
            vals.append(_parse_literal(p))
        p.take("punct", ")")
        return [[col, "in", vals]]
    if p.accept("kw", "like"):
        return [[col, "like", p.take("str")]]
    if p.accept("kw", "is"):
        neg = p.accept("kw", "not")
        p.take("kw", "null")
        return [[col, "not_null" if neg else "is_null", None]]
    if p.accept("kw", "between"):
        lo = _parse_literal(p)
        p.take("kw", "and")
        hi = _parse_literal(p)
        return [[col, ">=", lo], [col, "<=", hi]]
    op = p.take("op")
    return [[col, _SQL_OPS[op], _parse_literal(p)]]


def _parse_conj(p: _P) -> list:
    preds = list(_parse_pred(p))
    while p.accept("kw", "and"):
        preds.extend(_parse_pred(p))
    return preds


# WHERE grammar (standard precedence, AND binds tighter than OR):
#   disj := conj (OR conj)*
#   conj := unit (AND unit)*
#   unit := '(' disj ')' | pred
# The tree lowers to DNF (or-of-conjunctions) — the engine's where list
# is a conjunction of clauses, and a disjunction occupies ONE clause
# slot as ["or", [conj, ...]] (streams._check_clause).

_DNF_LIMIT = 64


def _parse_unit(p: _P):
    if p.accept("punct", "("):
        node = _parse_disj(p)
        p.take("punct", ")")
        return node
    triples = _parse_pred(p)
    if len(triples) == 1:
        return ("pred", triples[0])
    return ("and", [("pred", t) for t in triples])  # e.g. BETWEEN


def _parse_and(p: _P):
    items = [_parse_unit(p)]
    while p.accept("kw", "and"):
        items.append(_parse_unit(p))
    return items[0] if len(items) == 1 else ("and", items)


def _parse_disj(p: _P):
    items = [_parse_and(p)]
    while p.accept("kw", "or"):
        items.append(_parse_and(p))
    return items[0] if len(items) == 1 else ("or", items)


def _to_dnf(node) -> list:
    """Boolean tree → list of conjunctions (each a list of triples)."""
    kind = node[0]
    if kind == "pred":
        return [[node[1]]]
    if kind == "or":
        out = []
        for child in node[1]:
            out.extend(_to_dnf(child))
        if len(out) > _DNF_LIMIT:
            raise ValueError(f"WHERE expands past {_DNF_LIMIT} OR branches")
        return out
    # and: cross product of child DNFs
    prod = [[]]
    for child in node[1]:
        nxt = []
        for conj in _to_dnf(child):
            for base in prod:
                nxt.append(base + conj)
        if len(nxt) > _DNF_LIMIT:
            raise ValueError(f"WHERE expands past {_DNF_LIMIT} OR branches")
        prod = nxt
    return prod


def _parse_where(p: _P) -> list:
    """Parse a boolean WHERE and lower to the engine clause list."""
    branches = _to_dnf(_parse_disj(p))
    if len(branches) == 1:
        return branches[0]
    return [["or", branches]]


def parse_sql(sql: str) -> dict:
    """SQL text → plan dict. Raises ValueError with position context on
    anything outside the dialect (the Solr handler does the same via
    Calcite's parse errors)."""
    p = _P(_tokenize(sql))
    p.take("kw", "select")
    distinct = p.accept("kw", "distinct")
    select = [_parse_select_item(p)]
    while p.accept("punct", ","):
        select.append(_parse_select_item(p))
    p.take("kw", "from")
    table = p.take("id")

    where = _parse_where(p) if p.accept("kw", "where") else []
    groupby: List[str] = []
    if p.accept("kw", "group"):
        p.take("kw", "by")
        groupby.append(p.take("id"))
        while p.accept("punct", ","):
            groupby.append(p.take("id"))
    having = []
    if p.accept("kw", "having"):
        having = _parse_conj(p)
    orderby: List[Tuple[str, str]] = []
    if p.accept("kw", "order"):
        p.take("kw", "by")
        while True:
            key = p.take("id")
            if p.accept("kw", "desc"):
                d = "desc"
            else:
                p.accept("kw", "asc")
                d = "asc"
            orderby.append((key, d))
            if not p.accept("punct", ","):
                break
    limit: Optional[int] = None
    if p.accept("kw", "limit"):
        limit = int(p.take("num"))
    if not p.done():
        raise ValueError(
            f"SQL parse error: unexpected trailing {p.toks[p.i]}")

    plan = {"distinct": distinct, "select": select, "table": table,
            "where": where, "groupby": groupby, "having": having,
            "orderby": orderby, "limit": limit}
    _check_plan(plan)
    return plan


def _check_plan(plan: dict) -> None:
    aggs = [s for s in plan["select"] if s["kind"] == "agg"]
    plain = [s for s in plan["select"] if s["kind"] == "col"]
    aliases = [s["alias"] for s in plan["select"]]
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"duplicate output aliases: {aliases}")
    if any(s["kind"] == "star" for s in plan["select"]):
        if (len(plan["select"]) > 1 or plan["groupby"]
                or plan["distinct"]):
            raise ValueError(
                "SELECT * must be the only select item "
                "(no other items, GROUP BY, or DISTINCT)")
    cd = [s for s in aggs if s["fn"] == "count_distinct"]
    if cd and (len(cd) > 1 or len(aggs) > len(cd)):
        raise ValueError(
            "COUNT(DISTINCT col) must be the only aggregate in the "
            "query (the two-phase distinct pipeline stands alone)")
    if plan["distinct"] and aggs:
        raise ValueError("DISTINCT with aggregates is out of dialect")
    if aggs:
        gset = set(plan["groupby"])
        bad = [s["col"] for s in plain if s["col"] not in gset]
        if bad:
            raise ValueError(
                f"non-aggregated columns {bad} must appear in GROUP BY")
    elif plan["groupby"]:
        raise ValueError("GROUP BY without aggregates (use DISTINCT)")
    if plan["having"] and not aggs:
        raise ValueError("HAVING requires aggregates")
    agg_aliases = {s["alias"] for s in aggs}
    avg_aliases = {s["alias"] for s in aggs if s["fn"] == "avg"}
    for h in plan["having"]:
        if h[0] not in agg_aliases:
            raise ValueError(
                f"HAVING references {h[0]!r}, not an aggregate alias")
        if h[0] in avg_aliases:
            raise ValueError(
                "HAVING on an AVG alias is out of dialect "
                "(filter on a SUM/COUNT alias instead)")


def _bind_literals(plan: dict, schema: pa.Schema) -> dict:
    """Coerce WHERE literals against the parquet schema (the Calcite
    type-binding step): date/datetime strings on timestamp columns
    become datetimes so Arrow kernels compare natively."""
    from datetime import datetime

    def coerce(col: str, val):
        idx = schema.get_field_index(col)
        if idx < 0:
            raise ValueError(f"unknown column {col!r} in WHERE")
        typ = schema.field(idx).type
        if pa.types.is_timestamp(typ) and isinstance(val, str):
            fmt = "%Y-%m-%d %H:%M:%S" if " " in val else "%Y-%m-%d"
            return datetime.strptime(val, fmt)
        return val

    def bind_triple(t):
        c, op, val = t
        return [c, op, [coerce(c, v) for v in val] if op == "in"
                else coerce(c, val)]

    out = dict(plan)
    out["where"] = [
        ["or", [[bind_triple(t) for t in conj] for conj in w[1]]]
        if (len(w) == 2 and w[0] == "or") else bind_triple(w)
        for w in plan["where"]]
    return out


def _run_count_distinct(sf_dir: str, plan: dict, cd: dict):
    """COUNT(DISTINCT col): two-phase — distinct (keys, col) pairs via
    the engine's native groupby, then a count per key group (the Solr
    map_reduce 'unique' metric shape). NULL col values are excluded
    (SQL COUNT(DISTINCT) semantics)."""
    import ray.data
    from ray.data.aggregate import Count

    from .streams import run_expr_dataset

    col = cd["col"]
    keys = list(plan["groupby"])
    inner_keys = keys + ([col] if col not in keys else [])
    spec = {"table": plan["table"], "where": plan["where"],
            "groupby": inner_keys, "aggs": {"__dn": ["count"]}}
    inner = run_expr_dataset(sf_dir, spec)

    def drop_null(batch: pa.Table) -> pa.Table:
        return batch.select(inner_keys).filter(pc.is_valid(batch[col]))

    distinct = inner.map_batches(drop_null, batch_format="pyarrow")

    if keys:
        counted = distinct.groupby(keys).aggregate(
            Count(col, ignore_nulls=False))

        def rename(batch: pa.Table) -> pa.Table:
            cols = {}
            for s in plan["select"]:
                if s["kind"] == "col":
                    cols[s["alias"]] = batch[s["col"]]
                else:
                    cols[s["alias"]] = pc.cast(
                        batch[f"count({col})"], pa.int64())
            return pa.table(cols)

        ds = counted.map_batches(rename, batch_format="pyarrow")
    else:
        n = distinct.count()
        ds = ray.data.from_arrow(pa.table(
            {cd["alias"]: pa.array([int(n)], type=pa.int64())}))

    for key, op, val in plan["having"]:
        from .streams import _WHERE_OPS

        def post(batch: pa.Table, key=key, op=op, val=val) -> pa.Table:
            return batch.filter(_WHERE_OPS[op](batch[key], val))

        ds = ds.map_batches(post, batch_format="pyarrow")
    if plan["orderby"]:
        ds = ds.sort([k for k, _ in plan["orderby"]],
                     descending=[d != "asc" for _, d in plan["orderby"]])
    if plan["limit"] is not None:
        ds = ds.limit(int(plan["limit"]))
    return ds


def sql_query(sf_dir: str, sql: str):
    """End-to-end /sql: parse → bind → table-expression engine → final
    SELECT-list projection. Returns a Ray Dataset (lazy, streaming)."""
    import pyarrow.parquet as pq
    import ray.data

    from .streams import run_expr_dataset

    plan = parse_sql(sql)
    path = os.path.join(sf_dir, f"{plan['table']}.parquet")
    schema = pq.read_schema(path)
    plan = _bind_literals(plan, schema)

    if any(s["kind"] == "star" for s in plan["select"]):
        # SELECT * expands against the parquet schema at bind time
        plan = dict(plan, select=[
            {"kind": "col", "col": n, "alias": n} for n in schema.names])

    aggs = [s for s in plan["select"] if s["kind"] == "agg"]
    plain = [s for s in plan["select"] if s["kind"] == "col"]

    cd = next((s for s in aggs if s["fn"] == "count_distinct"), None)
    if cd is not None:
        return _run_count_distinct(sf_dir, plan, cd)

    spec: dict = {"table": plan["table"], "where": plan["where"]}
    post_avg: dict = {}   # alias -> (sum_name, n_name)
    post_counts: List[str] = []  # extra COUNT(*) aliases (copy of first)
    count_name: Optional[str] = None
    int_casts: List[str] = []

    if plan["distinct"]:
        # DISTINCT = groupby over the select list with a dropped count
        # (two-phase native distinct — same engine path JSON facet
        # unique uses)
        spec["groupby"] = [s["col"] for s in plain]
        spec["aggs"] = {"__dn": ["count"]}
    elif aggs:
        spec["groupby"] = list(plan["groupby"])
        sa: dict = {}
        # collapse every COUNT(*) (explicit or an AVG denominator) onto
        # ONE engine count agg — the engine names count outputs by their
        # anchor column, so two counts would collide
        count_aliases = [s["alias"] for s in aggs if s["fn"] == "count"]
        count_name = count_aliases[0] if count_aliases else (
            "__n" if any(s["fn"] == "avg" for s in aggs) else None)
        if count_name is not None:
            sa[count_name] = ["count"]
        post_counts.extend(count_aliases[1:])  # extra COUNT(*): copied
        for s in aggs:
            if s["fn"] == "count":
                continue
            if s["fn"] == "avg":
                # exact integer partials; one final double division
                sa[f"__s_{s['alias']}"] = ["sum", s["col"]]
                post_avg[s["alias"]] = (f"__s_{s['alias']}", count_name)
            else:
                sa[s["alias"]] = [s["fn"], s["col"]]
                idx = schema.get_field_index(s["col"])
                if idx >= 0 and pa.types.is_integer(schema.field(idx).type):
                    int_casts.append(s["alias"])
        spec["aggs"] = sa
        # avg aliases are rejected at parse time; duplicate-count
        # aliases remap onto the single engine count column
        spec["having"] = [
            [count_name if key in post_counts else key, op, val]
            for key, op, val in plan["having"]]
    else:
        cols = [s["col"] for s in plain]
        for key, _ in plan["orderby"]:
            src = next((s["col"] for s in plain if s["alias"] == key), key)
            if src not in cols:
                cols.append(src)
        spec["columns"] = cols

    # sort inside the engine when the keys are engine-output names
    # (pre-projection); plain-path sorts run on source columns
    alias_to_src = {s["alias"]: s["col"] for s in plain}
    if plan["orderby"]:
        if aggs or plan["distinct"]:
            # engine output names: group cols + agg aliases (avg sorts
            # post-projection — rare; handled below)
            engine_sort = [(k, d) for k, d in plan["orderby"]
                           if k not in post_avg]
            engine_sort = [
                (count_name if k in post_counts else alias_to_src.get(k, k),
                 d)
                for k, d in engine_sort]
            if len(engine_sort) == len(plan["orderby"]):
                spec["sort"] = engine_sort
        else:
            spec["sort"] = [(alias_to_src.get(k, k), d)
                            for k, d in plan["orderby"]]
    if plan["limit"] is not None and "sort" in spec:
        spec["limit"] = plan["limit"]

    ds = run_expr_dataset(sf_dir, spec)

    group_src = {s["alias"]: s["col"] for s in plain}

    def project(batch: pa.Table) -> pa.Table:
        cols = {}
        for s in plan["select"]:
            name = s["alias"]
            if s["kind"] == "col":
                cols[name] = batch[group_src[name]]
            elif name in post_counts:
                cols[name] = batch[count_name]
            elif name in post_avg:
                sn, nn = post_avg[name]
                sv = batch[sn].to_numpy(zero_copy_only=False).astype(
                    np.float64)
                nv = batch[nn].to_numpy(zero_copy_only=False).astype(
                    np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cols[name] = pa.array(sv / nv, type=pa.float64())
            else:
                arr = batch[name]
                if name in int_casts:
                    arr = pc.cast(arr, pa.int64())
                cols[name] = arr
        return pa.table(cols)

    ds = ds.map_batches(project, batch_format="pyarrow")
    # NOTE: a fully-filtered result comes back with zero blocks and NO
    # schema (Ray 2.49 drops empty blocks even from from_arrow), so an
    # empty /sql result has no column metadata — pinned in tests

    if plan["orderby"] and "sort" not in spec:
        # avg-keyed (or mixed) sorts run after projection
        ds = ds.sort([k for k, _ in plan["orderby"]],
                     descending=[d != "asc" for _, d in plan["orderby"]])
    if plan["limit"] is not None and spec.get("limit") is None:
        ds = ds.limit(int(plan["limit"]))
    return ds
