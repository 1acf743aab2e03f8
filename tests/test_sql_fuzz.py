"""Generative /sql parser fuzz (functions/sql.py): random plan shapes →
rendered SQL text → parse_sql → the parse must reproduce the intended
structure; a sampled subset also executes vs DuckDB on a small fixture.
Complements test_sql.py's fixed cases — this sweeps the grammar corners
(alias/no-alias, keyword case, paren nesting, BETWEEN inside OR,
IN-list sizes, LIMIT presence)."""
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from lucene_solr_ray.functions.sql import parse_sql, sql_query

COLS = ["a", "b", "c"]

# type-aware literals: a is int64, b float64, c string — mixed-type
# IN lists / comparisons are invalid SQL on BOTH engines, so the
# generator never draws them
_LIT_BY_COL = {
    "a": st.integers(-100, 100),
    "b": st.one_of(st.integers(-15, 15),
                   st.floats(-15, 15, allow_nan=False).map(
                       lambda f: round(f, 2))),
    "c": st.sampled_from(["x", "y", "o'k", "abc"]),
}


def _render_lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _cmp_pred(col):
    return st.tuples(
        st.just(col),
        st.sampled_from(["=", "<>", "!=", "<", "<=", ">", ">="]),
        _LIT_BY_COL[col])


def _in_pred(col):
    return st.tuples(st.just(col), st.just("in"),
                     st.lists(_LIT_BY_COL[col], min_size=1, max_size=4))


pred = st.one_of(
    st.sampled_from(COLS).flatmap(_cmp_pred),
    st.sampled_from(COLS).flatmap(_in_pred),
    st.tuples(st.just("c"), st.just("like"),
              st.sampled_from(["%x%", "a_c", "%o''k"])),
    st.tuples(st.sampled_from(["a", "b"]), st.just("between"),
              st.tuples(st.integers(-10, 10), st.integers(-10, 10))),
    st.tuples(st.sampled_from(COLS), st.just("null"),
              st.booleans()),
)


def _render_pred(p):
    col, op, v = p
    if op == "in":
        return f"{col} IN ({', '.join(_render_lit(x) for x in v)})"
    if op == "like":
        return f"{col} LIKE '{v}'"
    if op == "between":
        return f"{col} BETWEEN {v[0]} AND {v[1]}"
    if op == "null":
        return f"{col} IS {'NOT ' if v else ''}NULL"
    return f"{col} {op} {_render_lit(v)}"


# boolean tree: leaves are preds, inner nodes AND/OR with parens
bool_tree = st.recursive(
    pred.map(lambda p: ("leaf", p)),
    lambda kids: st.tuples(st.sampled_from(["and", "or"]),
                           st.lists(kids, min_size=2, max_size=3)),
    max_leaves=6,
)


def _render_tree(t):
    if t[0] == "leaf":
        return _render_pred(t[1])
    op = f" {t[0].upper()} "
    return "(" + op.join(_render_tree(k) for k in t[1]) + ")"


@given(tree=bool_tree,
       sel=st.lists(st.sampled_from(COLS), min_size=1, max_size=3,
                    unique=True),
       limit=st.one_of(st.none(), st.integers(0, 50)))
@settings(max_examples=120, deadline=None)
def test_parse_roundtrip_never_crashes(tree, sel, limit):
    sql = (f"SELECT {', '.join(sel)} FROM t WHERE {_render_tree(tree)} "
           f"ORDER BY {sel[0]}")
    if limit is not None:
        sql += f" LIMIT {limit}"
    plan = parse_sql(sql)
    assert plan["table"] == "t"
    assert [s["alias"] for s in plan["select"]] == sel
    assert plan["limit"] == limit
    # every clause is a triple or a DNF or-clause of triples
    for w in plan["where"]:
        if len(w) == 2:
            assert w[0] == "or"
            for conj in w[1]:
                assert all(len(tr) == 3 for tr in conj)
        else:
            assert len(w) == 3


@pytest.fixture(scope="module")
def fuzz_table(tmp_path_factory):
    d = tmp_path_factory.mktemp("sqlfuzz")
    n = 300
    tab = pa.table({
        "a": pa.array([i % 21 - 10 for i in range(n)], type=pa.int64()),
        "b": pa.array([round((i % 17 - 8) * 1.5, 2) for i in range(n)]),
        "c": pa.array([None if i % 11 == 0 else ["x", "y", "o'k", "abc"][i % 4]
                       for i in range(n)]),
    })
    pq.write_table(tab, str(d / "t.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM "
                f"read_parquet('{d}/t.parquet')")
    return str(d), con


@given(tree=bool_tree)
@settings(max_examples=40, deadline=None)
def test_execute_matches_duckdb(ray_session, fuzz_table, tree):
    d, con = fuzz_table
    sql = (f"SELECT a, b, c FROM t WHERE {_render_tree(tree)} "
           f"ORDER BY a, b, c")
    mine = sql_query(d, sql).to_pandas().reset_index(drop=True)
    want = con.execute(sql).fetchdf().reset_index(drop=True)
    if len(want) == 0:
        assert len(mine) == 0
        return
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
