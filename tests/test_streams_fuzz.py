"""Property-based checks for the new §2.8/§2.9 modules:

- random table-expression specs → run_expr_arrow must agree with DuckDB
  running the equivalent SQL on the same parquet (the oracle relation,
  fuzzed instead of hand-written);
- random list columns → evaluator kernels (asc/desc/rev/valueAt/
  reductions) must agree with a per-row Python reference.
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_solr_ray.functions.evaluators import compile_evaluator
from lucene_solr_ray.functions.streams import run_expr_arrow

FUZZ = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

KS = ["a", "b", "c", "d"]


@pytest.fixture(scope="module")
def expr_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("exprfuzz")
    rng = np.random.default_rng(7)
    n = 300
    pq.write_table(
        pa.table({
            "k": rng.choice(KS, n).tolist(),
            "g": rng.integers(0, 3, n),
            "v": np.round(rng.uniform(0, 2000, n), 2),
        }),
        os.path.join(d, "t.parquet"),
    )
    return str(d)


where_st = st.lists(
    st.tuples(
        st.sampled_from(["k", "g", "v"]),
        st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
        st.none(),
    ),
    min_size=0,
    max_size=2,
)


def _where_sql(w):
    col, op, _ = w
    val = {"k": "'b'", "g": "1", "v": "900.0"}[col]
    sqlop = "=" if op == "==" else op
    return f"{col} {sqlop} {val}", [col, op,
                                    {"k": "b", "g": 1, "v": 900.0}[col]]


@FUZZ
@given(wh=where_st, grouped=st.booleans())
def test_expr_arrow_matches_duckdb(expr_dir, wh, grouped):
    sql_w, spec_w = [], []
    for w in wh:
        s, sp = _where_sql(w)
        sql_w.append(s)
        spec_w.append(sp)
    spec = {
        "table": "t",
        "where": spec_w,
        "aggs": {"n": ["count"], "s": ["sum_cents", "v"]},
    }
    sel = "count(*) AS n, CAST(sum(CAST(FLOOR(v*100.0+0.5) AS BIGINT)) AS BIGINT) AS s"
    q = f"SELECT {sel} FROM t"
    if grouped:
        spec["groupby"] = ["k"]
        spec["sort"] = [["k", "asc"]]
        q = f"SELECT k, {sel} FROM t"
    if sql_w:
        q += " WHERE " + " AND ".join(sql_w)
    if grouped:
        q += " GROUP BY k ORDER BY k"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT * FROM '{expr_dir}/t.parquet'")
    ref = con.execute(q).fetch_arrow_table()
    got = run_expr_arrow(expr_dir, spec)
    # duckdb sum() of BIGINT is HUGEINT; normalize then compare values
    ref = pa.table({c: pa.compute.cast(ref[c], got[c].type)
                    for c in got.column_names})
    if not grouped and got["n"][0].as_py() == 0:
        # SQL sum over zero rows is NULL; ours is 0 by contract
        assert ref["s"][0].as_py() is None and got["s"][0].as_py() == 0
        return
    assert got.equals(ref), (q, spec)


lists_st = st.lists(
    st.lists(st.integers(min_value=-50, max_value=50), max_size=6),
    min_size=1,
    max_size=20,
)


@FUZZ
@given(rows=lists_st, i=st.integers(min_value=-3, max_value=3))
def test_evaluator_kernels_match_python(rows, i):
    b = pa.table({"xs": pa.array([[float(v) for v in r] for r in rows],
                                 type=pa.list_(pa.float64()))})
    assert compile_evaluator(["asc", "xs"])(b).to_pylist() == \
        [sorted(r) for r in b["xs"].to_pylist()]
    assert compile_evaluator(["desc", "xs"])(b).to_pylist() == \
        [sorted(r, reverse=True) for r in b["xs"].to_pylist()]
    assert compile_evaluator(["rev", "xs"])(b).to_pylist() == \
        [r[::-1] for r in b["xs"].to_pylist()]
    got = compile_evaluator(["valueAt", "xs", i])(b).to_pylist()
    for g, r in zip(got, b["xs"].to_pylist()):
        want = None
        if (0 <= i < len(r)) or (i < 0 and -i <= len(r)):
            want = r[i]
        assert g == want
    for name, ref in [("sumArray", sum), ("minArray", min),
                      ("maxArray", max)]:
        got = compile_evaluator([name, "xs"])(b).to_pylist()
        for g, r in zip(got, b["xs"].to_pylist()):
            if r:
                assert g == pytest.approx(ref(r))
            else:
                assert np.isnan(g)


@FUZZ
@given(rows=st.lists(
    st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
             max_size=5),
    min_size=1, max_size=15))
def test_evaluator_string_sort_matches_python(rows):
    b = pa.table({"s": pa.array(rows, type=pa.list_(pa.string()))})
    assert compile_evaluator(["asc", "s"])(b).to_pylist() == \
        [sorted(r) for r in rows]
    assert compile_evaluator(["desc", "s"])(b).to_pylist() == \
        [sorted(r, reverse=True) for r in rows]
