"""eval()/executor() stream analogs (functions/streams.py; SURVEY.md
§2.8 — [8x] solr/solrj/.../io/stream/{EvalStream,ExecutorStream}.java).
The two runners (pyarrow pushdown vs full Dataset engine) must agree
bit-exactly; the contract twins are executor_stream_orders /
eval_stream_orders in the sweep."""
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.functions.streams import (
    eval_stream,
    executor_stream,
    run_expr_arrow,
    run_expr_dataset,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("streams")
    pq.write_table(
        pa.table({
            "k": ["a", "a", "b", "b", "c"],
            "v": [1.005, 2.0, 3.5, None, 5.0],
        }),
        os.path.join(d, "t.parquet"),
    )
    return str(d)


def test_runner_parity_global(ray_session):
    spec = {
        "table": "orders",
        "where": [["o_orderpriority", "==", "1-URGENT"]],
        "aggs": {"n": ["count"],
                 "sum_price_c": ["sum_cents", "o_totalprice"],
                 "max_price_c": ["max_cents", "o_totalprice"],
                 "min_price_c": ["min_cents", "o_totalprice"]},
    }
    a = run_expr_arrow(SF, spec).to_pandas()
    d = run_expr_dataset(SF, spec).to_pandas()
    assert a.equals(d)
    assert a["n"][0] > 0


def test_runner_parity_grouped(ray_session):
    spec = {
        "table": "orders",
        "where": [["o_totalprice", ">", 100000.0]],
        "groupby": ["o_orderstatus"],
        "aggs": {"n": ["count"], "sum_price_c": ["sum_cents", "o_totalprice"]},
        "sort": [["o_orderstatus", "asc"]],
        "limit": 10,
    }
    a = run_expr_arrow(SF, spec).to_pandas()
    d = run_expr_dataset(SF, spec).to_pandas()
    assert a.equals(d)


def test_runner_parity_having(ray_session):
    # HavingStream analog: post-aggregate filter on agg OUTPUT columns,
    # bit-identical across both runners and verified against duckdb
    spec = {
        "table": "orders",
        "groupby": ["o_orderstatus"],
        "aggs": {"n": ["count"], "sum_price_c": ["sum_cents", "o_totalprice"]},
        "having": [["n", ">=", 100]],
        "sort": [["o_orderstatus", "asc"]],
    }
    a = run_expr_arrow(SF, spec).to_pandas()
    d = run_expr_dataset(SF, spec).to_pandas()
    assert a.equals(d)
    import duckdb

    ref = duckdb.sql(f"""
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_c
        FROM read_parquet('{SF}/orders.parquet')
        GROUP BY o_orderstatus HAVING count(*) >= 100
        ORDER BY o_orderstatus
    """).df()
    assert a.equals(ref)
    assert len(a) > 0


def test_having_requires_aggs():
    import pytest as _pt

    with _pt.raises(ValueError):
        run_expr_arrow(SF, {"table": "orders", "having": [["n", ">", 1]]})


def test_count_counts_null_rows(ray_session, fixture_dir):
    """count = row count (Ray Count ignore_nulls=False parity), even when
    the anchor column holds nulls."""
    spec = {"table": "t", "groupby": ["k"], "aggs": {"n": ["count"]},
            "sort": [["k", "asc"]]}
    a = run_expr_arrow(fixture_dir, spec)
    d = run_expr_dataset(fixture_dir, spec).to_pandas()
    # the v-null row in group "b" still counts (row count, not valid count)
    by = dict(zip(a["k"].to_pylist(), a["n"].to_pylist()))
    assert by["a"] == 2 and by["b"] == 2 and by["c"] == 1
    assert a.to_pandas().equals(d)


def test_cents_floor_convention(fixture_dir):
    """floor(x*100+0.5) on float64 — 1.005 is 1.00499999999999989, so
    BOTH the engine and DuckDB's FLOOR(v*100.0+0.5) land on 100 cents;
    the convention pins identical float semantics, not decimal ones."""
    spec = {"table": "t", "where": [["k", "==", "a"]],
            "aggs": {"s": ["sum_cents", "v"]}}
    out = run_expr_arrow(fixture_dir, spec)
    assert out["s"][0].as_py() == 100 + 200
    import duckdb
    sq = duckdb.sql(
        "SELECT CAST(sum(CAST(FLOOR(v*100.0+0.5) AS BIGINT)) AS BIGINT) "
        "FROM (VALUES (1.005::DOUBLE), (2.0::DOUBLE)) t(v)").fetchone()[0]
    assert out["s"][0].as_py() == sq


def test_eval_takes_first_tuple_only(ray_session):
    import ray.data

    spec1 = {"table": "orders", "aggs": {"n": ["count"]}}
    spec2 = {"table": "orders", "aggs": {"bogus": ["count"]}}
    meta = ray.data.from_items(
        [{"expr_s": json.dumps(spec1)}, {"expr_s": json.dumps(spec2)}])
    out = eval_stream(meta, SF).to_pandas()
    assert list(out.columns) == ["n"] and out["n"][0] > 0
    with pytest.raises(ValueError, match="empty"):
        eval_stream(ray.data.from_items([{"expr_s": "x"}]).limit(0), SF)


def test_executor_tags_and_parallel_results(ray_session):
    import ray.data

    metas = [{"id": i, "expr_s": json.dumps({
        "table": "orders",
        "where": [["o_orderstatus", "==", s]],
        "aggs": {"n": ["count"]},
    })} for i, s in enumerate(["F", "O", "P"])]
    out = (executor_stream(ray.data.from_items(metas), SF, concurrency=2)
           .to_pandas().sort_values("expr_id").reset_index(drop=True))
    assert list(out["expr_id"]) == [0, 1, 2]
    direct = [run_expr_arrow(SF, json.loads(m["expr_s"]))["n"][0].as_py()
              for m in metas]
    assert list(out["n"]) == direct


def test_bad_specs_raise():
    with pytest.raises(ValueError, match="bad where"):
        run_expr_arrow(SF, {"table": "orders", "where": [["a", "~", 1]]})
    with pytest.raises(ValueError, match="unknown agg"):
        run_expr_arrow(SF, {"table": "orders", "aggs": {"x": ["median", "v"]}})
    with pytest.raises(ValueError, match="bad table expression"):
        run_expr_arrow(SF, ["not", "a", "dict"])


def test_runner_parity_new_where_ops(ray_session):
    """in / like / is_null / not_null and the DNF or-clause must agree
    bit-exactly across the pushdown-pyarrow and full-Dataset runners
    (the /sql planner lowers onto these)."""
    specs = [
        {"table": "orders",
         "where": [["o_orderpriority", "in", ["1-URGENT", "2-HIGH"]]],
         "aggs": {"n": ["count"]}},
        {"table": "orders",
         "where": [["o_orderpriority", "like", "%URG%"]],
         "aggs": {"n": ["count"]}},
        {"table": "orders",
         "where": [["o_orderstatus", "not_null", None],
                   ["o_totalprice", ">", 100000.0]],
         "aggs": {"n": ["count"]}},
        {"table": "orders",
         "where": [["or", [
             [["o_orderstatus", "==", "F"],
              ["o_totalprice", ">", 150000.0]],
             [["o_orderpriority", "like", "%LOW%"]],
         ]]],
         "groupby": ["o_orderstatus"],
         "aggs": {"n": ["count"]},
         "sort": [["o_orderstatus", "asc"]]},
    ]
    for spec in specs:
        a = run_expr_arrow(SF, spec).to_pandas()
        d = run_expr_dataset(SF, spec).to_pandas()
        assert a.equals(d), spec
        assert a["n"].sum() > 0, spec
