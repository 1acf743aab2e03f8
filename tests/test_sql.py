"""/sql handler analog (functions/sql.py; SURVEY.md §2.8 — [8x]
solr/core/src/java/org/apache/solr/handler/sql/, the Calcite planner
behind Solr 8's Parallel SQL). Parser units + end-to-end equality vs
DuckDB on the shared testdata + a randomized WHERE/GROUP BY fuzz."""
import duckdb
import pandas as pd
import pytest

from lucene_solr_ray.functions.sql import parse_sql, sql_query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["orders", "lineitem", "events", "customer", "part"]:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')")
    return c


def _check(ray_session, con, mine_sql, oracle_sql=None):
    mine = sql_query(SF, mine_sql).to_pandas().reset_index(drop=True)
    want = con.execute(oracle_sql or mine_sql).fetchdf().reset_index(
        drop=True)
    if len(want) == 0:
        # Ray 2.49 drops empty blocks, so a zero-row result carries no
        # column metadata (documented in sql_query) — rows-only compare
        assert len(mine) == 0
        return mine
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    return mine


# ---------------------------------------------------------------- parser

def test_parse_basic():
    p = parse_sql(
        "SELECT a, b AS bb, COUNT(*) AS n, SUM(x) AS s FROM t "
        "WHERE a = 'x' AND x > 3 GROUP BY a, b "
        "HAVING n >= 2 ORDER BY n DESC, a LIMIT 7;")
    assert p["table"] == "t"
    assert [s["alias"] for s in p["select"]] == ["a", "bb", "n", "s"]
    assert p["where"] == [["a", "==", "x"], ["x", ">", 3]]
    assert p["groupby"] == ["a", "b"]
    assert p["having"] == [["n", ">=", 2]]
    assert p["orderby"] == [("n", "desc"), ("a", "asc")]
    assert p["limit"] == 7


def test_parse_in_like_and_escapes():
    p = parse_sql("SELECT a FROM t WHERE a IN ('x', 'y''z') "
                  "AND b LIKE '%o_o%' AND c <> 4.5")
    assert p["where"][0] == ["a", "in", ["x", "y'z"]]
    assert p["where"][1] == ["b", "like", "%o_o%"]
    assert p["where"][2] == ["c", "!=", 4.5]


def test_parse_keywords_case_insensitive():
    p = parse_sql("select A from T order by A desc limit 1")
    assert p["table"] == "T" and p["orderby"] == [("A", "desc")]


def test_parse_or_dnf():
    p = parse_sql("SELECT a FROM t WHERE a = 1 OR b = 2")
    assert p["where"] == [["or", [[["a", "==", 1]], [["b", "==", 2]]]]]
    # AND binds tighter: (a AND b) OR c
    p = parse_sql("SELECT a FROM t WHERE a = 1 AND b = 2 OR c = 3")
    assert p["where"] == [["or", [[["a", "==", 1], ["b", "==", 2]],
                                  [["c", "==", 3]]]]]
    # parens force the other grouping → a AND (b OR c) = DNF of 2
    p = parse_sql("SELECT a FROM t WHERE a = 1 AND (b = 2 OR c = 3)")
    assert p["where"] == [["or", [[["a", "==", 1], ["b", "==", 2]],
                                  [["a", "==", 1], ["c", "==", 3]]]]]
    # pure conjunction stays a flat AND list
    p = parse_sql("SELECT a FROM t WHERE (a = 1) AND b = 2")
    assert p["where"] == [["a", "==", 1], ["b", "==", 2]]


def test_parse_star_and_count_distinct():
    p = parse_sql("SELECT * FROM t WHERE a > 1")
    assert p["select"] == [{"kind": "star", "alias": "*"}]
    p = parse_sql("SELECT k, COUNT(DISTINCT u) AS uu FROM t GROUP BY k")
    assert p["select"][1] == {"kind": "agg", "fn": "count_distinct",
                              "col": "u", "alias": "uu"}


@pytest.mark.parametrize("bad", [
    "SELECT FROM t",                               # no select list
    "SELECT a t",                                  # missing FROM
    "SELECT a FROM t WHERE a ~ 3",                 # unknown operator
    "SELECT a, COUNT(*) AS n FROM t",              # a not grouped
    "SELECT a FROM t GROUP BY a",                  # group w/o aggs
    "SELECT DISTINCT COUNT(*) AS n FROM t",        # distinct + agg
    "SELECT a FROM t HAVING a > 1",                # having w/o aggs
    "SELECT COUNT(*) AS n FROM t HAVING x > 1",    # having non-alias
    "SELECT a AS x, b AS x FROM t",                # duplicate aliases
    "SELECT a FROM t LIMIT 5 extra",               # trailing tokens
    "SELECT AVG(v) AS a FROM t HAVING a > 1",      # having on avg
    "SELECT *, a FROM t",                          # star not alone
    "SELECT DISTINCT * FROM t",                    # distinct star
    "SELECT a FROM t WHERE (a = 1 OR b = 2",       # unbalanced paren
    "SELECT COUNT(DISTINCT a) AS x, COUNT(*) AS n FROM t",  # cd + agg
])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_sql(bad)


# ------------------------------------------------------------ end-to-end

def test_select_where_order_limit(ray_session, con):
    out = _check(
        ray_session, con,
        "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 150000 "
        "ORDER BY o_orderkey LIMIT 20")
    assert list(out.columns) == ["o_orderkey", "o_custkey", "o_orderstatus"]


def test_alias_projection_and_order_on_alias(ray_session, con):
    _check(ray_session, con,
           "SELECT o_orderkey AS k, o_totalprice AS price FROM orders "
           "WHERE o_orderpriority = '1-URGENT' ORDER BY k LIMIT 15")


def test_group_agg_min_max_count(ray_session, con):
    _check(ray_session, con,
           "SELECT event_type, COUNT(*) AS n, MIN(value) AS min_v, "
           "MAX(value) AS max_v FROM events GROUP BY event_type "
           "ORDER BY event_type")


def test_group_avg_int_exact_and_having(ray_session, con):
    _check(
        ray_session, con,
        "SELECT c_mktsegment, COUNT(*) AS n, AVG(c_nationkey) AS avg_nk "
        "FROM customer GROUP BY c_mktsegment HAVING n >= 10 "
        "ORDER BY n DESC, c_mktsegment",
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, "
        "AVG(c_nationkey) AS avg_nk FROM customer GROUP BY c_mktsegment "
        "HAVING COUNT(*) >= 10 ORDER BY n DESC, c_mktsegment")


def test_order_by_avg_alias(ray_session, con):
    _check(
        ray_session, con,
        "SELECT l_returnflag, AVG(l_linenumber) AS avg_ln, COUNT(*) AS n "
        "FROM lineitem GROUP BY l_returnflag ORDER BY avg_ln DESC",
        "SELECT l_returnflag, AVG(l_linenumber) AS avg_ln, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY avg_ln DESC")


def test_in_and_like(ray_session, con):
    _check(ray_session, con,
           "SELECT p_partkey, p_brand FROM part "
           "WHERE p_brand IN ('Brand#1', 'Brand#2') AND p_name LIKE '%s%' "
           "ORDER BY p_partkey LIMIT 50")


def test_distinct(ray_session, con):
    _check(ray_session, con,
           "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem "
           "ORDER BY l_returnflag, l_linestatus")


def test_global_agg_with_timestamp_where(ray_session, con):
    _check(
        ray_session, con,
        "SELECT COUNT(*) AS n, SUM(l_linenumber) AS sum_ln, "
        "MAX(l_quantity) AS max_qty FROM lineitem "
        "WHERE l_shipdate >= '1995-01-01'",
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln, "
        "MAX(l_quantity) AS max_qty FROM lineitem "
        "WHERE l_shipdate >= '1995-01-01'")


def test_empty_result_rows_only(ray_session, con):
    out = _check(ray_session, con,
                 "SELECT o_orderkey FROM orders WHERE o_totalprice < 0 "
                 "ORDER BY o_orderkey")
    assert len(out) == 0


def test_duplicate_count_aliases(ray_session, con):
    _check(
        ray_session, con,
        "SELECT l_linestatus, COUNT(*) AS n1, COUNT(*) AS n2 "
        "FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus",
        "SELECT l_linestatus, CAST(COUNT(*) AS BIGINT) AS n1, "
        "CAST(COUNT(*) AS BIGINT) AS n2 FROM lineitem "
        "GROUP BY l_linestatus ORDER BY l_linestatus")


def test_or_where(ray_session, con):
    _check(ray_session, con,
           "SELECT o_orderkey, o_orderstatus FROM orders "
           "WHERE o_orderstatus = 'F' OR o_totalprice > 200000 "
           "ORDER BY o_orderkey LIMIT 30")
    _check(ray_session, con,
           "SELECT o_orderkey FROM orders "
           "WHERE (o_orderstatus = 'F' AND o_totalprice > 100000) "
           "OR (o_orderstatus = 'O' AND o_totalprice < 50000) "
           "ORDER BY o_orderkey LIMIT 30")


def test_or_with_group_and_pushdown_mix(ray_session, con):
    # IN pushes down, LIKE post-filters — inside one OR clause
    _check(
        ray_session, con,
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE user_id < 200 OR event_type IN ('click') "
        "GROUP BY event_type ORDER BY event_type",
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events "
        "WHERE user_id < 200 OR event_type IN ('click') "
        "GROUP BY event_type ORDER BY event_type")
    _check(ray_session, con,
           "SELECT p_partkey FROM part "
           "WHERE p_type LIKE '%O%' OR p_size > 40 "
           "ORDER BY p_partkey LIMIT 25")


def test_select_star(ray_session, con):
    out = _check(ray_session, con,
                 "SELECT * FROM part WHERE p_partkey <= 5 "
                 "ORDER BY p_partkey")
    assert out.shape[1] >= 5  # full schema expanded


def test_count_distinct_grouped(ray_session, con):
    _check(
        ray_session, con,
        "SELECT event_type, COUNT(DISTINCT user_id) AS uu FROM events "
        "GROUP BY event_type ORDER BY event_type",
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uu "
        "FROM events GROUP BY event_type ORDER BY event_type")


def test_count_distinct_global(ray_session, con):
    _check(
        ray_session, con,
        "SELECT COUNT(DISTINCT o_custkey) AS nc FROM orders "
        "WHERE o_totalprice > 100000",
        "SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nc "
        "FROM orders WHERE o_totalprice > 100000")


def test_count_distinct_having_order(ray_session, con):
    _check(
        ray_session, con,
        "SELECT event_type, COUNT(DISTINCT user_id) AS uu FROM events "
        "GROUP BY event_type HAVING uu >= 1 ORDER BY uu DESC, event_type",
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS uu "
        "FROM events GROUP BY event_type "
        "HAVING COUNT(DISTINCT user_id) >= 1 ORDER BY uu DESC, event_type")


# ------------------------------------------------------------------ fuzz

def test_fuzz_where_group_vs_duckdb(ray_session, con):
    """Randomized conjunction/group shapes over events: every generated
    query must match DuckDB exactly (integer aggregates only)."""
    import random

    rng = random.Random(4242)
    preds = [
        ("event_type", "=", "'click'"), ("event_type", "<>", "'view'"),
        ("user_id", "<", 500), ("user_id", ">=", 100),
        ("event_id", ">", 1000), ("value", "<=", 50.0),
        ("event_type", "IN", "('click', 'purchase')"),
        ("props", "LIKE", "'%a%'"),
    ]
    for trial in range(12):
        chosen = rng.sample(preds, rng.randint(0, 3))
        parts = [f"{c} {op} {v}" for c, op, v in chosen]
        # random AND/OR connectors: standard precedence on both sides,
        # so this fuzzes the DNF lowering against DuckDB's evaluation
        w = ""
        for i, s in enumerate(parts):
            w += s if i == 0 else f" {rng.choice(['AND', 'OR'])} {s}"
        where = f" WHERE {w}" if parts else ""
        if rng.random() < 0.5:
            q = (f"SELECT event_type, COUNT(*) AS n, MIN(user_id) AS lo, "
                 f"MAX(user_id) AS hi FROM events{where} "
                 f"GROUP BY event_type ORDER BY event_type")
            o = (f"SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
                 f"CAST(MIN(user_id) AS BIGINT) AS lo, "
                 f"CAST(MAX(user_id) AS BIGINT) AS hi FROM events{where} "
                 f"GROUP BY event_type ORDER BY event_type")
        else:
            q = (f"SELECT event_id, user_id FROM events{where} "
                 f"ORDER BY event_id LIMIT 40")
            o = q
        _check(ray_session, con, q, o)


def test_between_and_null_preds(ray_session, con):
    _check(ray_session, con,
           "SELECT o_orderkey FROM orders "
           "WHERE o_totalprice BETWEEN 50000 AND 60000 "
           "ORDER BY o_orderkey")
    # BETWEEN inside a disjunction (its inner AND must not leak)
    _check(ray_session, con,
           "SELECT o_orderkey FROM orders "
           "WHERE o_totalprice BETWEEN 50000 AND 55000 "
           "OR o_totalprice > 290000 ORDER BY o_orderkey")
    # IS [NOT] NULL (testdata is null-free: IS NULL empties, NOT NULL
    # keeps everything — both sides agree)
    _check(ray_session, con,
           "SELECT COUNT(*) AS n FROM orders WHERE o_orderstatus IS NULL",
           "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders "
           "WHERE o_orderstatus IS NULL")
    _check(ray_session, con,
           "SELECT COUNT(*) AS n FROM orders "
           "WHERE o_orderstatus IS NOT NULL AND o_totalprice < 60000",
           "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders "
           "WHERE o_orderstatus IS NOT NULL AND o_totalprice < 60000")


def test_null_semantics_on_nullable_fixture(ray_session, tmp_path):
    """Real nulls: engine IS NULL / IS NOT NULL / count-distinct
    null-exclusion vs DuckDB on a fixture with missing values."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    tab = pa.table({
        "k": ["a", "a", "b", "b", "c", "c"],
        "v": pa.array([1, None, 2, None, None, 3], type=pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    c = duckdb.connect()
    c.execute(f"CREATE VIEW t AS SELECT * FROM "
              f"read_parquet('{tmp_path}/t.parquet')")
    for q, o in [
        ("SELECT k FROM t WHERE v IS NULL ORDER BY k", None),
        ("SELECT k, v FROM t WHERE v IS NOT NULL ORDER BY k, v", None),
        ("SELECT COUNT(DISTINCT v) AS dv FROM t",
         "SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS dv FROM t"),
    ]:
        mine = sql_query(str(tmp_path), q).to_pandas().reset_index(drop=True)
        want = c.execute(o or q).fetchdf().reset_index(drop=True)
        pd.testing.assert_frame_equal(mine, want, check_dtype=False)
