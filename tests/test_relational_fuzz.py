"""Property-based checks: the distributed relational operators must agree
with straightforward single-process pandas references on random inputs
(random block splits included — partition count must never change a
result)."""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = ["a", "b", "c"]

rows_st = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(min_value=-5, max_value=5),
        st.sampled_from(["p", "q", "r", "s"]),
    ),
    min_size=1,
    max_size=40,
)

FUZZ = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(rows):
    return pd.DataFrame(
        {
            "k": [r[0] for r in rows],
            "v": [r[1] for r in rows],
            "p": [r[2] for r in rows],
            "id": list(range(len(rows))),
        }
    )


@given(rows=rows_st, n=st.integers(min_value=1, max_value=4),
       blocks=st.integers(min_value=1, max_value=5))
@FUZZ
def test_group_topk_matches_pandas(ray_session, rows, n, blocks):
    from lucene_solr_ray.functions.relational import group_topk

    df = _df(rows)
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    got = (
        group_topk(ds, "k", ["v", "id"], [True, False], n)
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby("k", sort=False)
        .head(n)
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "p", "id"]], ref[["k", "v", "p", "id"]])


@given(rows=rows_st, blocks=st.integers(min_value=1, max_value=5))
@FUZZ
def test_facet_range_matches_numpy(ray_session, rows, blocks):
    from lucene_solr_ray.functions.relational import facet_range

    df = _df(rows)
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    got = facet_range(ds, "v", -4.0, 4.0, 2.0)
    v = df["v"].to_numpy(dtype=np.float64)
    b = np.floor((v + 4.0) / 2.0)
    ref = [int(((b == i) & (v >= -4) & (v < 4)).sum()) for i in range(4)]
    assert list(got["count"]) == ref
    assert list(got["bucket_lo"]) == [-4.0, -2.0, 0.0, 2.0]


@given(rows=rows_st, ta=st.integers(min_value=1, max_value=3),
       tb=st.integers(min_value=1, max_value=3),
       blocks=st.integers(min_value=1, max_value=5))
@FUZZ
def test_facet_pivot_matches_pandas(ray_session, rows, ta, tb, blocks):
    from lucene_solr_ray.functions.relational import facet_pivot

    df = _df(rows)
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    got = facet_pivot(ds, "k", "p", topn_a=ta, topn_b=tb)

    pc = df.groupby(["k", "p"]).size().reset_index(name="count")
    at = (
        pc.groupby("k")["count"].sum().reset_index()
        .sort_values(["count", "k"], ascending=[False, True], kind="mergesort")
    )
    exp = []
    for a in at["k"].head(ta):
        sub = pc[pc["k"] == a].sort_values(
            ["count", "p"], ascending=[False, True], kind="mergesort"
        ).head(tb)
        exp.append(sub)
    ref = pd.concat(exp, ignore_index=True)[["k", "p", "count"]]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref, check_dtype=False
    )


@given(rows=rows_st, blocks=st.integers(min_value=1, max_value=5),
       lim=st.integers(min_value=1, max_value=3))
@FUZZ
def test_json_facet_matches_pandas(ray_session, rows, blocks, lim):
    from lucene_solr_ray.functions.json_facet import json_facet

    df = _df(rows)
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    res = json_facet(
        ds,
        {"by_k": {"type": "terms", "field": "k", "limit": lim,
                   "facet": {"sum_v": "sum(v)"}}},
    )
    assert res["count"] == len(df)
    cnt = df.groupby("k").agg(count=("v", "size"), sum_v=("v", "sum")).reset_index()
    cnt = cnt.sort_values(["count", "k"], ascending=[False, True],
                          kind="mergesort").head(lim)
    got = res["by_k"]["buckets"]
    assert [b["val"] for b in got] == list(cnt["k"])
    assert [b["count"] for b in got] == list(cnt["count"])
    assert [b["sum_v"] for b in got] == [float(x) for x in cnt["sum_v"]]


@given(vals=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                     min_size=1, max_size=60),
       blocks=st.integers(min_value=1, max_value=5))
@FUZZ
def test_exact_quantiles_matches_quantile_disc(ray_session, vals, blocks):
    from lucene_solr_ray.functions.quantiles import exact_quantiles

    df = pd.DataFrame({"v": vals})
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    qs = [0.01, 0.25, 0.5, 0.9, 1.0]
    got = exact_quantiles(ds, "v", qs)
    srt = sorted(vals)
    for q in qs:
        target = max(int(np.ceil(q * len(vals))), 1)
        assert got[q] == srt[target - 1], (q, got[q], srt)


@given(
    left=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=0, max_value=100)),
        min_size=1, max_size=40),
    right=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=0, max_value=100),
                  st.integers(min_value=-5, max_value=5)),
        min_size=0, max_size=40),
    blocks=st.integers(min_value=1, max_value=5),
)
@FUZZ
def test_asof_join_matches_merge_asof(ray_session, left, right, blocks):
    from lucene_solr_ray.functions.relational import asof_join

    ldf = pd.DataFrame({"k": [r[0] for r in left],
                        "ts": [np.int64(r[1]) for r in left],
                        "lid": np.arange(len(left), dtype=np.int64)})
    rdf = pd.DataFrame({"k": pd.Series([r[0] for r in right], dtype=np.int64),
                        "ts": pd.Series([r[1] for r in right], dtype=np.int64),
                        "rv": pd.Series([r[2] for r in right], dtype=np.int64)})
    # dedup right on (k, ts): merge_asof keeps the LAST row of a tie group,
    # which depends on input order — pin the reference by keeping max rv
    rdf = (rdf.sort_values(["k", "ts", "rv"], kind="mergesort")
              .groupby(["k", "ts"], sort=False).tail(1).reset_index(drop=True))

    lds = ray.data.from_pandas(ldf, override_num_blocks=blocks)
    rds = ray.data.from_pandas(rdf, override_num_blocks=blocks)
    got = (asof_join(lds, rds, key="k", ts_col="ts", right_cols=["rv"])
           .to_pandas().sort_values("lid").reset_index(drop=True))

    ref = pd.merge_asof(
        ldf.sort_values("ts", kind="mergesort"),
        rdf.sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    assert len(got) == len(ref)
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), ref["rv"].astype("float64"), check_names=False
    )
    assert got["lid"].dtype == np.int64 and got["ts"].dtype == np.int64


@given(
    rows=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4),
                  st.integers(min_value=0, max_value=200)),
        min_size=1, max_size=60),
    gap=st.integers(min_value=1, max_value=50),
    blocks=st.integers(min_value=1, max_value=5),
)
@FUZZ
def test_session_windows_matches_loop(ray_session, rows, gap, blocks):
    from lucene_solr_ray.functions.relational import session_windows

    df = pd.DataFrame({"k": pd.Series([r[0] for r in rows], dtype=np.int64),
                       "ts": pd.Series([r[1] for r in rows], dtype=np.int64)})
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    got = (session_windows(ds, key="k", ts_col="ts", gap_us=gap)
           .to_pandas()
           .sort_values(["k", "session_start"]).reset_index(drop=True))

    # independent slow reference: per-key python loop over sorted timestamps
    exp = []
    for k, sub in df.groupby("k"):
        ts = sorted(sub["ts"])
        start, prev, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - prev > gap:
                exp.append((k, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        exp.append((k, start, prev, n))
    ref = (pd.DataFrame(exp, columns=["k", "session_start", "session_end", "n_events"])
           .astype({"k": np.int64, "session_start": np.int64,
                    "session_end": np.int64, "n_events": np.int64})
           .sort_values(["k", "session_start"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[ref.columns], ref)


@given(
    vals=st.lists(st.integers(min_value=-20, max_value=120), min_size=1, max_size=50),
    ivals=st.lists(
        st.tuples(st.integers(min_value=-20, max_value=120),
                  st.integers(min_value=0, max_value=40)),
        min_size=0, max_size=20),
    width=st.integers(min_value=1, max_value=25),
    blocks=st.integers(min_value=1, max_value=5),
)
@FUZZ
def test_range_join_matches_cross_filter(ray_session, vals, ivals, width, blocks):
    from lucene_solr_ray.functions.relational import range_join

    ldf = pd.DataFrame({"v": pd.Series(vals, dtype=np.int64),
                        "lid": np.arange(len(vals), dtype=np.int64)})
    rdf = pd.DataFrame({"lo": pd.Series([a for a, _ in ivals], dtype=np.int64),
                        "hi": pd.Series([a + w for a, w in ivals], dtype=np.int64),
                        "rid": np.arange(len(ivals), dtype=np.int64)})
    lds = ray.data.from_pandas(ldf, override_num_blocks=blocks)
    rds = ray.data.from_pandas(rdf, override_num_blocks=blocks)
    got = range_join(lds, "v", rds, "lo", "hi",
                     left_cols=["lid"], right_cols=["rid"],
                     bucket_width=width).to_pandas()

    # brute-force reference: full cross product, filter lo <= v < hi
    ref = (ldf.merge(rdf, how="cross")
           .query("lo <= v < hi")[["lid", "rid"]]
           .sort_values(["lid", "rid"]).reset_index(drop=True))
    assert len(got) == len(ref)
    if len(ref):
        got = got.sort_values(["lid", "rid"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["lid", "rid"]].astype(np.int64), ref)


def test_bucketed_agg_matches_pandas(ray_session):
    """bucketed_agg (combiner + bucket-grouped pyarrow merge) must equal a
    pandas groupby bit-for-bit across fns, key types, and null values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.relational import bucketed_agg

    rng = np.random.default_rng(23)
    n = 20_000
    df = pd.DataFrame({
        "k1": rng.integers(0, 5_000, n),            # high cardinality
        "k2": rng.choice(["x", "y", "z"], n),
        "v": rng.integers(-100, 100, n).astype("int64"),
    })
    # sprinkle nulls into v (sum/min/max ignore nulls; count counts rows)
    vnull = df["v"].astype("Int64")
    vnull[rng.choice(n, 500, replace=False)] = pd.NA
    t = pa.table({"k1": df.k1, "k2": df.k2, "v": pa.array(vnull, type=pa.int64())})
    ds = ray.data.from_arrow(t)

    got = bucketed_agg(
        ds, ["k1", "k2"],
        [("v", "sum"), ("v", "min"), ("v", "max"), ("v", "count")],
        ["s", "mn", "mx", "c"],
    ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)

    pdf = pd.DataFrame({"k1": df.k1, "k2": df.k2, "v": vnull})
    g = pdf.groupby(["k1", "k2"], sort=True)
    exp = pd.DataFrame({
        # min_count=1 → all-null groups sum to NA, matching Arrow's null
        "s": g["v"].sum(min_count=1),
        "mn": g["v"].min(),
        "mx": g["v"].max(),
        "c": g["v"].size(),
    }).reset_index()
    assert len(got) == len(exp)
    assert got["k1"].tolist() == exp["k1"].tolist()
    assert got["k2"].tolist() == exp["k2"].tolist()
    for col in ("s", "mn", "mx"):
        a = got[col].astype("float64").to_numpy()
        b = exp[col].astype("float64").to_numpy()
        assert np.array_equal(a, b, equal_nan=True), col
    assert got["c"].astype("int64").tolist() == exp["c"].astype("int64").tolist()


@given(rows=rows_st, n=st.integers(min_value=1, max_value=4),
       blocks=st.integers(min_value=1, max_value=5))
@FUZZ
def test_bucketed_topn_multikey_matches_pandas(ray_session, rows, n, blocks):
    """bucketed_topn with a TWO-column key and n>1 must agree with the
    pandas sort+groupby.head reference (ties broken by the unique id
    column, so any stable top-n implementation agrees) at every block
    split."""
    from lucene_solr_ray.functions.relational import bucketed_topn

    df = _df(rows)
    ds = ray.data.from_pandas(df, override_num_blocks=blocks)
    got = (
        bucketed_topn(ds, ["k", "p"], ["v", "id"], [True, False], n)
        .to_pandas()
        .sort_values(["k", "p", "v", "id"], ascending=[True, True, False, True])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="mergesort")
        .groupby(["k", "p"], sort=False)
        .head(n)
        .sort_values(["k", "p", "v", "id"], ascending=[True, True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "p", "id"]], ref[["k", "v", "p", "id"]])


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 12),            # parent key
                  st.integers(0, 5),             # order value
                  st.integers(0, 100)),          # quantity (filter col)
        min_size=1, max_size=80),
    parents=st.sets(st.integers(0, 12), min_size=1, max_size=13),
    limit=st.integers(1, 3),
    blocks=st.integers(1, 4),
)
def test_child_doc_transform_matches_pandas(ray_session, rows, parents,
                                            limit, blocks):
    """[child] transformer vs pandas: childFilter, per-parent top-limit by
    (val desc, uid asc), inner attach drops childless parents."""
    import pyarrow.compute as pc
    from lucene_solr_ray.functions import relational as rel

    ch = pd.DataFrame(rows, columns=["pk", "val", "qty"])
    ch["uid"] = np.arange(len(ch))  # unique tiebreak → deterministic top-n
    par = pd.DataFrame({"pk": sorted(parents)})
    par["pname"] = ["p%d" % k for k in par["pk"]]

    out = rel.child_doc_transform(
        ray.data.from_pandas(par).repartition(2),
        ray.data.from_pandas(ch).repartition(blocks),
        parent_key="pk", child_parent_key="pk",
        child_filter_fn=lambda t: pc.greater_equal(t["qty"], 50),
        child_order=["val", "uid"], descending=[True, False], limit=limit,
        num_partitions=4,
    ).to_pandas()

    want = ch[ch.qty >= 50].sort_values(
        ["pk", "val", "uid"], ascending=[True, False, True])
    want = want.groupby("pk").head(limit)
    want = par.merge(want, on="pk", how="inner")

    if len(want) == 0:
        assert len(out) == 0
        return
    key = ["pk", "pname", "val", "qty", "uid"]
    got = out[key].sort_values(key).reset_index(drop=True)
    exp = want[key].sort_values(key).reset_index(drop=True)
    assert got.astype("int64", errors="ignore").reset_index(drop=True).equals(
        exp.astype("int64", errors="ignore").reset_index(drop=True)) or \
        got.astype(str).equals(exp.astype(str))
