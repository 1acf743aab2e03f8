"""ExpandComponent analog (relational.expand): per collapsed group, up to
``rows`` additional documents with the collapse winner excluded —
property-checked against a single-process pandas rank reference, plus the
Solr edge semantics (single-member groups emit nothing; rows cap)."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from lucene_solr_ray.functions.relational import expand


def _ref_expand(df, key, order_cols, descending, rows):
    df = df.sort_values(
        [key] + list(order_cols),
        ascending=[True] + [not d for d in descending],
        kind="mergesort",
    )
    g = df.groupby(key, sort=False, dropna=False)
    rank = g.cumcount()
    return df[(rank >= 1) & (rank <= rows)]


@pytest.mark.parametrize("rows", [1, 2, 5])
def test_expand_matches_pandas(ray_session, rows):
    rng = np.random.default_rng(23)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 4_000, n),
            "ts": rng.integers(0, 10**9, n),
            "id": np.arange(n),
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        expand(ds, "k", ["ts", "id"], [True, False], rows=rows)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    exp = (
        _ref_expand(df, "k", ["ts", "id"], [True, False], rows)
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "ts", "id"]].astype(np.int64),
        exp[["k", "ts", "id"]].astype(np.int64),
    )


def test_expand_single_member_groups_emit_nothing(ray_session):
    df = pd.DataFrame({"k": [1, 2, 2, 3], "v": [10, 20, 21, 30],
                       "id": [0, 1, 2, 3]})
    ds = ray.data.from_pandas(df)
    out = expand(ds, "k", ["v", "id"], [True, False], rows=3).to_pandas()
    # groups 1 and 3 are singletons -> absent; group 2 loses its winner (21)
    assert sorted(out["k"].tolist()) == [2]
    assert out["v"].tolist() == [20]
