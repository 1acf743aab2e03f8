"""Time-series / vector evaluators (movingAvg, movingMedian, zscores,
cov, dotProduct, cosineSimilarity, distance): each kernel pinned against
a straightforward per-row numpy reference on random ragged lists —
including empty lists, lists shorter than the window, and 1-element
lists (NaN z-scores / covariance, Solr commons-math sample semantics)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.functions.evaluators import compile_evaluator


def _lists_table(rng, n_rows=60, max_len=9, int_vals=False):
    xs, ys = [], []
    for _ in range(n_rows):
        m = int(rng.integers(0, max_len))
        if int_vals:
            xs.append(rng.integers(-9, 10, size=m).astype(np.float64))
            ys.append(rng.integers(-9, 10, size=m).astype(np.float64))
        else:
            xs.append(rng.normal(size=m))
            ys.append(rng.normal(size=m))
    t = pa.table({
        "x": pa.array([list(v) for v in xs], type=pa.list_(pa.float64())),
        "y": pa.array([list(v) for v in ys], type=pa.list_(pa.float64())),
    })
    return t, xs, ys


def test_moving_avg_median_vs_loop():
    rng = np.random.default_rng(31)
    t, xs, _ = _lists_table(rng)
    for w in (1, 2, 3, 5):
        got_a = compile_evaluator(["movingAvg", "x", w])(t).to_pylist()
        got_m = compile_evaluator(["movingMedian", "x", w])(t).to_pylist()
        for r, v in enumerate(xs):
            n_out = max(len(v) - w + 1, 0)
            exp_a = [float(np.mean(v[i:i + w])) for i in range(n_out)]
            exp_m = [float(np.median(v[i:i + w])) for i in range(n_out)]
            assert got_a[r] == pytest.approx(exp_a, rel=1e-12), (w, r)
            assert got_m[r] == pytest.approx(exp_m, rel=1e-12), (w, r)


def test_moving_avg_integer_exact():
    # integer inputs: cumsum-difference must be EXACT (the oracle-parity
    # contract relies on it)
    t = pa.table({"x": pa.array([[1.0, 2.0, 4.0, 8.0]],
                                type=pa.list_(pa.float64()))})
    got = compile_evaluator(["movingAvg", "x", 2])(t).to_pylist()[0]
    assert got == [1.5, 3.0, 6.0]


def test_zscores_vs_loop():
    rng = np.random.default_rng(32)
    t, xs, _ = _lists_table(rng)
    got = compile_evaluator(["zscores", "x"])(t).to_pylist()
    for r, v in enumerate(xs):
        if len(v) < 2:
            assert all(g is None or np.isnan(g) for g in got[r])
            assert len(got[r]) == len(v)
            continue
        exp = (v - v.mean()) / v.std(ddof=1)
        assert got[r] == pytest.approx(list(exp), rel=1e-10, abs=1e-12), r


def test_pair_evaluators_vs_loop():
    rng = np.random.default_rng(33)
    t, xs, ys = _lists_table(rng)
    got_dot = compile_evaluator(["dotProduct", "x", "y"])(t).to_pylist()
    got_cov = compile_evaluator(["cov", "x", "y"])(t).to_pylist()
    got_cos = compile_evaluator(["cosineSimilarity", "x", "y"])(t).to_pylist()
    got_dst = compile_evaluator(["distance", "x", "y"])(t).to_pylist()
    for r, (x, y) in enumerate(zip(xs, ys)):
        if len(x) == 0:
            for g in (got_dot[r], got_cov[r], got_cos[r], got_dst[r]):
                assert g is None or np.isnan(g), r
            continue
        assert got_dot[r] == pytest.approx(float(x @ y), rel=1e-12), r
        if len(x) >= 2:
            assert got_cov[r] == pytest.approx(
                float(np.cov(x, y, ddof=1)[0, 1]), rel=1e-9, abs=1e-12), r
        else:
            assert got_cov[r] is None or np.isnan(got_cov[r]), r
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx > 0 and ny > 0:
            assert got_cos[r] == pytest.approx(
                float(x @ y) / (nx * ny), rel=1e-12), r
        assert got_dst[r] == pytest.approx(
            float(np.linalg.norm(x - y)), rel=1e-12), r


def test_pair_rejects_ragged():
    t = pa.table({
        "x": pa.array([[1.0, 2.0]], type=pa.list_(pa.float64())),
        "y": pa.array([[1.0]], type=pa.list_(pa.float64())),
    })
    with pytest.raises(ValueError):
        compile_evaluator(["dotProduct", "x", "y"])(t)


def test_nested_composition():
    # valueAt(movingMedian(x, 3), 1) — evaluator trees compose
    t = pa.table({"x": pa.array([[5.0, 1.0, 4.0, 2.0]],
                                type=pa.list_(pa.float64()))})
    got = compile_evaluator(
        ["valueAt", ["movingMedian", "x", 3], 1])(t).to_pylist()
    assert got == [2.0]  # median(1,4,2)


def test_empty_batch_all_kernels():
    # empty blocks are routine in real reads — every kernel must pass
    # a 0-row batch through with 0 rows out
    t = pa.table({"x": pa.array([], type=pa.list_(pa.float64())),
                  "y": pa.array([], type=pa.list_(pa.float64())),
                  "va": pa.array([], type=pa.float64())})
    for spec in (["movingAvg", "x", 2], ["movingMedian", "x", 3],
                 ["zscores", "x"], ["cov", "x", "y"],
                 ["dotProduct", "x", "y"], ["cosineSimilarity", "x", "y"],
                 ["distance", "x", "y"], ["array", "va", "va"]):
        assert len(compile_evaluator(spec)(t)) == 0, spec
