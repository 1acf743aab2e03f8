"""Stream evaluators (functions/evaluators.py; SURVEY.md §2.9 registry 2
— [8x] solr/solrj/.../io/eval/). Kernels are pinned against numpy /
the per-string analyze() reference; the contract twin is
stream_evaluators_docs in the sweep."""
import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.functions.evaluators import (
    compile_evaluator,
    register_evaluator,
    select_with_evaluators,
)


@pytest.fixture()
def batch():
    return pa.table({
        "xs": [[1.0, 3.0, 2.0], [5.0, 4.0], [], [7.0]],
        "ys": [[2.0, 6.0, 4.0], [11.0, 9.0], [], [15.0]],
        "a": [1.0, 2.0, 3.0, 4.0],
        "b": [10.0, 20.0, 30.0, 40.0],
        "txt": ["The QUICK brown Fox", "running RUNS", "", "a b c"],
    })


def test_array_length_rev(batch):
    arr = compile_evaluator(["array", "a", "b", 0.5])(batch)
    assert arr.to_pylist() == [[1.0, 10.0, 0.5], [2.0, 20.0, 0.5],
                               [3.0, 30.0, 0.5], [4.0, 40.0, 0.5]]
    assert compile_evaluator(["length", "xs"])(batch).to_pylist() == \
        [3, 2, 0, 1]
    assert compile_evaluator(["rev", "xs"])(batch).to_pylist() == \
        [[2.0, 3.0, 1.0], [4.0, 5.0], [], [7.0]]


def test_sort_and_value_at(batch):
    assert compile_evaluator(["asc", "xs"])(batch).to_pylist() == \
        [[1.0, 2.0, 3.0], [4.0, 5.0], [], [7.0]]
    assert compile_evaluator(["desc", "xs"])(batch).to_pylist() == \
        [[3.0, 2.0, 1.0], [5.0, 4.0], [], [7.0]]
    # strings sort/desc too (one global lexsort, reversed per segment)
    b2 = pa.table({"s": [["pear", "apple", "fig"], ["b", "a"]]})
    assert compile_evaluator(["desc", "s"])(b2).to_pylist() == \
        [["pear", "fig", "apple"], ["b", "a"]]
    # valueAt: 0-based, negatives from the end, out-of-range → null
    assert compile_evaluator(["valueAt", "xs", 0])(batch).to_pylist() == \
        [1.0, 5.0, None, 7.0]
    assert compile_evaluator(["valueAt", "xs", -1])(batch).to_pylist() == \
        [2.0, 4.0, None, 7.0]
    assert compile_evaluator(["valueAt", "xs", 5])(batch).to_pylist() == \
        [None, None, None, None]
    # nested tree: max via valueAt(desc(x), 0)
    assert compile_evaluator(["valueAt", ["desc", "xs"], 0])(
        batch).to_pylist() == [3.0, 5.0, None, 7.0]


def test_reductions_match_numpy(batch):
    xs = batch["xs"].to_pylist()
    for name, ref in [("mean", np.mean), ("sumArray", np.sum),
                      ("minArray", np.min), ("maxArray", np.max)]:
        got = compile_evaluator([name, "xs"])(batch).to_pylist()
        for g, row in zip(got, xs):
            if row:
                assert g == pytest.approx(ref(row))
            else:
                assert np.isnan(g)


def test_percentile_matches_numpy(batch):
    for p in (0, 25, 50, 90, 100):
        got = compile_evaluator(["percentile", "xs", p])(batch).to_pylist()
        for g, row in zip(got, batch["xs"].to_pylist()):
            if row:
                assert g == pytest.approx(
                    np.percentile(row, p, method="linear"))
            else:
                assert np.isnan(g)


def test_regress_predict_corr_match_numpy(batch):
    reg = compile_evaluator(["regress", "xs", "ys"])(batch).to_pylist()
    pred = compile_evaluator(
        ["predict", ["regress", "xs", "ys"], "a"])(batch).to_pylist()
    cor = compile_evaluator(["corr", "xs", "ys"])(batch).to_pylist()
    xs, ys = batch["xs"].to_pylist(), batch["ys"].to_pylist()
    for i, (x, y) in enumerate(zip(xs, ys)):
        if len(x) >= 2:
            slope, intercept = np.polyfit(x, y, 1)
            assert reg[i][0] == pytest.approx(slope)
            assert reg[i][1] == pytest.approx(intercept)
            assert pred[i] == pytest.approx(
                slope * batch["a"][i].as_py() + intercept)
            assert cor[i] == pytest.approx(np.corrcoef(x, y)[0, 1])
        else:
            assert all(np.isnan(v) for v in reg[i]) and np.isnan(cor[i])


def test_analyze_matches_reference(batch):
    from lucene_solr_ray.stages.analyzer import analyze

    specs = [
        {"filters": ["lowercase"]},
        {"filters": ["lowercase", {"name": "stop", "words": ["a", "the"]},
                     "porter_stem"]},
        {"filters": ["lowercase", "ascii_folding"]},
        {"char_filters": ["html_strip"], "filters": ["lowercase"]},
    ]
    texts = batch["txt"].to_pylist() + ["<b>Bold &amp; X</b>"]
    b = pa.table({"txt": texts})
    for spec in specs:
        got = compile_evaluator(["analyze", "txt", spec])(b).to_pylist()
        ref = [analyze(t, spec) for t in texts]
        assert got == ref, spec
    with pytest.raises(ValueError, match="sequence filter"):
        compile_evaluator(["analyze", "txt", {"filters": ["shingle"]}])


def test_sliced_list_column_normalizes():
    tab = pa.table({"xs": [[9.0], [1.0, 2.0], [3.0]]}).slice(1, 2)
    got = compile_evaluator(["sumArray", "xs"])(tab).to_pylist()
    assert got == [3.0, 3.0]


def test_select_with_evaluators_and_spi(ray_session):
    import ray.data

    register_evaluator("always7", lambda ctx: lambda batch: 7.0)
    ds = ray.data.from_items([{"k": 1, "xs": [1.0, 2.0]},
                              {"k": 2, "xs": [5.0]}])
    out = select_with_evaluators(
        ds, {"n": ["length", "xs"], "c": ["always7"]}, keep=["k"]
    ).to_pandas().sort_values("k")
    assert list(out["n"]) == [2, 1] and list(out["c"]) == [7.0, 7.0]
    with pytest.raises(KeyError, match="unknown evaluator"):
        compile_evaluator(["nope", "xs"])
