"""Function-query scalar registry unit gates (SURVEY.md §2.9): compiled
spec trees vs direct numpy evaluation — no Ray needed."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.functions.scalars import compile_value_source, register_function


@pytest.fixture()
def batch():
    return pa.table(
        {
            "x": pa.array([1.0, 4.0, 9.0, 16.0]),
            "y": pa.array([2.0, 0.5, -3.0, 10.0]),
            "s": pa.array(["abc", "abd", "zzz", "abc"]),
            "n": pa.array([1.0, None, 3.0, None]),
            "ts": pa.array(
                np.array([0, 1_000_000, 2_000_000, 3_500_000], dtype="datetime64[us]"),
                type=pa.timestamp("us"),
            ),
        }
    )


def test_arithmetic_tree(batch):
    fn = compile_value_source(["sum", ["product", "x", 2], ["neg", "y"], 1])
    np.testing.assert_allclose(
        fn(batch), 2 * batch["x"].to_numpy() - batch["y"].to_numpy() + 1
    )


def test_sqrt_log_pow(batch):
    fn = compile_value_source(["pow", ["sqrt", "x"], 2])
    np.testing.assert_allclose(fn(batch), batch["x"].to_numpy())
    fn = compile_value_source(["log", 100])  # Solr log() is base 10
    assert float(fn(batch)) == pytest.approx(2.0)


def test_conditionals_and_comparisons(batch):
    fn = compile_value_source(["if", ["gt", "x", 5], "y", ["neg", "y"]])
    x, y = batch["x"].to_numpy(), batch["y"].to_numpy()
    np.testing.assert_allclose(fn(batch), np.where(x > 5, y, -y))
    fn = compile_value_source(["and", ["gte", "x", 4], ["lt", "y", 1]])
    np.testing.assert_allclose(fn(batch), ((x >= 4) & (y < 1)).astype(float))


def test_exists_and_def(batch):
    assert compile_value_source(["exists", "n"])(batch).tolist() == [1, 0, 1, 0]
    np.testing.assert_allclose(
        compile_value_source(["def", "n", 99])(batch), [1, 99, 3, 99]
    )


def test_scale_needs_stats(batch):
    with pytest.raises(ValueError, match="scale"):
        compile_value_source(["scale", "x", 0, 1])
    fn = compile_value_source(["scale", "x", 0, 1], stats={"min_x": 1, "max_x": 16})
    np.testing.assert_allclose(fn(batch), (batch["x"].to_numpy() - 1) / 15)


def test_map_recip_linear(batch):
    np.testing.assert_allclose(
        compile_value_source(["map", "x", 4, 9, 0])(batch), [1, 0, 0, 16]
    )
    np.testing.assert_allclose(
        compile_value_source(["recip", "x", 1, 2, 0])(batch), 2 / batch["x"].to_numpy()
    )
    np.testing.assert_allclose(
        compile_value_source(["linear", "x", 3, -1])(batch), 3 * batch["x"].to_numpy() - 1
    )


def test_strdist(batch):
    out = compile_value_source(["strdist", "s", "abc", "levenshtein"])(batch)
    np.testing.assert_allclose(out, [1.0, 1 - 1 / 3, 0.0, 1.0])


def test_ms_timestamp(batch):
    np.testing.assert_allclose(
        compile_value_source(["ms", "ts"])(batch), [0, 1000, 2000, 3500]
    )


def test_unknown_function_raises(batch):
    with pytest.raises(KeyError, match="unknown function"):
        compile_value_source(["frobnicate", "x"])


def test_register_function_spi(batch):
    register_function("double", lambda stats, x: (
        lambda b, f=compile_value_source(x, stats): 2 * f(b)
    ))
    np.testing.assert_allclose(
        compile_value_source(["double", "x"])(batch), 2 * batch["x"].to_numpy()
    )
