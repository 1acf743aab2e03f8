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
    fn = compile_value_source(["xor", ["gte", "x", 4], ["lt", "y", 1]])
    np.testing.assert_allclose(fn(batch), ((x >= 4) ^ (y < 1)).astype(float))


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


def test_math_pack(batch):
    import math

    x = batch["x"].to_numpy()
    y = batch["y"].to_numpy()
    np.testing.assert_allclose(compile_value_source(["exp", "y"])(batch), np.exp(y))
    np.testing.assert_allclose(compile_value_source(["cbrt", "x"])(batch), np.cbrt(x))
    np.testing.assert_allclose(
        compile_value_source(["sin", ["rad", "x"]])(batch), np.sin(np.radians(x))
    )
    np.testing.assert_allclose(
        compile_value_source(["atan2", "y", "x"])(batch), np.arctan2(y, x)
    )
    np.testing.assert_allclose(
        compile_value_source(["hypot", "x", "y"])(batch), np.hypot(x, y)
    )
    np.testing.assert_allclose(
        compile_value_source(["tanh", "y"])(batch), np.tanh(y)
    )
    assert float(compile_value_source(["pi"])(batch)) == math.pi
    assert float(compile_value_source(["e"])(batch)) == math.e
    np.testing.assert_allclose(
        compile_value_source(["deg", ["pi"]])(batch), 180.0
    )


def test_geodist_haversine(batch):
    # Paris (48.8566, 2.3522) -> Berlin (52.52, 13.405): ~877.46 km
    fn = compile_value_source(["geodist", 48.8566, 2.3522, 52.52, 13.405])
    assert float(fn(batch)) == pytest.approx(877.46, abs=0.5)
    # zero distance, antipodal cap at pi*R
    assert float(compile_value_source(["geodist", 10, 20, 10, 20])(batch)) == 0.0
    anti = float(compile_value_source(["geodist", 0, 0, 0, 180])(batch))
    assert anti == pytest.approx(np.pi * 6371.0087714, rel=1e-9)


def test_sqedist_and_dist(batch):
    x, y = batch["x"].to_numpy(), batch["y"].to_numpy()
    np.testing.assert_allclose(
        compile_value_source(["sqedist", "x", "y", 0, 0])(batch), x * x + y * y
    )
    np.testing.assert_allclose(
        compile_value_source(["dist", 2, "x", "y", 0, 0])(batch), np.hypot(x, y)
    )
    np.testing.assert_allclose(
        compile_value_source(["dist", 1, "x", "y", 1, 1])(batch),
        np.abs(x - 1) + np.abs(y - 1),
    )
    np.testing.assert_allclose(
        compile_value_source(["dist", 0, "x", "y", 1.0, 0.5])(batch),
        (x != 1).astype(float) + (y != 0.5).astype(float),
    )
    np.testing.assert_allclose(
        compile_value_source(["dist", 3, "x", "y", 0, 0])(batch),
        (np.abs(x) ** 3 + np.abs(y) ** 3) ** (1 / 3),
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


def test_jarowinkler_published_goldens():
    """Winkler 1990 published pairs (Lucene JaroWinklerDistance params:
    threshold 0.7, prefix scale 0.1 over <=4 chars)."""
    from lucene_solr_ray.functions.scalars import _jaro_winkler

    assert _jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111, abs=1e-6)
    assert _jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333, abs=1e-6)
    assert _jaro_winkler("DWAYNE", "DUANE") == pytest.approx(0.84, abs=1e-6)
    assert _jaro_winkler("abc", "abc") == 1.0
    assert _jaro_winkler("", "x") == 0.0
    # below the 0.7 boost threshold the prefix bonus must NOT apply
    assert _jaro_winkler("abcdxxxxxx", "abcdyyyyyyzzzz") <= 0.7
    b = pa.table({"s": ["MARTHA", "DWAYNE"]})
    np.testing.assert_allclose(
        compile_value_source(["strdist", "s", "MARHTA", "jarowinkler"])(b)[:1],
        [0.9611111], atol=1e-6,
    )


def test_concat_field_ord_rord():
    b = pa.table({
        "seg": ["BUILDING", "AUTOMOBILE", "HOUSEHOLD", None],
        "k": [1.0, 2.0, 3.0, 4.0],
    })
    cat = compile_value_source(["concat", "seg:", "seg"])(b)
    assert list(cat) == ["seg:BUILDING", "seg:AUTOMOBILE", "seg:HOUSEHOLD", "seg:"]
    np.testing.assert_allclose(
        compile_value_source(["field", "k"])(b), [1, 2, 3, 4]
    )
    st = {"ord_seg": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                      "MACHINERY"]}
    np.testing.assert_allclose(
        compile_value_source(["ord", "seg"], st)(b), [2, 1, 4, 0]
    )
    np.testing.assert_allclose(
        compile_value_source(["rord", "seg"], st)(b), [4, 5, 2, 0]
    )
    with pytest.raises(ValueError, match="ord"):
        compile_value_source(["ord", "seg"])(b)
