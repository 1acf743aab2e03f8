"""Function-query scalar registry: per-row value sources compiled from a
declarative spec to vectorized Arrow/numpy kernels.

Re-creates the registry shape and semantics of Solr's ValueSourceParser
(reference: solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
~1,600 LoC registering ~80 parsers, branch_8x; SURVEY.md §2.9): a function
query is a TREE of named functions over fields and literals. Here a spec
is a JSON-able nested list ``[name, arg0, arg1, ...]`` where args are
specs, field names (strings), or numeric literals — compiled once into a
closure that evaluates per batch with numpy (float64, Solr's evaluation
dtype).

Implemented (names follow the reference):
arithmetic  sum sub product div mod abs log ln sqrt cbrt exp pow neg
trig        sin cos tan asin acos atan sinh cosh tanh atan2 hypot
            rad deg  (constants: pi e)
rounding    floor ceil rint
min/max     min max
geo         geodist(lat1, lon1, lat2, lon2) [haversine km,
            R = 6371.0087714 = Lucene DistanceUtils.EARTH_MEAN_RADIUS_KM]
            sqedist(a1, a2, b1, b2)  dist(p, a1, a2, b1, b2) [Minkowski]
scaling     scale(x, lo, hi) [two-pass: needs precomputed stats]
            recip(x, m, a, b)  map(x, lo, hi, target)
            linear(x, m, c)
conditional if(test, a, b)  exists(field)  not(x)  and(...)  or(...)
            def(field, fallback)
comparison  gt gte lt lte eq
string      strdist(a, b, "levenshtein"|"jarowinkler"|"ngram")
            concat(a, b, ...)  [string-valued source]
field       field(name)  ord(field)  rord(field)  [ord/rord need the
            global sorted value list in stats — two-pass like scale]
date        ms(field)  (epoch millis of a timestamp field)

``compile_value_source(spec, stats=None)`` → ``fn(batch: pa.Table) ->
np.ndarray``. ``scale`` needs the field's global (min, max) in ``stats``
(the two-pass shape — Solr computes it from field caches at request
time; distributed engines aggregate first)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "compile_value_source", "FUNCTIONS", "register_function",
    "parse_date_math", "apply_date_math",
]


def _num(batch: pa.Table, col: str) -> np.ndarray:
    a = batch[col]
    if pa.types.is_timestamp(a.type):
        return a.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
    return a.to_numpy(zero_copy_only=False).astype(np.float64)


def _compile_arg(arg, stats):
    if isinstance(arg, (int, float)):
        v = float(arg)
        return lambda batch, v=v: v
    if isinstance(arg, str):
        return lambda batch, c=arg: _num(batch, c)
    return compile_value_source(arg, stats)


def _nary(op):
    def build(stats, *args):
        fns = [_compile_arg(a, stats) for a in args]

        def fn(batch):
            out = fns[0](batch)
            for f in fns[1:]:
                out = op(out, f(batch))
            return out

        return fn

    return build


def _unary(op):
    def build(stats, x):
        f = _compile_arg(x, stats)
        return lambda batch: op(f(batch))

    return build


def _binary(op):
    def build(stats, a, b):
        fa, fb = _compile_arg(a, stats), _compile_arg(b, stats)
        return lambda batch: op(fa(batch), fb(batch))

    return build


def _build_scale(stats, x, lo, hi):
    """scale(x, lo, hi): min-max rescale using the field's GLOBAL min/max
    (pass them via ``stats={"min_<expr>": .., "max_<expr>": ..}`` keyed by
    the field name, or ``stats={"min": .., "max": ..}``)."""
    f = _compile_arg(x, stats)
    key = x if isinstance(x, str) else ""
    mn = stats.get(f"min_{key}", stats.get("min"))
    mx = stats.get(f"max_{key}", stats.get("max"))
    if mn is None or mx is None:
        raise ValueError("scale() needs global min/max in stats (two-pass)")
    lo_f, hi_f = float(lo), float(hi)
    span = float(mx) - float(mn) or 1.0

    def fn(batch):
        return lo_f + (f(batch) - float(mn)) * (hi_f - lo_f) / span

    return fn


def _build_recip(stats, x, m, a, b):
    f = _compile_arg(x, stats)
    m, a, b = float(m), float(a), float(b)
    return lambda batch: a / (m * f(batch) + b)


def _build_map(stats, x, lo, hi, target, default=None):
    f = _compile_arg(x, stats)
    lo, hi, target = float(lo), float(hi), float(target)

    def fn(batch):
        v = f(batch)
        inside = (v >= lo) & (v <= hi)
        other = v if default is None else float(default)
        return np.where(inside, target, other)

    return fn


def _build_linear(stats, x, m, c):
    f = _compile_arg(x, stats)
    m, c = float(m), float(c)
    return lambda batch: m * f(batch) + c


def _build_if(stats, test, a, b):
    ft, fa, fb = (_compile_arg(s, stats) for s in (test, a, b))
    return lambda batch: np.where(ft(batch) != 0, fa(batch), fb(batch))


def _build_exists(stats, field):
    return lambda batch: pc.is_valid(batch[field]).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)


def _build_def(stats, field, fallback):
    fb = _compile_arg(fallback, stats)

    def fn(batch):
        valid = pc.is_valid(batch[field]).to_numpy(zero_copy_only=False)
        vals = batch[field].fill_null(0).to_numpy(zero_copy_only=False).astype(np.float64)
        return np.where(valid, vals, fb(batch))

    return fn


def _string_arg(arg, what="string function"):
    """Field-or-literal string accessor (the strdist convention: a name
    that matches a batch column reads the column, anything else is the
    literal itself). Nulls read as ''."""
    if not isinstance(arg, str):
        raise TypeError(f"{what} args must be field names or string literals")

    def g(batch, c=arg):
        if c in batch.column_names:
            return ["" if v is None else str(v) for v in batch[c].to_pylist()]
        return [c] * batch.num_rows

    return g


def _jaro_winkler(x: str, y: str) -> float:
    """Jaro-Winkler similarity with Lucene JaroWinklerDistance's
    parameters (reference: lucene/suggest/.../JaroWinklerDistance.java,
    branch_8x — published Winkler 1990 algorithm): prefix scaling 0.1
    over at most 4 chars, applied only when jaro > threshold 0.7."""
    if x == y:
        return 1.0
    lx, ly = len(x), len(y)
    if not lx or not ly:
        return 0.0
    window = max(max(lx, ly) // 2 - 1, 0)
    ym = [False] * ly
    xm = [False] * lx
    matches = 0
    for i, cx in enumerate(x):
        lo, hi = max(0, i - window), min(ly, i + window + 1)
        for j in range(lo, hi):
            if not ym[j] and y[j] == cx:
                xm[i] = ym[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    tr = 0
    j = 0
    for i in range(lx):
        if xm[i]:
            while not ym[j]:
                j += 1
            if x[i] != y[j]:
                tr += 1
            j += 1
    half_tr = tr // 2
    m = float(matches)
    jaro = (m / lx + m / ly + (m - half_tr) / m) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for cx, cy in zip(x[:4], y[:4]):
        if cx != cy:
            break
        prefix += 1
    return jaro + prefix * 0.1 * (1.0 - jaro)


def _build_strdist(stats, a, b, measure="levenshtein"):
    """strdist(field_or_literal, field_or_literal, measure): similarity in
    [0,1] like Solr's StringDistanceFunction (levenshtein: 1 − dist/maxlen;
    jarowinkler: Lucene JaroWinklerDistance; ngram: bigram overlap)."""

    ga = _string_arg(a, "strdist")
    gb = _string_arg(b, "strdist")

    def fn(batch):
        from ..search.multiterm import levenshtein_batch

        xs, ys = ga(batch), gb(batch)
        out = np.empty(len(xs), dtype=np.float64)
        if measure == "levenshtein":
            for i, (x, y) in enumerate(zip(xs, ys)):
                mx = max(len(x), len(y)) or 1
                d = int(levenshtein_batch(np.array([x], dtype=object), y)[0])
                out[i] = 1.0 - d / mx
        elif measure == "jarowinkler":
            for i, (x, y) in enumerate(zip(xs, ys)):
                out[i] = _jaro_winkler(x, y)
        else:  # ngram (bigram Dice-style overlap, public measure)
            for i, (x, y) in enumerate(zip(xs, ys)):
                sa = {x[j : j + 2] for j in range(max(len(x) - 1, 1))}
                sb = {y[j : j + 2] for j in range(max(len(y) - 1, 1))}
                out[i] = 2 * len(sa & sb) / max(len(sa) + len(sb), 1)
        return out

    return fn


def _build_concat(stats, *args):
    """concat(a, b, ...): string concatenation of fields and literals
    (ValueSourceParser "concat" → ConcatStringFunction, branch_8x;
    SURVEY.md §2.9). STRING-valued source: returns an object ndarray of
    str — composes with strdist/eq/ord, not with numeric arithmetic."""
    gs = [_string_arg(a, "concat") for a in args]

    def fn(batch):
        parts = [g(batch) for g in gs]
        return np.array(["".join(row) for row in zip(*parts)], dtype=object)

    return fn


def _build_field(stats, name):
    """field(name): explicit field-access value source (ValueSourceParser
    "field"; bare strings already compile to field reads — this is the
    spelled-out registry name for spec generators)."""
    return _compile_arg(str(name), stats)


def _ord_lookup(stats, field, what):
    vals = stats.get(f"ord_{field}")
    if vals is None:
        raise ValueError(
            f"{what}() needs the field's global sorted unique values in "
            f"stats['ord_{field}'] (two-pass, like scale(); Solr reads "
            "them from the field cache at request time)"
        )
    return np.array([str(v) for v in vals], dtype=object)


def _build_ord(stats, field):
    """ord(field): 1-based ordinal of the doc's value within the sorted
    unique values of the field (OrdFieldSource behind ValueSourceParser
    "ord", branch_8x; Solr ref guide counts from 1). Needs the global
    sorted value list in ``stats['ord_<field>']`` — the two-pass shape;
    distributed engines aggregate the dictionary first."""
    vals = _ord_lookup(stats, field, "ord")

    def fn(batch):
        raw = batch[field].to_pylist()
        xs = np.array(["" if v is None else str(v) for v in raw], dtype=object)
        ords = (np.searchsorted(vals, xs) + 1).astype(np.float64)
        missing = np.array([v is None for v in raw], dtype=bool)
        return np.where(missing, 0.0, ords)

    return fn


def _build_rord(stats, field):
    """rord(field): reverse ordinal — (#uniques − ord + 1), Solr's
    ReverseOrdFieldSource."""
    vals = _ord_lookup(stats, field, "rord")
    f = _build_ord(stats, field)
    n = float(len(vals))

    def fn(batch):
        o = f(batch)
        return np.where(o == 0.0, 0.0, n - o + 1.0)

    return fn


def _build_ms(stats, field):
    def fn(batch):
        a = batch[field]
        if pa.types.is_timestamp(a.type):
            us = a.cast(pa.int64()).to_numpy(zero_copy_only=False)
            return (us // 1000).astype(np.float64)
        return _num(batch, field)

    return fn


# ------------------------------------------------------------- date math ---
# DateMathParser (reference: solr/core/src/java/org/apache/solr/util/
# DateMathParser.java ~350 LoC, branch_8x; SURVEY.md §2.9): Solr date
# expressions are a chain of roundings ``/UNIT`` and calendar arithmetic
# ``±N UNITS`` applied left to right, e.g. ``NOW/DAY-7DAYS`` or
# ``/MONTH+1MONTH-1DAY`` (end of month). Re-created vectorized over numpy
# datetime64; month/year arithmetic is calendar-aware with day-of-month
# CLAMPING (Jan 31 + 1MONTH = Feb 28), matching java.util.Calendar.add.
_DM_UNITS = {
    "YEAR": "Y", "YEARS": "Y",
    "MONTH": "M", "MONTHS": "M",
    "DAY": "D", "DAYS": "D", "DATE": "D",
    "HOUR": "h", "HOURS": "h",
    "MINUTE": "m", "MINUTES": "m",
    "SECOND": "s", "SECONDS": "s",
    "MILLI": "ms", "MILLIS": "ms",
    "MILLISECOND": "ms", "MILLISECONDS": "ms",
}


def parse_date_math(expr: str):
    """``/DAY+7DAYS-1HOUR`` → [("round", "D"), ("add", 7, "D"), ...]."""
    ops, i = [], 0
    expr = expr.strip().upper()
    while i < len(expr):
        c = expr[i]
        if c == "/":
            j = i + 1
            while j < len(expr) and expr[j].isalpha():
                j += 1
            ops.append(("round", _DM_UNITS[expr[i + 1 : j]]))
            i = j
        elif c in "+-":
            j = i + 1
            while j < len(expr) and expr[j].isdigit():
                j += 1
            n = int(expr[i + 1 : j])
            k = j
            while k < len(expr) and expr[k].isalpha():
                k += 1
            ops.append(("add", n if c == "+" else -n, _DM_UNITS[expr[j:k]]))
            i = k
        else:
            raise ValueError(f"bad date math at {expr[i:]!r}")
    return ops


def apply_date_math(ms: np.ndarray, ops) -> np.ndarray:
    """Apply parsed ops to an epoch-millis int64 array → epoch millis."""
    dt = ms.astype(np.int64).astype("datetime64[ms]")
    for op in ops:
        if op[0] == "round":
            dt = dt.astype(f"datetime64[{op[1]}]").astype("datetime64[ms]")
            continue
        _, n, u = op
        if u in ("Y", "M"):
            months = n * 12 if u == "Y" else n
            mo = dt.astype("datetime64[M]")
            day = (dt.astype("datetime64[D]") - mo.astype("datetime64[D]")).astype(np.int64)
            tod = dt - dt.astype("datetime64[D]").astype("datetime64[ms]")
            mo2 = mo + np.timedelta64(months, "M")
            days_in = (
                (mo2 + np.timedelta64(1, "M")).astype("datetime64[D]")
                - mo2.astype("datetime64[D]")
            ).astype(np.int64)
            day2 = np.minimum(day, days_in - 1)  # Calendar.add day clamp
            dt = (
                mo2.astype("datetime64[D]") + day2.astype("timedelta64[D]")
            ).astype("datetime64[ms]") + tod
        else:
            dt = dt + np.timedelta64(n, u)
    return dt.astype("datetime64[ms]").astype(np.int64)


def _build_datemath(stats, x, expr):
    """datemath(x, "expr"): x is a timestamp field, a numeric epoch-ms
    value source, or the literal "NOW" (resolved from stats["NOW"] for
    determinism — distributed engines must pin NOW once per request, as
    Solr does per request). Returns epoch millis (float64, like ms())."""
    ops = parse_date_math(expr)
    if isinstance(x, str) and x.upper() == "NOW":
        if "NOW" not in (stats or {}):
            raise ValueError('datemath("NOW", ...) needs stats={"NOW": epoch_ms}')
        now_ms = int(stats["NOW"])

        def fn(batch):
            base = np.full(batch.num_rows, now_ms, dtype=np.int64)
            return apply_date_math(base, ops).astype(np.float64)

        return fn
    base_fn = _build_ms(stats, x) if isinstance(x, str) else _compile_arg(x, stats)

    def fn(batch):
        return apply_date_math(base_fn(batch).astype(np.int64), ops).astype(np.float64)

    return fn


def _build_const(v):
    """Zero-arg constant value source (Solr registers pi/e the same way:
    ValueSourceParser addParser("pi"/"e") → DoubleConstValueSource)."""
    v = float(v)

    def build(stats):
        return lambda batch, v=v: v

    return build


# Mean earth radius used by Lucene spatial's haversine
# (DistanceUtils.EARTH_MEAN_RADIUS_KM, branch_8x lucene/spatial-extras).
EARTH_MEAN_RADIUS_KM = 6371.0087714


def _build_geodist(stats, lat1, lon1, lat2, lon2):
    """geodist(lat1, lon1, lat2, lon2): great-circle distance in km via
    the haversine formula — the GeoDistValueSource/HaversineFunction pair
    behind Solr's geodist() (ValueSourceParser "geodist"). Args are any
    value sources (fields or literals), all in degrees."""
    fs = [_compile_arg(a, stats) for a in (lat1, lon1, lat2, lon2)]

    def fn(batch):
        la1, lo1, la2, lo2 = (np.radians(f(batch)) for f in fs)
        s_lat = np.sin((la2 - la1) * 0.5)
        s_lon = np.sin((lo2 - lo1) * 0.5)
        h = s_lat * s_lat + np.cos(la1) * np.cos(la2) * s_lon * s_lon
        return 2.0 * EARTH_MEAN_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(h, 1.0)))

    return fn


def _build_sqedist(stats, a1, a2, b1, b2):
    """sqedist(a1, a2, b1, b2): squared 2-d euclidean distance
    (SquaredEuclideanFunction)."""
    fa1, fa2, fb1, fb2 = (_compile_arg(a, stats) for a in (a1, a2, b1, b2))

    def fn(batch):
        d1 = fa1(batch) - fb1(batch)
        d2 = fa2(batch) - fb2(batch)
        return d1 * d1 + d2 * d2

    return fn


def _build_dist(stats, p, a1, a2, b1, b2):
    """dist(p, a1, a2, b1, b2): 2-d Minkowski p-distance (VectorDistanceFunction):
    p=1 manhattan, p=2 euclidean, p=0 sparseness, p=inf chebyshev."""
    p = float(p)
    fa1, fa2, fb1, fb2 = (_compile_arg(a, stats) for a in (a1, a2, b1, b2))

    def fn(batch):
        d1 = np.abs(fa1(batch) - fb1(batch))
        d2 = np.abs(fa2(batch) - fb2(batch))
        if p == 0.0:  # "sparseness": count of non-equal dims
            return (d1 != 0).astype(np.float64) + (d2 != 0).astype(np.float64)
        if np.isinf(p):
            return np.maximum(d1, d2)
        if p == 1.0:
            return d1 + d2
        if p == 2.0:
            return np.sqrt(d1 * d1 + d2 * d2)
        return (d1 ** p + d2 ** p) ** (1.0 / p)

    return fn


FUNCTIONS: Dict[str, Callable] = {
    "sum": _nary(np.add),
    "sub": _binary(np.subtract),
    "product": _nary(np.multiply),
    "div": _binary(np.divide),
    "mod": _binary(np.mod),
    "abs": _unary(np.abs),
    "log": _unary(np.log10),   # Solr's log() is base 10
    "ln": _unary(np.log),
    "sqrt": _unary(np.sqrt),
    "pow": _binary(np.power),
    "neg": _unary(np.negative),
    "floor": _unary(np.floor),
    "ceil": _unary(np.ceil),
    "rint": _unary(np.rint),
    "min": _nary(np.minimum),
    "max": _nary(np.maximum),
    "gt": _binary(lambda a, b: (a > b).astype(np.float64)),
    "gte": _binary(lambda a, b: (a >= b).astype(np.float64)),
    "lt": _binary(lambda a, b: (a < b).astype(np.float64)),
    "lte": _binary(lambda a, b: (a <= b).astype(np.float64)),
    "eq": _binary(lambda a, b: (a == b).astype(np.float64)),
    "not": _unary(lambda a: (a == 0).astype(np.float64)),
    "and": _nary(lambda a, b: ((a != 0) & (b != 0)).astype(np.float64)),
    "or": _nary(lambda a, b: ((a != 0) | (b != 0)).astype(np.float64)),
    "xor": _binary(lambda a, b: ((a != 0) ^ (b != 0)).astype(np.float64)),
    "if": _build_if,
    "exists": _build_exists,
    "def": _build_def,
    "scale": _build_scale,
    "recip": _build_recip,
    "map": _build_map,
    "linear": _build_linear,
    "strdist": _build_strdist,
    "concat": _build_concat,
    "field": _build_field,
    "ord": _build_ord,
    "rord": _build_rord,
    "ms": _build_ms,
    "datemath": _build_datemath,
    # math pack (ValueSourceParser registers each of these as a
    # DualFloatFunction/SimpleFloatFunction over java.lang.Math)
    "exp": _unary(np.exp),
    "cbrt": _unary(np.cbrt),
    "sin": _unary(np.sin),
    "cos": _unary(np.cos),
    "tan": _unary(np.tan),
    "asin": _unary(np.arcsin),
    "acos": _unary(np.arccos),
    "atan": _unary(np.arctan),
    "sinh": _unary(np.sinh),
    "cosh": _unary(np.cosh),
    "tanh": _unary(np.tanh),
    "atan2": _binary(np.arctan2),
    "hypot": _binary(np.hypot),
    "rad": _unary(np.radians),
    "deg": _unary(np.degrees),
    "pi": _build_const(np.pi),
    "e": _build_const(np.e),
    # geo / vector distances
    "geodist": _build_geodist,
    "sqedist": _build_sqedist,
    "dist": _build_dist,
}
def register_function(name: str, builder: Callable) -> None:
    """SPI hook (§2.11): plugins register extra value-source builders."""
    FUNCTIONS[name] = builder


def compile_value_source(spec, stats: Optional[dict] = None) -> Callable:
    """Compile ``[name, *args]`` → ``fn(batch) -> np.ndarray[float64]``."""
    stats = stats or {}
    if isinstance(spec, (int, float)):
        return _compile_arg(spec, stats)
    if isinstance(spec, str):
        return _compile_arg(spec, stats)
    name, *args = spec
    if name not in FUNCTIONS:
        raise KeyError(
            f"unknown function {name!r}; registered: {sorted(FUNCTIONS)}"
        )
    return FUNCTIONS[name](stats, *args)
