"""Stream evaluators (SURVEY.md §2.9 registry 2).

Reference: [8x] solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
(~250 Expressible classes) — per-tuple functions over values INCLUDING
arrays, used inside select()/let() streaming expressions. This module is
the Ray-Data-native analog: an evaluator compiles to a columnar kernel
``fn(batch: pa.Table) -> pa.Array`` where arrays are Arrow list columns
and every per-list operation runs vectorized over the flattened values
buffer (offsets + numpy) — no Python loop over rows in the hot path.

Registered names (each mirrors an io/eval class):

array ctors   array(a, b, ...)            ArrayEvaluator
array ops     length(x)                   LengthEvaluator
              rev(x)                      ReverseEvaluator
              asc(x) / desc(x)            AscEvaluator / DescEvaluator
              valueAt(x, i)               ValueAtEvaluator (0-based)
stats         percentile(x, p)            PercentileEvaluator
              mean(x) sumArray(x)         MeanEvaluator / AddAll
              minArray(x) maxArray(x)     MinEvaluator / MaxEvaluator
              corr(x, y)                  CorrelationEvaluator (Pearson)
ML            regress(x, y)               RegressionEvaluator →
                                          list [slope, intercept]
              predict(reg, v)             PredictEvaluator
text          analyze(field, spec?)       AnalyzeEvaluator → tokens
                                          (per-token filter chains; the
                                          sequence filters shingle/cjk
                                          run in the full AnalyzerStage)

Scalar arithmetic (add/sub/mult/...) intentionally lives in the OTHER
registry — functions/scalars.py value sources — exactly as Solr splits
ValueSourceParser from io/eval.

SPI: ``register_evaluator(name, builder)`` (§2.11).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --------------------------------------------------------------- helpers ---

def _list_parts(arr):
    """(offsets int64[n+1], flat numpy values) of a list array/chunk."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        raise TypeError(f"expected a list column, got {arr.type}")
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.values
    if len(off) and off[0] != 0:
        # sliced list arrays carry base offsets; normalize to 0-based
        flat = flat.slice(off[0], off[-1] - off[0])
        off = off - off[0]
    return off, flat


def _rebuild(off: np.ndarray, flat: pa.Array) -> pa.ListArray:
    return pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), flat)


def _segment_ids(off: np.ndarray) -> np.ndarray:
    n_flat = int(off[-1]) if len(off) else 0
    seg = np.zeros(n_flat, dtype=np.int64)
    nz = off[1:-1]
    if len(nz):
        np.add.at(seg, nz[nz < n_flat], 1)
        seg = np.cumsum(seg)
    return seg


def _compile_arg(arg, ctx):
    """Resolve an evaluator arg: nested spec, field name, literal."""
    if isinstance(arg, (list, tuple)):
        return compile_evaluator(list(arg), ctx)
    if isinstance(arg, (int, float)):
        return lambda batch, v=arg: v
    if isinstance(arg, str):
        def col_or_lit(batch, c=arg):
            if c in batch.column_names:
                return batch[c]
            return c
        return col_or_lit
    raise TypeError(f"bad evaluator arg: {arg!r}")


def _sorted_each(off, flat_np, descending=False):
    """Per-list sort of the flattened values, vectorized: lexsort by
    (segment, value) — one global sort instead of n per-row sorts."""
    seg = _segment_ids(off)
    if descending:
        if flat_np.dtype.kind in "iuf":
            order = np.lexsort((-flat_np, seg))
        else:
            # strings: ascending lexsort then reverse within segment
            order = np.lexsort((flat_np, seg))
            order = _reverse_within(off, order)
    else:
        order = np.lexsort((flat_np, seg))
    return order


def _reverse_within(off: np.ndarray, idx: np.ndarray) -> np.ndarray:
    out = np.empty_like(idx)
    for i in range(len(off) - 1):  # bounded by row count, cheap slices
        lo, hi = off[i], off[i + 1]
        out[lo:hi] = idx[lo:hi][::-1]
    return out


# ------------------------------------------------------------- evaluators ---

def _build_array(ctx, *args):
    fns = [_compile_arg(a, ctx) for a in args]

    def fn(batch):
        n = batch.num_rows
        cols = []
        for f in fns:
            v = f(batch)
            if isinstance(v, (pa.Array, pa.ChunkedArray)):
                cols.append(v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
            else:
                cols.append(pa.array([v] * n))
        k = len(cols)
        # interleave: element (row r, slot j) reads concat index j*n + r
        pos = np.arange(n * k, dtype=np.int64)
        idx = (pos % k) * n + pos // k
        flat = pa.concat_arrays(
            [c.cast(cols[0].type) for c in cols]).take(pa.array(idx))
        off = np.arange(n + 1, dtype=np.int64) * k
        return _rebuild(off, flat)

    return fn


def _build_length(ctx, x):
    f = _compile_arg(x, ctx)
    return lambda batch: pc.cast(
        pc.list_value_length(f(batch)), pa.int64())


def _build_rev(ctx, x):
    f = _compile_arg(x, ctx)

    def fn(batch):
        off, flat = _list_parts(f(batch))
        idx = _reverse_within(off, np.arange(int(off[-1]), dtype=np.int64))
        return _rebuild(off, flat.take(pa.array(idx)))

    return fn


def _build_sort(descending):
    def build(ctx, x):
        f = _compile_arg(x, ctx)

        def fn(batch):
            off, flat = _list_parts(f(batch))
            flat_np = flat.to_numpy(zero_copy_only=False)
            order = _sorted_each(off, flat_np, descending)
            return _rebuild(off, flat.take(pa.array(order)))

        return fn

    return build


def _build_value_at(ctx, x, i):
    f = _compile_arg(x, ctx)
    i = int(i)

    def fn(batch):
        off, flat = _list_parts(f(batch))
        lens = np.diff(off)
        if len(flat) == 0:  # every list empty: nothing to gather
            return pa.nulls(len(lens), flat.type)
        pos = off[:-1] + (i if i >= 0 else lens + i)
        ok = (i >= 0) & (i < lens) if i >= 0 else (-i <= lens)
        safe = np.where(ok, pos, 0)
        vals = flat.take(pa.array(safe.astype(np.int64)))
        return pc.if_else(pa.array(ok), vals, pa.scalar(None, vals.type))

    return fn


def _reduce_each(off, flat_np, how):
    """Per-list reduction via np.*.reduceat (empty lists → nan)."""
    lens = np.diff(off)
    out = np.full(len(lens), np.nan)
    nz = lens > 0
    if nz.any():
        starts = off[:-1][nz]
        red = {"sum": np.add.reduceat, "min": np.minimum.reduceat,
               "max": np.maximum.reduceat}[how](
            flat_np.astype(np.float64), starts)
        out[nz] = red
    return out


def _build_reduce(how, mean=False):
    def build(ctx, x):
        f = _compile_arg(x, ctx)

        def fn(batch):
            off, flat = _list_parts(f(batch))
            flat_np = flat.to_numpy(zero_copy_only=False)
            out = _reduce_each(off, flat_np, how)
            if mean:
                lens = np.diff(off)
                out = np.where(lens > 0, out / np.maximum(lens, 1), np.nan)
            return pa.array(out)

        return fn

    return build


def _build_percentile(ctx, x, p):
    f = _compile_arg(x, ctx)
    p = float(p)

    def fn(batch):
        off, flat = _list_parts(f(batch))
        flat_np = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        order = _sorted_each(off, flat_np, False)
        snp = flat_np[order]
        lens = np.diff(off)
        out = np.full(len(lens), np.nan)
        nz = lens > 0
        # linear interpolation on the sorted values (numpy 'linear')
        rank = (lens[nz] - 1) * (p / 100.0)
        lo = np.floor(rank).astype(np.int64)
        hi = np.ceil(rank).astype(np.int64)
        base = off[:-1][nz]
        vlo, vhi = snp[base + lo], snp[base + hi]
        out[nz] = vlo + (vhi - vlo) * (rank - lo)
        return pa.array(out)

    return fn


def _xy_stats(fx, fy, batch):
    offx, flatx = _list_parts(fx(batch))
    offy, flaty = _list_parts(fy(batch))
    if not np.array_equal(offx, offy):
        raise ValueError("regress/corr need equal-length x/y arrays per row")
    x = flatx.to_numpy(zero_copy_only=False).astype(np.float64)
    y = flaty.to_numpy(zero_copy_only=False).astype(np.float64)
    lens = np.diff(offx).astype(np.float64)
    sx = _reduce_each(offx, x, "sum")
    sy = _reduce_each(offx, y, "sum")
    sxx = _reduce_each(offx, x * x, "sum")
    syy = _reduce_each(offx, y * y, "sum")
    sxy = _reduce_each(offx, x * y, "sum")
    with np.errstate(divide="ignore", invalid="ignore"):
        cov = sxy - sx * sy / lens
        varx = sxx - sx * sx / lens
        vary = syy - sy * sy / lens
        slope = cov / varx
        intercept = (sy - slope * sx) / lens
        r = cov / np.sqrt(varx * vary)
    return slope, intercept, r


def _build_regress(ctx, xs, ys):
    fx, fy = _compile_arg(xs, ctx), _compile_arg(ys, ctx)

    def fn(batch):
        slope, intercept, _ = _xy_stats(fx, fy, batch)
        n = len(slope)
        flat = pa.array(np.column_stack([slope, intercept]).reshape(-1))
        return _rebuild(np.arange(n + 1, dtype=np.int64) * 2, flat)

    return fn


def _build_predict(ctx, reg, v):
    fr, fv = _compile_arg(reg, ctx), _compile_arg(v, ctx)

    def fn(batch):
        off, flat = _list_parts(fr(batch))
        par = flat.to_numpy(zero_copy_only=False).reshape(-1, 2)
        x = fv(batch)
        if isinstance(x, (pa.Array, pa.ChunkedArray)):
            x = x.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.array(par[:, 0] * x + par[:, 1])

    return fn


def _build_corr(ctx, xs, ys):
    fx, fy = _compile_arg(xs, ctx), _compile_arg(ys, ctx)

    def fn(batch):
        _, _, r = _xy_stats(fx, fy, batch)
        return pa.array(r)

    return fn


def _build_analyze(ctx, field, spec=None):
    """AnalyzeEvaluator: tokenize + per-token filter chain over a string
    column → list<string> tokens in document order. Vectorized: the
    filter chain runs once per UNIQUE token (np.unique + take), not per
    occurrence; sequence filters (shingle/cjk_bigram) belong to the full
    AnalyzerStage and are rejected here."""
    from ..analysis.filters import build_filter_chain
    from ..analysis.tokenizer import StandardTokenizer

    spec = dict(spec or {})
    filters = list(spec.get("filters", ["lowercase"]))
    for flt in filters:
        nm = flt.get("name") if isinstance(flt, dict) else flt
        if nm in ("shingle", "cjk_bigram"):
            raise ValueError(
                f"analyze() evaluator does not run sequence filter {nm!r};"
                " use the AnalyzerStage pipeline")
    chain = build_filter_chain(filters)
    lower = any(
        (f.get("name") if isinstance(f, dict) else f) == "lowercase"
        for f in filters)
    tok = StandardTokenizer(
        max_token_length=int(spec.get("max_token_length", 255)))
    cf = spec.get("char_filters")
    char_chain = None
    if cf:
        from ..analysis.html import build_char_filter_chain

        char_chain = build_char_filter_chain(cf)
    f = _compile_arg(field, ctx)

    def fn(batch):
        col = f(batch)
        if not isinstance(col, (pa.Array, pa.ChunkedArray)):
            col = pa.array([col] * batch.num_rows, type=pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if char_chain is not None and len(col):
            col = char_chain(col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
        texts = col.to_pylist()
        tokenize = tok.tokenize_lower if lower else tok.tokenize
        toks, off = [], [0]
        for t in texts:
            tt = tokenize(t or "")
            toks.extend(tt)
            off.append(len(toks))
        off = np.asarray(off, dtype=np.int64)
        flat = np.asarray(toks, dtype=object)
        if chain is not None and len(flat):
            # chain once per UNIQUE token; a token maps to 0 (dropped),
            # 1, or many (synonym expansion) output tokens
            uniq, inv = np.unique(flat, return_inverse=True)
            mapped = np.empty(len(uniq), dtype=object)
            for i, u in enumerate(uniq):
                r = chain(u)
                mapped[i] = (np.empty(0, dtype=object) if r is None
                             else np.asarray(
                                 r if isinstance(r, list) else [r],
                                 dtype=object))
            per_occ = mapped[inv]
            exp_lens = np.array([len(v) for v in per_occ], dtype=np.int64)
            seg = _segment_ids(off)
            new_lens = np.bincount(
                seg, weights=exp_lens, minlength=len(off) - 1
            ).astype(np.int64)
            off = np.concatenate([[0], np.cumsum(new_lens)])
            flat = (np.concatenate(per_occ) if len(per_occ)
                    else np.empty(0, dtype=object))
        return _rebuild(off, pa.array(list(flat), type=pa.string()))

    return fn


def _moving_starts(off: np.ndarray, w: int):
    """Valid window starts (flat index space) for per-list sliding windows
    of width ``w``: windows never cross a list boundary. Returns
    (new_off int64[n+1], starts int64[total])."""
    lens = np.diff(off)
    out_lens = np.maximum(lens - w + 1, 0).astype(np.int64)
    new_off = np.concatenate([[0], np.cumsum(out_lens)])
    total = int(new_off[-1])
    if total == 0:
        return new_off, np.empty(0, dtype=np.int64)
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        new_off[:-1], out_lens)
    starts = np.repeat(off[:-1], out_lens) + intra
    return new_off, starts


def _build_moving(stat: str):
    """movingAvg / movingMedian (reference: [8x] solr/solrj/.../io/eval/
    MovingAverageEvaluator.java, MovingMedianEvaluator.java, branch_8x):
    width-w sliding window per list, output length max(len-w+1, 0) —
    Solr throws on len < w; we emit an empty list (documented deviation,
    keeps the operator total). Vectorized: one cumsum (avg) or one
    sliding_window_view + axis-median (median) over the flat buffer."""

    def build(ctx, x, w):
        f = _compile_arg(x, ctx)
        w = int(w)
        if w < 1:
            raise ValueError("moving window must be >= 1")

        def fn(batch):
            off, flat = _list_parts(f(batch))
            v = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            new_off, starts = _moving_starts(off, w)
            if not len(starts):
                return _rebuild(new_off, pa.array(
                    np.empty(0, dtype=np.float64)))
            if stat == "avg":
                cs = np.concatenate([[0.0], np.cumsum(v)])
                out = (cs[starts + w] - cs[starts]) / float(w)
            else:
                win = np.lib.stride_tricks.sliding_window_view(v, w)
                out = np.median(win[starts], axis=1)
            return _rebuild(new_off, pa.array(out))

        return fn

    return build


def _build_zscores(ctx, x):
    """zscores (reference: [8x] solr/solrj/.../io/eval/
    NormalizeEvaluator.java registered as "zscores", branch_8x):
    (v - mean) / sample-stddev per list (commons-math sample semantics,
    ddof=1; lists with < 2 values emit NaN z-scores)."""
    f = _compile_arg(x, ctx)

    def fn(batch):
        off, flat = _list_parts(f(batch))
        v = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = np.diff(off).astype(np.float64)
        sx = _reduce_each(off, v, "sum")
        sxx = _reduce_each(off, v * v, "sum")
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = sx / lens
            std = np.sqrt((sxx - sx * sx / lens) / (lens - 1.0))
            std = np.where(lens >= 2, std, np.nan)
        rep = np.diff(off)
        out = (v - np.repeat(mean, rep)) / np.repeat(std, rep)
        return _rebuild(off, pa.array(out))

    return fn


def _build_pair(kind: str):
    """Two-array scalar evaluators (reference: [8x] solr/solrj/.../io/eval/
    CovarianceEvaluator ("cov"), DotProductEvaluator ("dotProduct"),
    CosineSimilarityEvaluator ("cosineSimilarity"),
    EuclideanDistanceEvaluator ("distance"), branch_8x). cov is the
    commons-math SAMPLE covariance (n-1 denominator); cosine is
    dot / (sqrt(Σx²) · sqrt(Σy²)) — formulas spelled out so an integer
    input yields bit-reproducible float64 (exact sums → one correctly
    rounded sqrt/divide), the oracle-parity convention."""

    def build(ctx, xs, ys):
        fx, fy = _compile_arg(xs, ctx), _compile_arg(ys, ctx)

        def fn(batch):
            offx, flatx = _list_parts(fx(batch))
            offy, flaty = _list_parts(fy(batch))
            if not np.array_equal(offx, offy):
                raise ValueError(f"{kind} needs equal-length arrays per row")
            x = flatx.to_numpy(zero_copy_only=False).astype(np.float64)
            y = flaty.to_numpy(zero_copy_only=False).astype(np.float64)
            lens = np.diff(offx).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                if kind == "dot":
                    out = _reduce_each(offx, x * y, "sum")
                elif kind == "cov":
                    sx = _reduce_each(offx, x, "sum")
                    sy = _reduce_each(offx, y, "sum")
                    sxy = _reduce_each(offx, x * y, "sum")
                    out = (sxy - sx * sy / lens) / (lens - 1.0)
                    out = np.where(lens >= 2, out, np.nan)
                elif kind == "cos":
                    dot = _reduce_each(offx, x * y, "sum")
                    nx = np.sqrt(_reduce_each(offx, x * x, "sum"))
                    ny = np.sqrt(_reduce_each(offx, y * y, "sum"))
                    out = dot / (nx * ny)
                else:  # euclidean distance
                    d = x - y
                    out = np.sqrt(_reduce_each(offx, d * d, "sum"))
            return pa.array(out)

        return fn

    return build


EVALUATORS = {
    "array": _build_array,
    "length": _build_length,
    "rev": _build_rev,
    "asc": _build_sort(False),
    "desc": _build_sort(True),
    "valueAt": _build_value_at,
    "percentile": _build_percentile,
    "mean": _build_reduce("sum", mean=True),
    "sumArray": _build_reduce("sum"),
    "minArray": _build_reduce("min"),
    "maxArray": _build_reduce("max"),
    "regress": _build_regress,
    "predict": _build_predict,
    "corr": _build_corr,
    "analyze": _build_analyze,
    "movingAvg": _build_moving("avg"),
    "movingMedian": _build_moving("median"),
    "zscores": _build_zscores,
    "cov": _build_pair("cov"),
    "covariance": _build_pair("cov"),  # alias
    "dotProduct": _build_pair("dot"),
    "cosineSimilarity": _build_pair("cos"),
    "distance": _build_pair("dist"),
}


def register_evaluator(name: str, builder: Callable) -> None:
    """SPI hook (§2.11): plugins register extra evaluators."""
    EVALUATORS[name] = builder


def compile_evaluator(spec, ctx: Optional[dict] = None) -> Callable:
    """Compile ``[name, *args]`` → ``fn(batch) -> pa.Array``."""
    ctx = ctx or {}
    if isinstance(spec, str):
        return _compile_arg(spec, ctx)
    name, *args = spec
    if name not in EVALUATORS:
        raise KeyError(
            f"unknown evaluator {name!r}; registered: {sorted(EVALUATORS)}")
    return EVALUATORS[name](ctx, *args)


def select_with_evaluators(ds, outputs: dict, keep=None):
    """select(...) with evaluator outputs: one vectorized map_batches
    computing each named evaluator column; ``keep`` = passthrough cols."""
    fns = {name: compile_evaluator(s) for name, s in outputs.items()}
    keep = list(keep or [])

    def ev(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keep}
        for name, f in fns.items():
            v = f(batch)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * batch.num_rows)
            cols[name] = v
        return pa.table(cols)

    return ds.map_batches(ev, batch_format="pyarrow")
