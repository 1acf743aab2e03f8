"""Exact distributed quantiles via two-pass histogram refinement.

PercentileAgg-exact analog (reference: solr/core/src/java/org/apache/
solr/search/facet/PercentileAgg.java uses approximate t-digest, branch
_8x — `functions/sketches.py` covers that; THIS is the exact
quantile_disc path, which the reference leaves to /export + sort).

Why not one groupby over the value domain: its shuffle grows with the
number of DISTINCT values (fine for enum-ish columns, unbounded for
prices/latencies at 10^12 rows). Two passes bound every exchange:

1. every block reduces to a fixed 4096-bin count histogram over the
   column's (min, max) — driver receives B × 4096 ints regardless of N,
   plus the global rank targets;
2. for each requested quantile only the ONE bin containing its rank is
   re-read (predicate pushed into the scan), and the exact answer is the
   (target - rank_below)-th smallest value within it — a local sort of
   ~N/4096 rows.

Both passes stream; nothing proportional to N ever reaches the driver.
Skew caveat: a single repeated value concentrates its bin (pass 2 then
scans that value's rows); correctness is unaffected.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["exact_quantiles"]

BINS = 4096


def exact_quantiles(ds, col: str, qs: Sequence[float]) -> Dict[float, int]:
    """quantile_disc semantics over an integer column: for each q, the
    smallest value v with rank ceil(q*N) in ascending order."""
    lo = ds.min(col)
    hi = ds.max(col)
    if lo is None:
        return {}
    lo, hi = int(lo), int(hi)
    width = max((hi - lo + 1 + BINS - 1) // BINS, 1)

    def block_hist(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy()
        h = np.bincount((v - lo) // width, minlength=BINS)
        return pa.table({"h": pa.array(h.astype(np.int64))})

    # pass 1: fixed-size per-block histograms, summed driver-side
    hist = np.zeros(BINS, dtype=np.int64)
    for b in ds.map_batches(block_hist, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        hist += np.asarray(b["h"].to_numpy()).reshape(-1, BINS).sum(axis=0)
    cum = np.cumsum(hist)
    n = int(cum[-1])

    out: Dict[float, int] = {}
    # group quantiles by owning bin so pass 2 scans each bin range once
    by_bin: Dict[int, List[float]] = {}
    for q in qs:
        target = max(int(np.ceil(q * n)), 1)
        bin_id = int(np.searchsorted(cum, target))
        by_bin.setdefault(bin_id, []).append(q)
    for bin_id, qlist in by_bin.items():
        blo = lo + bin_id * width
        bhi = blo + width
        vals = np.sort(
            np.concatenate(
                [
                    b[col].to_numpy()
                    for b in ds.map_batches(
                        lambda t, _lo=blo, _hi=bhi: t.filter(
                            pc.and_(
                                pc.greater_equal(t[col], _lo),
                                pc.less(t[col], _hi),
                            )
                        ),
                        batch_format="pyarrow",
                    ).iter_batches(batch_size=None, batch_format="pyarrow")
                    if b.num_rows
                ]
                or [np.empty(0, dtype=np.int64)]
            )
        )
        below = int(cum[bin_id - 1]) if bin_id > 0 else 0
        for q in qlist:
            target = max(int(np.ceil(q * n)), 1)
            out[q] = int(vals[target - below - 1])
    return out
