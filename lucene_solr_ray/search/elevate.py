"""Query elevation: editorial pinning/exclusion over search results.

QueryElevationComponent analog (reference: solr/core/src/java/org/apache/
solr/handler/component/QueryElevationComponent.java ~900 LoC, branch_8x;
elevate.xml maps query text → pinned doc ids + excluded ids). The
reference rewrites the query with boosts and filters; ranking-wise the
contract is: elevated docs first in CONFIG order, excluded docs gone,
everything else in score order after them. That contract is a pure,
partition-invariant reordering of the merged top list, so it runs on the
driver over k rows — the distributed work stays in `search()`.

Elevated docs not present in the first-pass top list are appended at
their pinned slot with NaN score (forceElevation=true semantics); pass a
large-enough first-pass ``k`` if elevated docs may rank deep.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

__all__ = ["elevate"]


def elevate(
    hits: pd.DataFrame,
    elevated: Sequence[str],
    excluded: Sequence[str] = (),
    k: Optional[int] = None,
    key_col: str = "url",
) -> pd.DataFrame:
    """Reorder one query's ``hits`` (columns: rank, ``key_col``, score,
    sorted by rank) per the elevation config. Returns the same columns
    with rank rebuilt 1..n and truncated to ``k``."""
    ex = set(excluded)
    pin = {u: i for i, u in enumerate(elevated)}
    df = hits[~hits[key_col].isin(ex)].copy()
    present = set(df[key_col])
    missing = [u for u in elevated if u not in present]
    if missing:
        pad = pd.DataFrame({key_col: missing})
        for c in df.columns:
            if c != key_col:
                pad[c] = np.nan
        df = pd.concat([df, pad[df.columns]], ignore_index=True)
    df["_pin"] = df[key_col].map(lambda u: pin.get(u, len(pin)))
    df["_ord"] = np.arange(len(df))  # stable score order within unpinned
    df = df.sort_values(["_pin", "_ord"], kind="mergesort").drop(
        columns=["_pin", "_ord"]
    )
    if k is not None:
        df = df.head(k)
    df["rank"] = np.arange(1, len(df) + 1)
    return df.reset_index(drop=True)
