"""Token-window sequence packing for training-data pipelines.

The standard LLM-pretraining batch layout: documents are concatenated in
a deterministic order and cut into fixed-size token windows; every token
belongs to exactly one window (``pack_id``). No Lucene/Solr analog — this
is one of the training-data extensions the task brief adds on top of the
reference inventory (like dedup/ANN/quality scoring).

Distributed shape (two-pass scan, no shuffle of the text itself):
1. token counts per doc are computed vectorized per block, and each
   block's TOTAL is the only thing the driver sees — a per-block prefix
   sum (#blocks values) yields each block's global token offset;
2. the offsets broadcast back, and a second pass assigns every doc its
   global token span and starting ``pack_id`` with one cumsum per block.

The pass-1 Dataset materializes only (block_id, n_tokens) — a few bytes
per block; the documents stream through both passes. Determinism needs a
stable doc order: the input must be sorted by ``order_col`` with blocks
in file order (true for a sorted parquet read, which is how the build
pipeline writes corpora).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

__all__ = ["pack_token_windows"]


def pack_token_windows(
    paths,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    columns: Optional[list] = None,
):
    """Assign each doc its global token span and window ids.

    Returns a Dataset of (``id_col``, n_tokens, tok_start, pack_first,
    pack_last) where ``tok_start`` is the doc's global token offset,
    ``pack_first = tok_start // window`` and ``pack_last =
    (tok_start + n_tokens - 1) // window`` (docs can straddle windows —
    the usual pretraining layout; a doc never reorders). Tokens are
    whitespace tokens, matching the corpus token-count contract.
    """
    cols = columns or [id_col, text_col]

    def counts(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.utf8_split_whitespace(batch[text_col]))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": n.cast(pa.int64()),
            }
        )

    # pass 1: per-block totals only reach the driver (bytes per block)
    per_doc = ray.data.read_parquet(paths, columns=cols).map_batches(
        counts, batch_format="pyarrow"
    )
    block_totals = [
        (int(b[id_col][0].as_py()), int(pc.sum(b["n_tokens"]).as_py()), b.num_rows)
        for b in per_doc.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    block_totals.sort()  # blocks ordered by their first doc id
    firsts = [f for f, _, _ in block_totals]
    offs = np.concatenate(([0], np.cumsum([t for _, t, _ in block_totals])[:-1]))
    off_by_first = dict(zip(firsts, offs.tolist()))
    off_ref = ray.put(off_by_first)

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "tok_start": pa.array([], type=pa.int64()),
                    "pack_first": pa.array([], type=pa.int64()),
                    "pack_last": pa.array([], type=pa.int64()),
                }
            )
        off_map = ray.get(off_ref)
        n = pc.list_value_length(pc.utf8_split_whitespace(batch[text_col]))
        n = n.cast(pa.int64()).to_numpy()
        first = int(batch[id_col][0].as_py())
        # both passes read with identical args and whole-block batches, so
        # every pass-2 batch must start exactly at a pass-1 block boundary
        assert first in off_map, (
            f"block split changed between passes (first doc {first})"
        )
        base = off_map[first]
        start = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n),
                "tok_start": pa.array(start),
                "pack_first": pa.array(start // window),
                "pack_last": pa.array((start + np.maximum(n, 1) - 1) // window),
            }
        )

    # pass 2 re-reads: same block split => same first-doc keys;
    # batch_size=None keeps whole blocks so the boundary keys line up
    return ray.data.read_parquet(paths, columns=cols).map_batches(
        assign, batch_format="pyarrow", batch_size=None
    )
