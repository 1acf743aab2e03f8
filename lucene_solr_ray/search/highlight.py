"""Snippet highlighting for search hits.

UnifiedHighlighter analog (reference: lucene/highlighter/src/java/org/
apache/lucene/search/uhighlight/UnifiedHighlighter.java ~1,100 LoC,
branch_8x; SURVEY.md §2 out-of-slice row, now covered for the term-query
case). The reference re-analyzes (or reads offsets for) only the docs
being highlighted — k ≪ N. Same shape here: the doc table is FILTERED
distributed (broadcast is_in over the hit keys — no doc body ever moves
for a non-hit), then snippets are computed inside map_batches on the ≤ k
surviving rows.

Passage selection is deliberately simple and deterministic for oracle
parity: query terms are tried in the given priority order; the first one
present in the token stream anchors the snippet at its FIRST occurrence,
and the snippet is the ±``window`` tokens around it. (The reference's BM25
passage scorer picks a best-scoring passage; with single-term anchors and
small windows the two coincide on first-occurrence anchoring.)
"""

from __future__ import annotations

from typing import List, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["highlight"]


def highlight(
    docs_ds,
    hit_keys: Sequence,
    terms: List[str],
    window: int = 2,
    key_col: str = "doc_id",
    text_col: str = "text",
    mark: str | None = "em",
    snippets: int = 1,
) -> pd.DataFrame:
    """Snippets for ``hit_keys`` docs. Returns (key_col, term, pos,
    snippet) with ``pos`` the 0-based token index of the anchor match and
    the matched token wrapped in <mark>…</mark> tags (``mark=None`` leaves
    the snippet unmarked). Docs where no query term occurs are omitted
    (can't happen for real hits). ``snippets`` is Solr's hl.snippets:
    up to that many passages per doc, anchored at the first N
    occurrences OF THE SAME winning term (term priority picks the term,
    occurrence order picks the passages), one row each in pos order."""
    keys = pa.array(list(hit_keys))

    def filt(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[key_col], value_set=keys))

    small = docs_ds.map_batches(filt, batch_format="pyarrow")

    def _find_all(toks: List[str], t, limit: int) -> List[int]:
        """First ``limit`` anchor positions of ``t``: a string is a
        single term, a list is an exact consecutive phrase
        (UnifiedHighlighter phrase passages — the whole span marks)."""
        out: List[int] = []
        if isinstance(t, str):
            start = 0
            while len(out) < limit:
                try:
                    p = toks.index(t, start)
                except ValueError:
                    break
                out.append(p)
                start = p + 1
            return out
        n = len(t)
        tl = list(t)
        for i in range(len(toks) - n + 1):
            if toks[i:i + n] == tl:
                out.append(i)
                if len(out) >= limit:
                    break
        return out

    def snip(batch: pa.Table) -> pa.Table:
        out_key, out_term, out_pos, out_snip = [], [], [], []
        ks = batch[key_col].to_pylist()
        txts = batch[text_col].to_pylist()
        for kv, txt in zip(ks, txts):  # ≤ k rows total survive the filter
            toks = txt.split(" ")
            for t in terms:
                positions = _find_all(toks, t, max(1, snippets))
                if not positions:
                    continue
                span = 1 if isinstance(t, str) else len(t)
                for p in positions:
                    lo = max(0, p - window)
                    seg = toks[lo : p + span + window]
                    if mark:
                        for j in range(p - lo, p - lo + span):
                            seg[j] = f"<{mark}>{seg[j]}</{mark}>"
                    out_key.append(kv)
                    out_term.append(
                        t if isinstance(t, str) else " ".join(t))
                    out_pos.append(p)
                    out_snip.append(" ".join(seg))
                break
        return pa.table(
            {
                key_col: pa.array(out_key, type=batch[key_col].type),
                "term": pa.array(out_term, type=pa.string()),
                "pos": pa.array(out_pos, type=pa.int64()),
                "snippet": pa.array(out_snip, type=pa.string()),
            }
        )

    df = small.map_batches(snip, batch_format="pyarrow").to_pandas()
    return df.sort_values([key_col, "pos"]).reset_index(drop=True)
