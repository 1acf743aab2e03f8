"""Spell correction over the index vocabulary.

DirectSpellChecker analog (reference: lucene/suggest/src/java/org/apache/
lucene/search/spell/DirectSpellChecker.java ~500 LoC + solr/core/.../
handler/component/SpellCheckComponent.java, branch_8x; SURVEY.md §2
suggester/LTR row). Lucene walks an FST intersected with a Levenshtein
automaton; the Ray-Data-native equivalent treats the build-time global
stats table as the dictionary and runs the banded vectorized Levenshtein
(`multiterm.levenshtein_batch`) over it:

- candidates prune by the length band ``|len(cand) - len(term)| <=
  max_edits`` BEFORE any DP (the automaton's cheapest invariant), then
  by a first-character match when ``prefix_len >= 1`` (DirectSpellChecker
  defaults to prefix 1 — typos rarely hit the first letter);
- each block emits its local top-n per input term, the driver merges the
  tiny (blocks × terms × n) residue — same shape as `suggest`.

Ordering is (distance asc, df desc, term asc): DirectSpellChecker's
score-then-frequency comparator with a deterministic tie-break.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .multiterm import levenshtein_batch

__all__ = ["spellcheck", "collate", "word_break"]


def word_break(
    index_root: str,
    terms: List[str],
    min_break: int = 3,
    combine: bool = True,
) -> pd.DataFrame:
    """WordBreakSolrSpellChecker analog (reference: lucene/suggest/src/
    java/org/apache/lucene/search/spell/WordBreakSpellChecker.java ~500
    LoC + solr/core/.../spelling/WordBreakSolrSpellChecker.java,
    branch_8x): suggest BREAKING a term into two dictionary words (every
    split point with both sides >= ``min_break``, the reference's
    minBreakWordLength) and COMBINING adjacent query terms whose
    concatenation is a dictionary word.

    Ray-Data shape: the candidate set is tiny (O(Σ len(term)) splits),
    so generate it driver-side, then ONE pruned read of the stats
    dictionary filtered by is_in — membership AND df resolve in a
    single streaming pass; no Levenshtein, no full-vocab scan. freq =
    min(df_a, df_b) for breaks (the weaker word bounds usefulness),
    df for combines. Ordering (original, kind, freq desc, suggestion)."""
    import ray.data

    cands = []  # (kind, original, part_a, part_b, suggestion)
    for t in terms:
        for i in range(min_break, len(t) - min_break + 1):
            cands.append(("break", t, t[:i], t[i:], f"{t[:i]} {t[i:]}"))
    if combine:
        for t1, t2 in zip(terms, terms[1:]):
            cands.append(("combine", f"{t1} {t2}", t1 + t2, None,
                          t1 + t2))
    cols = ["kind", "original", "suggestion", "freq"]
    if not cands:
        return pd.DataFrame(columns=cols)

    need = sorted({c[2] for c in cands} | {c[3] for c in cands if c[3]})
    stats_dir = os.path.join(index_root, "stats", "global_stats")
    need_arr = pa.array(need)

    def member(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"], value_set=need_arr))

    hit = (
        ray.data.read_parquet(stats_dir, columns=["term", "df"])
        .map_batches(member, batch_format="pyarrow")
        .to_pandas()
    )
    # zero dictionary hits → Ray drops every block and the frame loses
    # its schema (the documented 2.49 empty-block behavior)
    df_map = ({} if len(hit) == 0
              else dict(zip(hit["term"], hit["df"].astype(int))))

    rows = []
    for kind, orig, a, b, sug in cands:
        if a not in df_map or (b is not None and b not in df_map):
            continue
        freq = min(df_map[a], df_map[b]) if b is not None else df_map[a]
        rows.append((kind, orig, sug, freq))
    out = pd.DataFrame(rows, columns=cols)
    return (out.sort_values(["original", "kind", "freq", "suggestion"],
                            ascending=[True, True, False, True])
            .reset_index(drop=True))


def spellcheck(
    index_root: str,
    terms: List[str],
    max_edits: int = 2,
    topn: int = 5,
    prefix_len: int = 1,
    min_df: int = 1,
) -> pd.DataFrame:
    """Top-``topn`` corrections per input term from the index vocabulary.
    A term's exact self (distance 0) is never suggested. Returns a
    DataFrame of (input, rank, suggestion, distance, df)."""
    import ray.data

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    ds = ray.data.read_parquet(stats_dir, columns=["term", "df"])
    tlist = list(terms)

    def local_topn(batch: pa.Table) -> pa.Table:
        # prune with Arrow kernels BEFORE any Python materialization: at
        # scale a stats block holds ~10^5-10^6 terms, and only the tiny
        # length-band ∩ prefix slice should ever become Python strings
        lens = pc.utf8_length(batch["term"])
        outs = []
        for tid, term in enumerate(tlist):
            band = pc.and_(
                pc.greater_equal(lens, len(term) - max_edits),
                pc.less_equal(lens, len(term) + max_edits),
            )
            if min_df > 1:
                band = pc.and_(band, pc.greater_equal(batch["df"], min_df))
            if prefix_len >= 1 and term:
                band = pc.and_(
                    band,
                    pc.starts_with(batch["term"], term[:prefix_len]),
                )
            sub_t = batch.filter(band)
            if sub_t.num_rows == 0:
                continue
            cand = np.asarray(sub_t["term"].to_pylist(), dtype=object)
            dfs = sub_t["df"].to_numpy()
            dist = levenshtein_batch(cand, term)
            ok = (dist <= max_edits) & (dist > 0)
            if not ok.any():
                continue
            sub = pd.DataFrame(
                {
                    "suggestion": cand[ok],
                    "distance": dist[ok],
                    "df": dfs[ok],
                }
            ).sort_values(
                ["distance", "df", "suggestion"],
                ascending=[True, False, True], kind="mergesort",
            ).head(topn)
            sub["term_id"] = tid
            outs.append(pa.Table.from_pandas(sub, preserve_index=False))
        if not outs:
            return pa.table(
                {
                    "suggestion": pa.array([], type=pa.string()),
                    "distance": pa.array([], type=pa.int64()),
                    "df": pa.array([], type=pa.int64()),
                    "term_id": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(outs)

    res = ds.map_batches(local_topn, batch_format="pyarrow").to_pandas()
    if "term_id" not in res.columns:  # every block came back empty
        res = pd.DataFrame(
            columns=["suggestion", "distance", "df", "term_id"]
        )
    rows = []
    for tid, term in enumerate(tlist):
        sub = res[res["term_id"] == tid].sort_values(
            ["distance", "df", "suggestion"],
            ascending=[True, False, True], kind="mergesort",
        ).head(topn)
        for r, (_, row) in enumerate(sub.iterrows(), start=1):
            rows.append(
                {
                    "input": term, "rank": r, "suggestion": row["suggestion"],
                    "distance": int(row["distance"]), "df": int(row["df"]),
                }
            )
    return pd.DataFrame(
        rows, columns=["input", "rank", "suggestion", "distance", "df"]
    )


def collate(index_root: str, terms: List[str], **kw) -> dict:
    """spellcheck.collate analog (reference: solr/core/.../spelling/
    SpellCheckCollator.java, branch_8x): rebuild the query string with
    each term replaced by its top correction (terms already in the
    vocabulary — i.e. with no distance-0-excluded suggestion better than
    themselves — stay as typed; spellcheck() never suggests the exact
    self, so "in vocabulary" is checked against the dictionary first).
    Returns {"collation": str, "corrections": {input: suggestion}}."""
    import ray.data

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    tset = pa.array(sorted(set(terms)))

    def present(batch: pa.Table) -> pa.Table:
        return batch.select(["term"]).filter(
            pc.is_in(batch["term"], value_set=tset))

    known = set(
        ray.data.read_parquet(stats_dir, columns=["term"])
        .map_batches(present, batch_format="pyarrow")
        .to_pandas()["term"]
    )
    unknown = [t for t in terms if t not in known]
    corrections: dict = {}
    if unknown:
        sugg = spellcheck(index_root, unknown, topn=1, **kw)
        corrections = dict(zip(sugg["input"], sugg["suggestion"]))
    return {
        "collation": " ".join(corrections.get(t, t) for t in terms),
        "corrections": corrections,
    }
