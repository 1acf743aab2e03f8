"""ShingleFilter analog — token-sequence n-grams ("word n-grams").

Re-creates Lucene's ShingleFilter (reference: lucene/analysis/common/src/
java/org/apache/lucene/analysis/shingle/ShingleFilter.java ~700 LoC,
branch_8x; SURVEY.md §2.2): emit every run of ``min_shingle``..
``max_shingle`` consecutive tokens joined by a separator, optionally
alongside the unigrams. Unlike the vocabulary-wise token filters
(analysis/filters.py), shingling needs the token SEQUENCE, so it hooks the
analyzer between tokenization and tf accumulation — vectorized over the
flat (tokens, doc_ids) stream with Arrow ``binary_join_element_wise``
(one kernel call per shingle size, never a Python loop over tokens).

Position-increment / doc-length semantics pinned to the reference:
- ``output_unigrams=True`` (default): unigrams keep posIncr 1, shingles
  overlay them at posIncr 0 → with discountOverlaps=true (the BM25
  default) ``dl`` stays the UNIGRAM count; shingles add vocabulary and
  tf but no length.
- ``output_unigrams=False``: the shingle run starting at each position
  carries that position's posIncr 1 (sizes beyond the first overlay at
  posIncr 0) → ``dl`` = number of positions that start a min-size
  shingle = max(T - min_shingle + 1, 0); docs shorter than
  ``min_shingle`` emit nothing (outputUnigramsIfNoShingles=false).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ShingleConfig", "shingle_token_stream", "shingle_token_list"]


class ShingleConfig:
    """Validated shingle spec (part of the analyzer-spec lineage hash)."""

    def __init__(
        self,
        min_shingle: int = 2,
        max_shingle: int = 2,
        output_unigrams: bool = True,
        separator: str = " ",
    ):
        if not (2 <= min_shingle <= max_shingle):
            raise ValueError("shingle sizes must satisfy 2 <= min <= max")
        self.min_shingle = int(min_shingle)
        self.max_shingle = int(max_shingle)
        self.output_unigrams = bool(output_unigrams)
        self.separator = separator

    @classmethod
    def from_args(cls, args: dict) -> "ShingleConfig":
        return cls(
            min_shingle=args.get("min_shingle", 2),
            max_shingle=args.get("max_shingle", 2),
            output_unigrams=args.get("output_unigrams", True),
            separator=args.get("separator", " "),
        )


def shingle_token_stream(
    tokens: pa.Array, doc_ids: np.ndarray, n_docs: int, cfg: ShingleConfig
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Flat token stream → flat shingled stream.

    Returns ``(out_tokens, out_doc_ids, dl)`` where ``dl`` is the per-doc
    field length under the posIncr semantics above (the tf accumulator's
    own bincount would count overlay tokens, so the override is returned
    explicitly). Output order is doc-major (tf accumulation is order-
    insensitive; positions are unsupported with shingles)."""
    doc_ids = doc_ids.astype(np.int64, copy=False)
    T = len(tokens)
    unigram_dl = np.bincount(doc_ids, minlength=n_docs).astype(np.int32)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()

    parts: List[pa.Array] = []
    part_docs: List[np.ndarray] = []
    if cfg.output_unigrams:
        parts.append(tokens)
        part_docs.append(doc_ids)

    # joined[k] spans tokens[i .. i+k-1]; build size k from size k-1 with
    # one element-wise join kernel over the whole stream, then keep only
    # spans that stay inside one doc (doc_ids[i] == doc_ids[i+k-1])
    prev = tokens
    for k in range(2, cfg.max_shingle + 1):
        if T < k:
            break
        prev = pc.binary_join_element_wise(
            prev.slice(0, T - k + 1), tokens.slice(k - 1), cfg.separator
        )
        if k >= cfg.min_shingle:
            same_doc = doc_ids[: T - k + 1] == doc_ids[k - 1 :]
            idx = np.nonzero(same_doc)[0]
            if len(idx):
                parts.append(prev.take(pa.array(idx)))
                part_docs.append(doc_ids[idx])

    if cfg.output_unigrams:
        dl = unigram_dl
    else:
        dl = np.maximum(unigram_dl - (cfg.min_shingle - 1), 0).astype(np.int32)

    if not parts:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64), dl
    if len(parts) == 1:
        return parts[0], part_docs[0], dl
    out_tokens = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]
    )
    out_docs = np.concatenate(part_docs)
    # regroup doc-major (stable: unigrams stay before overlays within a doc)
    order = np.argsort(out_docs, kind="stable")
    return out_tokens.take(pa.array(order)), out_docs[order], dl


def shingle_token_list(toks: List[str], cfg: ShingleConfig) -> Tuple[List[str], int]:
    """Per-doc Python reference (the non-ASCII regex fallback path and the
    property-test oracle): token list → (shingled token list, dl)."""
    out = list(toks) if cfg.output_unigrams else []
    for k in range(cfg.min_shingle, cfg.max_shingle + 1):
        for i in range(len(toks) - k + 1):
            out.append(cfg.separator.join(toks[i : i + k]))
    if cfg.output_unigrams:
        dl = len(toks)
    else:
        dl = max(len(toks) - (cfg.min_shingle - 1), 0)
    return out, dl
