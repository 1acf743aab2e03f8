"""CommonGramsFilter analog — stopword-anchored word bigrams.

Re-creates Lucene's CommonGramsFilter (reference: lucene/analysis/common/
src/java/org/apache/lucene/analysis/commongrams/CommonGramsFilter.java
~200 LoC, branch_8x; SURVEY.md §2.2): alongside every unigram, each
adjacent token pair where EITHER member is a "common" word emits a
joined gram ``left_right`` (the reference's GRAM_TYPE token, separator
"_") overlaying the pair's first token at posIncr 0. Phrase queries over
stopword-heavy pairs ("the query") then hit one posting instead of a
positional intersection against a huge stopword posting list.

Like shingles, this needs the token SEQUENCE, so it hooks the analyzer
between tokenization and tf accumulation — vectorized over the flat
(tokens, doc_ids) stream: ONE ``binary_join_element_wise`` + ONE
``is_in`` pass per batch, never a Python loop over tokens.

posIncr / doc-length semantics: grams overlay at posIncr 0, so with
discountOverlaps=true (the BM25 default) ``dl`` stays the UNIGRAM count.
CommonGramsQueryFilter (the query-time unigram-dropping twin) is not
implemented — grams are additional vocabulary, queries address them
explicitly.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "CommonGramsConfig",
    "common_grams_token_stream",
    "common_grams_token_list",
]


class CommonGramsConfig:
    """Validated common-grams spec (part of the analyzer-spec hash)."""

    def __init__(self, words, separator: str = "_"):
        words = list(words or ())
        if not words:
            raise ValueError("common_grams requires a non-empty word list")
        self.words = sorted(set(words))
        self.separator = separator

    @classmethod
    def from_args(cls, args: dict) -> "CommonGramsConfig":
        return cls(words=args.get("words"),
                   separator=args.get("separator", "_"))


def common_grams_token_stream(
    tokens: pa.Array, doc_ids: np.ndarray, n_docs: int,
    cfg: CommonGramsConfig,
) -> Tuple[pa.Array, np.ndarray, np.ndarray]:
    """Flat token stream → flat (unigrams + common grams) stream.

    Returns ``(out_tokens, out_doc_ids, dl)`` with ``dl`` = unigram count
    (grams overlay at posIncr 0). Output order is doc-major; tf
    accumulation downstream is order-insensitive."""
    doc_ids = doc_ids.astype(np.int64, copy=False)
    T = len(tokens)
    dl = np.bincount(doc_ids, minlength=n_docs).astype(np.int32)
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if T < 2:
        return tokens, doc_ids, dl
    common = pa.array(cfg.words, type=pa.string())
    left, right = tokens.slice(0, T - 1), tokens.slice(1)
    anchored = pc.or_(pc.is_in(left, value_set=common),
                      pc.is_in(right, value_set=common))
    same_doc = doc_ids[: T - 1] == doc_ids[1:]
    mask = anchored.to_numpy(zero_copy_only=False) & same_doc
    idx = np.nonzero(mask)[0]
    if len(idx) == 0:
        return tokens, doc_ids, dl
    grams = pc.binary_join_element_wise(left, right, cfg.separator).take(
        pa.array(idx))
    out_tokens = pa.concat_arrays([
        tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray)
        else tokens,
        grams.combine_chunks() if isinstance(grams, pa.ChunkedArray)
        else grams,
    ])
    out_docs = np.concatenate([doc_ids, doc_ids[idx]])
    order = np.argsort(out_docs, kind="stable")
    return out_tokens.take(pa.array(order)), out_docs[order], dl


def common_grams_token_list(
    toks: List[str], cfg: CommonGramsConfig
) -> Tuple[List[str], int]:
    """Per-doc Python reference (the non-ASCII regex fallback path and
    the property-test oracle): token list → (tokens + grams, dl)."""
    common = set(cfg.words)
    out = list(toks)
    for i in range(len(toks) - 1):
        if toks[i] in common or toks[i + 1] in common:
            out.append(toks[i] + cfg.separator + toks[i + 1])
    return out, len(toks)
