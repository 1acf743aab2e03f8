"""Analyzer stage: the stateful actor-pool map over zero-copy Arrow batches.

Analog of Lucene's per-thread reused analysis chain (reference:
lucene/core/src/java/org/apache/lucene/analysis/Analyzer.java#ReuseStrategy,
branch_8x; SURVEY.md §2.2, §2.4): the compiled tokenizer chain is built
ONCE per actor in ``__init__`` and applied per batch in ``__call__``. Used
as ``ds.map_batches(AnalyzerStage, fn_constructor_kwargs=..., batch_format=
"pyarrow", zero_copy_batch=True, concurrency=N)``.

Output per doc is the compact per-field term-frequency map (unique terms +
freqs + field length) rather than the raw token stream — the analog of
Lucene's in-DWPT TermsHashPerField accumulation, emitted early so the
downstream shuffle moves tf maps, not text.
"""

from __future__ import annotations

import hashlib
import json
from collections import Counter

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import StandardTokenizer
from ..index.partitioner import part_keys

__all__ = ["AnalyzerStage", "analyzer_spec_hash", "analyze_table"]


def analyzer_spec_hash(spec: dict) -> str:
    """Stable hash of the analyzer config — part of every segment's lineage
    (a stale-config resume must invalidate old segments; SURVEY.md §7.4.6)."""
    return hashlib.sha256(json.dumps(spec, sort_keys=True).encode()).hexdigest()[:16]


DEFAULT_SPEC = {"tokenizer": "standard_uax29", "max_token_length": 255, "filters": ["lowercase"]}


def analyze_table(table: pa.Table, tokenizer: StandardTokenizer, num_partitions: int) -> pa.Table:
    """Pure function core (also used by tests without Ray): pages table
    (url, warc_ts, text) → (url, warc_ts, part_key, terms, freqs, dl)."""
    texts = table["text"].to_pylist()
    n = len(texts)
    flat_terms: list = []
    freq_chunks: list = []
    offsets = np.empty(n + 1, dtype=np.int32)
    offsets[0] = 0
    dl = np.empty(n, dtype=np.int32)
    tokenize = tokenizer.tokenize_lower
    for i, text in enumerate(texts):
        toks = tokenize(text) if text else []
        tf = Counter(toks)
        dl[i] = len(toks)
        offsets[i + 1] = offsets[i] + len(tf)
        flat_terms.extend(tf.keys())
        freq_chunks.append(np.fromiter(tf.values(), dtype=np.int32, count=len(tf)))

    terms_arr = pa.ListArray.from_arrays(
        pa.array(offsets), pa.array(flat_terms, type=pa.string())
    )
    freqs_arr = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.array(np.concatenate(freq_chunks) if freq_chunks else np.array([], dtype=np.int32)),
    )
    urls = table["url"].to_pylist()
    pk = part_keys(urls, num_partitions)
    return pa.table(
        {
            "url": table["url"],
            "warc_ts": table["warc_ts"],
            "part_key": pk,
            "terms": terms_arr,
            "freqs": freqs_arr,
            "dl": dl,
        }
    )


class AnalyzerStage:
    """Callable class → Ray actor pool; tokenizer compiled once per actor."""

    def __init__(self, num_partitions: int, max_token_length: int = 255):
        self.tokenizer = StandardTokenizer(max_token_length=max_token_length)
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        return analyze_table(batch, self.tokenizer, self.num_partitions)
