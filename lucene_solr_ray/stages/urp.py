"""Update-request-processor chain: named, configurable per-batch
transform stages applied at ingest, before analysis.

Re-creates the semantics of Solr's UpdateRequestProcessorChain
(reference: solr/core/src/java/org/apache/solr/update/processor/
UpdateRequestProcessorChain.java ~300 LoC + the ~40 factory classes,
branch_8x; SURVEY.md §2.2, §2.11 "Solr plugin registry"): a pipeline of
named factories, declared as data (JSON-able spec list), each producing a
vectorized ``map_batches`` body. The spec hash is part of the index
lineage, so changing the chain invalidates resumed partitions — the
solrconfig.xml-edit-forces-reindex behavior.

Spec format: ``[{"name": "...", ...kwargs}, ...]`` (a bare string means
no-kwargs). Example::

    pre_stages=[
        {"name": "regex_replace", "col": "text", "pattern": "\\\\s+", "replacement": " "},
        {"name": "trim", "col": "text"},
        {"name": "min_token_filter", "col": "text", "min_tokens": 5},
        {"name": "clone_field", "src": "text", "dst": "text_orig"},
    ]
"""

from __future__ import annotations

import hashlib
import json
from typing import Callable, Dict, List, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["STAGE_FACTORIES", "build_stage_chain", "stage_chain_hash", "register_stage"]


def _trim(col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pc.utf8_trim_whitespace(batch[col]))

    return fn


def _lowercase(col: str = "text"):
    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pc.utf8_lower(batch[col]))

    return fn


def _regex_replace(col: str, pattern: str, replacement: str):
    """RegexReplaceProcessorFactory analog (vectorized RE2)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(
            i, col, pc.replace_substring_regex(batch[col], pattern, replacement)
        )

    return fn


def _clone_field(src: str, dst: str):
    """CloneFieldUpdateProcessorFactory analog."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(dst, batch[src])

    return fn


def _concat_fields(cols: List[str], dst: str, sep: str = " "):
    def fn(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(*[batch[c] for c in cols], sep)
        return batch.append_column(dst, joined)

    return fn


def _min_token_filter(col: str = "text", min_tokens: int = 1):
    """Drop rows whose ``col`` has fewer than ``min_tokens`` whitespace
    tokens (the quality-gate ingest filter every curation chain carries)."""

    def fn(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.utf8_split_whitespace(batch[col]))
        return batch.filter(pc.greater_equal(n, min_tokens))

    return fn


def _field_length(col: str, dst: str):
    """CountFieldValuesUpdateProcessorFactory-style derived count field."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(dst, pc.utf8_length(batch[col]).cast(pa.int64()))

    return fn


def _drop_nulls(col: str):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[col]))

    return fn


# (pattern, replacement) pairs applied in order; RE2 syntax (both Arrow's
# replace_substring_regex and DuckDB's regexp_replace compile RE2, so the
# SQL oracle uses the same patterns verbatim with the 'g' flag)
PII_PATTERNS: List[tuple] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def _pii_scrub(col: str = "text"):
    """PII redaction for webtext curation (the large-scale training-data
    equivalent of a RegexReplaceProcessorFactory stack): emails, IPv4
    addresses and NNN-NNN-NNNN phone numbers become typed mask tokens.
    One vectorized RE2 pass per pattern, chained — order matters (emails
    first so their dotted hosts can't half-match the IP pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        arr = batch[col]
        for pat, rep in PII_PATTERNS:
            arr = pc.replace_substring_regex(arr, pat, rep)
        return batch.set_column(i, col, arr)

    return fn


def _timestamp(dst: str = "ingest_ts", value: str = None):
    """TimestampUpdateProcessorFactory analog: stamp every row with the
    ingest time. Pass a fixed ISO ``value`` for deterministic lineage
    (resume-idempotent builds); default is the stage's wall clock, the
    Solr behavior (re-ingest ⇒ new stamps)."""
    import datetime

    fixed = (
        datetime.datetime.fromisoformat(value).replace(tzinfo=None)
        if value else None
    )

    def fn(batch: pa.Table) -> pa.Table:
        ts = fixed or datetime.datetime.utcnow()
        return batch.append_column(
            dst, pa.array([ts] * len(batch), type=pa.timestamp("us"))
        )

    return fn


def _uuid(src: str = "url", dst: str = "id"):
    """UUIDUpdateProcessorFactory analog, made resume-safe: a NAME-based
    (UUIDv5-style) id from the unique-key column instead of a random v4 —
    re-ingesting the same row yields the same id on any worker, which is
    what idempotent distributed ingest needs."""
    import uuid

    ns = uuid.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 URL ns

    def fn(batch: pa.Table) -> pa.Table:
        vals = [str(uuid.uuid5(ns, s)) for s in batch[src].to_pylist()]
        return batch.append_column(dst, pa.array(vals, type=pa.string()))

    return fn


def _default_value(col: str, value):
    """DefaultValueUpdateProcessorFactory analog: fill nulls with a
    constant."""

    def fn(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index(col)
        return batch.set_column(i, col, pc.fill_null(batch[col], value))

    return fn


STAGE_FACTORIES: Dict[str, Callable] = {
    "trim": _trim,
    "timestamp": _timestamp,
    "uuid": _uuid,
    "default_value": _default_value,
    "lowercase": _lowercase,
    "regex_replace": _regex_replace,
    "clone_field": _clone_field,
    "concat_fields": _concat_fields,
    "min_token_filter": _min_token_filter,
    "field_length": _field_length,
    "drop_nulls": _drop_nulls,
    "pii_scrub": _pii_scrub,
}


def register_stage(name: str, factory: Callable) -> None:
    """SPI hook: plugins add their own named stage factories (§2.11)."""
    STAGE_FACTORIES[name] = factory


def build_stage_chain(spec: List[Union[str, dict]]) -> List[Callable]:
    """Resolve a spec list to vectorized map_batches bodies, in order."""
    out = []
    for entry in spec or []:
        if isinstance(entry, str):
            name, kwargs = entry, {}
        else:
            kwargs = dict(entry)
            name = kwargs.pop("name")
        if name not in STAGE_FACTORIES:
            raise KeyError(
                f"unknown pipeline stage {name!r}; registered: "
                f"{sorted(STAGE_FACTORIES)}"
            )
        out.append(STAGE_FACTORIES[name](**kwargs))
    return out


def stage_chain_hash(spec: List[Union[str, dict]]) -> str:
    """Deterministic lineage hash of the chain config (name+args, order)."""
    canon = json.dumps(spec or [], sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canon.encode()).hexdigest()[:16]
