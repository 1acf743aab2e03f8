"""Solr XML update-payload loader (reference: solr/core/src/java/org/
apache/solr/handler/loader/XMLLoader.java ~700 LoC, branch_8x; SURVEY.md
§2.1 doc loaders — the one format JSON/CSV/parquet didn't cover).

Payload shape (the XMLLoader subset that carries documents)::

    <add>
      <doc>
        <field name="id">42</field>
        <field name="title">hello</field>
        <field name="tag">a</field><field name="tag">b</field>
      </doc>
      ...
    </add>

Distributed shape: files stream through ``ray.data.read_binary_files``
(one payload file = one block row; Solr updates are many small payloads,
so files parallelize naturally) and each batch parses with stdlib
``xml.etree`` into an Arrow table — field values arrive as strings
(XML has no types; Solr's schema applies typing, our ``schema=`` cast
is the analog). A field name appearing multiple times in one doc
collects into a list column when ``multivalued`` names it, else last
value wins (SolrInputDocument setField semantics for unexpected
repeats)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence

import pyarrow as pa

__all__ = ["parse_update_xml", "read_update_xml"]


def parse_update_xml(
    payload,
    multivalued: Sequence[str] = (),
) -> List[dict]:
    """One ``<add>`` payload (str or bytes) → list of doc dicts."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    root = ET.fromstring(payload)
    if root.tag != "add":
        raise ValueError(f"expected <add> root, got <{root.tag}>")
    mv = frozenset(multivalued)
    docs = []
    for doc_el in root.iter("doc"):
        doc: dict = {}
        for f in doc_el.iter("field"):
            name = f.get("name")
            if name is None:
                raise ValueError("<field> without name attribute")
            val = f.text if f.text is not None else ""
            if name in mv:
                doc.setdefault(name, []).append(val)
            else:
                doc[name] = val  # repeated single-valued: last wins
        docs.append(doc)
    return docs


def _docs_to_table(docs: List[dict], columns, mv: frozenset) -> pa.Table:
    cols = {}
    for name in columns:
        if name in mv:
            cols[name] = pa.array(
                [d.get(name, []) for d in docs], type=pa.list_(pa.string())
            )
        else:
            cols[name] = pa.array(
                [d.get(name) for d in docs], type=pa.string()
            )
    return pa.table(cols)


def read_update_xml(
    paths,
    schema: Optional[pa.Schema] = None,
    multivalued: Sequence[str] = (),
):
    """Dataset of parsed docs from XML update payload files. ``schema``
    (optional) both fixes the column set/order and casts the string
    fields to typed columns — the IndexSchema typing analog."""
    import ray.data

    mv = frozenset(multivalued)
    raw = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        docs: List[dict] = []
        for payload in batch["bytes"].to_pylist():
            docs.extend(parse_update_xml(payload, multivalued=mv))
        if schema is not None:
            t = _docs_to_table(docs, schema.names, mv)
            return t.cast(schema)
        names = sorted({k for d in docs for k in d})
        return _docs_to_table(docs, names, mv)

    return raw.map_batches(parse, batch_format="pyarrow")
