"""Update-path operations beyond append/merge: deleteByQuery, deleteById,
and atomic (partial document) updates.

Solr's ``<delete><query>…</query></delete>`` update (reference:
solr/core/src/java/org/apache/solr/update/DirectUpdateHandler2.java
#deleteByQuery + DeleteUpdateCommand, branch_8x; SURVEY.md §2.10 update
semantics): every doc matching the query is tombstoned in place — no
reindex, no segment rewrite. Search immediately excludes tombstoned docs;
term stats (df/N/avgdl) deliberately still include them until a merge
reclaims the space, exactly Lucene's docFreq-not-adjusted-for-deletes
behavior, so surviving docs' BM25 scores are unchanged.

Ray shape: the segment list is a Dataset; a DeleteByQueryStage actor pool
evaluates the query FULL (no top-k) per segment with the same broadcast
(weights, stats) context the searcher uses, and merges matched docids
into that segment's ``deletes.parquet`` with a rename-aside publish.
Each segment row is processed by exactly one task (batch_size=1), so
writes never race. Idempotent: re-running the same delete is a no-op.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state.manifest import (
    partition_segments,
    read_root_manifest,
    write_root_manifest,
)
from .query import prepare_search_context

__all__ = ["delete_by_query", "delete_by_id", "atomic_update"]


class _DeleteByIdStage:
    """Actor: per segment, tombstone the broadcast url set's docs via
    O(row-group) docmap point lookups (the realtime-get discipline)."""

    def __init__(self, urls_ref):
        self.urls = ray.get(urls_ref) if not isinstance(urls_ref, list) else urls_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.segment import SegmentReader, add_deletes

        seg_dirs, matched, newly = [], [], []
        for row in batch.to_pylist():
            seg = row["seg_dir"]
            reader = SegmentReader(seg)
            docids = [
                d for d in (reader.docid_of_url(u) for u in self.urls)
                if d is not None
                and (reader.deleted is None or not reader.deleted[d])
            ]
            seg_dirs.append(seg)
            matched.append(len(docids))
            newly.append(add_deletes(seg, docids))
        return pa.table(
            {
                "seg_dir": pa.array(seg_dirs, type=pa.string()),
                "matched": pa.array(matched, type=pa.int64()),
                "new_tombstones": pa.array(newly, type=pa.int64()),
            }
        )


def delete_by_id(index_root: str, urls, concurrency=None) -> Dict[str, int]:
    """Solr ``deleteById`` analog (unique key = url): tombstone the given
    docs wherever they live. The url list is broadcast once; each segment
    resolves its members via docmap row-group point lookups. A url present
    in several generations is tombstoned in each (all versions deleted,
    Solr deleteById semantics). Idempotent."""
    urls = sorted(set(urls))
    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    urls_ref = ray.put(urls)
    parts = [
        {"seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    out = ds.map_batches(
        _DeleteByIdStage,
        fn_constructor_kwargs={"urls_ref": urls_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    ).to_pandas()
    result = {
        "matched": int(out["matched"].sum()),
        "new_tombstones": int(out["new_tombstones"].sum()),
    }
    root = read_root_manifest(index_root)
    ops = list(root.get("delete_ops", ()))
    ops.append({"ids": len(urls), **result, "ts": time.time()})
    root["delete_ops"] = ops
    write_root_manifest(index_root, root)
    return result


class DeleteByQueryStage:
    """Actor: per segment, match the delete query and tombstone the hits."""

    def __init__(self, ctx_ref):
        ctx = ray.get(ctx_ref) if not isinstance(ctx_ref, dict) else ctx_ref
        from ..search.similarity import similarity_from_config

        self.query = ctx["queries"][0]
        self.weights = ctx["weights"]
        self.sim = similarity_from_config(ctx.get("sim"))
        self.cache_inv = self.sim.norm_inverse_cache(ctx["avgdl"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.segment import SegmentReader, add_deletes
        from ..search.searcher import match_query_full

        seg_dirs, matched, newly = [], [], []
        for row in batch.to_pylist():
            seg = row["seg_dir"]
            reader = SegmentReader(seg)
            if reader.num_docs == 0:
                docids = np.empty(0, dtype=np.int64)
            else:
                docids = match_query_full(
                    reader, self.query, self.weights, self.cache_inv, self.sim
                )
            seg_dirs.append(seg)
            matched.append(len(docids))
            newly.append(add_deletes(seg, docids))
        return pa.table(
            {
                "seg_dir": pa.array(seg_dirs, type=pa.string()),
                "matched": pa.array(matched, type=pa.int64()),
                "new_tombstones": pa.array(newly, type=pa.int64()),
            }
        )


def delete_by_query(
    index_root: str,
    query: dict,
    sim_config: Optional[dict] = None,
    concurrency: Optional[Union[int, tuple]] = None,
) -> Dict[str, int]:
    """Tombstone every doc matching ``query`` (same query-spec dicts as
    ``search``, ``query_id`` optional). Returns
    {"matched": total live matches, "new_tombstones": newly deleted}
    and records the operation in the root manifest's ``delete_ops`` log."""
    q = dict(query)
    q.setdefault("query_id", 0)
    ctx = prepare_search_context(index_root, [q], k=1, method="exhaustive",
                                 sim_config=sim_config)
    P = ctx.pop("num_partitions")
    ctx_ref = ray.put(ctx)

    parts = [
        {"seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    out = ds.map_batches(
        DeleteByQueryStage,
        fn_constructor_kwargs={"ctx_ref": ctx_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    ).to_pandas()
    result = {
        "matched": int(out["matched"].sum()),
        "new_tombstones": int(out["new_tombstones"].sum()),
    }
    root = read_root_manifest(index_root)
    ops = list(root.get("delete_ops", ()))
    ops.append(
        {
            "query": {k: v for k, v in q.items() if k != "query_id"},
            **result,
            "ts": time.time(),
        }
    )
    root["delete_ops"] = ops
    write_root_manifest(index_root, root)
    return result


# ------------------------------------------------------------------------
# Atomic updates (partial document updates)
# ------------------------------------------------------------------------
ATOMIC_DIR = "atomic"
_ATOMIC_OPS = ("set", "add", "inc", "remove", "removeregex")


def _apply_ops(row: dict, ops: Dict[str, Dict[str, object]]) -> dict:
    """Apply Solr field modifiers to one stored document (reference:
    solr/core/src/java/org/apache/solr/update/processor/
    AtomicUpdateDocumentMerger.java ~500 LoC, branch_8x; SURVEY.md §2.10):
    ``set`` replaces, ``add`` appends (string fields concatenate with a
    space — our fields are scalar, Solr's multiValued list-append analog),
    ``inc`` adds to a numeric field, ``remove`` nulls the field,
    ``removeregex`` deletes every whitespace-separated value matching
    the anchored pattern (the multiValued removeregex analog on the
    space-joined scalar)."""
    import re as _re

    out = dict(row)
    for field, spec in ops.items():
        if not isinstance(spec, dict) or len(spec) != 1:
            raise ValueError(f"field {field!r}: modifier must be one "
                             f"{{op: value}} dict, got {spec!r}")
        (op, val), = spec.items()
        if op not in _ATOMIC_OPS:
            raise ValueError(f"unknown atomic op {op!r} (have {_ATOMIC_OPS})")
        if op == "set":
            out[field] = val
        elif op == "remove":
            out[field] = None
        elif op == "removeregex":
            cur = out.get(field)
            if cur not in (None, ""):
                pat = _re.compile(str(val))
                kept = [v for v in str(cur).split(" ")
                        if not pat.fullmatch(v)]
                out[field] = " ".join(kept) if kept else None
        elif op == "inc":
            cur = out.get(field) or 0
            out[field] = cur + val
        else:  # add
            cur = out.get(field)
            out[field] = val if cur in (None, "") else f"{cur} {val}"
    return out


def atomic_update(
    index_root: str,
    updates,
    source_paths=None,
    dataset=None,
    lang: Optional[str] = "en",
    fingerprint: Optional[str] = None,
) -> Dict:
    """Partial document update (Solr atomic updates, SURVEY.md §2.10):
    resolve each url's CURRENT stored document, apply the field
    modifiers, bump the version, and reindex the result as one append
    generation — the old version is tombstoned by the same last-wins
    (warc_ts, dl) resolution every append uses, exactly Solr's
    RTG + AtomicUpdateDocumentMerger + _version_-bump flow.

    Solr requires all fields stored; our stored-field store is the source
    parquet (``source_paths``/``dataset``). Chaining works without
    re-reading prior outputs: every atomic generation's updated rows are
    ALSO written under ``<index_root>/atomic/`` and consulted (newest
    wins) when resolving the current document, so update #2 of a url sees
    update #1's fields, not the original row.

    Scale shape: k updates ≪ N docs — the source read is one pruned
    streaming pass with a broadcast url mask (never a shuffle), only the
    ≤k matched rows reach the driver for the modifier merge (the same
    point-lookup budget realtime_get spends), and the reindex is a normal
    append over k rows touching only the owning partitions.

    ``updates``: list of {"url": u, "ops": {field: {op: value}}}.
    Returns {"updated": n, "missing": [urls], "generation_file": path}.
    """
    import os

    import pandas as pd
    import pyarrow.parquet as _pq

    ups = {u["url"]: u["ops"] for u in updates}
    if len(ups) != len(updates):
        raise ValueError("duplicate url in one atomic_update call — "
                         "order would be ambiguous; chain two calls")
    url_set = frozenset(ups)

    if dataset is None:
        if not source_paths:
            raise ValueError("need source_paths or dataset (stored fields)")
        dataset = ray.data.read_parquet(source_paths)

    def match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["url"], value_set=pa.array(list(url_set))))

    rows = dataset.map_batches(match, batch_format="pyarrow").take_all()

    # prior atomic generations participate in current-version resolution
    adir = os.path.join(index_root, ATOMIC_DIR)
    gen_files = sorted(
        os.path.join(adir, f) for f in os.listdir(adir)
    ) if os.path.isdir(adir) else []
    for f in gen_files:
        t = _pq.read_table(f)
        t = t.filter(pa.compute.is_in(t["url"], value_set=pa.array(list(url_set))))
        rows.extend(t.to_pylist())

    def _dl(r):
        txt = r.get("text") or ""
        return len([w for w in txt.split(" ") if w])

    current: Dict[str, dict] = {}
    for r in rows:
        u = r["url"]
        best = current.get(u)
        if best is None or (r["warc_ts"], _dl(r)) > (best["warc_ts"], _dl(best)):
            current[u] = r

    missing = sorted(url_set - set(current))
    updated = []
    for u in sorted(current):
        new = _apply_ops(current[u], ups[u])
        if "warc_ts" not in ups[u]:  # _version_ bump: the update must win
            import datetime as _dt

            new["warc_ts"] = new["warc_ts"] + _dt.timedelta(microseconds=1)
        updated.append(new)

    result = {"updated": len(updated), "missing": missing,
              "generation_file": None}
    if not updated:
        return result

    os.makedirs(adir, exist_ok=True)
    gen_path = os.path.join(adir, f"upd-{len(gen_files):06d}.parquet")
    df = pd.DataFrame(updated)
    t = pa.Table.from_pandas(df, preserve_index=False)
    for i, f in enumerate(t.schema):  # pandas promotes to ns; index is µs
        if pa.types.is_timestamp(f.type) and f.type.unit != "us":
            t = t.set_column(i, f.name, pa.compute.cast(
                t[f.name], pa.timestamp("us")))
    _pq.write_table(t, gen_path)
    result["generation_file"] = gen_path

    from .build import append_index

    append_index([gen_path], index_root, lang=lang,
                 fingerprint=fingerprint or f"atomic-{len(gen_files)}")
    return result
