"""Delta import and index replication.

Two ingest/ops surfaces the reference ships that were previously out of
slice here:

- **delta_import** — DataImportHandler delta-import analog (reference:
  solr/contrib/dataimporthandler/src/java/org/apache/solr/handler/
  dataimport/DataImporter.java + delta-query semantics, branch_8x): pull
  only rows newer than the last imported watermark and append them. The
  watermark predicate is PUSHED INTO the parquet read (row-group pruning
  at the storage layer — a delta over a 100 TB source scans only new
  row groups when the source is written time-partitioned), and the new
  watermark is the max over the imported delta, computed distributed.

- **replicate_index** — master→replica segment pull (reference: solr/
  core/src/java/org/apache/solr/handler/ReplicationHandler.java +
  IndexFetcher.java ~1,800 LoC, branch_8x): the replica fetches only
  segment directories it does not already have (generation-addressed,
  immutable once published — same invariant Lucene relies on), then
  atomically adopts the master's manifest. Copies run as a wave of
  per-partition Ray tasks (on a real cluster: replica-local pulls from
  shared storage), and a failed pull never corrupts the replica: the
  manifest flips only after every segment landed.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow.dataset as pa_ds
import ray
import ray.data

from ..state.manifest import (
    partition_segments,
    read_root_manifest,
    write_root_manifest,
)
from .build import append_index

__all__ = ["delta_import", "replicate_index"]


def delta_import(
    input_paths: List[str],
    index_root: str,
    watermark_col: str = "warc_ts",
    lang: Optional[str] = "en",
    **append_kwargs,
) -> Dict:
    """Append only rows with ``watermark_col`` strictly newer than the
    last imported watermark, then advance it. With no stored watermark
    yet, ``since`` (epoch micros) seeds it — typically the max timestamp
    of the initial full build; unset, the first call imports every row
    (DIH full-import fallback; upserts keep that idempotent). Returns
    the append result plus ``imported_docs`` and the new watermark."""
    since = append_kwargs.pop("since", None)
    root = read_root_manifest(index_root)
    wm = root.get("delta_watermark", since)  # epoch micros of last import

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    flt = None
    if wm is not None:
        # pushed into the read: parquet row-group stats skip old groups
        flt = pa_ds.field(watermark_col) > pa_ds.scalar(
            np.datetime64(int(wm), "us")
        )
    ds = ray.data.read_parquet(
        input_paths,
        columns=["url", "warc_ts", "text", "lang"],
        filter=flt,
        override_num_blocks=max(4 * ncpu, 64),
    )
    # distributed max over the delta (tiny: one value per block)
    mx = ds.max(watermark_col)
    if mx is None:
        return {"imported_docs": 0, "delta_watermark": wm, "noop": True}
    new_wm = int(pd.Timestamp(mx).value // 1000)  # ns -> epoch micros
    res = append_index(
        input_paths, index_root, lang=lang, dataset=ds, **append_kwargs
    )
    root = read_root_manifest(index_root)  # re-read: append rewrote it
    root["delta_watermark"] = new_wm
    write_root_manifest(index_root, root)
    res["imported_docs"] = res.get("num_live_docs", res.get("num_docs"))
    res["delta_watermark"] = new_wm
    return res


def replicate_index(src_root: str, dst_root: str) -> Dict:
    """Pull segments the replica is missing, then adopt the master's
    manifest. Segment dirs are generation-addressed and immutable after
    publish, so presence ⇒ up to date (the IndexFetcher filename+size
    check collapses to a directory-existence check). Returns
    {"fetched": [...], "skipped": [...]}."""
    src_manifest = read_root_manifest(src_root)
    P = src_manifest["num_partitions"]
    os.makedirs(os.path.join(dst_root, "segments"), exist_ok=True)

    want: List[tuple] = []
    skipped: List[str] = []
    for pid in range(P):
        for seg in partition_segments(src_root, pid):
            rel = os.path.relpath(seg, src_root)
            if os.path.exists(os.path.join(dst_root, rel, "manifest.json")):
                skipped.append(rel)
            else:
                want.append(rel)

    @ray.remote(num_cpus=1)
    def fetch(rel: str) -> str:
        src = os.path.join(src_root, rel)
        dst = os.path.join(dst_root, rel)
        tmp = dst + ".fetch"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(src, tmp)
        if os.path.exists(dst):  # lost a race to another fetch wave
            shutil.rmtree(tmp)
        else:
            os.replace(tmp, dst)  # atomic adopt: never a half-copied dir
        return rel

    fetched = ray.get([fetch.remote(r) for r in want])

    # stats tables ship with the manifest flip (small, immutable per gen)
    stats_src = os.path.join(src_root, "stats")
    if os.path.isdir(stats_src):
        stats_dst = os.path.join(dst_root, "stats")
        shutil.rmtree(stats_dst, ignore_errors=True)
        shutil.copytree(stats_src, stats_dst)
    write_root_manifest(dst_root, src_manifest)
    sentinel = os.path.join(src_root, ".lifecycle_complete")
    if os.path.exists(sentinel):
        shutil.copy(sentinel, os.path.join(dst_root, ".lifecycle_complete"))
    return {"fetched": sorted(fetched), "skipped": sorted(skipped),
            "generation_count": len(fetched) + len(skipped)}
