"""Segment merging: fold a partition's append generations into one segment.

Re-creates the semantics of Lucene's SegmentMerger under TieredMergePolicy
(reference: lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java,
TieredMergePolicy.java, MergeState.java#DocMap, branch_8x; SURVEY.md §3.1
step 8, §4 "merge scheduling"): term streams of the input segments merge
into one sorted dictionary, docIDs are remapped through a DocMap, and
tombstoned (deleted) docs are reclaimed — after a full merge the segment is
byte-equivalent to a fresh build over the surviving docs.

Ray-Data-native execution: one merge task per partition, fanned out with
``map_batches`` over the partition list (partitions are independent — the
merge never shuffles across partitions; the only cross-partition term work
is the global-stats pass, SURVEY.md §7.3). Deterministic: merged docIDs
are assigned in url sort order, like the fresh build.

Policy: ``merge_policy="full"`` merges every generation (forceMerge(1)
analog). ``max_segments`` triggers auto-merge from append_index when a
partition's segment count exceeds it (segsPerTier analog).
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any, Dict, List

import numpy as np
import pyarrow as pa
import ray.data

from ..state.manifest import (
    next_gen_dir,
    partition_segments,
    read_segment_manifest,
    segment_dir,
)
from .segment import SegmentReader, write_segment_artifact

__all__ = [
    "merge_partition",
    "merge_partition_tiered",
    "merge_index",
    "tiered_merge_index",
]


def _decode_all_postings(reader: SegmentReader):
    """Flat (tid, docid, freq) arrays of a whole segment (term-major) —
    ONE vectorized bulk unpack of all FOR blocks (postings.py
    decode_all_postings), not a Python ``reader.postings(o)`` round-trip
    per vocabulary term (10⁵–10⁶ calls per partition on the old path)."""
    from .postings import decode_all_postings

    return decode_all_postings(
        np.asarray(reader.post), reader.block_offset, reader.df
    )


def _merge_to(
    index_root: str,
    partition_id: int,
    segs: List[str],
    readers: List[SegmentReader],
    target_dir: str,
    lineage: Dict[str, Any],
    folded_gens: List[int],
    t0: float,
) -> Dict[str, Any]:
    """Merge ``segs`` (any subset of a partition's segments) into ONE
    segment published atomically at ``target_dir``, reclaiming tombstones.
    ``folded_gens`` is recorded as the new manifest's ``merged_gens`` —
    discovery (partition_segments) shadows those generations the instant
    the target manifest appears, so cleanup of the inputs can happen (or
    crash) afterwards without duplicates or data loss. Callers remove the
    input gen dirs."""
    merged_from = [os.path.basename(s) for s in segs]

    # DocMap: live docs of every input segment, re-sorted by url
    urls_all, ts_all, dl_all, seg_maps = [], [], [], []
    for r in readers:
        import pyarrow.parquet as pq

        dm = pq.read_table(os.path.join(r.seg_dir, "docmap.parquet"))
        live = (
            np.ones(r.num_docs, dtype=bool) if r.deleted is None else ~r.deleted
        )
        urls = np.asarray(dm["url"].to_pandas(), dtype=object)
        ts = dm["warc_ts"].to_pandas().to_numpy()
        urls_all.append(urls[live])
        ts_all.append(ts[live])
        dl_all.append(r.dl[live].astype(np.int64))
        seg_maps.append(live)
    urls_cat = np.concatenate(urls_all)
    ts_cat = np.concatenate(ts_all)
    dl_cat = np.concatenate(dl_all)
    order = np.argsort(urls_cat)  # urls unique across segs (older are deleted)
    merged_urls = urls_cat[order]
    merged_ts = ts_cat[order]
    merged_dl = dl_cat[order]
    n_docs = len(merged_urls)

    if n_docs == 0:
        # deleteByQuery can tombstone EVERY doc of the inputs: publish an
        # empty segment (still recording merged_gens so interrupted .gN
        # cleanup stays shadowed)
        from .segment import _build_empty_segment_at

        return _build_empty_segment_at(
            partition_id,
            target_dir,
            lineage,
            t0,
            extra_manifest={
                "merged_gens": folded_gens,
                "merged_from": merged_from,
            },
            store_positions=all(
                bool(getattr(r, "has_positions", False)) for r in readers
            ),
        )

    # per-segment old docid -> merged docid (-1 = deleted)
    docmaps = []
    for r, live, urls in zip(readers, seg_maps, urls_all):
        m = np.full(r.num_docs, -1, dtype=np.int64)
        m[np.nonzero(live)[0]] = np.searchsorted(merged_urls, urls)
        docmaps.append(m)

    # merged vocabulary (terms whose postings all died are dropped below);
    # as_object() is the documented offline materialization of TermDict —
    # merge is a batch path, never a searcher actor
    vocab_cat = np.concatenate([r.terms.as_object() for r in readers])
    merged_vocab = np.unique(vocab_cat)

    # positions survive the merge iff every input segment carries them
    # (Lucene's SegmentMerger preserves the .pos stream; mixed inputs are a
    # broken index state and refused loudly rather than silently dropped)
    pos_flags = [bool(getattr(r, "has_positions", False)) for r in readers]
    store_positions = all(pos_flags)
    if any(pos_flags) and not store_positions:
        raise ValueError(
            f"partition {partition_id}: segments disagree on positions "
            f"({dict(zip([os.path.basename(s) for s in segs], pos_flags))}) — "
            "cannot merge without silently dropping phrase capability"
        )

    tid_chunks, docid_chunks, freq_chunks, pos_chunks = [], [], [], []
    for r, dmap in zip(readers, docmaps):
        tids, docids, freqs = _decode_all_postings(r)
        new_docids = dmap[docids]
        keep = new_docids >= 0
        tid_map = np.searchsorted(merged_vocab, r.terms.as_object())
        tid_chunks.append(tid_map[tids[keep]])
        docid_chunks.append(new_docids[keep])
        freq_chunks.append(freqs[keep])
        if store_positions:
            # the segment's flat positions array is term-major in exactly
            # the (tids, docids, freqs) entry order — gather the kept
            # entries' position slices
            flat = np.asarray(r.pos)
            src_off = np.zeros(len(freqs) + 1, dtype=np.int64)
            np.cumsum(freqs.astype(np.int64), out=src_off[1:])
            kept_freqs = freqs[keep].astype(np.int64)
            out_off = np.zeros(len(kept_freqs) + 1, dtype=np.int64)
            np.cumsum(kept_freqs, out=out_off[1:])
            gather = np.arange(int(out_off[-1]), dtype=np.int64) + np.repeat(
                src_off[:-1][keep] - out_off[:-1], kept_freqs
            )
            pos_chunks.append(flat[gather])
    tids = np.concatenate(tid_chunks) if tid_chunks else np.empty(0, dtype=np.int64)
    docids = np.concatenate(docid_chunks) if docid_chunks else np.empty(0, dtype=np.int64)
    freqs = np.concatenate(freq_chunks) if freq_chunks else np.empty(0, dtype=np.uint32)

    # drop now-empty terms, compact ordinals
    live_tids = np.unique(tids)
    if len(live_tids) < len(merged_vocab):
        remap = np.full(len(merged_vocab), -1, dtype=np.int64)
        remap[live_tids] = np.arange(len(live_tids))
        tids = remap[tids]
        merged_vocab = merged_vocab[live_tids]

    post_order = np.lexsort((docids, tids))
    positions_s = None
    if store_positions:
        # reorder the concatenated per-entry position slices into the
        # merged (term, docid) posting order — same DocMap-style gather the
        # fresh build uses (segment.py build_segment_at)
        flat_cat = (
            np.concatenate(pos_chunks) if pos_chunks else np.empty(0, dtype=np.int32)
        )
        f64 = freqs.astype(np.int64)
        src_off = np.zeros(len(f64) + 1, dtype=np.int64)
        np.cumsum(f64, out=src_off[1:])
        ordered_freqs = f64[post_order]
        out_off = np.zeros(len(ordered_freqs) + 1, dtype=np.int64)
        np.cumsum(ordered_freqs, out=out_off[1:])
        gather = np.arange(int(out_off[-1]), dtype=np.int64) + np.repeat(
            src_off[:-1][post_order] - out_off[:-1], ordered_freqs
        )
        positions_s = flat_cat[gather]
    return write_segment_artifact(
        target_dir,
        partition_id,
        merged_vocab,
        tids[post_order],
        docids[post_order],
        freqs[post_order],
        merged_dl,
        pa.array(list(merged_urls), type=pa.string()),
        pa.array(list(merged_ts), type=pa.timestamp("us")),
        lineage,
        t0,
        extra_manifest={
            "merged_gens": folded_gens,
            "merged_from": merged_from,
        },
        positions_s=positions_s,
    )


def _gen_number(seg_dir_path: str) -> int:
    name = os.path.basename(seg_dir_path)
    return int(name.rsplit(".g", 1)[1]) if ".g" in name else -1


def merge_partition(index_root: str, partition_id: int, lineage: Dict[str, Any]) -> Dict[str, Any]:
    """Merge ALL of a partition's segments (+ reclaim deletes) into one —
    the forceMerge(1) analog.

    No-op if the partition already has a single segment without deletes.
    Publish order is crash-safe: the merged base segment (whose manifest
    records ``merged_gens``) replaces part-XXXXX atomically FIRST; stale
    .gN dirs are removed after and ignored by discovery if removal is
    interrupted (partition_segments consults merged_gens)."""
    segs = partition_segments(index_root, partition_id)
    readers = [SegmentReader(s) for s in segs]
    if len(segs) <= 1 and (not readers or readers[0].deleted is None):
        m = read_segment_manifest(segs[0]) if segs else {}
        return {**(m or {}), "merged": False}
    t0 = time.perf_counter()
    # cumulative: gens folded now ∪ gens folded by earlier merges (their
    # dirs may survive an interrupted cleanup and must stay shadowed)
    folded = set()
    for s in segs:
        m = read_segment_manifest(s) or {}
        folded |= set(m.get("merged_gens") or [])
        g = _gen_number(s)
        if g >= 0:
            folded.add(g)
    summary = _merge_to(
        index_root, partition_id, segs, readers,
        segment_dir(index_root, partition_id), lineage, sorted(folded), t0,
    )
    # reclaim stale generation dirs (discovery ignores them if this is
    # interrupted, via merged_gens in the base manifest)
    for s in segs:
        if ".g" in os.path.basename(s):
            shutil.rmtree(s, ignore_errors=True)
    return {**summary, "merged": True}


def merge_partition_tiered(
    index_root: str,
    partition_id: int,
    lineage: Dict[str, Any],
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
) -> Dict[str, Any]:
    """ONE TieredMergePolicy-style merge step for a partition (reference:
    lucene/core/src/java/org/apache/lucene/index/TieredMergePolicy.java
    ~900 LoC, branch_8x): when the live segment count exceeds
    ``segs_per_tier``, fold the SMALLEST ``max_merge_at_once`` append
    generations (by live doc count) into one new generation — the base
    and the large generations are never rewritten, so merge I/O stays
    proportional to the small tier instead of the whole partition (at
    10¹²-doc scale a forceMerge(1) per ingest cycle would rewrite the
    index every time). Returns {"merged": bool, "segments": live count}."""
    segs = partition_segments(index_root, partition_id)
    if len(segs) <= segs_per_tier:
        return {"merged": False, "segments": len(segs)}
    gens = [s for s in segs if ".g" in os.path.basename(s)]
    if len(gens) < 2:
        return {"merged": False, "segments": len(segs)}
    readers = {s: SegmentReader(s) for s in gens}
    chosen = sorted(gens, key=lambda s: readers[s].num_live_docs)[:max_merge_at_once]
    if len(chosen) < 2:
        return {"merged": False, "segments": len(segs)}
    t0 = time.perf_counter()
    folded = set()
    for s in chosen:
        folded.add(_gen_number(s))
        m = read_segment_manifest(s) or {}
        folded |= set(m.get("merged_gens") or [])
    target = next_gen_dir(index_root, partition_id)
    summary = _merge_to(
        index_root, partition_id, chosen, [readers[s] for s in chosen],
        target, lineage, sorted(folded), t0,
    )
    for s in chosen:
        shutil.rmtree(s, ignore_errors=True)
    live = len(partition_segments(index_root, partition_id))
    return {**summary, "merged": True, "segments": live}


def merge_index(index_root: str, concurrency: int = None) -> Dict[str, Any]:
    """Merge every partition (one Ray task per partition), then refresh
    global stats and the root manifest."""
    from ..index.stats import compute_global_stats
    from ..pipelines.build import refresh_root_manifest
    from ..state.manifest import read_root_manifest

    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    lineage = {
        "input_fingerprint": root.get("input_fingerprint"),
        "analyzer_hash": root.get("analyzer_hash"),
        "num_partitions": P,
    }

    def do_merge(batch: pa.Table) -> pa.Table:
        merged = []
        for pid in batch["pid"].to_pylist():
            s = merge_partition(index_root, int(pid), lineage)
            merged.append(bool(s.get("merged")))
        return pa.table({"merged": pa.array(merged)})

    ds = ray.data.from_items([{"pid": p} for p in range(P)], override_num_blocks=P)
    n_merged = sum(
        int(b["merged"].to_numpy(zero_copy_only=False).sum())
        for b in ds.map_batches(do_merge, batch_size=1, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    compute_global_stats(index_root, P)
    new_root = refresh_root_manifest(index_root, P, root)
    return {**new_root, "partitions_merged": n_merged}


def tiered_merge_index(
    index_root: str,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    concurrency: int = None,
) -> Dict[str, Any]:
    """Run TieredMergePolicy steps across every partition until each is at
    or under ``segs_per_tier`` live segments (one Ray task per partition
    per round — partitions are independent, no shuffle), then refresh
    global stats (tombstone reclamation changes df/total_tf exactly like a
    full merge). The per-partition loop converges: every step folds ≥2
    generations."""
    from ..index.stats import compute_global_stats
    from ..pipelines.build import refresh_root_manifest
    from ..state.manifest import read_root_manifest

    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    lineage = {
        "input_fingerprint": root.get("input_fingerprint"),
        "analyzer_hash": root.get("analyzer_hash"),
        "num_partitions": P,
    }

    def do_tiered(batch: pa.Table) -> pa.Table:
        steps = []
        for pid in batch["pid"].to_pylist():
            n = 0
            while True:
                s = merge_partition_tiered(
                    index_root, int(pid), lineage,
                    segs_per_tier=segs_per_tier,
                    max_merge_at_once=max_merge_at_once,
                )
                if not s.get("merged"):
                    break
                n += 1
            steps.append(n)
        return pa.table({"steps": pa.array(steps, type=pa.int64())})

    ds = ray.data.from_items([{"pid": p} for p in range(P)], override_num_blocks=P)
    total_steps = sum(
        int(b["steps"].to_numpy().sum())
        for b in ds.map_batches(do_tiered, batch_size=1, batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if total_steps:
        compute_global_stats(index_root, P)
        refresh_root_manifest(index_root, P, root)
    return {"merge_steps": total_steps, "num_partitions": P}
