"""Index + segment manifests: lineage, metrics, atomic publish, resume.

Analog of Lucene's ``segments_N`` commit point and Solr's cluster state
(reference: lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java,
solr/core/src/java/org/apache/solr/cloud/ZkController.java, branch_8x;
SURVEY.md §3.4, §4): every per-partition segment directory carries a
``manifest.json`` written LAST into a temp dir that is atomically renamed
into place (the commit), and the index root carries ``MANIFEST.json``
listing global stats + the partition set. Resume = scan for valid
partition manifests whose lineage (input fingerprint + analyzer spec hash
+ partition count) matches the current build config, and skip them.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

FORMAT_VERSION = 1

__all__ = [
    "FORMAT_VERSION",
    "segment_dir",
    "partition_segments",
    "next_gen_dir",
    "write_segment_manifest",
    "read_segment_manifest",
    "valid_segment",
    "publish_segment",
    "write_root_manifest",
    "read_root_manifest",
    "list_valid_partitions",
]


def segment_dir(index_root: str, partition_id: int) -> str:
    return os.path.join(index_root, "segments", f"part-{partition_id:05d}")


def partition_segments(index_root: str, partition_id: int) -> List[str]:
    """All live segment dirs of a partition, oldest first: the base
    ``part-XXXXX`` plus any append generations ``part-XXXXX.gN`` (the
    multi-segment-per-shard state between appends and merges — Lucene's
    per-core segment list, SegmentInfos analog). Generations recorded in
    the base manifest's ``merged_gens`` are already folded into the base —
    they are skipped even if an interrupted merge left their dirs behind."""
    import glob as _glob

    base = segment_dir(index_root, partition_id)
    live_base = base
    if not os.path.exists(os.path.join(base, "manifest.json")) and os.path.exists(
        os.path.join(base + ".old", "manifest.json")
    ):
        # publish crashed between rename-aside and rename-into-place: the
        # pre-publish segment survives at .old — serve it (read-only
        # recovery; the next successful publish cleans it up)
        live_base = base + ".old"
    out = []
    folded = set()
    if os.path.exists(os.path.join(live_base, "manifest.json")):
        out.append(live_base)
        m = read_segment_manifest(live_base) or {}
        folded = set(m.get("merged_gens") or [])
    gens = []
    gen_manifests = {}
    for d in _glob.glob(f"{base}.g*"):
        suffix = d.rsplit(".g", 1)[1]
        if suffix.isdigit() and os.path.exists(os.path.join(d, "manifest.json")):
            g = int(suffix)
            gens.append(g)
            gen_manifests[g] = read_segment_manifest(d) or {}
    # tiered partial merges record their folded inputs in the NEW gen's
    # manifest (the base stays untouched): union every live segment's
    # merged_gens — a gen listed there is already folded even if its dir
    # survives an interrupted cleanup
    for g in gens:
        folded |= set(gen_manifests[g].get("merged_gens") or [])
    for gen in sorted(gens):
        if gen not in folded:
            out.append(f"{base}.g{gen}")
    return out


def next_gen_dir(index_root: str, partition_id: int) -> str:
    """Next append-generation dir name for a partition: past every existing
    generation dir AND every generation folded by ANY live manifest (base
    or tiered-merge gen) — gen numbers are never reused, so merged_gens
    can never shadow a later append."""
    import glob as _glob

    base = segment_dir(index_root, partition_id)
    m = read_segment_manifest(base) or {}
    hi = max([0] + list(m.get("merged_gens") or []))
    for d in _glob.glob(f"{base}.g*"):
        suffix = d.rsplit(".g", 1)[1]
        if not suffix.isdigit():
            continue
        hi = max(hi, int(suffix))
        gm = read_segment_manifest(d) or {}
        hi = max([hi] + list(gm.get("merged_gens") or []))
    gen = hi + 1
    while os.path.exists(os.path.join(f"{base}.g{gen}", "manifest.json")):
        gen += 1
    return f"{base}.g{gen}"


def write_segment_manifest(seg_dir: str, manifest: Dict[str, Any]) -> None:
    manifest = dict(manifest, format_version=FORMAT_VERSION)
    tmp = os.path.join(seg_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(seg_dir, "manifest.json"))


def read_segment_manifest(seg_dir: str) -> Optional[Dict[str, Any]]:
    path = os.path.join(seg_dir, "manifest.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def valid_segment(seg_dir: str, lineage: Dict[str, Any]) -> bool:
    """A segment is reusable iff its manifest exists and its lineage keys
    (input_fingerprint, analyzer_hash, num_partitions, format_version)
    match the current build config."""
    m = read_segment_manifest(seg_dir)
    if m is None:
        return False
    if m.get("format_version") != FORMAT_VERSION:
        return False
    for key in ("input_fingerprint", "analyzer_hash", "num_partitions"):
        if m.get(key) != lineage.get(key):
            return False
    return True


def publish_segment(tmp_dir: str, final_dir: str) -> None:
    """Crash-safe publish: the stale final dir (if any) is renamed ASIDE
    (atomic) before the temp dir is renamed into place (atomic), then the
    aside copy is deleted. A crash between the two renames leaves
    ``final_dir + ".old"`` recoverable — discovery (partition_segments)
    falls back to it — instead of losing the old segment outright, which
    the previous rmtree-then-replace did (a merge crash in that window
    would have silently served a partial partition)."""
    os.makedirs(os.path.dirname(final_dir), exist_ok=True)
    old = final_dir + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a completed earlier publish
    had_old = os.path.exists(final_dir)
    if had_old:
        os.replace(final_dir, old)
    os.replace(tmp_dir, final_dir)
    if had_old:
        shutil.rmtree(old, ignore_errors=True)


def write_root_manifest(index_root: str, manifest: Dict[str, Any]) -> None:
    manifest = dict(manifest, format_version=FORMAT_VERSION)
    tmp = os.path.join(index_root, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(index_root, "MANIFEST.json"))


def read_root_manifest(index_root: str) -> Dict[str, Any]:
    with open(os.path.join(index_root, "MANIFEST.json")) as f:
        return json.load(f)


def list_valid_partitions(index_root: str, num_partitions: int, lineage: Dict[str, Any]) -> List[int]:
    done = []
    for pid in range(num_partitions):
        if valid_segment(segment_dir(index_root, pid), lineage):
            done.append(pid)
    return done
