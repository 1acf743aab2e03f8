"""Index build pipeline: pages parquet → partitioned segment index.

The Ray-Data re-expression of the reference ingest path (SURVEY.md §3.1;
reference trace: JsonLoader → UpdateRequestProcessorChain →
DistributedUpdateProcessor hash routing → DWPT analysis/accumulation →
flush → TieredMergePolicy merges → commit, branch_8x):

    read_parquet(columns pruned — the multi-MB html column NEVER leaves
                 storage unless the extraction check is on)
      → [optional] text-extraction invariant check (stateless map_batches)
      → lang filter (vectorized arrow predicate)
      → route: part_key = crc32(url) % P   (stateless map_batches)
      → [resume] drop rows of already-built partitions (done-set filter,
                 broadcast — skipped rows never reach the analyzer)
      → analyzer actor pool (stateful map_batches, zero-copy Arrow)
      → groupby(part_key).map_groups(segment writer)   ← THE shuffle
      → per-partition segment artifact, atomically published
      → global stats pass (groupby term over pre-aggregated term tables)
      → root MANIFEST.json (the segments_N commit point analog)

One partition == one segment == one unit of resume. Deduplication
(last-wins by warc_ts) happens INSIDE the partition writer — the hash
route already co-locates all versions of a url, so dedup costs no extra
shuffle (SURVEY.md §7.3).
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..index.partitioner import part_keys
from ..index.segment import build_segment
from ..index.stats import compute_global_stats
from ..stages.analyzer import DEFAULT_SPEC, AnalyzerStage, analyzer_spec_hash
from ..state.manifest import (
    list_valid_partitions,
    next_gen_dir,
    partition_segments,
    read_root_manifest,
    read_segment_manifest,
    segment_dir,
    write_root_manifest,
)

__all__ = ["build_index", "append_index", "refresh_root_manifest", "input_fingerprint"]


def input_fingerprint(paths: List[str]) -> str:
    """Stable identity of the input file set (name + size), part of every
    segment's lineage — resume invalidates when the input changes."""
    h = hashlib.sha256()
    for p in sorted(paths):
        try:
            size = os.path.getsize(p)
        except OSError:
            size = -1
        h.update(f"{os.path.basename(p)}:{size};".encode())
    return h.hexdigest()[:16]


def _check_extraction_invariant(batch: pa.Table) -> pa.Table:
    """Per-row invariant from BASELINE.json:15: extracted text must be
    byte-identical per url. Our synthetic html wraps text invertibly
    (FIXTURES.md §1); rows violating the invariant fail the build loudly
    (the reference's analog: Tika extraction is deterministic per url).
    Vectorized: rebuild wrap(text) with one element-wise join and compare
    whole-row bytes — equality of html and wrap(text) implies the inner
    slice equals text AND the wrapper is intact (strictly stronger than
    slicing out the middle). Rows with null html are exempt."""
    html = batch["html"]
    expect = pc.cast(
        pc.binary_join_element_wise(
            "<html><body><p>", batch["text"], "</p></body></html>", ""
        ),
        pa.binary(),
    )
    eq = pc.equal(html, expect)  # null where html or text is null
    bad = pc.and_(
        pc.is_valid(html), pc.invert(pc.coalesce(eq, False))
    )
    if pc.any(bad).as_py():
        i = int(np.argmax(bad.combine_chunks().to_numpy(zero_copy_only=False)))
        raise ValueError(
            f"text-extraction invariant violated for url={batch['url'][i]}"
        )
    return batch.drop_columns(["html"])


def build_index(
    input_paths: List[str],
    index_root: str,
    num_partitions: int,
    lang: Optional[str] = "en",
    resume: bool = True,
    check_extraction: bool = False,
    analyzer_concurrency=None,
    analyzer_batch_size: int = 512,
    dataset=None,
    fingerprint: Optional[str] = None,
    analyzer_spec: Optional[Dict] = None,
    max_docs_per_segment: Optional[int] = None,
    store_positions: bool = False,
    shuffle: str = "runs",
    spill_batch_rows: int = 32768,
    pre_stages=None,
) -> Dict:
    """Build (or resume) the full index; returns the root manifest dict.

    ``dataset``: an already-constructed pages Dataset (adapter output)
    instead of reading ``input_paths`` — then ``fingerprint`` must identify
    the upstream input for resume lineage.
    ``analyzer_spec``: tokenizer + filter-chain config (analysis/filters.py
    registry); its hash is part of lineage, so changing it invalidates
    resumed partitions.
    ``pre_stages``: UpdateRequestProcessor-chain analog (stages/urp.py) —
    a JSON-able list of named per-batch transform stages applied BEFORE
    routing/analysis; its hash is part of lineage too.
    ``shuffle``: how analyzed rows reach their partition's segment writer.
    ``"runs"`` (default) streams map-side spill files per partition under
    ``index_root/_runs/`` — the classic M×P shuffle-file exchange through
    shared storage (index_root already must be shared on a real cluster) —
    then builds each partition from its run files as an independent task:
    no global sort barrier, no all-to-all through the object store, and
    spilling overlaps analysis. ``"groupby"`` is the old sort-based
    ``groupby(part_key).map_groups`` path (kept for A/B benchmarking; its
    sort barrier was a ~12s constant floor that capped scaling)."""
    t0 = time.perf_counter()
    os.makedirs(os.path.join(index_root, "segments"), exist_ok=True)
    spec = dict(analyzer_spec or DEFAULT_SPEC)
    from ..stages.urp import build_stage_chain, stage_chain_hash

    lineage = {
        "input_fingerprint": fingerprint or input_fingerprint(input_paths),
        "analyzer_hash": analyzer_spec_hash(
            {**spec, "positions": store_positions,
             "pre_stages": stage_chain_hash(pre_stages)}
        ),
        "num_partitions": num_partitions,
    }

    done: List[int] = (
        list_valid_partitions(index_root, num_partitions, lineage) if resume else []
    )
    done_set = frozenset(done)

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if dataset is not None:
        ds = dataset
    else:
        columns = ["url", "warc_ts", "text", "lang"]
        if check_extraction:
            columns.append("html")
        # enough read blocks that every core streams batches concurrently
        # (32 input files would otherwise cap the read at 32-way)
        ds = ray.data.read_parquet(
            input_paths, columns=columns, override_num_blocks=max(4 * ncpu, 64)
        )

    if check_extraction:
        ds = ds.map_batches(_check_extraction_invariant, batch_format="pyarrow")
    for stage_fn in build_stage_chain(pre_stages):
        ds = ds.map_batches(stage_fn, batch_format="pyarrow")
    if lang is not None:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lang)), batch_format="pyarrow"
        )
    ds = ds.drop_columns(["lang"])

    P = num_partitions

    def route(batch: pa.Table) -> pa.Table:
        pk = part_keys(batch["url"], P)
        out = batch.append_column("part_key", pa.array(pk))
        if done_set:
            keep = ~np.isin(pk, np.fromiter(done_set, dtype=np.int32))
            out = out.filter(pa.array(keep))
        return out

    ds = ds.map_batches(route, batch_format="pyarrow")

    if analyzer_concurrency is None:
        # FIXED-size actor pool (autoscaling from 1 ramps far too slowly —
        # measured 3.5x slower at 32 CPUs), sized to the session CPUs minus
        # a few for the read+spill tasks: a pool that reserves every CPU
        # starves the upstream ReadParquet tasks and deadlocks the streaming
        # executor on a small node. At mid widths the reserve must scale
        # with the pool — ncpu-1 at 8 CPUs left ONE slot for ~25 core-s of
        # read+spill work, serializing it behind the pool (measured 26.5 s
        # → 19.2 s at 8 CPUs just by freeing a second task slot).
        if ncpu > 8:
            analyzer_concurrency = max(2, ncpu - 4)
        else:
            analyzer_concurrency = max(1, ncpu - max(1, ncpu // 4))
    ds = ds.map_batches(
        AnalyzerStage,
        fn_constructor_kwargs={
            "num_partitions": P,
            "spec": spec,
            "store_positions": store_positions,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=analyzer_batch_size,
        concurrency=analyzer_concurrency,
    )

    def write_partition(group: pa.Table, pid: Optional[int] = None) -> pa.Table:
        from ..index.segment import _dedup_sort, build_segment_at

        if pid is None:
            pid = int(group["part_key"][0].as_py())
        if max_docs_per_segment and group.num_rows > max_docs_per_segment:
            # memory-bounded flush (SURVEY.md §4 "memory pressure": spill a
            # too-big partition to multiple url-range segments — the DWPT
            # flush-at-ramBufferSizeMB analog). Dedup/sort ONCE so ranges
            # are disjoint; each chunk becomes base + generation segments,
            # searched exactly like append generations.
            sorted_tbl = _dedup_sort(group)
            n = sorted_tbl.num_rows
            chunks = [
                sorted_tbl.slice(s, min(max_docs_per_segment, n - s))
                for s in range(0, n, max_docs_per_segment)
            ]
            _cleanup_stale_gens(pid, keep_below=len(chunks))
            extra = []
            for i, chunk in enumerate(chunks[1:], start=1):
                extra.append(
                    build_segment_at(
                        chunk, pid, segment_dir(index_root, pid) + f".g{i}", lineage
                    )
                )
            # base LAST: its manifest is the partition's validity marker, so
            # a crash mid-split leaves the partition invalid → fully rebuilt
            summary = build_segment(chunks[0], pid, index_root, lineage)
            for s in extra:
                for k in ("docs", "terms", "postings", "sum_dl", "postings_bytes"):
                    summary[k] += s[k]
            return pa.table({k: [v] for k, v in summary.items()})
        _cleanup_stale_gens(pid, keep_below=1)
        summary = build_segment(group, pid, index_root, lineage)
        return pa.table({k: [v] for k, v in summary.items()})

    def _cleanup_stale_gens(pid: int, keep_below: int) -> None:
        """A rebuilt partition owns its whole dir family: generation dirs at
        or above the new split count are leftovers of an older run."""
        import glob as _glob
        import shutil as _shutil

        base = segment_dir(index_root, pid)
        for d in _glob.glob(f"{base}.g*"):
            suffix = d.rsplit(".g", 1)[1]
            if suffix.isdigit() and int(suffix) >= keep_below:
                _shutil.rmtree(d, ignore_errors=True)

    phases: Dict[str, float] = {}
    t_ph = time.perf_counter()
    if shuffle == "groupby":
        summaries = ds.groupby("part_key").map_groups(
            write_partition, batch_format="pyarrow"
        ).to_pandas()
        phases["analyze_shuffle_write"] = round(time.perf_counter() - t_ph, 3)
        # partitions that received no rows (or were resumed) still need
        # artifacts
        built = set(summaries["partition_id"].tolist()) if len(summaries) else set()
        for pid in range(P):
            if pid in built or pid in done_set:
                continue
            build_segment(_empty_analyzed_table(), pid, index_root, lineage)
        t_ph = time.perf_counter()
        compute_global_stats(index_root, P)
        phases["global_stats"] = round(time.perf_counter() - t_ph, 3)
    else:
        import gc
        import shutil as _sh

        runs_dir = os.path.join(index_root, "_runs")
        if os.path.exists(runs_dir):
            _sh.rmtree(runs_dir)  # stale spill from a crashed build
        os.makedirs(runs_dir)
        _spill_runs(ds, runs_dir, P, spill_batch_rows)
        # drop EVERY reference to the pipeline before the build wave: a
        # finished-but-referenced Dataset keeps its actor pool's CPU
        # reservation alive, which would starve the wave's tasks (measured:
        # 1 of 2 CPUs held at num_cpus=2 until the object is GC'd)
        ds = None
        gc.collect()
        phases["analyze_spill"] = round(time.perf_counter() - t_ph, 3)
        _build_via_runs(
            runs_dir, index_root, P, write_partition, phases, done_set
        )

    root = refresh_root_manifest(
        index_root,
        P,
        {
            "analyzer_spec": spec,
            "lang_filter": lang,
            "store_positions": store_positions,
            "build_wall_sec": round(time.perf_counter() - t0, 3),
            "build_phases": phases,
            "resumed_partitions": sorted(done_set),
            **lineage,
        },
    )
    return root


def _spill_runs(ds, runs_dir: str, P: int, spill_batch_rows: int) -> None:
    """Map-side shuffle spill: stream analyzed batches into per-partition
    run files under ``runs_dir/part-XXXXX/`` (the Spark-style M×P
    shuffle-file exchange, using shared storage as the exchange medium —
    the analog of Solr's hash-routed forward to the shard leader,
    reference solr/core/src/java/org/apache/solr/update/processor/
    DistributedUpdateProcessor.java, branch_8x). Spill tasks run as the
    analyzer produces blocks — no sort, no barrier beyond the inherent
    all-rows-before-segment-build one."""
    import uuid

    def spill(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"rows": pa.array([0], type=pa.int64())})
        from pyarrow import feather as _ft

        pk = batch["part_key"].to_numpy()
        order = np.argsort(pk, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        pks = pk[order]
        bounds = np.nonzero(np.diff(pks))[0] + 1
        starts = [0, *bounds.tolist(), len(pks)]
        uid = uuid.uuid4().hex
        for i in range(len(starts) - 1):
            s, e = starts[i], starts[i + 1]
            pdir = os.path.join(runs_dir, f"part-{int(pks[s]):05d}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, f".{uid}.tmp")
            # run files are transient (deleted after the build wave):
            # feather/IPC + lz4 writes at near-memcpy speed — parquet's
            # heavier encode was pure overhead on the critical path
            _ft.write_feather(sorted_batch.slice(s, e - s), tmp, compression="lz4")
            os.replace(tmp, os.path.join(pdir, f"run-{uid}.feather"))
        return pa.table({"rows": pa.array([batch.num_rows], type=pa.int64())})

    ds.map_batches(
        spill, batch_format="pyarrow", batch_size=spill_batch_rows
    ).materialize()


def _empty_analyzed_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "warc_ts": pa.array([], type=pa.timestamp("us")),
            "part_key": pa.array([], type=pa.int32()),
            "terms": pa.array([], type=pa.list_(pa.string())),
            "freqs": pa.array([], type=pa.list_(pa.int32())),
            "dl": pa.array([], type=pa.int32()),
        }
    )


def _term_shard_keys(terms, num_shards: int) -> np.ndarray:
    """Vectorized deterministic shard key per term. Shard assignment only
    controls stats file layout within one build (read-back filters by term
    value), so any stable vectorized hash works; polars' hash kernel
    replaces the old per-term Python crc32 loop."""
    try:
        import polars as pl

        h = pl.from_arrow(
            terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        ).hash(seed=0)
        return (h % num_shards).to_numpy().astype(np.int32)
    except Exception:
        import zlib

        vals = terms.to_pylist()
        return np.fromiter(
            (zlib.crc32(t.encode("utf-8")) % num_shards for t in vals),
            dtype=np.int32,
            count=len(vals),
        )


def _spill_partition_stats(index_root: str, pid: int, stats_runs: str, num_shards: int) -> None:
    """Map side of the global-stats aggregation, fused into the segment
    build wave: pre-sum this partition's live segments' term tables (bounds
    any term's global group to ≤ P rows — the primary head-term skew
    defense) and append the result, split by term-hash shard, under
    ``stats_runs/shard-SSSS/``."""
    import pyarrow.parquet as _pq

    from ..state.manifest import partition_segments

    tabs = []
    for seg in partition_segments(index_root, pid):
        f = os.path.join(seg, "terms.parquet")
        if os.path.exists(f):
            t = _pq.read_table(f, columns=["term", "df", "total_tf"])
            if t.num_rows:
                # per-segment dictionaries store df as int32; the pre-sum
                # below widens to int64 ONLY when >1 segment spilled, so a
                # sparse append (one touched partition aggregates, others
                # pass through) would hand reduce_shard mixed schemas —
                # normalize here
                tabs.append(t.set_column(
                    t.schema.get_field_index("df"), "df",
                    pc.cast(t["df"], pa.int64()),
                ))
    if not tabs:
        return
    t = pa.concat_tables(tabs)
    if len(tabs) > 1:
        t = t.group_by("term").aggregate([("df", "sum"), ("total_tf", "sum")])
        t = t.select(["term", "df_sum", "total_tf_sum"]).rename_columns(
            ["term", "df", "total_tf"]
        )
    sh = _term_shard_keys(t["term"], num_shards)
    order = np.argsort(sh, kind="stable")
    t = t.take(pa.array(order))
    sh = sh[order]
    bounds = np.nonzero(np.diff(sh))[0] + 1
    starts = [0, *bounds.tolist(), len(sh)]
    for i in range(len(starts) - 1):
        s, e = starts[i], starts[i + 1]
        sdir = os.path.join(stats_runs, f"shard-{int(sh[s]):04d}")
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, f".part-{pid:05d}.tmp")
        _pq.write_table(t.slice(s, e - s), tmp)
        os.replace(tmp, os.path.join(sdir, f"part-{pid:05d}.parquet"))


def _build_via_runs(
    runs_dir: str, index_root: str, P: int, write_partition,
    phases: Dict, done_set: frozenset,
) -> None:
    """Runs-exchange segment build + fused global stats:

    1. spill analyzed rows to per-partition run files (streams with the
       analyzer — no sort barrier);
    2. ONE wave of P independent tasks: build each partition's segment from
       its runs (or an empty artifact, or skip if resumed) and emit its
       pre-summed term-stats shards — the stats map-side re-read of
       terms.parquet is page-cache-warm, so fusing it here removes a whole
       extra Dataset pipeline over the index;
    3. one small wave of S shard-reduce tasks → stats/global_stats/.

    The waves are fixed-size sets of independent side-effecting tasks (each
    writes its own artifact directory), so they run as plain ``ray.remote``
    tasks rather than a Dataset pipeline — Dataset startup + block
    accounting was a measurable constant floor at high parallelism, which
    is exactly what the N→4N scaling bar punishes."""
    import shutil

    t_ph = time.perf_counter()
    has_runs = frozenset(
        int(d.rsplit("-", 1)[1]) for d in os.listdir(runs_dir) if d.startswith("part-")
    )
    num_shards = max(8, P // 8)
    stats_runs = os.path.join(index_root, "_stats_runs")
    shutil.rmtree(stats_runs, ignore_errors=True)
    os.makedirs(stats_runs)

    @ray.remote(num_cpus=1)
    def build_one(pid: int) -> float:
        import glob as _glob

        t0 = time.perf_counter()
        if pid not in done_set:
            if pid in has_runs:
                from pyarrow import feather as _ft

                pdir = os.path.join(runs_dir, f"part-{pid:05d}")
                files = sorted(_glob.glob(os.path.join(pdir, "run-*.feather")))
                group = pa.concat_tables([_ft.read_table(f) for f in files])
                write_partition(group, pid=pid)
            else:
                write_partition(_empty_analyzed_table(), pid=pid)
        _spill_partition_stats(index_root, pid, stats_runs, num_shards)
        return time.perf_counter() - t0

    # longest-processing-time-first: submit partitions by descending run
    # bytes so the big ones start in the first wave — at width W the last
    # wave then holds the SMALL tasks, cutting the straggler tail that
    # inflates the wide leg's wall time (task order does not affect any
    # artifact: each task writes only its own partition directory)
    def _run_bytes(pid: int) -> int:
        pdir = os.path.join(runs_dir, f"part-{pid:05d}")
        try:
            with os.scandir(pdir) as it:
                return sum(e.stat().st_size for e in it if e.is_file())
        except OSError:
            return 0

    order = sorted(range(P), key=_run_bytes, reverse=True)
    secs_by_pid = dict(zip(order, ray.get([build_one.remote(pid) for pid in order])))
    task_secs = [secs_by_pid[pid] for pid in range(P)]
    shutil.rmtree(runs_dir, ignore_errors=True)
    phases["segment_build"] = round(time.perf_counter() - t_ph, 3)
    if task_secs:
        # per-task distribution: separates skew (max >> p50) from
        # bandwidth/steal inflation (p50 itself grows with cluster width)
        ts = np.sort(np.asarray(task_secs))
        phases["build_task_secs"] = {
            "p50": round(float(ts[len(ts) // 2]), 3),
            "max": round(float(ts[-1]), 3),
            "sum": round(float(ts.sum()), 3),
        }
    t_ph = time.perf_counter()

    from ..index.stats import reduce_stats_shards

    reduce_stats_shards(index_root, stats_runs, num_shards)
    phases["global_stats"] = round(time.perf_counter() - t_ph, 3)


def append_index(
    input_paths: List[str],
    index_root: str,
    lang: Optional[str] = "en",
    analyzer_batch_size: int = 512,
    max_segments_per_partition: Optional[int] = None,
    dataset=None,
    fingerprint: Optional[str] = None,
    merge_policy: str = "full",
) -> Dict:
    """Incrementally add documents to an existing index (NRT ingest analog,
    SURVEY.md §2.10): each touched partition gains one append-generation
    segment; urls that already exist in older segments are tombstoned there
    (Lucene updateDocument = delete-by-term + add — the append always wins,
    reference lucene/core/src/java/org/apache/lucene/index/IndexWriter.java
    #updateDocument, branch_8x). When a partition's segment count exceeds
    ``max_segments_per_partition`` (the TieredMergePolicy segsPerTier
    trigger), it is merged down to one (``merge_policy="full"``) or the
    smallest generations fold into one new generation
    (``merge_policy="tiered"`` — the base is never rewritten, the
    steady-state ingest policy at scale)."""
    import pyarrow.parquet as _pq

    t0 = time.perf_counter()
    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    lineage = {
        "input_fingerprint": fingerprint or input_fingerprint(input_paths),
        "analyzer_hash": root["analyzer_hash"],
        "num_partitions": P,
    }
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if dataset is not None:
        ds = dataset
    else:
        ds = ray.data.read_parquet(
            input_paths,
            columns=["url", "warc_ts", "text", "lang"],
            override_num_blocks=max(4 * ncpu, 64),
        )
    if lang is not None:
        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lang)), batch_format="pyarrow"
        )
    ds = ds.drop_columns(["lang"])

    def route(batch: pa.Table) -> pa.Table:
        pk = part_keys(batch["url"], P)
        return batch.append_column("part_key", pa.array(pk))

    ds = ds.map_batches(route, batch_format="pyarrow")
    conc = max(2, ncpu - 4) if ncpu > 8 else max(1, ncpu - 1)
    # positions flag comes from the ROOT manifest: append generations on a
    # positions-enabled index must carry positions too, or phrase queries
    # would start failing on the appended segments (the root analyzer_hash
    # already encodes the flag, so lineage stays consistent)
    store_positions = bool(root.get("store_positions", False))
    ds = ds.map_batches(
        AnalyzerStage,
        fn_constructor_kwargs={
            "num_partitions": P,
            "spec": root.get("analyzer_spec"),
            "store_positions": store_positions,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=analyzer_batch_size,
        concurrency=conc,
    )

    def _add_deletes(seg: str, docids) -> None:
        from ..index.segment import add_deletes

        add_deletes(seg, docids)

    def write_gen(group: pa.Table) -> pa.Table:
        from ..index.segment import build_segment_at

        pid = int(group["part_key"][0].as_py())
        gen_dir = next_gen_dir(index_root, pid)
        summary = build_segment_at(group, pid, gen_dir, lineage)
        # version resolution per url across generations, mirroring the
        # fresh build's last-wins order (max (warc_ts, dl)): the LOSING
        # side gets the tombstone, so an incrementally built index merges
        # down to exactly the fresh-build result
        ndm = _pq.read_table(
            os.path.join(gen_dir, "docmap.parquet"), columns=["local_docid", "url", "warc_ts"]
        )
        n_norm = _pq.read_table(os.path.join(gen_dir, "norms.parquet"), columns=["dl"])
        new_ts = ndm["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_dl = n_norm["dl"].to_numpy().astype(np.int64)
        new_id = ndm["local_docid"].to_numpy().astype(np.int64)
        # keep-LAST row per url (docmap row order) — an Arrow hash-agg over
        # row indices; the resulting unique url column is the probe set
        rows = pa.table(
            {"url": ndm["url"], "row": pa.array(np.arange(ndm.num_rows, dtype=np.int64))}
        )
        last = rows.group_by("url").aggregate([("row", "max")])
        sel = last["row_max"].to_numpy()
        probe_urls = last["url"].combine_chunks()
        ts_u, dl_u, id_u = new_ts[sel], new_dl[sel], new_id[sel]
        gen_tombs: list = []
        for seg in partition_segments(index_root, pid):
            if os.path.abspath(seg) == os.path.abspath(gen_dir):
                continue
            # Arrow hash probe of the old docmap against the new urls +
            # vectorized (warc_ts, dl) comparison — the old per-row Python
            # loop over every live doc was O(partition docs) Python per
            # append and dominated incremental ingest at scale
            dm = _pq.read_table(seg + "/docmap.parquet", columns=["local_docid", "url", "warc_ts"])
            nn = _pq.read_table(os.path.join(seg, "norms.parquet"), columns=["dl"])
            dpath = os.path.join(seg, "deletes.parquet")
            old_id = dm["local_docid"].to_numpy().astype(np.int64)
            alive = np.ones(len(old_id), dtype=bool)
            if os.path.exists(dpath):
                dead = _pq.read_table(dpath)["local_docid"].to_numpy().astype(np.int64)
                alive = ~np.isin(old_id, dead)
            idx = pc.index_in(dm["url"], value_set=probe_urls)
            hit = idx.is_valid().to_numpy(zero_copy_only=False) & alive
            if not hit.any():
                continue
            idxn = idx.fill_null(0).to_numpy().astype(np.int64)
            old_ts = dm["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            old_dl = nn["dl"].to_numpy().astype(np.int64)
            nts, ndl = ts_u[idxn], dl_u[idxn]
            old_wins = (old_ts > nts) | ((old_ts == nts) & (old_dl > ndl))
            gen_tombs.extend(id_u[idxn][hit & old_wins].tolist())  # new doc dies
            _add_deletes(seg, old_id[hit & ~old_wins].tolist())
        _add_deletes(gen_dir, gen_tombs)
        return pa.table({k: [v] for k, v in summary.items()})

    ds.groupby("part_key").map_groups(write_gen, batch_format="pyarrow").materialize()

    if max_segments_per_partition:
        from ..index.merge import merge_partition, merge_partition_tiered

        def maybe_merge(batch: pa.Table) -> pa.Table:
            out = []
            for pid in batch["pid"].to_pylist():
                if len(partition_segments(index_root, int(pid))) > max_segments_per_partition:
                    if merge_policy == "tiered":
                        while merge_partition_tiered(
                            index_root, int(pid), lineage,
                            segs_per_tier=max_segments_per_partition,
                        ).get("merged"):
                            pass
                    else:
                        merge_partition(index_root, int(pid), lineage)
                    out.append(True)
                else:
                    out.append(False)
            return pa.table({"merged": pa.array(out)})

        ray.data.from_items([{"pid": p} for p in range(P)], override_num_blocks=P).map_batches(
            maybe_merge, batch_size=1, batch_format="pyarrow"
        ).materialize()

    compute_global_stats(index_root, P)
    return refresh_root_manifest(
        index_root,
        P,
        {
            "analyzer_spec": root.get("analyzer_spec"),
            "lang_filter": lang,
            "store_positions": store_positions,
            "build_wall_sec": round(time.perf_counter() - t0, 3),
            "analyzer_hash": root["analyzer_hash"],
            "input_fingerprint": root.get("input_fingerprint"),
            "num_partitions": P,
            "last_append_fingerprint": lineage["input_fingerprint"],
        },
    )


def refresh_root_manifest(index_root: str, P: int, base_info: Dict) -> Dict:
    """Scan every partition's live segments (base + append generations) and
    write the root MANIFEST.json (the segments_N commit point analog).

    ``num_docs``/``sum_dl`` include tombstoned docs — they still count for
    scoring (Lucene's N/avgdl are not adjusted for deletes until merge);
    ``num_live_docs`` reports the reclaimable view."""
    base_info = {
        k: v
        for k, v in base_info.items()
        if k not in ("partitions", "num_docs", "sum_dl", "num_live_docs", "format_version")
    }
    partitions = []
    for pid in range(P):
        segs = partition_segments(index_root, pid)
        docs = terms = postings = sum_dl = pbytes = deleted = 0
        for seg in segs:
            m = read_segment_manifest(seg) or {}
            docs += m.get("docs", 0)
            terms += m.get("terms", 0)
            postings += m.get("postings", 0)
            sum_dl += m.get("sum_dl", 0)
            pbytes += m.get("postings_bytes", 0)
            dpath = os.path.join(seg, "deletes.parquet")
            if os.path.exists(dpath):
                import pyarrow.parquet as _pq

                deleted += _pq.ParquetFile(dpath).metadata.num_rows
        partitions.append(
            {
                "partition_id": pid,
                "segments": [os.path.basename(s) for s in segs],
                "docs": docs,
                "deleted_docs": deleted,
                "terms": terms,
                "postings": postings,
                "sum_dl": sum_dl,
                "postings_bytes": pbytes,
                "resumed": pid in set(base_info.get("resumed_partitions", [])),
            }
        )
    n_docs = sum(p["docs"] for p in partitions)
    root = {
        "num_partitions": P,
        "num_docs": n_docs,
        "num_live_docs": n_docs - sum(p["deleted_docs"] for p in partitions),
        "sum_dl": sum(p["sum_dl"] for p in partitions),
        "partitions": partitions,
        **base_info,
    }
    write_root_manifest(index_root, root)
    return root
