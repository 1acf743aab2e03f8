"""Per-partition immutable segment: build (write) and read paths.

The segment is this engine's analog of a Lucene segment (reference:
lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java
flush path + the lucene84 codec writers, branch_8x; SURVEY.md §1.1, §3.1,
Appendix B). One Ray Data partition (all rows whose
``crc32(url) % P == partition_id``) becomes exactly one immutable segment
directory:

    segments/part-XXXXX/
      manifest.json     lineage + metrics (written last; atomic publish)
      terms.parquet     sorted term dictionary: term, df, total_tf,
                        offset/nbytes into postings.bin, nblocks
      skips.parquet     per-128-doc-block skip+impact data:
                        term, last_docid, max_freq, min_norm, nbytes
      postings.bin      FOR-packed delta blocks (postings.py layout)
      norms.parquet     per-doc norm byte (SmallFloat) + exact dl (debug)
      docmap.parquet    local_docid -> url, warc_ts

Determinism: docs are deduped last-wins by (url, warc_ts) and sorted by
url before docID assignment, so the same input rows always produce the
same segment bytes regardless of arrival order or parallelism (stronger
than Lucene's arrival-order docIDs; required for the rank-identity gate,
SURVEY.md §4 "ordering").
"""

from __future__ import annotations

import os
import time
import zlib
from typing import Any, Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis.smallfloat import int_to_byte4
from ..state.manifest import publish_segment, segment_dir, write_segment_manifest
from .postings import BLOCK, decode_term_postings, encode_postings_batch

__all__ = ["build_segment", "write_segment_artifact", "SegmentReader", "DOCMAP_ROW_GROUP"]

DOCMAP_ROW_GROUP = 8192


def _dedup_sort(table: pa.Table) -> pa.Table:
    """Last-wins dedup by url (version = warc_ts, SURVEY.md §2.10 analog of
    Solr's _version_ optimistic concurrency), then sort by url for
    deterministic local docID assignment."""
    urls = np.asarray(table["url"].to_pandas(), dtype=object)
    ts = table["warc_ts"].to_pandas().to_numpy().view("int64")
    dl = table["dl"].to_numpy()
    order = np.lexsort((dl, ts, urls))  # primary url, then ts, then dl
    urls_sorted = urls[order]
    # keep the LAST row of each url run (max warc_ts)
    is_last = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        is_last[:-1] = urls_sorted[:-1] != urls_sorted[1:]
    keep = order[is_last]
    return table.take(pa.array(keep))


def build_segment(
    table: pa.Table, partition_id: int, index_root: str, lineage: Dict[str, Any]
) -> Dict[str, Any]:
    """Build + atomically publish one partition's segment; returns summary.

    ``table`` carries the analyzer stage's output columns:
    url:string, warc_ts:timestamp[us], terms:list<string> (unique per doc),
    freqs:list<int32>, dl:int32.
    """
    return build_segment_at(
        table, partition_id, segment_dir(index_root, partition_id), lineage
    )


def build_segment_at(
    table: pa.Table, partition_id: int, final_dir: str, lineage: Dict[str, Any]
) -> Dict[str, Any]:
    """build_segment targeting an explicit dir (used for append-generation
    segments, which live beside the base partition dir)."""
    t0 = time.perf_counter()
    table = _dedup_sort(table)
    n_docs = table.num_rows
    if n_docs == 0:
        return _build_empty_segment_at(partition_id, final_dir, lineage, t0)

    terms_col = table["terms"].combine_chunks()
    if isinstance(terms_col, pa.ChunkedArray):
        terms_col = terms_col.combine_chunks()
    freqs_col = table["freqs"].combine_chunks()
    lengths = pc.list_value_length(terms_col).to_numpy().astype(np.int64)
    flat_terms = pc.list_flatten(terms_col)
    flat_freqs = pc.list_flatten(freqs_col).to_numpy().astype(np.uint32)

    # term dictionary: arrow-side hash dedup, then lexicographic rank
    dict_enc = pc.dictionary_encode(flat_terms)
    codes = dict_enc.combine_chunks().indices.to_numpy().astype(np.int64) if isinstance(
        dict_enc, pa.ChunkedArray
    ) else dict_enc.indices.to_numpy().astype(np.int64)
    dictionary = (
        dict_enc.combine_chunks().dictionary if isinstance(dict_enc, pa.ChunkedArray)
        else dict_enc.dictionary
    )
    vocab = np.asarray(dictionary.to_pandas(), dtype=object)
    n_terms = len(vocab)
    order = np.argsort(vocab)  # UTF-8/codepoint order (BytesRef order)
    rank = np.empty(n_terms, dtype=np.int64)
    rank[order] = np.arange(n_terms)
    tids = rank[codes]
    sorted_vocab = vocab[order]

    docids = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    dl = table["dl"].to_numpy().astype(np.int64)

    post_order = np.argsort(tids, kind="stable")  # (term, docid) order
    tids_s = tids[post_order]
    docids_s = docids[post_order]
    freqs_s = flat_freqs[post_order]

    positions_s = None
    if "positions" in table.column_names:
        # per-entry position ranges, reordered to (term, docid) postings
        # order — the .pos file contents (positions within a posting stay
        # ascending; inner lengths == freqs)
        pos_col = table["positions"].combine_chunks()
        flat_pos = pc.list_flatten(pos_col).to_numpy().astype(np.int32)
        src_off = np.zeros(len(flat_freqs) + 1, dtype=np.int64)
        np.cumsum(flat_freqs.astype(np.int64), out=src_off[1:])
        out_off = np.zeros(len(freqs_s) + 1, dtype=np.int64)
        np.cumsum(freqs_s.astype(np.int64), out=out_off[1:])
        gather = np.arange(int(out_off[-1]), dtype=np.int64) + np.repeat(
            src_off[post_order] - out_off[:-1], freqs_s
        )
        positions_s = flat_pos[gather]

    return write_segment_artifact(
        final_dir,
        partition_id,
        sorted_vocab,
        tids_s,
        docids_s,
        freqs_s,
        dl,
        table["url"],
        table["warc_ts"],
        lineage,
        t0,
        positions_s=positions_s,
    )


def write_segment_artifact(
    final_dir: str,
    partition_id: int,
    sorted_vocab: np.ndarray,
    tids_s: np.ndarray,
    docids_s: np.ndarray,
    freqs_s: np.ndarray,
    dl: np.ndarray,
    urls,
    warc_ts,
    lineage: Dict[str, Any],
    t0: float,
    extra_manifest: Optional[Dict[str, Any]] = None,
    positions_s: Optional[np.ndarray] = None,
) -> Dict[str, Any]:
    """Encode + atomically publish one segment from (term, docid)-sorted
    posting arrays — shared by the fresh build and the merge paths.
    ``positions_s``: flat int32 positions in (term, docid, pos) order
    (inner lengths == freqs_s) → positions.bin (the .pos analog; stored
    raw int32 v1, not FOR — positions are read per candidate doc only)."""
    n_docs = len(dl)
    n_terms = len(sorted_vocab)
    norms = int_to_byte4(dl)

    blob, t_off, t_nbytes, skips = encode_postings_batch(
        tids_s, docids_s, freqs_s, n_terms, norm_bytes=norms[docids_s]
    )
    df = np.bincount(tids_s, minlength=n_terms).astype(np.int32)
    total_tf = np.bincount(
        tids_s, weights=freqs_s.astype(np.float64), minlength=n_terms
    ).astype(np.int64)
    nblocks = ((df.astype(np.int64) + BLOCK - 1) // BLOCK).astype(np.int32)

    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)

    with open(os.path.join(tmp_dir, "postings.bin"), "wb") as f:
        f.write(blob)

    has_positions = positions_s is not None
    if has_positions:
        with open(os.path.join(tmp_dir, "positions.bin"), "wb") as f:
            f.write(positions_s.astype("<i4").tobytes())

    pq.write_table(
        pa.table(
            {
                "term": pa.array(sorted_vocab, type=pa.string()),
                "df": df,
                "total_tf": total_tf,
                "offset": t_off,
                "nbytes": t_nbytes,
                "nblocks": nblocks,
            }
        ),
        os.path.join(tmp_dir, "terms.parquet"),
    )
    pq.write_table(pa.table(skips), os.path.join(tmp_dir, "skips.parquet"))
    pq.write_table(
        pa.table({"norm": norms, "dl": dl.astype(np.int32)}),
        os.path.join(tmp_dir, "norms.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "local_docid": np.arange(n_docs, dtype=np.int32),
                "url": urls,
                "warc_ts": warc_ts,
            }
        ),
        os.path.join(tmp_dir, "docmap.parquet"),
        row_group_size=DOCMAP_ROW_GROUP,
    )

    summary = {
        "partition_id": int(partition_id),
        "docs": int(n_docs),
        "terms": int(n_terms),
        "postings": int(len(tids_s)),
        "sum_dl": int(dl.sum()),
        "postings_bytes": len(blob),
        "checksum_crc32": zlib.crc32(blob),
        "positions": bool(has_positions),
        "build_sec": round(time.perf_counter() - t0, 3),
    }
    write_segment_manifest(tmp_dir, {**summary, **lineage, **(extra_manifest or {})})
    publish_segment(tmp_dir, final_dir)
    return summary


def _build_empty_segment_at(partition_id, final_dir, lineage, t0,
                            extra_manifest=None, store_positions=False):
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    with open(os.path.join(tmp_dir, "postings.bin"), "wb") as f:
        f.write(b"")
    if store_positions:
        # keep the positions stream present so later merges with
        # positions-enabled siblings don't refuse as mixed-capability
        with open(os.path.join(tmp_dir, "positions.bin"), "wb") as f:
            f.write(b"")
    empty_i32 = np.array([], dtype=np.int32)
    pq.write_table(
        pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": empty_i32,
                "total_tf": np.array([], dtype=np.int64),
                "offset": np.array([], dtype=np.int64),
                "nbytes": np.array([], dtype=np.int64),
                "nblocks": empty_i32,
            }
        ),
        os.path.join(tmp_dir, "terms.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "term": empty_i32,
                "last_docid": empty_i32,
                "max_freq": empty_i32,
                "min_norm": np.array([], dtype=np.uint8),
                "nbytes": empty_i32,
            }
        ),
        os.path.join(tmp_dir, "skips.parquet"),
    )
    pq.write_table(
        pa.table({"norm": np.array([], dtype=np.uint8), "dl": empty_i32}),
        os.path.join(tmp_dir, "norms.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "local_docid": empty_i32,
                "url": pa.array([], type=pa.string()),
                "warc_ts": pa.array([], type=pa.timestamp("us")),
            }
        ),
        os.path.join(tmp_dir, "docmap.parquet"),
    )
    summary = {
        "partition_id": int(partition_id),
        "docs": 0,
        "terms": 0,
        "postings": 0,
        "sum_dl": 0,
        "postings_bytes": 0,
        "positions": bool(store_positions),
        "checksum_crc32": zlib.crc32(b""),
        "build_sec": round(time.perf_counter() - t0, 3),
    }
    write_segment_manifest(tmp_dir, {**summary, **lineage, **(extra_manifest or {})})
    publish_segment(tmp_dir, final_dir)
    return summary


def add_deletes(seg_dir: str, docids) -> int:
    """Merge ``docids`` into the segment's tombstone set (Lucene .liv
    analog) with a rename-aside atomic publish. Idempotent (set union).
    Returns the number of NEWLY tombstoned docs."""
    docids = [int(d) for d in docids]
    if not docids:
        return 0
    dpath = os.path.join(seg_dir, "deletes.parquet")
    prev = (
        set(pq.read_table(dpath)["local_docid"].to_pylist())
        if os.path.exists(dpath)
        else set()
    )
    merged = sorted(prev | set(docids))
    new = len(merged) - len(prev)
    if new:
        tmp = dpath + ".tmp"
        pq.write_table(
            pa.table({"local_docid": pa.array(merged, type=pa.int32())}), tmp
        )
        os.replace(tmp, dpath)
    return new


class TermDict:
    """Sorted term dictionary kept as the Arrow string column itself —
    zero-copy offset/byte views instead of a numpy OBJECT array of Python
    str (~60-80 B/term heap multiplier; at 100x vocab that materialization
    was the searcher actor's memory ceiling — SURVEY.md Appendix B, the
    round-3 finding). Probes run as a sampled-prefix-index narrowing
    (numpy S-dtype searchsorted, C speed) followed by an exact bytes
    bisect inside the ~SAMPLE-row window — the in-memory analog of
    Lucene's FST-from-term-prefixes → sorted-block walk (reference:
    lucene/core/.../codecs/blocktree/BlockTreeTermsWriter.java,
    branch_8x)."""

    SAMPLE = 64  # one prefix-index entry per SAMPLE terms
    PREFIX = 16  # bytes per index entry

    def __init__(self, col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        self.arr = col
        n = len(col)
        bufs = col.buffers()
        wide = pa.types.is_large_string(col.type) or pa.types.is_large_binary(col.type)
        off_dtype = np.int64 if wide else np.int32
        self._off = np.frombuffer(bufs[1], dtype=off_dtype)[
            col.offset : col.offset + n + 1
        ]
        self._data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.empty(0, dtype=np.uint8)
        )
        # sampled prefix index: first PREFIX bytes of every SAMPLE-th term.
        # prefix(x) is monotone in x, so sample searchsorted bounds the
        # exact insertion point to a ±1-sample window (proof in probe()).
        idx = np.arange(0, n, self.SAMPLE)
        samp = np.zeros((len(idx), self.PREFIX), dtype=np.uint8)
        for k, i in enumerate(idx):  # n/SAMPLE iterations, build-time only
            s = int(self._off[i])
            e = min(int(self._off[i + 1]), s + self.PREFIX)
            samp[k, : e - s] = self._data[s:e]
        self._sample = samp.view(f"S{self.PREFIX}").ravel()

    def __len__(self) -> int:
        return len(self.arr)

    def __getitem__(self, i):
        if isinstance(i, slice):
            lo, hi, step = i.indices(len(self))
            assert step == 1
            return self.arr.slice(lo, hi - lo)
        return self.arr[i].as_py()

    def term_bytes(self, i: int) -> bytes:
        s, e = int(self._off[i]), int(self._off[i + 1])
        return self._data[s:e].tobytes()

    def slice(self, lo: int, hi: int) -> pa.Array:
        """Zero-copy Arrow slice [lo, hi) for vectorized vocab scans."""
        return self.arr.slice(lo, hi - lo)

    def as_object(self) -> np.ndarray:
        """Materialize as a numpy object array — OFFLINE batch paths only
        (segment merge); never build this inside a searcher actor."""
        return np.asarray(self.arr.to_pandas(), dtype=object)

    def searchsorted(self, key, side: str = "left") -> int:
        """Insertion point of ``key`` (str or raw bytes) — sampled-prefix
        narrowing + exact bytes bisect. UTF-8 byte order == code point
        order, so this matches numpy str searchsorted exactly."""
        kb = key.encode("utf-8") if isinstance(key, str) else bytes(key)
        n = len(self)
        if n == 0:
            return 0
        kp = np.bytes_(kb[: self.PREFIX])
        # samples[i] < prefix(kb) ⇒ terms[i·S] < kb (strict prefix order
        # implies strict full order); samples[i] > prefix(kb) ⇒
        # terms[i·S] > kb — so the answer lies in ((l-1)·S, r·S]
        l = int(np.searchsorted(self._sample, kp, side="left"))
        r = int(np.searchsorted(self._sample, kp, side="right"))
        lo = max(0, (l - 1) * self.SAMPLE)
        hi = min(n, r * self.SAMPLE + 1)
        while lo < hi:
            mid = (lo + hi) // 2
            t = self.term_bytes(mid)
            if t < kb or (side == "right" and t == kb):
                lo = mid + 1
            else:
                hi = mid
        return lo


class SegmentReader:
    """mmap-backed read path (analog of MMapDirectory + SegmentReader;
    reference: lucene/core/src/java/org/apache/lucene/store/MMapDirectory.java,
    branch_8x). Open once per searcher actor (SURVEY.md §2.4)."""

    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
        self.terms = TermDict(t["term"])
        self.df = t["df"].to_numpy()
        self.total_tf = t["total_tf"].to_numpy()
        self.offset = t["offset"].to_numpy()
        self.nbytes = t["nbytes"].to_numpy()
        self.nblocks = t["nblocks"].to_numpy().astype(np.int64)
        self.term_block_start = np.concatenate(([0], np.cumsum(self.nblocks)[:-1]))

        s = pq.read_table(os.path.join(seg_dir, "skips.parquet"))
        self.skip_last_docid = s["last_docid"].to_numpy()
        self.skip_max_freq = s["max_freq"].to_numpy()
        self.skip_min_norm = s["min_norm"].to_numpy()
        skip_nbytes = s["nbytes"].to_numpy().astype(np.int64)
        # absolute byte offset of every block in postings.bin
        self.block_offset = np.concatenate(([0], np.cumsum(skip_nbytes)[:-1]))

        n = pq.read_table(os.path.join(seg_dir, "norms.parquet"))
        self.norms = n["norm"].to_numpy()
        self.dl = n["dl"].to_numpy()
        self.num_docs = len(self.norms)

        # tombstones (Lucene .liv analog): docs shadowed by a newer append
        # generation. Term stats (df/total_tf) deliberately still include
        # them — Lucene's docFreq is not adjusted for deletes until merge.
        self.deleted = None  # None = all live; else bool mask len num_docs
        del_path = os.path.join(seg_dir, "deletes.parquet")
        if os.path.exists(del_path):
            ids = pq.read_table(del_path)["local_docid"].to_numpy()
            if len(ids):
                mask = np.zeros(self.num_docs, dtype=bool)
                mask[ids] = True
                self.deleted = mask

        post_path = os.path.join(seg_dir, "postings.bin")
        if os.path.getsize(post_path):
            self.post = np.memmap(post_path, dtype=np.uint8, mode="r")
        else:
            self.post = np.empty(0, dtype=np.uint8)  # mmap rejects empty files

        # optional .pos analog: flat int32 positions in (term, docid, pos)
        # order; term t's slice starts at cumsum(total_tf)[t-1]
        pos_path = os.path.join(seg_dir, "positions.bin")
        self.has_positions = os.path.exists(pos_path)
        if self.has_positions and os.path.getsize(pos_path):
            self.pos = np.memmap(pos_path, dtype="<i4", mode="r")
            self._pos_start = np.concatenate(
                ([0], np.cumsum(self.total_tf.astype(np.int64)))
            )
        elif self.has_positions:
            self.pos = np.empty(0, dtype=np.int32)
            self._pos_start = np.zeros(len(self.total_tf) + 1, dtype=np.int64)

    def positions(self, ordinal: int) -> np.ndarray:
        """Flat positions of one term across its postings (split per doc
        with cumsum of that term's freqs)."""
        s = int(self._pos_start[ordinal])
        e = int(self._pos_start[ordinal + 1])
        return np.asarray(self.pos[s:e])

    @property
    def num_live_docs(self) -> int:
        return self.num_docs - (int(self.deleted.sum()) if self.deleted is not None else 0)

    def lookup(self, term: str) -> int:
        """Binary search the sorted term dictionary → ordinal or -1."""
        kb = term.encode("utf-8")
        i = self.terms.searchsorted(kb)
        if i < len(self.terms) and self.terms.term_bytes(i) == kb:
            return i
        return -1

    def docid_of_url(self, url: str):
        """Reverse docmap lookup: url → local_docid or None. The docmap is
        written url-sorted with fixed row groups, so the probe reads
        parquet row-group statistics plus ONE row group — O(row_group)
        I/O per point lookup (the realtime-get discipline), never the
        whole docmap. Row groups are cached per reader."""
        import bisect

        if not hasattr(self, "_dm_meta"):
            pf = pq.ParquetFile(os.path.join(self.seg_dir, "docmap.parquet"))
            md = pf.metadata
            uidx = md.schema.to_arrow_schema().get_field_index("url")
            mins, maxs = [], []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(uidx).statistics
                if st is None or not st.has_min_max:
                    mins = None
                    break
                mins.append(st.min)
                maxs.append(st.max)
            self._dm_meta = (pf, mins, maxs)
            self._dm_groups = {}
        pf, mins, maxs = self._dm_meta
        if mins is None:
            groups = list(range(pf.metadata.num_row_groups))
        else:
            # parquet may TRUNCATE string min statistics, which only makes
            # the recorded min SMALLER — bisect_right over truncated mins
            # lands at-or-RIGHT-of the true owner, never left (any group
            # with truncated min > url has actual min > url too). When
            # several groups' truncated mins collapse to a shared prefix
            # the true owner can be several groups LEFT, so walk left from
            # the bisect group; the loop below stops once a loaded group's
            # ACTUAL first url <= url (the url cannot live further left).
            g = bisect.bisect_right(mins, url) - 1
            groups = list(range(g, -1, -1))
        for g in groups:
            ent = self._dm_groups.get(g)
            if ent is None:
                t = pf.read_row_group(g, columns=["local_docid", "url"])
                ent = self._dm_groups[g] = (
                    t["url"].to_pylist(), t["local_docid"].to_numpy()
                )
            urls_g, ids = ent
            i = bisect.bisect_left(urls_g, url)
            if i < len(urls_g) and urls_g[i] == url:
                return int(ids[i])
            if mins is not None and urls_g and urls_g[0] <= url:
                break  # true owner found and url absent; stop walking left
        return None

    def prefix_range(self, prefix: str) -> tuple:
        """Ordinal range [lo, hi) of terms starting with ``prefix`` — the
        sorted-term-block range scan behind PrefixQuery (reference:
        lucene/core/src/java/org/apache/lucene/search/PrefixQuery.java via
        automaton ∩ term dict, branch_8x; SURVEY.md §2.3)."""
        pb = prefix.encode("utf-8")
        lo = self.terms.searchsorted(pb)
        # no UTF-8 byte is 0xFF, so prefix+b'\xff' upper-bounds exactly the
        # terms that start with prefix
        hi = self.terms.searchsorted(pb + b"\xff")
        return lo, hi

    def postings(self, ordinal: int):
        off = int(self.offset[ordinal])
        return decode_term_postings(
            self.post[off : off + int(self.nbytes[ordinal])], int(self.df[ordinal])
        )

    def term_blocks(self, ordinal: int):
        """(block_offsets, last_docids, max_freqs, min_norms) of one term."""
        s = int(self.term_block_start[ordinal])
        e = s + int(self.nblocks[ordinal])
        return (
            self.block_offset[s:e],
            self.skip_last_docid[s:e],
            self.skip_max_freq[s:e],
            self.skip_min_norm[s:e],
        )
