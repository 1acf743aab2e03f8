"""CheckIndex: re-read every segment structure and cross-check invariants.

Re-creation of the semantics of lucene/core/src/java/org/apache/lucene/
index/CheckIndex.java (branch_8x; SURVEY.md §5 pattern 4) for our segment
artifact layout — both a library call (used in tests) and a CLI:

    python -m lucene_solr_ray.index.checkindex <index_root>

Checks per segment: term dictionary strictly sorted; df == decoded posting
count; docIDs strictly ascending within [0, num_docs); freqs >= 1;
total_tf == sum(freqs); skip data consistent (last_docid per block, max
freq, min norm, byte sizes sum to term nbytes); norms == intToByte4(dl);
docmap aligned and url-sorted; postings.bin crc matches the manifest.
Cross-index: root manifest doc/sum_dl totals == segment sums; global stats
df/total_tf == sum over segments.
"""

from __future__ import annotations

import glob
import os
import sys
import zlib
from typing import List

import numpy as np
import pyarrow.parquet as pq

from ..analysis.smallfloat import int_to_byte4
from ..index.postings import BLOCK
from ..index.segment import SegmentReader
from ..state.manifest import read_root_manifest, read_segment_manifest

__all__ = ["check_segment", "check_index"]


class CheckIndexError(AssertionError):
    pass


def _require(cond: bool, msg: str, errors: List[str]):
    if not cond:
        errors.append(msg)


def check_segment(seg_dir: str) -> List[str]:
    errors: List[str] = []
    r = SegmentReader(seg_dir)
    m = read_segment_manifest(seg_dir) or {}

    n_terms = len(r.terms)
    _require(m.get("terms") == n_terms, f"{seg_dir}: manifest term count", errors)
    _require(m.get("docs") == r.num_docs, f"{seg_dir}: manifest doc count", errors)

    if n_terms > 1:
        import pyarrow.compute as pc

        ta = r.terms.slice(0, n_terms)
        _require(
            bool(pc.all(pc.less(ta.slice(0, n_terms - 1), ta.slice(1))).as_py()),
            f"{seg_dir}: term dictionary not strictly sorted",
            errors,
        )

    blob = np.fromfile(os.path.join(seg_dir, "postings.bin"), dtype=np.uint8)
    _require(
        zlib.crc32(blob.tobytes()) == m.get("checksum_crc32"),
        f"{seg_dir}: postings.bin crc mismatch",
        errors,
    )

    total_postings = 0
    sum_tf_all = 0
    for o in range(n_terms):
        tp = r.postings(o)
        df = int(r.df[o])
        _require(len(tp.docids) == df, f"{seg_dir}: term {o} df != postings", errors)
        _require(
            bool((np.diff(tp.docids) > 0).all()) if df > 1 else True,
            f"{seg_dir}: term {o} docids not strictly ascending",
            errors,
        )
        _require(
            df == 0 or (0 <= tp.docids[0] and tp.docids[-1] < r.num_docs),
            f"{seg_dir}: term {o} docid out of range",
            errors,
        )
        _require(bool((tp.freqs >= 1).all()), f"{seg_dir}: term {o} freq < 1", errors)
        _require(
            int(tp.freqs.sum()) == int(r.total_tf[o]),
            f"{seg_dir}: term {o} total_tf mismatch",
            errors,
        )
        # skip data cross-check
        off, last, maxf, minn = r.term_blocks(o)
        nb = (df + BLOCK - 1) // BLOCK
        _require(len(off) == nb, f"{seg_dir}: term {o} nblocks mismatch", errors)
        for b in range(nb):
            lo, hi = b * BLOCK, min((b + 1) * BLOCK, df)
            _require(
                int(last[b]) == int(tp.docids[hi - 1]),
                f"{seg_dir}: term {o} block {b} last_docid",
                errors,
            )
            _require(
                int(maxf[b]) == int(tp.freqs[lo:hi].max()),
                f"{seg_dir}: term {o} block {b} max_freq",
                errors,
            )
            _require(
                int(minn[b]) == int(r.norms[tp.docids[lo:hi]].min()),
                f"{seg_dir}: term {o} block {b} min_norm",
                errors,
            )
        total_postings += df
        sum_tf_all += int(r.total_tf[o])

    _require(m.get("postings") == total_postings, f"{seg_dir}: manifest postings", errors)

    # norms vs dl, docmap alignment
    _require(
        bool((int_to_byte4(r.dl.astype(np.int64)) == r.norms).all()),
        f"{seg_dir}: norms != intToByte4(dl)",
        errors,
    )
    _require(sum_tf_all == int(r.dl.sum()), f"{seg_dir}: sum(total_tf) != sum(dl)", errors)
    dm = pq.read_table(os.path.join(seg_dir, "docmap.parquet"))
    _require(dm.num_rows == r.num_docs, f"{seg_dir}: docmap rows != num_docs", errors)
    urls = dm["url"].to_pylist()
    _require(
        all(urls[i] < urls[i + 1] for i in range(len(urls) - 1)),
        f"{seg_dir}: docmap urls not strictly sorted (docid order broken)",
        errors,
    )

    # tombstones (.liv analog): in-range, unique, strictly ascending
    del_path = os.path.join(seg_dir, "deletes.parquet")
    if os.path.exists(del_path):
        ids = pq.read_table(del_path)["local_docid"].to_numpy()
        _require(
            len(ids) == 0 or (0 <= ids[0] and ids[-1] < r.num_docs),
            f"{seg_dir}: deleted docid out of range",
            errors,
        )
        _require(
            bool((np.diff(ids) > 0).all()) if len(ids) > 1 else True,
            f"{seg_dir}: deletes not strictly ascending/unique",
            errors,
        )
    return errors


def check_index(index_root: str) -> List[str]:
    from ..state.manifest import partition_segments

    errors: List[str] = []
    root = read_root_manifest(index_root)
    seg_dirs = [
        seg
        for pid in range(root["num_partitions"])
        for seg in partition_segments(index_root, pid)
    ]
    _require(
        len(seg_dirs) >= root["num_partitions"],
        f"{index_root}: fewer segment dirs than partitions",
        errors,
    )
    tot_docs = tot_dl = 0
    df_sum: dict = {}
    for seg in seg_dirs:
        errors.extend(check_segment(seg))
        m = read_segment_manifest(seg) or {}
        tot_docs += m.get("docs", 0)
        tot_dl += m.get("sum_dl", 0)
        t = pq.read_table(os.path.join(seg, "terms.parquet"), columns=["term", "df", "total_tf"])
        for term, df, ttf in zip(t["term"].to_pylist(), t["df"].to_pylist(), t["total_tf"].to_pylist()):
            a, b = df_sum.get(term, (0, 0))
            df_sum[term] = (a + df, b + ttf)
    _require(tot_docs == root["num_docs"], f"{index_root}: root num_docs mismatch", errors)
    _require(tot_dl == root["sum_dl"], f"{index_root}: root sum_dl mismatch", errors)

    stats_dir = os.path.join(index_root, "stats", "global_stats")
    if os.path.isdir(stats_dir):
        import pyarrow.dataset as pads

        st = pads.dataset(stats_dir).to_table()
        got = {
            t: (int(d), int(f))
            for t, d, f in zip(
                st["term"].to_pylist(), st["df"].to_pylist(), st["total_tf"].to_pylist()
            )
        }
        _require(got == df_sum, f"{index_root}: global stats != sum over segments", errors)
    return errors


def main():
    root = sys.argv[1]
    errs = check_index(root)
    if errs:
        print(f"CheckIndex FAILED ({len(errs)} problems):")
        for e in errs:
            print(" -", e)
        sys.exit(1)
    print("CheckIndex OK:", root)


if __name__ == "__main__":
    main()
