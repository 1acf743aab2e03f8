"""Regression test for the docmap reverse-lookup probe direction under
parquet PREFIX-TRUNCATED string min statistics (ADVICE r4): truncation only
makes recorded mins SMALLER, so the bisect over truncated mins lands
at-or-RIGHT-of the true owning row group — the probe must walk LEFT (and may
need to walk several groups when truncated mins collapse to a shared
prefix), never right. pyarrow 16 writes full stats, so truncation is
simulated by rewriting the cached mins after the first lookup."""

import os
from types import SimpleNamespace

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index.segment import SegmentReader


def _make_docmap(tmp_path, urls):
    seg = str(tmp_path / "seg-trunc")
    os.makedirs(seg, exist_ok=True)
    t = pa.table(
        {"url": pa.array(urls, type=pa.string()),
         "local_docid": pa.array(range(len(urls)), type=pa.int32())}
    )
    pq.write_table(t, os.path.join(seg, "docmap.parquet"), row_group_size=4)
    return seg


def _reader_stub(seg):
    # docid_of_url only touches seg_dir + its two lazy caches; avoid
    # building a full segment for this focused probe test
    return SimpleNamespace(seg_dir=seg)


def test_truncated_min_stats_walk_left(tmp_path):
    base = "https://example.com/" + "a" * 40 + "/"
    urls = sorted(base + f"{i:03d}" for i in range(12))  # 3 row groups of 4
    seg = _make_docmap(tmp_path, urls)
    stub = _reader_stub(seg)

    # prime the metadata cache with REAL stats, then simulate prefix
    # truncation: every group's min collapses to the shared prefix
    assert SegmentReader.docid_of_url(stub, urls[0]) == 0
    pf, mins, maxs = stub._dm_meta
    assert mins is not None and len(mins) == 3
    truncated = [base[:16]] * len(mins)  # all mins collapse left of every url
    stub._dm_meta = (pf, truncated, maxs)
    stub._dm_groups = {}

    # every url must still resolve: bisect now lands on the LAST group for
    # all of them, and the probe has to walk left up to two groups
    for i, u in enumerate(urls):
        assert SegmentReader.docid_of_url(stub, u) == i, u

    # absent urls: still None, and no infinite walk
    assert SegmentReader.docid_of_url(stub, base + "999") is None
    assert SegmentReader.docid_of_url(stub, "aaa") is None


def test_truncated_min_one_group_shift(tmp_path):
    # classic single-shift case: group g+1's truncated min sorts BELOW a
    # url owned by g+1... i.e. bisect lands right of true owner by one
    urls = [f"u{i:04d}" for i in range(8)]
    seg = _make_docmap(tmp_path, urls)
    stub = _reader_stub(seg)
    assert SegmentReader.docid_of_url(stub, urls[0]) == 0
    pf, mins, maxs = stub._dm_meta
    # truncate group 1's min "u0004" -> "u000": now "u0003" (owned by g0)
    # bisects into g1; the probe must walk left to g0
    mins2 = list(mins)
    mins2[1] = mins2[1][:4]
    stub._dm_meta = (pf, mins2, maxs)
    stub._dm_groups = {}
    assert SegmentReader.docid_of_url(stub, "u0003") == 3
    assert SegmentReader.docid_of_url(stub, "u0004") == 4
