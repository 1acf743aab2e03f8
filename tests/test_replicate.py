"""Delta import (watermark append) and master→replica segment pull."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.pipelines.build import append_index, build_index
from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.pipelines.replicate import delta_import, replicate_index
from lucene_solr_ray.state.manifest import read_root_manifest

COLS = ["query_id", "rank", "url", "score"]


def _frame(df):
    return df[COLS].reset_index(drop=True)


def _pages(n, t0, tag):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", tag]
    texts = [" ".join(words[i % len(words) :] + words[: i % len(words)]) for i in range(n)]
    return pa.table(
        {
            "url": [f"u://{tag}/{i:04d}" for i in range(n)],
            "warc_ts": pa.array(
                (np.arange(n) + t0).astype("datetime64[us]"),
                type=pa.timestamp("us"),
            ),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
        }
    )


def test_delta_import_watermark(ray_session, tmp_path):
    old = _pages(40, 1_000_000, "old")
    new = _pages(25, 9_000_000, "new")
    both = str(tmp_path / "both.parquet")
    pq.write_table(pa.concat_tables([old, new]), both)
    oldp = str(tmp_path / "old.parquet")
    pq.write_table(old, oldp)

    idx = str(tmp_path / "idx")
    build_index([oldp], idx, num_partitions=2)
    base = read_root_manifest(idx)["num_docs"]
    assert base == 40

    # watermark seeded at old's max ts: only the 25 'new' rows import
    r1 = delta_import([both], idx, since=1_000_000 + 39)
    assert r1["imported_docs"] == 65  # 40 old + 25 appended, none updated
    assert r1["delta_watermark"] == 9_000_000 + 24

    # second pull: nothing newer → no-op, watermark unchanged
    r2 = delta_import([both], idx)
    assert r2.get("noop") and r2["delta_watermark"] == r1["delta_watermark"]

    # the incrementally-imported index answers like a fresh full build
    union = str(tmp_path / "union_idx")
    build_index([both], union, num_partitions=2)
    qs = [
        {"query_id": 0, "kind": "term", "terms": ["new"]},
        {"query_id": 1, "kind": "term", "terms": ["old"]},
    ]
    assert _frame(search(idx, qs, k=10)).equals(_frame(search(union, qs, k=10)))


def test_replicate_incremental_pull(ray_session, tmp_path):
    a = _pages(30, 1_000_000, "seed")
    ap = str(tmp_path / "a.parquet")
    pq.write_table(a, ap)
    src = str(tmp_path / "master")
    dst = str(tmp_path / "replica")
    build_index([ap], src, num_partitions=2)

    r1 = replicate_index(src, dst)
    assert len(r1["fetched"]) == 2 and not r1["skipped"]
    qs = [{"query_id": 0, "kind": "term", "terms": ["seed"]}]
    assert _frame(search(dst, qs, k=10)).equals(_frame(search(src, qs, k=10)))

    # unchanged master → pure skip
    r2 = replicate_index(src, dst)
    assert not r2["fetched"] and len(r2["skipped"]) == 2

    # append a generation on the master → replica pulls ONLY the new segs
    b = _pages(10, 5_000_000, "fresh")
    bp = str(tmp_path / "b.parquet")
    pq.write_table(b, bp)
    append_index([bp], src)
    r3 = replicate_index(src, dst)
    assert r3["fetched"] and all(".g" in f for f in r3["fetched"])
    assert len(r3["skipped"]) == 2
    qs2 = qs + [{"query_id": 1, "kind": "term", "terms": ["fresh"]}]
    assert _frame(search(dst, qs2, k=10)).equals(_frame(search(src, qs2, k=10)))
