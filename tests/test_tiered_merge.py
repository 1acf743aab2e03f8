"""TieredMergePolicy-style partial merges (reference: lucene/core/.../
index/TieredMergePolicy.java, branch_8x): only the smallest generations
fold per step, the base is never rewritten, gen numbers are never reused,
and the final results remain rank/score-identical to a fresh build."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index, tiered_merge_index
from lucene_solr_ray.pipelines.build import append_index, build_index
from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.state.manifest import (
    next_gen_dir,
    partition_segments,
    read_segment_manifest,
    segment_dir,
)


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


P = 2


@pytest.fixture(scope="module")
def staged_index(ray_session, small_corpus, tmp_path_factory):
    """Base build from file A's first 800 rows, then 5 small appends of 100
    fresh docs each → base + 5 generations per partition."""
    base = tmp_path_factory.mktemp("tiered")
    ta = pq.read_table(small_corpus[0])
    assert len(ta) >= 1000
    idx = str(base / "idx")
    base_tbl = ta.slice(0, 500)
    base_path = str(base / "base.parquet")
    pq.write_table(base_tbl, base_path)
    build_index([base_path], idx, num_partitions=P)
    for i in range(5):
        chunk = ta.slice(500 + i * 100, 100)
        cpath = str(base / f"chunk{i}.parquet")
        pq.write_table(chunk, cpath)
        append_index([cpath], idx)
    full_path = str(base / "full.parquet")
    pq.write_table(ta.slice(0, 1000), full_path)
    fresh = str(base / "fresh")
    build_index([full_path], fresh, num_partitions=P)
    return idx, fresh


def test_append_tiered_trigger(ray_session, small_corpus, tmp_path):
    """append_index(merge_policy='tiered') keeps each partition at or under
    max_segments without ever rewriting the base."""
    ta = pq.read_table(small_corpus[0])
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(ta.slice(0, 500), base_path)
    idx = str(tmp_path / "idx")
    build_index([base_path], idx, num_partitions=P)
    base_ck = {
        pid: read_segment_manifest(segment_dir(idx, pid))["checksum_crc32"]
        for pid in range(P)
    }
    for i in range(5):
        cpath = str(tmp_path / f"c{i}.parquet")
        pq.write_table(ta.slice(500 + i * 100, 100), cpath)
        append_index([cpath], idx, max_segments_per_partition=3,
                     merge_policy="tiered")
    for pid in range(P):
        assert len(partition_segments(idx, pid)) <= 3
        assert read_segment_manifest(segment_dir(idx, pid))["checksum_crc32"] \
            == base_ck[pid]
    assert check_index(idx) == []


def test_tiered_merge_folds_small_gens(staged_index, corpus_queries):
    idx, fresh = staged_index
    pre = {pid: partition_segments(idx, pid) for pid in range(P)}
    assert all(len(v) == 6 for v in pre.values())  # base + 5 gens
    before = search(idx, corpus_queries, k=10)

    res = tiered_merge_index(idx, segs_per_tier=3, max_merge_at_once=3)
    assert res["merge_steps"] >= P  # at least one fold per partition

    for pid in range(P):
        segs = partition_segments(idx, pid)
        assert len(segs) <= 3
        # the base was NOT rewritten: same manifest checksum as before
        m_pre = read_segment_manifest(pre[pid][0])
        m_post = read_segment_manifest(segment_dir(idx, pid))
        assert m_pre["checksum_crc32"] == m_post["checksum_crc32"]
        # the new gen records which gens it folded
        new_gens = [s for s in segs if s not in pre[pid]]
        assert new_gens, "a new merged generation must exist"
        folded = set()
        for s in new_gens:
            folded |= set((read_segment_manifest(s) or {}).get("merged_gens") or [])
        assert len(folded) >= 2

    assert check_index(idx) == []
    # results identical to the pre-merge index (stats refresh is a no-op
    # here: no tombstones existed in the folded gens)
    after = search(idx, corpus_queries, k=10)
    assert _frame(after).equals(_frame(before))

    # gen numbers are never reused after folding
    for pid in range(P):
        nxt = int(os.path.basename(next_gen_dir(idx, pid)).rsplit(".g", 1)[1])
        assert nxt >= 6

    # a subsequent full merge still converges to the fresh-build results
    merge_index(idx)
    for pid in range(P):
        assert len(partition_segments(idx, pid)) == 1
    final = search(idx, corpus_queries, k=10)
    fresh_res = search(fresh, corpus_queries, k=10)
    assert _frame(final).equals(_frame(fresh_res))
    assert check_index(idx) == []


def test_tiered_merge_interrupted_cleanup(ray_session, small_corpus, tmp_path):
    """Crash between gen publish and input cleanup: a surviving folded gen
    dir must stay shadowed (merged_gens in the NEW gen's manifest), and
    gen numbers must never be reused."""
    import shutil

    from lucene_solr_ray.index.merge import merge_partition_tiered

    ta = pq.read_table(small_corpus[0])
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(ta.slice(0, 300), base_path)
    idx = str(tmp_path / "idx")
    build_index([base_path], idx, num_partitions=1)
    for i in range(3):
        cpath = str(tmp_path / f"c{i}.parquet")
        pq.write_table(ta.slice(300 + i * 100, 100), cpath)
        append_index([cpath], idx)
    segs_before = partition_segments(idx, 0)
    assert len(segs_before) == 4  # base + g1..g3

    # snapshot a gen that the merge will fold, then "resurrect" it after
    victim = segs_before[1]
    backup = str(tmp_path / "victim_backup")
    shutil.copytree(victim, backup)
    lineage = {"input_fingerprint": None, "analyzer_hash": None,
               "num_partitions": 1}
    res = merge_partition_tiered(idx, 0, lineage, segs_per_tier=2,
                                 max_merge_at_once=3)
    assert res["merged"]
    live = partition_segments(idx, 0)
    pre_resurrect = [os.path.basename(s) for s in live]
    shutil.copytree(backup, victim)  # interrupted-cleanup simulation
    live2 = [os.path.basename(s) for s in partition_segments(idx, 0)]
    assert live2 == pre_resurrect, "resurrected folded gen must stay shadowed"
    # and the next append never reuses a folded gen number
    nxt = int(os.path.basename(next_gen_dir(idx, 0)).rsplit(".g", 1)[1])
    assert nxt >= 4
    r1 = search(idx, [{"query_id": 0, "kind": "term", "terms": ["w000000"]}],
                k=10)
    shutil.rmtree(victim)
    r2 = search(idx, [{"query_id": 0, "kind": "term", "terms": ["w000000"]}],
                k=10)
    assert _frame(r1).equals(_frame(r2))
