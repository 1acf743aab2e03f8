"""Incremental ingest + segment merge gates (SURVEY.md §2.10 NRT analog,
§3.1 step 8 TieredMergePolicy): append-wins update semantics via
tombstones, multi-segment search correctness, and the merge invariant —
a fully merged incrementally-built index returns results rank- and
score-identical to a fresh build over the final corpus."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index
from lucene_solr_ray.pipelines.build import append_index, build_index
from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.state.manifest import partition_segments, read_root_manifest


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


@pytest.fixture(scope="module")
def corpora(ray_session, small_corpus, tmp_path_factory):
    """Split the 2000-doc corpus: batch A = first file, batch B = second
    file PLUS updated versions (newer warc_ts, different text) of 50 urls
    from batch A."""
    base = tmp_path_factory.mktemp("append")
    a_path, b_path = small_corpus[0], small_corpus[1]
    ta = pq.read_table(a_path)

    en_idx = [i for i, l in enumerate(ta["lang"].to_pylist()) if l == "en"][:50]
    upd = ta.take(pa.array(en_idx))
    # +10^13 µs (~4 months) so the update outranks ANY in-corpus duplicate
    # version of the same url (last-wins is by warc_ts, not by append order)
    new_ts = pa.array(
        (upd["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64) + 10**13).astype(
            "datetime64[us]"
        ),
        type=pa.timestamp("us"),
    )
    new_text = pa.array([f"updated fresh body {i} zqupdated" for i in range(len(en_idx))])
    upd = (
        upd.set_column(upd.schema.get_field_index("warc_ts"), "warc_ts", new_ts)
        .set_column(upd.schema.get_field_index("text"), "text", new_text)
    )
    b_plus = pa.concat_tables([pq.read_table(b_path), upd], promote_options="default")
    b_plus_path = str(base / "batch_b.parquet")
    pq.write_table(b_plus, b_plus_path)
    return str(a_path), b_plus_path, str(base)


@pytest.fixture(scope="module")
def incremental_index(corpora, corpus_queries):
    a_path, b_plus_path, base = corpora
    idx = os.path.join(base, "idx_incr")
    build_index([a_path], idx, num_partitions=4)
    append_index([b_plus_path], idx)
    return idx


def test_append_creates_generations_and_tombstones(incremental_index):
    root = read_root_manifest(incremental_index)
    segs = [s for pid in range(4) for s in partition_segments(incremental_index, pid)]
    assert any(".g1" in s for s in segs), "append did not create generations"
    assert root["num_docs"] > root["num_live_docs"], "updates must tombstone old docs"
    assert check_index(incremental_index) == []


def test_append_update_wins(incremental_index):
    """The updated doc version (batch B) must be the one returned; the
    tombstoned original must never appear."""
    res = search(
        incremental_index,
        [{"query_id": 0, "kind": "term", "terms": ["zqupdated"]}],
        k=60,
    )
    assert len(res) == 50, "every updated doc matches its new unique term"


def test_multi_segment_search_matches_service(incremental_index, corpus_queries):
    from lucene_solr_ray.search.service import SearcherService

    r_ds = _frame(search(incremental_index, corpus_queries, k=10))
    svc = SearcherService(incremental_index, num_searchers=2)
    try:
        r_svc = _frame(svc.search(corpus_queries, k=10))
    finally:
        svc.shutdown()
    assert r_ds.equals(r_svc)


def test_merge_equals_fresh_build(corpora, incremental_index, corpus_queries, tmp_path_factory):
    """forceMerge(1): after merging, results == a fresh build over the
    union corpus (last-wins per url) — scores AND ranks identical."""
    a_path, b_plus_path, base = corpora
    merged = merge_index(incremental_index)
    assert merged["partitions_merged"] >= 1
    assert merged["num_docs"] == merged["num_live_docs"], "merge reclaims tombstones"
    segs = [s for pid in range(4) for s in partition_segments(incremental_index, pid)]
    assert all(".g" not in os.path.basename(s) for s in segs)
    assert check_index(incremental_index) == []

    fresh = os.path.join(base, "idx_fresh")
    build_index([a_path, b_plus_path], fresh, num_partitions=4)
    queries = list(corpus_queries) + [
        {"query_id": 9001, "kind": "term", "terms": ["zqupdated"]}
    ]
    r_merged = _frame(search(incremental_index, queries, k=10))
    r_fresh = _frame(search(fresh, queries, k=10))
    assert r_merged.equals(r_fresh)

    # append after merge: generation numbering must not collide with
    # folded generations
    append_index([b_plus_path], incremental_index)
    segs = [s for pid in range(4) for s in partition_segments(incremental_index, pid)]
    assert any(".g" in os.path.basename(s) for s in segs)
    assert check_index(incremental_index) == []


def test_split_build_matches_unsplit(ray_session, small_corpus, corpus_queries, tmp_path_factory):
    """max_docs_per_segment: an oversized partition flushes to multiple
    url-range segments (DWPT spill analog) — results identical to the
    single-segment build, CheckIndex green, and merge folds it back."""
    base = tmp_path_factory.mktemp("split")
    idx_a = str(base / "one_seg")
    idx_b = str(base / "split_seg")
    build_index(small_corpus, idx_a, num_partitions=2)
    build_index(small_corpus, idx_b, num_partitions=2, max_docs_per_segment=200)
    segs = [s for pid in range(2) for s in partition_segments(idx_b, pid)]
    assert len(segs) > 2, "expected url-range split segments"
    assert check_index(idx_b) == []
    ra = _frame(search(idx_a, corpus_queries, k=10))
    rb = _frame(search(idx_b, corpus_queries, k=10))
    assert ra.equals(rb)
    merge_index(idx_b)
    segs = [s for pid in range(2) for s in partition_segments(idx_b, pid)]
    assert len(segs) == 2
    assert check_index(idx_b) == []
    assert ra.equals(_frame(search(idx_b, corpus_queries, k=10)))


def test_positions_survive_append_and_merge(corpora, corpus_queries, tmp_path_factory):
    """Regression: append generations and merges on a positions-enabled
    index must carry positions (Lucene's SegmentMerger preserves the .pos
    stream) — phrase queries stay answerable and rank/score-identical to a
    fresh positions build over the union corpus."""
    from lucene_solr_ray.analysis.tokenizer import tokenize_lower

    a_path, b_plus_path, base = corpora
    idx = os.path.join(base, "idx_pos")
    build_index([a_path], idx, num_partitions=4, store_positions=True)
    append_index([b_plus_path], idx)
    root = read_root_manifest(idx)
    assert root["store_positions"] is True, "append dropped the positions flag"

    # phrases drawn from BOTH batches, including an updated-doc phrase
    rows = pq.read_table(a_path).to_pylist() + pq.read_table(b_plus_path).to_pylist()
    phrases = []
    for r in rows[:30]:
        toks = tokenize_lower(r["text"])
        if len(toks) >= 5:
            phrases.append(toks[1:3])
        if len(phrases) == 6:
            break
    queries = [
        {"query_id": i, "kind": "phrase", "terms": ph} for i, ph in enumerate(phrases)
    ] + [{"query_id": 100, "kind": "phrase", "terms": ["updated", "fresh", "body"]}]

    r_appended = _frame(search(idx, queries, k=10))
    assert 100 in set(r_appended["query_id"]), "appended docs must answer phrases"

    merge_index(idx)
    segs = [s for pid in range(4) for s in partition_segments(idx, pid)]
    assert all(".g" not in os.path.basename(s) for s in segs)
    r_merged = _frame(search(idx, queries, k=10))

    fresh = os.path.join(base, "idx_pos_fresh")
    build_index([a_path, b_plus_path], fresh, num_partitions=4, store_positions=True)
    r_fresh = _frame(search(fresh, queries, k=10))
    assert r_merged.equals(r_fresh)


def test_ten_generation_append_merge(ray_session, tmp_path_factory):
    """Append-heavy lifecycle (the incremental-ingest hot path): 10
    generations with url overlap in BOTH directions (newer-wins and
    older-survives), merged down, must equal a fresh build over the
    last-wins union — and CheckIndex stays green throughout."""
    from lucene_solr_ray.sources.pages import (
        corpus_df_stats,
        generate_pages,
        generate_query_set,
    )

    base = tmp_path_factory.mktemp("gen10")
    paths = generate_pages(str(base / "pages"), 1500, 2, seed=42)
    idx = str(base / "idx")
    build_index(paths, idx, num_partitions=4)

    gen_paths = []
    for g in range(10):
        t = pq.read_table(paths[g % 2]).slice(g * 40, 80)
        ts = t["warc_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # even generations: strictly newer (update wins); odd: strictly
        # older (existing doc must survive the append)
        delta = 10**13 * (g + 1) if g % 2 == 0 else -(10**13) * (g + 1)
        t = t.set_column(
            t.schema.get_field_index("warc_ts"),
            "warc_ts",
            pa.array((ts + delta).astype("datetime64[us]"), type=pa.timestamp("us")),
        )
        if g % 2 == 0:
            t = t.set_column(
                t.schema.get_field_index("text"),
                "text",
                pa.array([f"gen{g} body {i} zzgen{g}" for i in range(t.num_rows)]),
            )
        p = str(base / f"gen{g}.parquet")
        pq.write_table(t, p)
        gen_paths.append(p)
        append_index([p], idx)

    assert check_index(idx) == []
    merge_index(idx)
    assert check_index(idx) == []

    union = str(base / "union")
    all_paths = paths + gen_paths
    build_index(all_paths, union, num_partitions=4)
    queries = generate_query_set(corpus_df_stats(all_paths))
    queries.append({"query_id": 9000, "kind": "term", "terms": ["zzgen8"]})
    ra = _frame(search(idx, queries, k=10))
    rb = _frame(search(union, queries, k=10))
    assert ra.equals(rb)
    assert (ra["query_id"] == 9000).any()  # gen-8 update is searchable


def test_realtime_get_tombstone_aware(corpora, incremental_index):
    """realtime_get on the appended index: updated urls resolve to the
    LIVE (generation-1) version — dl must match the updated text's token
    count, not the original's — and the row-group-pruned probe agrees
    with a full docmap scan."""
    from lucene_solr_ray.analysis.tokenizer import StandardTokenizer
    from lucene_solr_ray.pipelines.query import realtime_get

    a_path, b_plus_path, _ = corpora
    tb = pq.read_table(b_plus_path, columns=["url", "text"])
    upd = {
        u: t
        for u, t in zip(tb["url"].to_pylist(), tb["text"].to_pylist())
        if "zqupdated" in t
    }
    probe_urls = list(upd)[:10]
    # plus one url only in batch A and one that exists nowhere
    ta = pq.read_table(a_path, columns=["url", "text", "lang"])
    a_only = next(
        (u, t)
        for u, t, l in zip(
            ta["url"].to_pylist(), ta["text"].to_pylist(), ta["lang"].to_pylist()
        )
        if u not in upd and l == "en"  # build indexes lang=="en" only
    )
    res = realtime_get(
        incremental_index, probe_urls + [a_only[0], "u://nonexistent"]
    )
    got = dict(zip(res["url"], res["dl"]))
    tok = StandardTokenizer().tokenize_lower
    assert "u://nonexistent" not in got
    assert got[a_only[0]] == len(tok(a_only[1]))
    for u in probe_urls:
        assert got[u] == len(tok(upd[u])), (u, got[u], len(tok(upd[u])))
