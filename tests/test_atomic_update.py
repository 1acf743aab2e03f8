"""Atomic (partial document) updates — RTG-resolve + modifier merge +
version-bump append (pipelines/update.py#atomic_update)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def built(ray_session, tmp_path):
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.sources.pages import generate_pages

    paths = generate_pages(str(tmp_path / "pages"), 400, 2, seed=42)
    idx = str(tmp_path / "idx")
    build_index(paths, idx, num_partitions=2)
    return paths, idx


def _qset():
    return [{"query_id": 0, "kind": "term", "terms": ["zzatomicmark"]}]


def test_atomic_set_add_searchable_and_rtg(built, ray_session):
    from lucene_solr_ray.pipelines.query import realtime_get, search
    from lucene_solr_ray.pipelines.update import atomic_update

    paths, idx = built
    rows = pq.read_table(paths[0]).to_pylist()
    u_set, u_add = rows[0]["url"], rows[1]["url"]
    old_add_text = rows[1]["text"]

    res = atomic_update(idx, [
        {"url": u_set, "ops": {"text": {"set": "zzatomicmark only body"}}},
        {"url": u_add, "ops": {"text": {"add": "zzatomicmark"}}},
    ], source_paths=paths)
    assert res["updated"] == 2 and res["missing"] == []

    hits = search(idx, _qset(), k=10)
    assert set(hits["url"]) == {u_set, u_add}

    got = realtime_get(idx, [u_set])
    assert len(got) == 1  # resolves to exactly the live (updated) version
    assert int(got.iloc[0]["dl"]) == 3

    # add concatenated, set replaced — check via a fresh-build equivalence
    mod = {r["url"]: dict(r) for r in rows}
    assert old_add_text  # non-empty precondition for the concat branch


def test_atomic_update_equals_fresh_build(built, ray_session, tmp_path):
    """Post-update index, forceMerged, == fresh build over the modified
    corpus, searched over a broad query set (the append-path bit-exactness
    gate; pre-merge the stats deliberately still count the tombstoned old
    version — Lucene's docFreq-not-adjusted-for-deletes — so the merge is
    what restores exact equality)."""
    from lucene_solr_ray.index.merge import merge_index
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.pipelines.update import atomic_update
    from lucene_solr_ray.sources.pages import corpus_df_stats, generate_query_set

    paths, idx = built
    rows = []
    for p in paths:
        rows.extend(pq.read_table(p).to_pylist())
    target = rows[5]["url"]

    atomic_update(
        idx, [{"url": target, "ops": {"text": {"set": "w000000 w000001"}}}],
        source_paths=paths,
    )
    merge_index(idx)

    # modified corpus: last-wins resolve, then apply the same set + ts bump
    cur = {}
    for r in rows:
        u = r["url"]
        dl = len([w for w in (r["text"] or "").split(" ") if w])
        key = (r["warc_ts"], dl)
        if u not in cur or key > cur[u][0]:
            cur[u] = (key, r)
    import datetime as dt

    mod_rows = []
    for u, (_, r) in cur.items():
        r = dict(r)
        if u == target:
            r["text"] = "w000000 w000001"
            r["warc_ts"] = r["warc_ts"] + dt.timedelta(microseconds=1)
        mod_rows.append(r)
    mp = str(tmp_path / "mod.parquet")
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(mod_rows), preserve_index=False), mp)
    fresh = str(tmp_path / "fresh")
    build_index([mp], fresh, num_partitions=2)

    qset = generate_query_set(corpus_df_stats(paths))
    cols = ["query_id", "rank", "url", "score"]
    a = search(idx, qset, k=10)[cols].reset_index(drop=True)
    b = search(fresh, qset, k=10)[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_atomic_chaining_and_inc_remove(built, ray_session):
    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.pipelines.update import ATOMIC_DIR, atomic_update

    paths, idx = built
    rows = pq.read_table(paths[0]).to_pylist()
    u = rows[2]["url"]

    atomic_update(idx, [{"url": u, "ops": {"text": {"set": "zzchain one"}}}],
                  source_paths=paths)
    # second update must see the FIRST update's text (RTG chaining), not
    # the original row
    atomic_update(idx, [{"url": u, "ops": {"text": {"add": "zzchain"}}}],
                  source_paths=paths)

    hits = search(idx, [{"query_id": 0, "kind": "term", "terms": ["zzchain"]}],
                  k=10)
    assert list(hits["url"]) == [u]
    # tf=2 via the chained add ("zzchain one zzchain")
    gens = os.listdir(os.path.join(idx, ATOMIC_DIR))
    assert sorted(gens) == ["upd-000000.parquet", "upd-000001.parquet"]
    last = pq.read_table(os.path.join(idx, ATOMIC_DIR, "upd-000001.parquet"))
    assert last.filter(
        pa.compute.equal(last["url"], u))["text"][0].as_py() == "zzchain one zzchain"

    # modifier unit semantics: inc on numeric, remove nulls
    from lucene_solr_ray.pipelines.update import _apply_ops

    r = {"url": "x", "n": 3, "lang": "en"}
    assert _apply_ops(r, {"n": {"inc": 4}})["n"] == 7
    assert _apply_ops(r, {"n": {"inc": 2}, "lang": {"remove": None}})["lang"] is None
    assert _apply_ops({"url": "x", "n": None}, {"n": {"inc": 5}})["n"] == 5
    with pytest.raises(ValueError):
        _apply_ops(r, {"n": {"bogus": 1}})


def test_atomic_missing_url_reported(built, ray_session):
    from lucene_solr_ray.pipelines.update import atomic_update

    paths, idx = built
    res = atomic_update(
        idx, [{"url": "doc://nope", "ops": {"text": {"set": "x"}}}],
        source_paths=paths,
    )
    assert res["updated"] == 0 and res["missing"] == ["doc://nope"]
    assert res["generation_file"] is None


def test_apply_ops_removeregex_unit():
    """removeregex deletes whitespace-separated values matching the
    ANCHORED pattern (fullmatch, the Solr multiValued analog); all
    values removed → field nulls like remove."""
    from lucene_solr_ray.pipelines.update import _apply_ops

    row = {"text": "alpha beta12 gamma beta7"}
    out = _apply_ops(row, {"text": {"removeregex": r"beta\d+"}})
    assert out["text"] == "alpha gamma"
    # non-anchored substring must NOT match (fullmatch semantics)
    out = _apply_ops(row, {"text": {"removeregex": "beta"}})
    assert out["text"] == "alpha beta12 gamma beta7"
    out = _apply_ops({"text": "x y"}, {"text": {"removeregex": "[xy]"}})
    assert out["text"] is None
    # empty/missing field is a no-op
    assert _apply_ops({"text": None},
                      {"text": {"removeregex": "a"}})["text"] is None
