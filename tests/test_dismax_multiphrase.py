"""DisjunctionMaxQuery + MultiPhraseQuery (reference: lucene/core/src/
java/org/apache/lucene/search/DisjunctionMaxQuery.java +
DisjunctionMaxScorer and MultiPhraseQuery.java + UnionPostingsEnum,
branch_8x; SURVEY.md §2.3): dismax score = max + tie_breaker·(sum − max)
over matching clauses; multi_phrase slots match ANY variant with
union-of-positions adjacency, and the classic analyzer upgrade (a quoted
phrase whose slot expands into posInc-0 synonyms becomes a
MultiPhraseQuery) mirrors QueryBuilder#analyzeMultiPhrase."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.query import search


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# dis_max
# ---------------------------------------------------------------------------

def _clause_scores(idx, clauses):
    """url → per-clause float32 score maps, one FULL search per clause."""
    res = search(
        idx,
        [{"query_id": i, **c} for i, c in enumerate(clauses)],
        k=10**9, method="exhaustive",
    )
    maps = []
    for i in range(len(clauses)):
        sub = res[res.query_id == i]
        maps.append(dict(zip(sub["url"], sub["score"].astype(np.float32))))
    return maps


def test_dismax_vs_bruteforce(built_indexes, corpus_queries):
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:4]
    a, b, c, d = terms
    clauses = [
        {"kind": "or", "terms": [a, b]},
        {"kind": "term", "terms": [c]},
        {"kind": "and", "terms": [a, d]},
    ]
    for tb in (0.0, 0.3, 1.0):
        q = [{"query_id": 0, "kind": "dis_max", "clauses": clauses,
              "tie_breaker": tb}]
        r4 = search(idx4, q, k=10**9, method="exhaustive")
        r1 = search(idx1, q, k=10**9, method="exhaustive")
        assert _frame(r4).equals(_frame(r1))

        maps = _clause_scores(idx4, clauses)
        urls = set().union(*maps)
        assert set(r4["url"]) == urls
        got = dict(zip(r4["url"], r4["score"]))
        for u in urls:
            vals = [m[u] for m in maps if u in m]
            best = np.float32(max(vals))
            ssum = np.float32(0.0)
            for v in vals:
                ssum = np.float32(ssum + v)
            exp = best + np.float32(tb) * (ssum - best)
            assert got[u] == pytest.approx(float(exp), rel=1e-6), (u, tb)


def test_dismax_semantics(built_indexes, corpus_queries):
    """tb=0 → pure max; tb=1 → equals the bool SHOULD sum; ghost-only
    clause list matches nothing; boost multiplies."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:2]
    a, b = terms
    clauses = [{"kind": "term", "terms": [a]}, {"kind": "term", "terms": [b]}]
    r_tb1 = search(idx4, [{"query_id": 0, "kind": "dis_max",
                           "clauses": clauses, "tie_breaker": 1.0}],
                   k=10**9, method="exhaustive")
    r_or = search(idx4, [{"query_id": 0, "kind": "bool", "should": clauses}],
                  k=10**9, method="exhaustive")
    assert set(r_tb1["url"]) == set(r_or["url"])
    s1 = dict(zip(r_tb1["url"], r_tb1["score"]))
    s2 = dict(zip(r_or["url"], r_or["score"]))
    for u in s1:
        assert s1[u] == pytest.approx(s2[u], rel=1e-6)

    ghost = search(idx4, [{"query_id": 0, "kind": "dis_max",
                           "clauses": [{"kind": "term", "terms": ["zzq_ghost"]}]}],
                   k=10)
    assert len(ghost) == 0

    r_b = search(idx4, [{"query_id": 0, "kind": "dis_max", "clauses": clauses,
                         "boost": 2.0}], k=10**9, method="exhaustive")
    r_p = search(idx4, [{"query_id": 0, "kind": "dis_max",
                         "clauses": clauses}], k=10**9, method="exhaustive")
    bs = dict(zip(r_b["url"], r_b["score"]))
    ps = dict(zip(r_p["url"], r_p["score"]))
    assert set(bs) == set(ps)
    for u in bs:
        assert bs[u] == pytest.approx(2.0 * ps[u], rel=1e-6)


def test_dismax_in_bool_tree_and_delete(built_indexes, corpus_queries,
                                        tmp_path):
    """dis_max works as a bool sub-clause and in deleteByQuery routing."""
    import shutil

    from lucene_solr_ray.pipelines.update import delete_by_query

    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:3]
    a, b, c = terms
    dm = {"kind": "dis_max", "clauses": [
        {"kind": "term", "terms": [a]}, {"kind": "term", "terms": [b]}]}
    r = search(idx4, [
        {"query_id": 0, "kind": "bool", "must": [dm], "must_not":
            [{"kind": "term", "terms": [c]}]},
        {"query_id": 1, "kind": "or", "terms": [a, b], "exclude": [c]},
    ], k=10**9, method="exhaustive")
    m0 = set(r[r.query_id == 0]["url"])
    m1 = set(r[r.query_id == 1]["url"])
    assert m0 == m1

    copy = str(tmp_path / "dmx_del")
    shutil.copytree(idx4, copy)
    pre = len(search(copy, [{"query_id": 0, **dm}], k=10**9,
                     method="exhaustive"))
    stats = delete_by_query(copy, dm)
    assert stats["matched"] == pre
    assert len(search(copy, [{"query_id": 0, **dm}], k=10**9,
                      method="exhaustive")) == 0


# ---------------------------------------------------------------------------
# multi_phrase
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mp_pages(tmp_path_factory):
    texts = [
        "the ray data engine streams blocks",      # ray data
        "a ray dataset engine also streams",       # ray dataset
        "ray of light no phrase here",             # ray alone
        "data engine without the lead token",      # no slot-0 match
        "ray data and ray dataset twice over",     # freq 2 (both variants)
        "dataset ray reversed order",              # reversed — no match
    ]
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    base = tmp_path_factory.mktemp("mp_pages")
    p = str(base / "pages.parquet")
    pq.write_table(pages, p)
    return p, texts


@pytest.fixture(scope="module")
def mp_index(ray_session, mp_pages, tmp_path_factory):
    from lucene_solr_ray.pipelines.build import build_index

    p, _ = mp_pages
    base = tmp_path_factory.mktemp("mp_idx")
    idx1, idx2 = str(base / "p1"), str(base / "p2")
    build_index([p], idx1, num_partitions=1, store_positions=True)
    build_index([p], idx2, num_partitions=2, store_positions=True)
    return idx1, idx2


def test_multi_phrase_engine_vs_oracle(mp_index, mp_pages):
    from lucene_solr_ray.search.oracle import OracleIndex

    idx1, idx2 = mp_index
    p, _ = mp_pages
    queries = [
        {"query_id": 0, "kind": "multi_phrase",
         "positions": [["ray"], ["data", "dataset"]]},
        {"query_id": 1, "kind": "multi_phrase",
         "positions": [["ray"], ["data", "dataset"], ["engine"]]},
        {"query_id": 2, "kind": "multi_phrase",     # ghost variant ignored
         "positions": [["ray"], ["data", "zz_ghost"]]},
        {"query_id": 3, "kind": "multi_phrase",     # ghost-only slot → empty
         "positions": [["ray"], ["zz_ghost"]]},
        {"query_id": 4, "kind": "multi_phrase",     # sloppy
         "positions": [["ray"], ["engine", "streams"]], "slop": 2},
    ]
    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r2 = search(idx2, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r2))

    exp = OracleIndex([p]).search(queries, k=10**9)
    got = _frame(r1)
    assert len(got) == len(exp)
    assert list(got["url"]) == list(exp["url"])
    np.testing.assert_allclose(
        got["score"].to_numpy(), exp["score"].to_numpy(), rtol=1e-6)

    m0 = set(r1[r1.query_id == 0]["url"])
    assert m0 == {"u://000", "u://001", "u://004"}
    # doc 004 holds both variants → freq 2 → strictly higher tf component
    assert 3 not in set(r1["query_id"])


def test_multi_phrase_single_variant_equals_phrase(mp_index):
    """Single-variant slots must reproduce PhraseQuery bit-exactly (same
    weight accumulation, same freq, same norm path)."""
    idx1, _ = mp_index
    rp = search(idx1, [{"query_id": 0, "kind": "phrase",
                        "terms": ["ray", "data"]}], k=10**9,
                method="exhaustive")
    rm = search(idx1, [{"query_id": 0, "kind": "multi_phrase",
                        "positions": [["ray"], ["data"]]}], k=10**9,
                method="exhaustive")
    assert _frame(rp).equals(_frame(rm))


def test_multi_phrase_in_bool_tree(mp_index):
    mp = {"kind": "multi_phrase", "positions": [["ray"], ["data", "dataset"]]}
    idx1, idx2 = mp_index
    r = search(idx2, [
        {"query_id": 0, "kind": "bool", "must": [mp],
         "must_not": [{"kind": "term", "terms": ["twice"]}]},
    ], k=10**9, method="exhaustive")
    assert set(r["url"]) == {"u://000", "u://001"}


@pytest.fixture(scope="module")
def fuzz_corpus(ray_session, tmp_path_factory):
    """Collision-heavy random corpus (8-word vocab, 80 docs) + P1/P3
    positions indexes — tiny vocabulary so random 2-3-slot phrases hit
    many docs with freq > 1 and union-variant overlaps."""
    from lucene_solr_ray.pipelines.build import build_index

    rng = np.random.default_rng(73)
    vocab = ["ray", "data", "set", "block", "stream", "merge", "sort", "scan"]
    texts = [
        " ".join(vocab[int(j)]
                 for j in rng.integers(0, len(vocab), size=int(m)))
        for m in rng.integers(3, 13, size=80)
    ]
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    base = tmp_path_factory.mktemp("mp_fuzz")
    p = str(base / "pages.parquet")
    pq.write_table(pages, p)
    idx1, idx3 = str(base / "p1"), str(base / "p3")
    build_index([p], idx1, num_partitions=1, store_positions=True)
    build_index([p], idx3, num_partitions=3, store_positions=True)
    return p, vocab, idx1, idx3


def test_multi_phrase_fuzz_vs_oracle(fuzz_corpus):
    """40 random multi_phrase queries (2-3 slots, 1-2 variants + ghosts,
    slop 0-2): P1 frame == P3 frame exactly, and doc set + per-url scores
    match OracleIndex (UnionPostingsEnum twin)."""
    from lucene_solr_ray.search.oracle import OracleIndex

    p, vocab, idx1, idx3 = fuzz_corpus
    rng = np.random.default_rng(8191)
    queries = []
    for qid in range(40):
        slots = []
        for _ in range(int(rng.integers(2, 4))):
            nv = int(rng.integers(1, 3))
            variants = list(rng.choice(vocab, size=nv, replace=False))
            if rng.random() < 0.15:
                variants.append("zz_ghost")
            slots.append(variants)
        q = {"query_id": qid, "kind": "multi_phrase", "positions": slots}
        s = int(rng.integers(0, 3))
        if s:
            q["slop"] = s
        queries.append(q)

    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r3 = search(idx3, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r3))

    exp = OracleIndex([p]).search(queries, k=10**9)
    n_hits = 0
    for qid in range(40):
        g = r1[r1.query_id == qid]
        e = exp[exp.query_id == qid]
        assert set(g["url"]) == set(e["url"]), qid
        gm = dict(zip(g["url"], g["score"]))
        em = dict(zip(e["url"], e["score"]))
        for u in gm:
            assert gm[u] == pytest.approx(em[u], rel=1e-6), (qid, u)
        n_hits += len(g)
    assert n_hits > 100  # the corpus actually exercises the matcher


def test_dismax_fuzz_partition_and_combiner(fuzz_corpus):
    """30 random dis_max trees (or/and/term clauses, random tie_breaker):
    P1 == P3 exactly; score == max + tb*(sum-max) recomposed from
    per-clause full searches."""
    p, vocab, idx1, idx3 = fuzz_corpus
    rng = np.random.default_rng(4099)
    cases = []
    for qid in range(30):
        clauses = []
        for _ in range(int(rng.integers(1, 4))):
            kind = ("term", "or", "and")[int(rng.integers(0, 3))]
            nt = 1 if kind == "term" else int(rng.integers(1, 3))
            clauses.append({"kind": kind,
                            "terms": list(rng.choice(vocab, size=nt,
                                                     replace=False))})
        tb = float(rng.choice([0.0, 0.1, 0.5, 1.0]))
        cases.append((qid, clauses, tb))

    queries = [{"query_id": qid, "kind": "dis_max", "clauses": cl,
                "tie_breaker": tb} for qid, cl, tb in cases]
    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r3 = search(idx3, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r3))

    for qid, clauses, tb in cases:
        sub = search(idx1, [{"query_id": i, **c}
                            for i, c in enumerate(clauses)],
                     k=10**9, method="exhaustive")
        maps = [dict(zip(sub[sub.query_id == i]["url"],
                         sub[sub.query_id == i]["score"].astype(np.float32)))
                for i in range(len(clauses))]
        g = r1[r1.query_id == qid]
        assert set(g["url"]) == set().union(*maps), qid
        gm = dict(zip(g["url"], g["score"]))
        for u, s in gm.items():
            vals = [m[u] for m in maps if u in m]
            best = np.float32(max(vals))
            ssum = np.float32(0.0)
            for v in vals:
                ssum = np.float32(ssum + v)
            e = float(best + np.float32(tb) * (ssum - best))
            assert s == pytest.approx(e, rel=1e-6), (qid, u)


def test_phrase_synonym_upgrade(ray_session, mp_pages, tmp_path):
    """A quoted phrase whose slot the analyzer expands (posInc-0 synonyms)
    upgrades to multi_phrase — QueryBuilder#analyzeMultiPhrase: the query
    "ray data" against a data≡dataset index matches BOTH surface forms."""
    from lucene_solr_ray.pipelines.build import build_index

    p, _ = mp_pages
    idx = str(tmp_path / "syn_idx")
    build_index([p], idx, num_partitions=2, store_positions=True,
                analyzer_spec={
                    "tokenizer": "standard_uax29", "max_token_length": 255,
                    "filters": ["lowercase",
                                {"name": "synonym",
                                 "groups": [["data", "dataset"]]}],
                })
    r = search(idx, [{"query_id": 0, "kind": "phrase",
                      "terms": ["ray", "data"]}], k=10**9,
               method="exhaustive")
    assert set(r["url"]) == {"u://000", "u://001", "u://004"}
    # explicit multi_phrase over the same expansion is identical
    rm = search(idx, [{"query_id": 0, "kind": "multi_phrase",
                       "positions": [["ray"], ["data", "dataset"]]}],
                k=10**9, method="exhaustive")
    assert _frame(r).equals(_frame(rm))
