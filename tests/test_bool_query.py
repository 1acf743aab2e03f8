"""Nested BooleanQuery trees (reference: lucene/core/src/java/org/apache/
lucene/search/BooleanQuery.java + BooleanWeight.java, branch_8x): the
nested evaluator must reproduce every flat path bit-exactly on the
queries both can express, match P=1 == P=4, and honor the nested
semantics (must/should score sum, msm defaults, must_not pruning)."""

import numpy as np

from lucene_solr_ray.pipelines.query import search


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


def test_bool_flat_identities(built_indexes, corpus_queries):
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:4]
    a, b, c, d = terms

    def t(x):
        return {"kind": "term", "terms": [x]}

    flat = [
        {"query_id": 0, "kind": "or", "terms": [a, b]},
        {"query_id": 1, "kind": "and", "terms": [a, b]},
        {"query_id": 2, "kind": "or", "terms": [a, b, c], "min_should_match": 2},
        {"query_id": 3, "kind": "or", "terms": [a, b], "exclude": [c]},
    ]
    nested = [
        {"query_id": 0, "kind": "bool", "should": [t(a), t(b)]},
        {"query_id": 1, "kind": "bool", "must": [t(a), t(b)]},
        {"query_id": 2, "kind": "bool", "should": [t(a), t(b), t(c)],
         "min_should_match": 2},
        {"query_id": 3, "kind": "bool", "must": [{"kind": "or", "terms": [a, b]}],
         "must_not": [t(c)]},
    ]
    rf = search(idx4, flat, k=10)
    rn = search(idx4, nested, k=10)
    assert _frame(rf).equals(_frame(rn))
    # partition invariance of the nested path itself
    rn1 = search(idx1, nested, k=10)
    assert _frame(rn1).equals(_frame(rn))


def test_bool_nested_semantics(built_indexes, corpus_queries):
    """must+should: should is optional (msm defaults to 0) but adds score;
    a ghost must_not clause changes nothing; an impossible must empties."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:3]
    a, b, c = terms

    def t(x):
        return {"kind": "term", "terms": [x]}

    r = search(idx4, [
        {"query_id": 0, "kind": "bool", "must": [t(a)], "should": [t(b)]},
        {"query_id": 1, "kind": "term", "terms": [a]},
        {"query_id": 2, "kind": "bool", "must": [t(a)],
         "must_not": [t("zzz_ghost")]},
        {"query_id": 3, "kind": "bool", "must": [t(a), t("zzz_ghost")]},
    ], k=10**6)
    match0 = set(r[r.query_id == 0]["url"])
    match1 = set(r[r.query_id == 1]["url"])
    # must=a, should=b matches exactly the docs matching a
    assert match0 == match1
    # ...but scores differ where b also matches: score(0) >= score(1)
    s0 = r[r.query_id == 0].set_index("url")["score"]
    s1 = r[r.query_id == 1].set_index("url")["score"]
    assert (s0[s1.index].to_numpy() >= s1.to_numpy() - 1e-6).all()
    assert (s0[s1.index].to_numpy() > s1.to_numpy()).any()
    assert set(r[r.query_id == 2]["url"]) == match1
    assert len(r[r.query_id == 3]) == 0


def test_bool_deep_nesting_bruteforce(built_indexes, small_corpus):
    """Two-level tree vs a per-doc brute-force recomputation over the raw
    corpus (CheckHits pattern)."""
    import pyarrow.parquet as pq

    idx1, idx4 = built_indexes
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p, columns=["url", "text"]).to_pylist())
    # last-wins dedup already applied at build; rebuild the surviving texts
    from collections import Counter

    texts = {}
    for row in rows:
        texts[row["url"]] = row["text"]  # generator emits one row per url here

    tf = {u: Counter(t.lower().split()) for u, t in texts.items()}
    vocab = Counter()
    for c in tf.values():
        vocab.update(c.keys())
    common = [w for w, _ in vocab.most_common(4)]
    a, b, c, d = common

    def t(x):
        return {"kind": "term", "terms": [x]}

    q = {
        "query_id": 0, "kind": "bool",
        "must": [{"kind": "bool", "should": [t(a), {"kind": "and", "terms": [b, c]}]}],
        "must_not": [t(d)],
    }
    res = search(idx4, [q], k=10**6)
    got = set(res["url"])
    exp = {
        u for u, cnt in tf.items()
        if (cnt[a] > 0 or (cnt[b] > 0 and cnt[c] > 0)) and cnt[d] == 0
    }
    assert got == exp


def test_bool_boost_and_const(built_indexes, corpus_queries):
    """BoostQuery multiplies a clause's score; ConstantScoreQuery scores
    exactly its boost regardless of tf/idf (reference BoostQuery.java /
    ConstantScoreQuery.java, branch_8x)."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:2]
    a, b = terms

    def t(x, **kw):
        return dict({"kind": "term", "terms": [x]}, **kw)

    r = search(idx4, [
        {"query_id": 0, "kind": "bool", "should": [t(a)]},
        {"query_id": 1, "kind": "bool", "should": [t(a, boost=2.0)]},
        {"query_id": 2, "kind": "bool",
         "should": [{"kind": "const", "of": t(a), "boost": 7.0}]},
        {"query_id": 3, "kind": "bool",
         "must": [t(a)],
         "should": [{"kind": "const", "of": t(b), "boost": 100.0}]},
    ], k=10**6)
    base = r[r.query_id == 0].set_index("url")["score"]
    boosted = r[r.query_id == 1].set_index("url")["score"]
    assert set(base.index) == set(boosted.index)
    assert np.allclose(boosted[base.index].to_numpy(),
                       2.0 * base.to_numpy(), rtol=1e-6)
    const = r[r.query_id == 2]
    assert set(const["url"]) == set(base.index)
    assert (const["score"].to_numpy() == np.float32(7.0)).all()
    # const-in-should: docs also matching b jump by exactly 100
    mixed = r[r.query_id == 3].set_index("url")["score"]
    assert set(mixed.index) == set(base.index)
    deltas = mixed[base.index].to_numpy() - base.to_numpy()
    assert set(np.round(deltas).astype(int)) <= {0, 100}
    assert (np.round(deltas) == 100).any()


def test_bool_filter_occur(built_indexes, corpus_queries):
    """Occur.FILTER: required, non-scoring (solr fq analog) — scores equal
    the unfiltered must clause on surviving docs; filter-only bools match
    with score 0.0."""
    import numpy as np

    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:2]
    a, b = terms

    def t(x):
        return {"kind": "term", "terms": [x]}

    filtered = search(idx4, [
        {"query_id": 0, "kind": "bool", "must": [t(a)], "filter": [t(b)]},
    ], k=10**9)
    unfiltered = search(idx4, [{"query_id": 0, "kind": "term", "terms": [a]}],
                        k=10**9)
    both = search(idx4, [{"query_id": 0, "kind": "and", "terms": [a, b]}],
                  k=10**9)
    assert set(filtered["url"]) == set(both["url"])
    base = dict(zip(unfiltered["url"], unfiltered["score"]))
    for url, sc in zip(filtered["url"], filtered["score"]):
        assert base[url] == sc  # filter adds NO score
    filter_only = search(idx4, [
        {"query_id": 0, "kind": "bool", "filter": [t(b)]},
    ], k=10**9)
    assert len(filter_only) == len(search(
        idx4, [{"query_id": 0, "kind": "term", "terms": [b]}], k=10**9))
    assert np.all(filter_only["score"].to_numpy() == 0.0)
    # partition invariance
    f1 = search(idx1, [
        {"query_id": 0, "kind": "bool", "must": [t(a)], "filter": [t(b)]},
    ], k=10**9)
    assert _frame(f1).equals(_frame(filtered))
