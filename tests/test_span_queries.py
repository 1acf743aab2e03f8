"""Span queries (reference: lucene/core/.../search/spans/NearSpansOrdered
+ SpanFirstQuery, branch_8x): the vectorized ordered matcher is pinned by a
brute-force reference on random position lists; engine span queries must be
partition-invariant and consistent with a pure-Python per-doc recount."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.search.searcher import (
    sloppy_phrase_freq,
    span_near_ordered_freq,
)


def _brute_ordered(pos_lists, slop):
    """Count start positions p1 admitting an in-order chain whose minimal
    width (greedy smallest-next is optimal for fixed start) ≤ slop + k."""
    k = len(pos_lists)
    count = 0
    for p1 in pos_lists[0]:
        prev, ok = p1, True
        for lst in pos_lists[1:]:
            nxt = [p for p in lst if p > prev]
            if not nxt:
                ok = False
                break
            prev = min(nxt)
        if ok and (prev - p1 + 1) - k <= slop:
            count += 1
    return count


def test_ordered_matcher_vs_bruteforce():
    rng = np.random.default_rng(7)
    for trial in range(200):
        k = int(rng.integers(2, 5))
        pos_lists = [
            np.unique(rng.integers(0, 30, size=rng.integers(1, 8)))
            for _ in range(k)
        ]
        slop = int(rng.integers(0, 6))
        assert span_near_ordered_freq(pos_lists, slop) == _brute_ordered(
            [lst.tolist() for lst in pos_lists], slop
        ), (trial, [lst.tolist() for lst in pos_lists], slop)


def test_ordered_matcher_edges():
    a = np.array([0, 5, 9])
    b = np.array([1, 6])
    assert span_near_ordered_freq([a, b], 0) == 2  # (0,1) and (5,6)
    assert span_near_ordered_freq([a, b], 10) == 2  # 9 has no successor
    assert span_near_ordered_freq([b, a], 0) == 0  # 1→5, 6→9: width 5 > 2
    assert span_near_ordered_freq([b, a], 3) == 2
    assert span_near_ordered_freq([a, np.array([], dtype=np.int64)], 5) == 0


@pytest.fixture(scope="module")
def span_index(ray_session, small_corpus, tmp_path_factory):
    from lucene_solr_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("span_idx")
    idx1, idx2 = str(base / "p1"), str(base / "p2")
    build_index(small_corpus, idx1, num_partitions=1, store_positions=True)
    build_index(small_corpus, idx2, num_partitions=2, store_positions=True)
    return idx1, idx2


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


def _corpus_token_positions(small_corpus):
    """url → token list, applying the build's row semantics: lang == 'en'
    filter and per-url version resolution by max (warc_ts, dl)."""
    from lucene_solr_ray.analysis.tokenizer import tokenize_lower

    best = {}
    for p in small_corpus:
        for r in pq.read_table(p).to_pylist():
            if r.get("lang") != "en":
                continue
            key = (r["warc_ts"], len(r["text"]))
            if r["url"] not in best or key > best[r["url"]][0]:
                best[r["url"]] = (key, r["text"])
    return {url: tokenize_lower(text) for url, (_, text) in best.items()}


def test_span_queries_engine(span_index, small_corpus):
    idx1, idx2 = span_index
    docs = _corpus_token_positions(small_corpus)
    # pick two terms that co-occur in at least one doc
    from collections import Counter

    cnt = Counter(t for toks in docs.values() for t in set(toks))
    common = [t for t, _ in cnt.most_common(6)]
    t1, t2 = common[0], common[1]
    queries = [
        {"query_id": 0, "kind": "span_near", "terms": [t1, t2], "slop": 3,
         "in_order": True},
        {"query_id": 1, "kind": "span_near", "terms": [t1, t2], "slop": 3,
         "in_order": False},
        {"query_id": 2, "kind": "span_first", "terms": [t1], "end": 4},
        {"query_id": 3, "kind": "span_near", "terms": [t1, "zzz_ghost"],
         "slop": 9, "in_order": True},
    ]
    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r2 = search(idx2, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r2))
    assert 3 not in set(r1["query_id"])  # ghost term → no hits

    # recount every query against raw token positions (pure Python)
    def positions(toks, term):
        return np.array([i for i, t in enumerate(toks) if t == term],
                        dtype=np.int64)

    def expected_urls(q):
        urls = set()
        for url, toks in docs.items():
            if q["kind"] == "span_first":
                pos = positions(toks, q["terms"][0])
                if np.any(pos < q["end"]):
                    urls.add(url)
                continue
            pls = [positions(toks, t) for t in q["terms"]]
            if any(len(p) == 0 for p in pls):
                continue
            f = (span_near_ordered_freq(pls, q["slop"])
                 if q["in_order"] else sloppy_phrase_freq(pls, q["slop"]))
            if f > 0:
                urls.add(url)
        return urls

    for q in queries[:3]:
        got = set(r1[r1["query_id"] == q["query_id"]]["url"])
        assert got == expected_urls(q), q
    # the positive span queries must actually match something
    assert len(r1[r1["query_id"] == 1]) >= len(r1[r1["query_id"] == 0]) > 0


def test_span_in_bool_tree(span_index, small_corpus, built_indexes):
    """span_near as a MUST clause composes with a SHOULD term and equals
    the standalone span on docs where the should term is absent."""
    idx1, idx2 = span_index
    docs = _corpus_token_positions(small_corpus)
    from collections import Counter

    cnt = Counter(t for toks in docs.values() for t in set(toks))
    common = [t for t, _ in cnt.most_common(6)]
    t1, t2 = common[0], common[1]
    span = {"kind": "span_near", "terms": [t1, t2], "slop": 5, "in_order": False}
    wrapped = {"query_id": 0, "kind": "bool", "must": [span]}
    standalone = {"query_id": 0, **span}
    rw = search(idx2, [wrapped], k=10**9, method="exhaustive")
    rs = search(idx2, [standalone], k=10**9, method="exhaustive")
    assert _frame(rw).equals(_frame(rs))
    # a no-positions index refuses span queries loudly
    no_pos, _ = built_indexes
    with pytest.raises(Exception, match="positions"):
        search(no_pos, [standalone], k=10, method="exhaustive")


def test_span_or_slots(span_index, small_corpus):
    """SpanNear over SpanOr clauses ('slots' alternatives): union-of-
    positions per slot, P-invariant, pure-Python recount agrees; a slot
    of only ghost variants matches nothing; single-variant slots equal
    the plain terms form bit-exactly."""
    idx1, idx2 = span_index
    docs = _corpus_token_positions(small_corpus)
    from collections import Counter

    cnt = Counter(t for toks in docs.values() for t in set(toks))
    common = [t for t, _ in cnt.most_common(8)]
    t1, t2, t3, t4 = common[:4]
    queries = [
        {"query_id": 0, "kind": "span_near", "slots": [[t1, t3], [t2, t4]],
         "slop": 4, "in_order": True},
        {"query_id": 1, "kind": "span_near", "slots": [[t1], [t2]],
         "slop": 3, "in_order": True},
        {"query_id": 2, "kind": "span_near", "terms": [t1, t2],
         "slop": 3, "in_order": True},
        {"query_id": 3, "kind": "span_near",
         "slots": [[t1], ["zzz_g1", "zzz_g2"]], "slop": 9, "in_order": True},
        {"query_id": 4, "kind": "span_first", "slots": [[t1, t2]], "end": 3},
    ]
    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r2 = search(idx2, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r2))
    # single-variant slots == plain terms, bit-exactly
    a = _frame(r1[r1.query_id == 1]).drop(columns=["query_id"])
    b = _frame(r1[r1.query_id == 2]).drop(columns=["query_id"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert 3 not in set(r1["query_id"])  # all-ghost slot → no hits

    def positions(toks, terms):
        return np.array(sorted(i for i, t in enumerate(toks) if t in terms),
                        dtype=np.int64)

    got0 = set(r1[r1.query_id == 0]["url"])
    want0 = set()
    for url, toks in docs.items():
        pls = [positions(toks, {t1, t3}), positions(toks, {t2, t4})]
        if all(len(p) for p in pls) and span_near_ordered_freq(pls, 4) > 0:
            want0.add(url)
    assert got0 == want0

    got4 = set(r1[r1.query_id == 4]["url"])
    want4 = {url for url, toks in docs.items()
             if np.any(positions(toks, {t1, t2}) < 3)}
    assert got4 == want4
    assert len(got0) > 0 and len(got4) > 0


def test_ordered_spans_vs_freq():
    """span_near_ordered_spans returns exactly the chains the freq counts,
    with inclusive ends equal to the greedy minimal chain's last hop."""
    rng = np.random.default_rng(11)
    from lucene_solr_ray.search.searcher import span_near_ordered_spans

    for trial in range(200):
        k = int(rng.integers(2, 5))
        pos_lists = [
            np.unique(rng.integers(0, 30, size=rng.integers(1, 8)))
            for _ in range(k)
        ]
        slop = int(rng.integers(0, 6))
        s, e = span_near_ordered_spans(pos_lists, slop)
        assert len(s) == span_near_ordered_freq(pos_lists, slop)
        assert np.all(e >= s)
        assert np.all((e - s + 1) - k <= slop)
        # starts are a subset of the first term's positions, ends of the last
        assert set(s.tolist()) <= set(pos_lists[0].tolist())
        assert set(e.tolist()) <= set(pos_lists[-1].tolist())


def _brute_span_not(toks, inc_terms, ex_term, pre, post, slop=None):
    """Pure-Python SpanNot doc predicate: any include span surviving the
    widened exclude window. include = term (len 1) or ordered pair chain."""
    def pos(t):
        return [i for i, x in enumerate(toks) if x == t]

    ex = set(pos(ex_term))
    spans = []
    if len(inc_terms) == 1:
        spans = [(p, p) for p in pos(inc_terms[0])]
    else:
        for p1 in pos(inc_terms[0]):
            prev, ok = p1, True
            for t in inc_terms[1:]:
                nxt = [p for p in pos(t) if p > prev]
                if not nxt:
                    ok = False
                    break
                prev = min(nxt)
            if ok and (prev - p1 + 1) - len(inc_terms) <= slop:
                spans.append((p1, prev))
    for s, e in spans:
        if not any(q in ex for q in range(s - pre, e + post + 1)):
            return True
    return False


def test_span_not_engine(span_index, small_corpus):
    """SpanNotQuery analog: P-invariant, pure-Python recount agrees for
    term and ordered-span includes; ghost exclude = plain include."""
    idx1, idx2 = span_index
    docs = _corpus_token_positions(small_corpus)
    from collections import Counter

    cnt = Counter(t for toks in docs.values() for t in set(toks))
    common = [t for t, _ in cnt.most_common(6)]
    t1, t2, t3 = common[:3]
    queries = [
        {"query_id": 0, "kind": "span_not",
         "include": {"kind": "term", "terms": [t1]},
         "exclude_terms": [t2], "pre": 1, "post": 1},
        {"query_id": 1, "kind": "span_not",
         "include": {"kind": "span_near", "terms": [t1, t2], "slop": 4,
                     "in_order": True},
         "exclude_terms": [t3], "pre": 0, "post": 0},
        {"query_id": 2, "kind": "span_not",
         "include": {"kind": "term", "terms": [t1]},
         "exclude_terms": ["zzz_ghost"], "pre": 2, "post": 2},
        {"query_id": 3, "kind": "term", "terms": [t1]},
    ]
    r1 = search(idx1, queries, k=10**9, method="exhaustive")
    r2 = search(idx2, queries, k=10**9, method="exhaustive")
    assert _frame(r1).equals(_frame(r2))

    got0 = set(r1[r1.query_id == 0]["url"])
    want0 = {u for u, toks in docs.items()
             if _brute_span_not(toks, [t1], t2, 1, 1)}
    assert got0 == want0 and len(want0) > 0

    got1 = set(r1[r1.query_id == 1]["url"])
    want1 = {u for u, toks in docs.items()
             if _brute_span_not(toks, [t1, t2], t3, 0, 0, slop=4)}
    assert got1 == want1

    # ghost exclude: same docs AND same scores as the plain term query
    a = _frame(r1[r1.query_id == 2]).drop(columns=["query_id"])
    b = _frame(r1[r1.query_id == 3]).drop(columns=["query_id"])
    assert set(a["url"]) == set(b["url"]) and len(a) > 0
