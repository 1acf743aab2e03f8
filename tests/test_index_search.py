"""End-to-end correctness gates (SURVEY.md §5 patterns 4/5/6):
distributed-vs-control equivalence, oracle rank-identity, WAND purity,
CheckIndex invariants, resume, dedup semantics."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.search.oracle import OracleIndex


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


def test_distributed_equals_control(built_indexes, corpus_queries):
    """P=1 vs P=4: identical top-k urls AND float32 scores (pattern 6 —
    BaseDistributedSearchTestCase's single-control-vs-sharded assert)."""
    idx1, idx4 = built_indexes
    r1 = search(idx1, corpus_queries, k=10)
    r4 = search(idx4, corpus_queries, k=10)
    assert _frame(r1).equals(_frame(r4))


def test_oracle_rank_identity(built_indexes, small_corpus, corpus_queries):
    """Engine vs the pure-Python Lucene-8.x-semantics oracle (pattern 5)."""
    _, idx4 = built_indexes
    res = search(idx4, corpus_queries, k=10)
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p).to_pylist())
    oracle = OracleIndex(rows)
    for q in corpus_queries:
        exp = oracle.query(q["terms"], q["kind"], 10)
        g = res[res.query_id == q["query_id"]]
        got = list(zip(g.url, [float(np.float32(s)) for s in g.score]))
        assert got == exp, f"query {q}"


def test_wand_identical(built_indexes, corpus_queries):
    """Block-max WAND is pure optimization: bit-identical results (M4)."""
    _, idx4 = built_indexes
    assert _frame(search(idx4, corpus_queries, k=10)).equals(
        _frame(search(idx4, corpus_queries, k=10, method="wand"))
    )


def test_checkindex(built_indexes):
    idx1, idx4 = built_indexes
    assert check_index(idx1) == []
    assert check_index(idx4) == []


def test_dedup_last_wins(built_indexes, small_corpus):
    """~1% dup urls: the index must keep exactly one doc per url, and the
    kept content must be the max-warc_ts version."""
    idx1, _ = built_indexes
    dm = pq.read_table(os.path.join(idx1, "segments", "part-00000", "docmap.parquet"))
    urls = dm["url"].to_pylist()
    assert len(urls) == len(set(urls))
    # input had dups for lang=en rows
    seen = {}
    n_dup_en = 0
    for p in small_corpus:
        t = pq.read_table(p, columns=["url", "lang"])
        for u, l in zip(t["url"].to_pylist(), t["lang"].to_pylist()):
            if l == "en":
                n_dup_en += u in seen
                seen[u] = True
    assert n_dup_en > 0, "corpus should contain en dup urls"
    kept_ts = dict(zip(dm["url"].to_pylist(), dm["warc_ts"].to_pylist()))
    max_ts = {}
    for p in small_corpus:
        t = pq.read_table(p, columns=["url", "warc_ts", "lang"])
        for u, ts, l in zip(
            t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["lang"].to_pylist()
        ):
            if l == "en" and (u not in max_ts or ts > max_ts[u]):
                max_ts[u] = ts
    assert kept_ts == max_ts


def test_resume_skips_done_partitions(ray_session, small_corpus, tmp_path_factory, corpus_queries):
    """Kill/resume (north_rule): rebuild only invalid partitions; results
    and manifests unchanged."""
    idx = str(tmp_path_factory.mktemp("resume") / "idx")
    root_a = build_index(small_corpus, idx, num_partitions=4)
    before = _frame(search(idx, corpus_queries, k=10))
    shutil.rmtree(os.path.join(idx, "segments", "part-00002"))
    root_b = build_index(small_corpus, idx, num_partitions=4)
    assert root_b["resumed_partitions"] == [0, 1, 3]
    assert root_b["num_docs"] == root_a["num_docs"]
    after = _frame(search(idx, corpus_queries, k=10))
    assert before.equals(after)
    # stale lineage (different partition count) must NOT resume
    root_c = build_index(small_corpus, idx, num_partitions=2)
    assert root_c["resumed_partitions"] == []


def test_extended_boolean_kinds(built_indexes, small_corpus, corpus_queries):
    """MUST_NOT / minShouldMatch / prefix vs the oracle, and P=1 == P=4
    (SURVEY.md §2.3 BooleanQuery clauses, §2.7 ReqExclScorer, PrefixQuery)."""
    idx1, idx4 = built_indexes
    base_terms = sorted({t for q in corpus_queries for t in q["terms"]})[:4]
    ext_queries = [
        {"query_id": 0, "kind": "or", "terms": base_terms[:3], "exclude": [base_terms[3]]},
        {"query_id": 1, "kind": "and", "terms": base_terms[:2], "exclude": [base_terms[2]]},
        {"query_id": 2, "kind": "or", "terms": base_terms[:3], "min_should_match": 2},
        {"query_id": 3, "kind": "or", "terms": base_terms[:4], "min_should_match": 3},
        {"query_id": 4, "kind": "prefix", "terms": [base_terms[0][:3]]},
        {"query_id": 5, "kind": "term", "terms": base_terms[:1], "exclude": ["zzz_ghost"]},
    ]
    r1 = search(idx1, ext_queries, k=10)
    r4 = search(idx4, ext_queries, k=10)
    assert _frame(r1).equals(_frame(r4))
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p).to_pylist())
    oracle = OracleIndex(rows)
    got = _frame(r4)
    exp = oracle.search(ext_queries, k=10)
    assert got[["query_id", "rank", "url"]].equals(
        exp[["query_id", "rank", "url"]].astype({"query_id": got["query_id"].dtype, "rank": got["rank"].dtype})
    )
    assert np.array_equal(
        got["score"].to_numpy().astype(np.float32), exp["score"].to_numpy()
    )
    # sanity: msm/exclude actually constrain
    assert set(r4[r4.query_id == 2]["url"]) <= set(
        search(idx4, [{"query_id": 0, "kind": "or", "terms": base_terms[:3]}], k=10**6)["url"]
    )


def test_searcher_service_identical(built_indexes, corpus_queries):
    """Persistent SearcherService (raw-actor scatter/gather) must be
    bit-identical to the Dataset search path across repeated calls."""
    from lucene_solr_ray.search.service import SearcherService

    _, idx4 = built_indexes
    expected = _frame(search(idx4, corpus_queries, k=10))
    svc = SearcherService(idx4, num_searchers=2)
    try:
        for _ in range(2):
            got = _frame(svc.search(corpus_queries, k=10))
            assert got.equals(expected)
    finally:
        svc.shutdown()


def test_ghost_terms(built_indexes):
    _, idx4 = built_indexes
    res = search(
        idx4,
        [
            {"query_id": 1, "kind": "term", "terms": ["zzz_no_such_term"]},
            {"query_id": 2, "kind": "and", "terms": ["w000000", "zzz_no_such_term"]},
            {"query_id": 3, "kind": "or", "terms": ["w000000", "zzz_no_such_term"]},
        ],
        k=5,
    )
    got_qids = set(res.query_id) if len(res) else set()
    assert 1 not in got_qids and 2 not in got_qids
    assert 3 in got_qids


def test_phrase_query(ray_session, small_corpus, corpus_queries, tmp_path_factory):
    """Exact PhraseQuery over a positions-enabled index: engine == oracle
    == P=1 (SURVEY.md §2.3 ExactPhraseMatcher semantics; phrase scored as
    one pseudo-term with summed idf)."""
    base = tmp_path_factory.mktemp("phrase")
    idx1, idx4 = str(base / "p1"), str(base / "p4")
    build_index(small_corpus, idx1, num_partitions=1, store_positions=True)
    build_index(small_corpus, idx4, num_partitions=4, store_positions=True)

    # phrases that actually occur: take bigrams from corpus texts
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p).to_pylist())
    from lucene_solr_ray.analysis.tokenizer import tokenize_lower

    bigrams = []
    for r in rows[:40]:
        toks = tokenize_lower(r["text"])
        if len(toks) >= 6:
            bigrams.append(toks[2:4])
            if len(toks) >= 10:
                bigrams.append(toks[5:8])  # a trigram too
    seen, phrases = set(), []
    for bg in bigrams:
        key = tuple(bg)
        if key not in seen:
            seen.add(key)
            phrases.append(list(bg))
        if len(phrases) == 12:
            break
    queries = [
        {"query_id": i, "kind": "phrase", "terms": ph} for i, ph in enumerate(phrases)
    ] + [{"query_id": 999, "kind": "phrase", "terms": ["zzz_ghost", "w000000"]}]

    r1 = _frame(search(idx1, queries, k=10))
    r4 = _frame(search(idx4, queries, k=10))
    assert len(r1) > 0, "no phrase produced hits"
    assert r1.equals(r4)
    oracle = OracleIndex(rows)
    exp = oracle.search(queries, k=10)
    got = r4
    assert got[["query_id", "rank", "url"]].reset_index(drop=True).equals(
        exp[["query_id", "rank", "url"]].astype(
            {"query_id": got["query_id"].dtype, "rank": got["rank"].dtype}
        )
    )
    assert np.array_equal(
        got["score"].to_numpy().astype(np.float32), exp["score"].to_numpy()
    )
    assert 999 not in set(got["query_id"])

    # an index without positions must refuse phrase queries loudly
    import pytest as _pytest

    no_pos = str(base / "nopos")
    build_index(small_corpus, no_pos, num_partitions=1)
    with _pytest.raises(Exception, match="positions"):
        search(no_pos, queries[:1], k=10)


def test_multiterm_kinds(built_indexes, small_corpus):
    """Wildcard/Regexp/Fuzzy constant-score expansion vs the pure-Python
    oracle, and P=1 == P=4 (SURVEY.md §2.3 AutomatonQuery family)."""
    idx1, idx4 = built_indexes
    queries = [
        {"query_id": 0, "kind": "wildcard", "terms": ["w0*"]},
        {"query_id": 1, "kind": "wildcard", "terms": ["w?0001?"]},
        {"query_id": 2, "kind": "regexp", "terms": ["w0+1.*"]},
        {"query_id": 3, "kind": "fuzzy", "terms": ["w000001"]},
        {"query_id": 4, "kind": "wildcard", "terms": ["zzz*nope"]},
        # parsed maxEdits is honored: ~1 must be a subset of the default ~2
        {"query_id": 5, "kind": "fuzzy", "terms": ["w000001"], "max_edits": 1},
    ]
    r1 = search(idx1, queries, k=20)
    r4 = search(idx4, queries, k=20)
    assert _frame(r1).equals(_frame(r4))
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p).to_pylist())
    oracle = OracleIndex(rows)
    got = _frame(r4)
    exp = oracle.search(queries, k=20)
    assert len(got) > 0
    assert got[["query_id", "rank", "url"]].reset_index(drop=True).equals(
        exp[["query_id", "rank", "url"]].astype(
            {"query_id": got["query_id"].dtype, "rank": got["rank"].dtype}
        )
    )
    assert 4 not in set(got["query_id"])
    # maxEdits=1 is honored (not silently widened back to 2): at FULL k
    # (truncated constant-score top-k is not subset-stable) the ~1 match
    # set must be a non-empty subset of the default ~2 set
    full = search(idx4, [
        {"query_id": 0, "kind": "fuzzy", "terms": ["w000001"], "max_edits": 1},
        {"query_id": 1, "kind": "fuzzy", "terms": ["w000001"]},
    ], k=10**9)
    e1 = set(full[full["query_id"] == 0]["url"])
    e2 = set(full[full["query_id"] == 1]["url"])
    assert e1 and e1 <= e2


def test_sloppy_phrase_freq_bruteforce():
    """Minimal-window matcher vs an O(positions^k) brute force on random
    position lists (the matcher's own correctness gate)."""
    from itertools import product as iproduct

    from lucene_solr_ray.search.sloppy_check import brute_force_window_count
    from lucene_solr_ray.search.searcher import sloppy_phrase_freq

    rng = np.random.default_rng(5)
    for trial in range(200):
        kterms = int(rng.integers(2, 4))
        slop = int(rng.integers(0, 5))
        lists = [
            np.unique(rng.integers(0, 30, size=rng.integers(1, 6)))
            for _ in range(kterms)
        ]
        got = sloppy_phrase_freq([l.astype(np.int64) for l in lists], slop)
        exp = brute_force_window_count(lists, slop)
        assert got == exp, (trial, [l.tolist() for l in lists], slop, got, exp)


def test_sloppy_phrase_repeated_terms():
    """Repeats-aware sloppy matching (SloppyPhraseMatcher repeats groups):
    a repeated query term needs multiplicity-many DISTINCT positions in
    the window — one occurrence must not satisfy both slots."""
    from lucene_solr_ray.search.sloppy_check import brute_force_window_count
    from lucene_solr_ray.search.searcher import sloppy_phrase_freq

    a = np.array([0, 2], dtype=np.int64)
    b = np.array([1], dtype=np.int64)
    # query "a b a" over doc "a b a": exactly one covering window at slop 0
    assert sloppy_phrase_freq([a, b, a], 0) == 1
    # doc "a b" (a only once) can NEVER match "a b a"
    a1 = np.array([0], dtype=np.int64)
    for slop in range(0, 6):
        assert sloppy_phrase_freq([a1, b, a1], slop) == 0
    # randomized: duplicate one list into a repeat slot, engine == brute
    rng = np.random.default_rng(9)
    for trial in range(200):
        slop = int(rng.integers(0, 5))
        base = [
            np.unique(rng.integers(0, 25, size=rng.integers(1, 6))).astype(np.int64)
            for _ in range(int(rng.integers(2, 4)))
        ]
        dup = base[int(rng.integers(0, len(base)))]
        lists = base + [dup]
        rng.shuffle(lists)
        got = sloppy_phrase_freq(lists, slop)
        exp = brute_force_window_count(lists, slop)
        assert got == exp, (trial, [l.tolist() for l in lists], slop, got, exp)


def test_sloppy_phrase_query(ray_session, small_corpus, corpus_queries, tmp_path_factory):
    """Sloppy phrase over a positions index: engine == oracle == P=1
    (SpanNearQuery-style unordered window, slop=2)."""
    base = tmp_path_factory.mktemp("sloppy")
    idx1, idx4 = str(base / "p1"), str(base / "p4")
    build_index(small_corpus, idx1, num_partitions=1, store_positions=True)
    build_index(small_corpus, idx4, num_partitions=4, store_positions=True)
    rows = []
    for p in small_corpus:
        rows.extend(pq.read_table(p).to_pylist())
    from lucene_solr_ray.analysis.tokenizer import tokenize_lower

    pairs = []
    for r in rows[:30]:
        toks = tokenize_lower(r["text"])
        if len(toks) >= 8:
            pairs.append([toks[2], toks[5]])  # 3 apart: needs slop >= 2
        if len(pairs) == 6:
            break
    queries = [
        {"query_id": i, "kind": "phrase", "terms": ph, "slop": 2}
        for i, ph in enumerate(pairs)
    ]
    r1 = _frame(search(idx1, queries, k=10))
    r4 = _frame(search(idx4, queries, k=10))
    assert len(r1) > 0
    assert r1.equals(r4)
    oracle = OracleIndex(rows)
    exp = oracle.search(queries, k=10)
    got = r4
    assert got[["query_id", "rank", "url"]].reset_index(drop=True).equals(
        exp[["query_id", "rank", "url"]].astype(
            {"query_id": got["query_id"].dtype, "rank": got["rank"].dtype}
        )
    )
    assert np.array_equal(
        got["score"].to_numpy().astype(np.float32), exp["score"].to_numpy()
    )


def test_regex_prefix_set():
    """Required-prefix extraction: every matching string must start with a
    returned prefix; None = unbounded (full scan)."""
    from lucene_solr_ray.search.multiterm import regex_prefix_set

    assert regex_prefix_set("(s|p)lan|h.sh") == ["h", "plan", "slan"]
    assert regex_prefix_set("abc") == ["abc"]
    assert regex_prefix_set("ab*c") == ["a"]       # b optional
    assert regex_prefix_set("ab+c") == ["ab"]      # one b required
    assert regex_prefix_set("a[xy]z") == ["axz", "ayz"]
    assert regex_prefix_set("a[b-d]") == ["ab", "ac", "ad"]
    assert regex_prefix_set(r"a\.b") == ["a.b"]    # escaped literal dot
    assert regex_prefix_set("(?:foo|ba)r") == ["bar", "foor"]
    assert regex_prefix_set("(|a)b") == sorted(["b", "ab"])
    # unbounded at position 0 → None
    assert regex_prefix_set(".*x") is None
    assert regex_prefix_set("[^a]b") is None
    assert regex_prefix_set(r"\d+") is None
    assert regex_prefix_set("x|.y") is None        # one branch unbounded
    assert regex_prefix_set("a{2,3}b") is None or regex_prefix_set("a{2,3}b") == []


def test_regexp_narrowed_equals_full_scan():
    """Property gate for the prefix narrowing: expand_regexp over a fake
    sorted vocab must equal a brute-force full-vocab re.fullmatch for
    every pattern, bounded and unbounded."""
    import re as _re

    from lucene_solr_ray.search import multiterm
    from lucene_solr_ray.index.segment import TermDict
    import pyarrow as _pa

    rng = np.random.default_rng(13)
    vocab = sorted({
        "".join(rng.choice(list("abcdefgh"), size=rng.integers(2, 7)))
        for _ in range(3000)
    } | {"plan", "slan", "hash", "hush", "scan", "span", "query"})

    class FakeReader:
        terms = TermDict(_pa.array(vocab, type=_pa.string()))
        def prefix_range(self, p):
            pb = p.encode("utf-8")
            return (self.terms.searchsorted(pb),
                    self.terms.searchsorted(pb + b"\xff"))

    r = FakeReader()
    patterns = [
        "(s|p)lan|h.sh", "pl.n", "s(c|p)an", "qu[de]ry", "a.*", ".*an",
        "ab+a", "(h|q)u..", "plan|scan|span", "z+", "[ab][cd]e.*",
        # unbounded-at-0 patterns exercising the required-FACTOR prefilter
        ".*lan.*", ".*ash", ".*qu.ry.*", ".+sh", ".*ab.*cd.*",
    ]
    for pat in patterns:
        got = sorted(multiterm.expand_regexp(r, pat).tolist())
        rx = _re.compile(f"^(?:{pat})$")
        exp = [i for i, t in enumerate(vocab) if rx.match(t)]
        assert got == exp, (pat, got[:5], exp[:5])

    # the factor path must actually engage and bound the RE2 scan
    from lucene_solr_ray.search.multiterm import SCAN_STATS, regex_required_factor

    assert regex_required_factor(".*lan.*") == "lan"
    before = dict(SCAN_STATS)
    multiterm.expand_regexp(r, ".*lan.*")
    assert SCAN_STATS["factor_calls"] > before["factor_calls"]
    scanned = SCAN_STATS["scanned_terms"] - before["scanned_terms"]
    assert scanned < len(vocab)  # prefiltered, not a full RE2 scan


def test_regexp_contract_pattern_narrows():
    """The ft_regexp_count contract pattern must ENGAGE the narrowed path:
    scanned terms ≪ vocab (the bench-visible counter)."""
    from lucene_solr_ray.index.segment import TermDict
    from lucene_solr_ray.search import multiterm
    import pyarrow as _pa

    rng = np.random.default_rng(3)
    vocab = sorted({
        "".join(rng.choice(list("abcdefghijklmnop"), size=rng.integers(3, 8)))
        for _ in range(5000)
    } | {"plan", "slan", "hash"})

    class FakeReader:
        terms = TermDict(_pa.array(vocab, type=_pa.string()))
        def prefix_range(self, p):
            pb = p.encode("utf-8")
            return (self.terms.searchsorted(pb),
                    self.terms.searchsorted(pb + b"\xff"))

    before = dict(multiterm.SCAN_STATS)
    ords = multiterm.expand_regexp(FakeReader(), "(s|p)lan|h.sh")
    scanned = multiterm.SCAN_STATS["scanned_terms"] - before["scanned_terms"]
    total = multiterm.SCAN_STATS["total_terms"] - before["total_terms"]
    assert {vocab[i] for i in ords} >= {"plan", "slan", "hash"}
    assert scanned < total / 3, (scanned, total)
