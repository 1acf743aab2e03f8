"""Classic query-string parser (reference: lucene/queryparser/.../classic/
QueryParser.jj + QueryParserBase.addClause, branch_8x): grammar → tree
structure pins, and end-to-end equivalence of parsed strings vs hand-built
query specs on a real index (parsed queries must be bit-identical to the
trees they denote, P=1 == P=4)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.search.queryparser import QueryParseError, parse_query


def _frame(df):
    return df[["query_id", "rank", "url", "score"]].reset_index(drop=True)


# ---------- pure grammar tests (no Ray) ----------

def test_default_or_and_modifiers():
    assert parse_query("jakarta apache") == {
        "kind": "bool",
        "should": [
            {"kind": "term", "terms": ["jakarta"]},
            {"kind": "term", "terms": ["apache"]},
        ],
    }
    assert parse_query("+a -b c") == {
        "kind": "bool",
        "must": [{"kind": "term", "terms": ["a"]}],
        "must_not": [{"kind": "term", "terms": ["b"]}],
        "should": [{"kind": "term", "terms": ["c"]}],
    }
    # single optional clause simplifies to the bare query (WAND-eligible)
    assert parse_query("solo") == {"kind": "term", "terms": ["solo"]}


def test_addclause_and_or_semantics():
    # Lucene's famously non-algebraic left-to-right resolution:
    # "a AND b OR c" == "+a +b c"
    assert parse_query("a AND b OR c") == parse_query("+a +b c")
    assert parse_query("a && b") == {
        "kind": "bool",
        "must": [
            {"kind": "term", "terms": ["a"]},
            {"kind": "term", "terms": ["b"]},
        ],
    }
    assert parse_query("a || b") == parse_query("a b")
    assert parse_query("a AND NOT b") == {
        "kind": "bool",
        "must": [{"kind": "term", "terms": ["a"]}],
        "must_not": [{"kind": "term", "terms": ["b"]}],
    }
    assert parse_query("NOT a b") == {
        "kind": "bool",
        "must_not": [{"kind": "term", "terms": ["a"]}],
        "should": [{"kind": "term", "terms": ["b"]}],
    }
    assert parse_query("a !b") == parse_query("a -b")


def test_phrase_slop_boost_and_single_word():
    assert parse_query('"ray data"') == {"kind": "phrase", "terms": ["ray", "data"]}
    assert parse_query('"ray data"~2^3') == {
        "kind": "phrase", "terms": ["ray", "data"], "slop": 2, "boost": 3.0,
    }
    # one-word phrase degenerates to a TermQuery (QueryParserBase)
    assert parse_query('"solo"') == {"kind": "term", "terms": ["solo"]}


def test_multiterm_classification():
    assert parse_query("pre*") == {"kind": "prefix", "terms": ["pre"]}
    assert parse_query("w?rd") == {"kind": "wildcard", "terms": ["w?rd"]}
    assert parse_query("wi*rd") == {"kind": "wildcard", "terms": ["wi*rd"]}
    # FuzzyQuery maxEdits: bare ~ = default 2, ~N carried, clamped to 2
    # (QueryParserBase#handleBareFuzzy + FuzzyQuery ctor, branch_8x)
    assert parse_query("roam~") == {"kind": "fuzzy", "terms": ["roam"], "max_edits": 2}
    assert parse_query("roam~1") == {"kind": "fuzzy", "terms": ["roam"], "max_edits": 1}
    assert parse_query("roam~7") == {"kind": "fuzzy", "terms": ["roam"], "max_edits": 2}
    assert parse_query("roam~0") == {"kind": "term", "terms": ["roam"]}
    assert parse_query("/r[ae]y/") == {"kind": "regexp", "terms": ["r[ae]y"]}
    # escaped wildcard is a literal
    assert parse_query(r"li\*eral") == {"kind": "term", "terms": ["li*eral"]}


def test_boost_group_field_and_nesting():
    assert parse_query("term^2.5") == {"kind": "term", "terms": ["term"], "boost": 2.5}
    assert parse_query("(a b)^2") == {
        "kind": "bool",
        "should": [
            {"kind": "term", "terms": ["a"]},
            {"kind": "term", "terms": ["b"]},
        ],
        "boost": 2.0,
    }
    assert parse_query("((a))") == {"kind": "term", "terms": ["a"]}
    assert parse_query("text:foo") == {"kind": "term", "terms": ["foo"]}
    assert parse_query('text:"a b"') == {"kind": "phrase", "terms": ["a", "b"]}
    assert parse_query("a AND (b OR c)") == {
        "kind": "bool",
        "must": [
            {"kind": "term", "terms": ["a"]},
            {
                "kind": "bool",
                "should": [
                    {"kind": "term", "terms": ["b"]},
                    {"kind": "term", "terms": ["c"]},
                ],
            },
        ],
    }


def test_parse_errors():
    for bad in ["", "(a b", "a b)", "^2", "otherfield:foo", 'other:"a b"']:
        with pytest.raises((QueryParseError, ValueError)):
            parse_query(bad)


# ---------- engine equivalence (built index, no positions needed) ----------

def test_parsed_equals_handbuilt(built_indexes, corpus_queries):
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:4]
    a, b, c, d = terms

    def t(x):
        return {"kind": "term", "terms": [x]}

    pairs = [
        (f"{a} {b}", {"kind": "bool", "should": [t(a), t(b)]}),
        (f"+{a} +{b}", {"kind": "bool", "must": [t(a), t(b)]}),
        (f"{a} AND {b}", {"kind": "bool", "must": [t(a), t(b)]}),
        (f"{a} -{b}", {"kind": "bool", "should": [t(a)], "must_not": [t(b)]}),
        (
            f"{a} AND ({b} OR {c}^2) -{d}",
            {
                "kind": "bool",
                "must": [
                    t(a),
                    {"kind": "bool", "should": [t(b), dict(t(c), boost=2.0)]},
                ],
                "must_not": [t(d)],
            },
        ),
    ]
    parsed = [{"query_id": i, **parse_query(s)} for i, (s, _) in enumerate(pairs)]
    manual = [{"query_id": i, **node} for i, (_, node) in enumerate(pairs)]
    for qs in (parsed, manual):
        for q in qs:
            assert q == manual[q["query_id"]] or q == parsed[q["query_id"]]
    rp = search(idx4, parsed, k=10)
    rm = search(idx4, manual, k=10)
    assert _frame(rp).equals(_frame(rm))
    assert len(rp) > 0
    # partition invariance of the parsed path
    rp1 = search(idx1, parsed, k=10)
    assert _frame(rp1).equals(_frame(rp))


def test_qstr_sugar(built_indexes, corpus_queries):
    """{"qstr": ...} query specs parse inside prepare_search_context and
    score identically to pre-parsed trees (Dataset and service paths)."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:3]
    a, b, c = terms
    qs = f"+{a} ({b} OR {c})"
    via_str = search(idx4, [{"query_id": 0, "qstr": qs}], k=10)
    via_tree = search(idx4, [{"query_id": 0, **parse_query(qs)}], k=10)
    assert _frame(via_str).equals(_frame(via_tree))
    from lucene_solr_ray.search.service import SearcherService

    svc = SearcherService(idx4, num_searchers=2)
    via_svc = svc.search([{"query_id": 0, "qstr": qs}], k=10)
    assert _frame(via_svc).equals(_frame(via_str))


def test_parsed_bool_matches_flat_or(built_indexes, corpus_queries):
    """A parsed two-term default-OR query must score bit-identically to the
    flat ``or`` kind (same clause order, same float32 accumulation)."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})[:2]
    a, b = terms
    rp = search(idx4, [{"query_id": 0, **parse_query(f"{a} {b}")}], k=10)
    rf = search(idx4, [{"query_id": 0, "kind": "or", "terms": [a, b]}], k=10)
    assert _frame(rp).equals(_frame(rf))


def test_pattern_subclause_constant_score(built_indexes, corpus_queries):
    """Prefix inside a bool tree scores constant 1.0 per matching doc
    (MultiTermQuery CONSTANT_SCORE_REWRITE), composing with BM25 terms."""
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})
    a = terms[0]
    stem = a[:3]
    parsed = {"query_id": 0, **parse_query(f"+{stem}* {a}")}
    r = search(idx4, [parsed], k=10)
    assert len(r) > 0
    # every doc matching the prefix but not `a` scores exactly 1.0
    only_prefix = search(
        idx4, [{"query_id": 0, "kind": "prefix", "terms": [stem]}], k=10
    )
    assert np.all(only_prefix["score"].to_numpy() == np.float32(1.0))
    r1 = search(idx1, [parsed], k=10)
    assert _frame(r1).equals(_frame(r))


# ---------- phrase sub-clauses (positions index) ----------

@pytest.fixture(scope="module")
def positions_index(ray_session, small_corpus, tmp_path_factory):
    from lucene_solr_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("qp_pos")
    idx = str(base / "p2")
    build_index(small_corpus, idx, num_partitions=2, store_positions=True)
    return idx


def _corpus_bigram(small_corpus):
    from lucene_solr_ray.analysis.tokenizer import tokenize_lower

    rows = pq.read_table(small_corpus[0]).to_pylist()
    for r in rows:
        toks = tokenize_lower(r["text"])
        if len(toks) >= 4:
            return toks[2], toks[3]
    raise AssertionError("no bigram in corpus")


def test_phrase_in_bool_equals_standalone(positions_index, small_corpus):
    w1, w2 = _corpus_bigram(small_corpus)
    standalone = search(
        positions_index,
        [{"query_id": 0, "kind": "phrase", "terms": [w1, w2]}],
        k=10,
    )
    assert len(standalone) > 0
    # parser emits a bare phrase for a single optional clause
    parsed = {"query_id": 0, **parse_query(f'"{w1} {w2}"')}
    assert parsed["kind"] == "phrase"
    # force it THROUGH the bool path and require identical scores
    wrapped = {
        "query_id": 0,
        "kind": "bool",
        "must": [{"kind": "phrase", "terms": [w1, w2]}],
    }
    rw = search(positions_index, [wrapped], k=10)
    assert _frame(rw).equals(_frame(standalone))


def test_parsed_phrase_composition(positions_index, small_corpus):
    """'+"w1 w2" w1' — phrase as MUST plus a SHOULD term: every hit's score
    is the phrase score plus the term contribution (float32 order: must
    clauses accumulate before should)."""
    w1, w2 = _corpus_bigram(small_corpus)
    parsed = {"query_id": 0, **parse_query(f'+"{w1} {w2}" {w1}')}
    r = search(positions_index, [parsed], k=10)
    assert len(r) > 0
    manual = {
        "query_id": 0,
        "kind": "bool",
        "must": [{"kind": "phrase", "terms": [w1, w2]}],
        "should": [{"kind": "term", "terms": [w1]}],
    }
    rm = search(positions_index, [manual], k=10)
    assert _frame(r).equals(_frame(rm))
    # sloppy slop carries through the parser
    sl = {"query_id": 0, **parse_query(f'"{w2} {w1}"~3')}
    assert sl.get("slop") == 3
    rs = search(positions_index, [sl], k=10)
    rs_manual = search(
        positions_index,
        [{"query_id": 0, "kind": "phrase", "terms": [w2, w1], "slop": 3}],
        k=10,
    )
    assert _frame(rs).equals(_frame(rs_manual))


def test_operator_words_as_term_prefixes():
    """Maximal munch: AND/OR/NOT followed by a term character are TERMS
    (Lucene's JavaCC lexer), not operators."""
    assert parse_query("NOT-ready") == {"kind": "term", "terms": ["NOT-ready"]}
    assert parse_query("foo AND-gate") == {
        "kind": "bool",
        "should": [
            {"kind": "term", "terms": ["foo"]},
            {"kind": "term", "terms": ["AND-gate"]},
        ],
    }
    assert parse_query("ORacle") == {"kind": "term", "terms": ["ORacle"]}
    assert parse_query("a AND b") == {
        "kind": "bool",
        "must": [{"kind": "term", "terms": ["a"]},
                 {"kind": "term", "terms": ["b"]}],
    }


def test_term_range_syntax_and_engine(built_indexes, corpus_queries):
    """[a TO b] / {a TO b} / open bounds parse and match the flat union of
    in-range vocab terms (constant score 1.0, P-invariant)."""
    assert parse_query("[aaa TO bbb]") == {
        "kind": "term_range", "lo": "aaa", "hi": "bbb",
        "lo_inc": True, "hi_inc": True,
    }
    assert parse_query("{aaa TO *}") == {
        "kind": "term_range", "lo": "aaa", "hi": None,
        "lo_inc": False, "hi_inc": False,
    }
    idx1, idx4 = built_indexes
    terms = sorted({t for q in corpus_queries for t in q["terms"]})
    lo, hi = terms[0], terms[min(3, len(terms) - 1)]
    q = {"query_id": 0, **parse_query(f"[{lo} TO {hi}]")}
    r4 = search(idx4, [q], k=10**9, method="exhaustive")
    r1 = search(idx1, [q], k=10**9, method="exhaustive")
    assert _frame(r4).equals(_frame(r1)) and len(r4) > 0
    assert np.all(r4["score"].to_numpy() == np.float32(1.0))
    # exclusive bounds shrink (or keep) the match set
    qx = {"query_id": 0, **parse_query(f"{{{lo} TO {hi}}}")}
    rx = search(idx4, [qx], k=10**9, method="exhaustive")
    assert set(rx["url"]) <= set(r4["url"])
