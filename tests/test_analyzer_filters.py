"""Analyzer extension surface (SURVEY.md §2.2 stemmers/StopFilter, §2.11
analysis-factory SPI): filter registry correctness, vocab-wise application
== token-wise reference, spec-dependent lineage, query-time analysis."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.analysis.filters import build_filter_chain
from lucene_solr_ray.analysis.porter import porter_stem
from lucene_solr_ray.analysis.tokenizer import StandardTokenizer
from lucene_solr_ray.stages.analyzer import (
    AnalyzerStage,
    _analyze_rows_regex,
    analyze_table,
    apply_token_filters,
)


def test_porter_golden():
    golden = {
        "caresses": "caress", "ponies": "poni", "motoring": "motor",
        "hopping": "hop", "relational": "relat", "conditional": "condit",
        "digitizer": "digit", "operator": "oper", "replacement": "replac",
        "triplicate": "triplic", "electriciti": "electr", "rate": "rate",
        "controll": "control", "roll": "roll", "agreed": "agre",
    }
    for w, e in golden.items():
        assert porter_stem(w) == e, (w, porter_stem(w), e)


def test_filter_chain_vocab_equals_tokenwise():
    """apply_token_filters (vocab-wise, memoized) must equal applying the
    chain token-by-token then recounting."""
    texts = [
        "the running runner runs quickly over the hills",
        "stopwords and stemming interact in surprising ways",
        "the the the only stopwords here the",
        "",
        "caresses ponies ties caress cats",
    ]
    spec_filters = [{"name": "stop", "words": ["the", "and", "in"]}, "porter_stem"]
    chain = build_filter_chain(spec_filters)
    tok = StandardTokenizer()
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
            "text": pa.array(texts),
        }
    )
    base = analyze_table(t, tok, 4)
    out = apply_token_filters(base, chain, {})
    for i, text in enumerate(texts):
        expect = {}
        for raw in tok.tokenize_lower(text):
            m = chain(raw)
            if m is not None:
                expect[m] = expect.get(m, 0) + 1
        got = dict(zip(out["terms"][i].as_py(), out["freqs"][i].as_py()))
        assert got == expect, (i, got, expect)
        assert out["dl"][i].as_py() == sum(expect.values())


def test_filter_chain_positions_equals_tokenwise():
    """Positions-aware apply_token_filters: surviving occurrences keep
    their ORIGINAL token positions (StopFilter enablePositionIncrements=
    true hole semantics), stem-collapsed terms merge + sort positions,
    synonym expansions copy the source positions (posInc-0) — all pinned
    against a per-token Python reference, including fuzz docs."""
    rng = np.random.default_rng(11)
    vocab = ["the", "running", "runs", "cats", "cat", "ties", "quick",
             "and", "hills", "data"]
    texts = [
        "the running runner runs quickly over the hills",
        "the the the only stopwords here the",
        "",
        "caresses ponies ties caress cats",
    ] + [
        " ".join(vocab[int(j)] for j in rng.integers(0, len(vocab), size=int(m)))
        for m in rng.integers(0, 14, size=30)
    ]
    spec_filters = [
        {"name": "stop", "words": ["the", "and"]},
        {"name": "synonym", "groups": [["data", "dataset"]]},
        "porter_stem",
    ]
    chain = build_filter_chain(spec_filters)
    tok = StandardTokenizer()
    t = pa.table({
        "url": [f"u{i}" for i in range(len(texts))],
        "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
        "text": pa.array(texts),
    })
    base = analyze_table(t, tok, 4, want_positions=True)
    out = apply_token_filters(base, chain, {})
    for i, text in enumerate(texts):
        expect: dict = {}
        for p, raw in enumerate(tok.tokenize_lower(text)):
            m = chain(raw)
            outs = [] if m is None else ([m] if isinstance(m, str) else m)
            for term in outs:
                expect.setdefault(term, []).append(p)
        terms = out["terms"][i].as_py()
        freqs = out["freqs"][i].as_py()
        flat = out["positions"][i].as_py()
        got, off = {}, 0
        for term, f in zip(terms, freqs):
            got[term] = flat[off:off + f]
            off += f
        assert off == len(flat), i
        assert got == {k: sorted(v) for k, v in expect.items()}, (i, got, expect)


def test_positions_index_with_filters_phrase_holes(ray_session, tmp_path):
    """End-to-end: a positions index built WITH stop+stem filters gives
    Lucene's hole semantics — an exact phrase does not match across a
    dropped stopword, slop 1 does; stemmed surface forms phrase-match."""
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(3)],
        "warc_ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
        "text": pa.array([
            "ray the data engine",        # hole between ray and data
            "ray data engine adjacent",   # true adjacency
            "running fast today",         # stem merge: running → run
        ]),
        "lang": pa.array(["en"] * 3),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2, store_positions=True,
                analyzer_spec={
                    "tokenizer": "standard_uax29", "max_token_length": 255,
                    "filters": ["lowercase",
                                {"name": "stop", "words": ["the"]},
                                "porter_stem"],
                })
    exact = search(idx, [{"query_id": 0, "kind": "phrase",
                          "terms": ["ray", "data"]}], k=10)
    assert set(exact["url"]) == {"u://001"}
    sloppy = search(idx, [{"query_id": 0, "kind": "phrase",
                           "terms": ["ray", "data"], "slop": 1}], k=10)
    assert set(sloppy["url"]) == {"u://000", "u://001"}
    stemmed = search(idx, [{"query_id": 0, "kind": "phrase",
                            "terms": ["runs", "fast"]}], k=10)
    assert set(stemmed["url"]) == {"u://002"}


def test_stemmed_index_search(ray_session, tmp_path):
    """Build with porter+stop spec: morphological variants match; the spec
    hash invalidates resume; query terms are analyzed."""
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    pages = pa.table(
        {
            "url": [f"u://{i:03d}" for i in range(4)],
            "warc_ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us")),
            "text": pa.array(
                [
                    "the runner was running fast",
                    "she runs daily",
                    "nothing related here at all",
                    "run with the pack",
                ]
            ),
            "lang": pa.array(["en"] * 4),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    spec = {
        "tokenizer": "standard_uax29",
        "max_token_length": 255,
        "filters": ["lowercase", {"name": "stop", "words": ["the", "was", "she", "with", "at"]}, "porter_stem"],
    }
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2, analyzer_spec=spec)

    # query with a surface form: "RUNNING" → lowercase → stem "run"
    res = search(idx, [{"query_id": 0, "kind": "term", "terms": ["RUNNING"]}], k=10)
    assert sorted(res["url"]) == ["u://000", "u://001", "u://003"]
    # stopword-only query → clause dropped → no results
    res2 = search(idx, [{"query_id": 0, "kind": "term", "terms": ["the"]}], k=10)
    assert len(res2) == 0

    # QueryParserBase null-query semantics: an analyzer-emptied MUST
    # clause is PRUNED from the bool tree, not left as a match-nothing
    # clause that kills the whole conjunction
    res3 = search(idx, [{"query_id": 0, "qstr": "+the +RUNNING"}], k=10)
    assert sorted(res3["url"]) == ["u://000", "u://001", "u://003"]
    # ...same when the stopword is the only SHOULD alongside a must
    res4 = search(
        idx,
        [{"query_id": 0, "kind": "bool",
          "must": [{"kind": "term", "terms": ["RUNNING"]}],
          "should": [{"kind": "term", "terms": ["the"]}]}],
        k=10,
    )
    assert sorted(res4["url"]) == ["u://000", "u://001", "u://003"]

    # different spec ⇒ resume must invalidate
    root2 = build_index([p], idx, num_partitions=2)
    assert root2["resumed_partitions"] == []


def test_urp_pre_stages_in_build(ray_session, small_corpus, tmp_path_factory):
    """pre_stages (URP chain analog): a min_token_filter ingest stage drops
    short docs from the index, and changing the chain invalidates resume
    (lineage hash covers the stage spec)."""
    from lucene_solr_ray.pipelines.build import build_index

    base = tmp_path_factory.mktemp("urp")
    idx = str(base / "idx")
    plain = build_index(small_corpus, idx, num_partitions=2, resume=False)
    chain = [{"name": "min_token_filter", "col": "text", "min_tokens": 200}]
    idx2 = str(base / "idx2")
    filtered = build_index(
        small_corpus, idx2, num_partitions=2, resume=False, pre_stages=chain
    )
    assert 0 < filtered["num_docs"] < plain["num_docs"]
    # same chain resumes; different chain must NOT resume
    again = build_index(small_corpus, idx2, num_partitions=2, pre_stages=chain)
    assert again["resumed_partitions"] == [0, 1]
    changed = build_index(
        small_corpus, idx2, num_partitions=2,
        pre_stages=[{"name": "min_token_filter", "col": "text", "min_tokens": 150}],
    )
    assert changed["resumed_partitions"] == []


def test_urp_unknown_stage_raises(ray_session):
    from lucene_solr_ray.stages.urp import build_stage_chain
    import pytest as _pytest

    with _pytest.raises(KeyError, match="unknown pipeline stage"):
        build_stage_chain([{"name": "nope_nothing"}])


def test_synonym_filter_expansion(ray_session, small_corpus, corpus_queries, tmp_path_factory):
    """Index-time synonym expansion (SynonymGraphFilter expand=true
    analog): group members are cross-searchable; expansion terms do not
    inflate dl (posIncr-0 / discountOverlaps semantics)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.state.manifest import read_root_manifest

    # find a real corpus term to alias
    t = pq.read_table(small_corpus[0], columns=["text", "lang"])
    texts = [x for x, l in zip(t["text"].to_pylist(), t["lang"].to_pylist()) if l == "en"]
    word = texts[0].split()[0]
    spec = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", {"name": "synonym", "groups": [[word, "zzalias"]]}],
    }
    base = tmp_path_factory.mktemp("syn")
    idx = str(base / "idx")
    root = build_index(small_corpus, idx, num_partitions=2, analyzer_spec=spec)
    plain = str(base / "plain")
    root_plain = build_index(small_corpus, plain, num_partitions=2)
    # dl (sum_dl) unchanged: expansions don't count toward doc length
    assert root["sum_dl"] == root_plain["sum_dl"]

    r_alias = search(idx, [{"query_id": 0, "kind": "term", "terms": ["zzalias"]}], k=10**6)
    r_word = search(idx, [{"query_id": 0, "kind": "term", "terms": [word]}], k=10**6)
    r_plain = search(plain, [{"query_id": 0, "kind": "term", "terms": [word]}], k=10**6)
    assert set(r_alias["url"]) == set(r_word["url"]) == set(r_plain["url"])
    assert len(r_alias) > 0


def test_shingle_stream_matches_reference():
    """Vectorized shingle_token_stream == per-doc Python reference across
    size/unigram configs, including empty docs and docs shorter than the
    shingle size."""
    from lucene_solr_ray.analysis.shingle import (
        ShingleConfig,
        shingle_token_list,
        shingle_token_stream,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        [vocab[int(rng.integers(0, 12))] for _ in range(int(n))]
        for n in rng.integers(0, 9, size=40)
    ]
    docs[3] = []  # force an empty doc and a 1-token doc
    docs[4] = ["solo"]
    flat = [t for d in docs for t in d]
    doc_ids = np.repeat(
        np.arange(len(docs), dtype=np.int64), [len(d) for d in docs]
    )
    for kwargs in (
        {},
        {"max_shingle": 3},
        {"output_unigrams": False},
        {"min_shingle": 3, "max_shingle": 3, "output_unigrams": False},
    ):
        cfg = ShingleConfig(**kwargs)
        toks, dids, dl = shingle_token_stream(
            pa.array(flat, type=pa.string()), doc_ids, len(docs), cfg
        )
        got = [[] for _ in docs]
        for t, d in zip(toks.to_pylist(), dids):
            got[d].append(t)
        for i, d in enumerate(docs):
            exp, dl_i = shingle_token_list(d, cfg)
            assert sorted(got[i]) == sorted(exp), (i, kwargs, got[i], exp)
            assert dl[i] == dl_i, (i, kwargs)


def test_edge_ngram_filter():
    chain = build_filter_chain([{"name": "edge_ngram", "min_gram": 2, "max_gram": 3}])
    assert chain("search") == ["se", "sea"]
    assert chain("se") == "se"
    assert chain("a") is None  # shorter than min_gram → dropped
    keep = build_filter_chain(
        [{"name": "edge_ngram", "min_gram": 2, "max_gram": 3, "preserve_original": True}]
    )
    assert keep("search") == ["se", "sea", "search"]
    assert keep("a") == "a"


def test_shingled_index_search(ray_session, tmp_path):
    """Shingle spec end-to-end: adjacent-pair term matches, reversed pair
    doesn't; sum_dl equals the plain build (posIncr-0 overlay); with
    output_unigrams=False single words are not indexed."""
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    pages = pa.table(
        {
            "url": [f"u://{i:03d}" for i in range(4)],
            "warc_ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us")),
            "text": pa.array(
                [
                    "the quick brown fox",
                    "brown quick jumps",
                    "quick brown again and quick brown",
                    "nothing here",
                ]
            ),
            "lang": pa.array(["en"] * 4),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    spec = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", {"name": "shingle", "min_shingle": 2, "max_shingle": 2}],
    }
    idx = str(tmp_path / "idx")
    root = build_index([p], idx, num_partitions=2, analyzer_spec=spec)
    plain = build_index([p], str(tmp_path / "plain"), num_partitions=2)
    assert root["sum_dl"] == plain["sum_dl"]

    hits = search(idx, [{"query_id": 0, "kind": "term", "terms": ["quick brown"]}], k=100)
    assert sorted(hits["url"]) == ["u://000", "u://002"]
    rev = search(idx, [{"query_id": 0, "kind": "term", "terms": ["brown quick"]}], k=100)
    assert sorted(rev["url"]) == ["u://001"]
    uni = search(idx, [{"query_id": 0, "kind": "term", "terms": ["quick"]}], k=100)
    assert len(uni) == 3  # unigrams still indexed (output_unigrams=True)

    spec_no_uni = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", {"name": "shingle", "min_shingle": 2,
                                  "max_shingle": 2, "output_unigrams": False}],
    }
    idx2 = str(tmp_path / "idx2")
    root2 = build_index([p], idx2, num_partitions=2, analyzer_spec=spec_no_uni)
    assert root2["sum_dl"] == root["sum_dl"] - 4  # T-1 positions per doc
    assert len(search(idx2, [{"query_id": 0, "kind": "term", "terms": ["quick"]}], k=100)) == 0
    assert len(search(idx2, [{"query_id": 0, "kind": "term", "terms": ["quick brown"]}], k=100)) == 2


def test_edge_ngram_index_search(ray_session, tmp_path):
    """edge_ngram spec: prefix-term lookup matches; dl unchanged (grams
    overlay at the token's position)."""
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    pages = pa.table(
        {
            "url": ["u://000", "u://001"],
            "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
            "text": pa.array(["searching searches", "unrelated words"]),
            "lang": pa.array(["en"] * 2),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    spec = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", {"name": "edge_ngram", "min_gram": 3,
                                  "max_gram": 5, "preserve_original": True}],
    }
    idx = str(tmp_path / "idx")
    root = build_index([p], idx, num_partitions=1, analyzer_spec=spec)
    plain = build_index([p], str(tmp_path / "plain"), num_partitions=1)
    assert root["sum_dl"] == plain["sum_dl"]
    hits = search(idx, [{"query_id": 0, "kind": "term", "terms": ["sear"]}], k=10)
    assert sorted(hits["url"]) == ["u://000"]


def test_snowball_porter2_golden():
    """~90 published Porter2 input/output pairs, including every
    special-case list (exceptions, 1a invariants, gener/commun/arsen R1
    prefixes, li-ending, ogi, short-word e-restore, ll-trim)."""
    from lucene_solr_ray.analysis.snowball import snowball_stem as s

    golden = {
        "caresses": "caress", "ponies": "poni", "ties": "tie", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "dying": "die",
        "lying": "lie", "tying": "tie", "idly": "idl", "gently": "gentl",
        "ugly": "ugli", "early": "earli", "only": "onli", "singly": "singl",
        "news": "news", "innings": "inning", "proceed": "proceed",
        "exceed": "exceed", "succeed": "succeed", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "radically": "radic",
        "differently": "differ", "vilely": "vile",
        "analogously": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formality": "formal",
        "sensitivity": "sensit", "sensibility": "sensibl",
        "triplicate": "triplic", "electricity": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "homologous": "homolog", "communism": "communism",
        "archaeology": "archaeolog", "cry": "cri", "by": "by",
        "say": "say", "fly": "fli", "hesitancy": "hesit",
        "running": "run", "generate": "generat", "skis": "ski",
        "skies": "sky", "dies": "die", "cries": "cri", "saying": "say",
        "controlling": "control", "rolling": "roll", "install": "instal",
        "hoping": "hope", "exceeding": "exceed",
    }
    for w, e in golden.items():
        assert s(w) == e, (w, s(w), e)


def test_word_delimiter_and_ngram_filters():
    from lucene_solr_ray.analysis.filters import FILTER_BUILDERS

    wd = FILTER_BUILDERS["word_delimiter"]({"catenate_all": True})
    assert wd("j2se") == ["j", "2", "se", "j2se"]
    assert wd("o'neil's") == ["o", "neil", "oneil"]  # possessive stripped
    assert wd("wi-fi") == ["wi", "fi", "wifi"]
    assert wd("hello") == "hello"  # single run passes through unchanged
    wd2 = FILTER_BUILDERS["word_delimiter"](
        {"generate_number_parts": False, "catenate_words": True}
    )
    assert wd2("big5dog") == ["big", "dog", "bigdog"]
    wd3 = FILTER_BUILDERS["word_delimiter"]({"split_on_numerics": False})
    assert wd3("j2se") == "j2se"  # alnum run stays whole
    assert wd3("a-b2c") == ["a", "b2c"]

    ng = FILTER_BUILDERS["ngram"]({"min_gram": 2, "max_gram": 3})
    assert ng("abcd") == ["ab", "bc", "cd", "abc", "bcd"]
    assert ng("a") is None
    ngp = FILTER_BUILDERS["ngram"]({"min_gram": 2, "max_gram": 3,
                                    "preserve_original": True})
    assert ngp("a") == "a"
    assert ngp("abcd")[-1] == "abcd"

    keep = FILTER_BUILDERS["keep"]({"words": ["alpha"]})
    assert keep("alpha") == "alpha" and keep("beta") is None


def test_ascii_folding_full_table():
    from lucene_solr_ray.analysis.filters import FILTER_BUILDERS

    full = FILTER_BUILDERS["ascii_folding"]({"full": True})
    head = FILTER_BUILDERS["ascii_folding"]({})
    # head table cases agree
    assert full("café") == head("café") == "cafe"
    assert full("straße") == "strasse"
    # NFKD-only cases the head table misses
    assert full("ḃṁẽ") == "bme"
    assert full("ｆｕｌｌｗｉｄｔｈ") == "fullwidth"
    assert full("ǟǡ") == "aa"
    # non-decomposable non-Latin stays put
    assert full("жархеолог") == "жархеолог"


def test_snowball_protected_and_index(ray_session, tmp_path):
    """snowball_stem spec end-to-end: stemmed index matches stemmed query
    terms; ``protected`` exempts KeywordMarker terms."""
    from lucene_solr_ray.analysis.filters import build_filter_chain
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    ch = build_filter_chain(
        [{"name": "snowball_stem", "protected": ["running"]}]
    )
    assert ch("running") == "running" and ch("jumping") == "jump"

    pages = pa.table(
        {
            "url": ["u://000", "u://001"],
            "warc_ts": pa.array([1, 2], type=pa.timestamp("us")),
            "text": pa.array(
                ["generously rational hoping", "unrelated words here"]
            ),
            "lang": pa.array(["en"] * 2),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    spec = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", "snowball_stem"],
    }
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=1, analyzer_spec=spec)
    # index-side terms are stems; query analysis applies the same spec
    hits = search(idx, [{"query_id": 0, "kind": "term", "terms": ["ration"]}], k=10)
    assert sorted(hits["url"]) == ["u://000"]


def test_phonetic_soundex():
    """Canonical Soundex vectors (commons-codec SoundexTest goldens used by
    lucene-analysis-phonetic, branch_8x) + the h/w transparency rule."""
    from lucene_solr_ray.analysis.filters import build_filter_chain

    chain = build_filter_chain([{"name": "phonetic", "encoder": "soundex"}])
    golden = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "jackson": "J250", "washington": "W252",
        "lee": "L000", "gutierrez": "G362",
    }
    for word, code in golden.items():
        assert chain(word) == code, (word, chain(word), code)
    # query-time chain parity: the same spec at build and query time maps
    # 'Robert' and 'Rupert' to the same indexed token
    assert chain("robert") == chain("rupert")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="phonetic encoder"):
        build_filter_chain([{"name": "phonetic", "encoder": "beider_morse"}])


def test_phonetic_metaphone():
    """Metaphone vectors (Philips 1990 algorithm, commons-codec rule set /
    maxCodeLen=4 — the lucene-analysis-phonetic default), incl. the
    documented quirks: initial KN/GN/WR/AE/WH/X rewrites, SCH→K, silent
    -MB / -GH / TCH, TH→0, X→KS, duplicate-collapse except C."""
    from lucene_solr_ray.analysis.filters import build_filter_chain
    from lucene_solr_ray.analysis.phonetic import metaphone

    golden = {
        # the commons-codec doc sentence, word by word
        "the": "0", "quick": "KK", "brown": "BRN", "fox": "FKS",
        "jumped": "JMPT", "over": "OFR", "lazy": "LS", "dogs": "TKS",
        # initial-pair exceptions
        "knight": "NT",      # KN- → N, silent GH before consonant
        "gnome": "NM",       # GN- → N
        "wrack": "RK",       # WR- → R
        "aeon": "EN",        # AE- → E
        "white": "WT",       # WH- → W
        "xylophone": "SLFN", # X- → S, PH → F
        # digraphs / silent letters (each hand-traced through the rules)
        "school": "SKL",     # SCH → K, duplicate O collapses
        "science": "SNS",    # SC + front vowel: C silent
        "dumb": "TM",        # terminal -MB: B silent
        "dodge": "TJ",       # DGE → J (consumes the GE)
        "watch": "WX",       # T silent in -TCH, CH → X
        "thomas": "0MS",     # TH → 0, H consumed
        "phish": "FX",       # PH → F, SH → X
        "cough": "K",        # terminal -GH fully silent
        "mississippi": "MSSP",  # duplicate S/P collapse, 4-char cap
    }
    for word, code in golden.items():
        assert metaphone(word) == code, (word, metaphone(word), code)

    # filter wiring: replace vs inject
    chain = build_filter_chain([{"name": "phonetic", "encoder": "metaphone"}])
    assert chain("knight") == chain("night") == "NT"
    inj = build_filter_chain(
        [{"name": "phonetic", "encoder": "metaphone", "inject": True}]
    )
    assert inj("knight") == ["knight", "NT"]
    # numerics pass through untouched (and inject emits no duplicate)
    assert metaphone("12345") == "12345"
    assert inj("12345") == "12345"
    # max_code_len is honored
    assert len(metaphone("abcdefghijklmnop", 4)) <= 4
    assert metaphone("xylophone", 2) == "SL"


def test_phonetic_refined_soundex():
    """RefinedSoundex vectors (commons-codec US-English mapping): first
    letter + per-letter digits, adjacent duplicates collapsed, no cap."""
    from lucene_solr_ray.analysis.phonetic import refined_soundex

    golden = {
        "testing": "T6036084", "the": "T60", "quick": "Q503",
        "brown": "B1908", "fox": "F205", "jumped": "J408106",
        "over": "O0209", "lazy": "L7050", "dogs": "D6043",
    }
    for word, code in golden.items():
        assert refined_soundex(word) == code, (word, refined_soundex(word), code)
    assert refined_soundex("42") == "42"


def test_phonetic_index_search(ray_session, tmp_path):
    """Phonetic index end-to-end: misspelled surface forms match via shared
    Soundex codes ('Rupert' finds the Robert doc)."""
    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    pages = pa.table(
        {
            "url": ["u://0", "u://1", "u://2"],
            "warc_ts": pa.array([1, 2, 3], type=pa.timestamp("us")),
            "text": pa.array(
                [
                    "robert met pfister",
                    "washington jackson",
                    "completely unrelated words",
                ]
            ),
            "lang": pa.array(["en"] * 3),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    spec = {
        "tokenizer": "standard_uax29",
        "max_token_length": 255,
        "filters": ["lowercase", {"name": "phonetic", "encoder": "soundex"}],
    }
    idx = str(tmp_path / "idx_ph")
    build_index([p], idx, num_partitions=2, analyzer_spec=spec)
    res = search(idx, [{"query_id": 0, "kind": "term", "terms": ["Rupert"]}], k=10)
    assert list(res["url"]) == ["u://0"]
    res2 = search(idx, [{"query_id": 0, "kind": "term", "terms": ["Pfyster"]}], k=10)
    assert list(res2["url"]) == ["u://0"]
    res3 = search(idx, [{"query_id": 0, "kind": "term", "terms": ["zzz"]}], k=10)
    assert len(res3) == 0


def test_german_snowball_goldens():
    """Hand-verified vectors of the published Snowball german algorithm
    (snowballstem.org) — regions (incl. the R1 >= 3 adjustment), all
    three steps, the niss rule, u-between-vowels marking, umlaut strip."""
    from lucene_solr_ray.analysis.german import german_stem

    cases = {
        "häuser": "haus",
        "haus": "haus",
        "katzen": "katz",
        "laufen": "lauf",
        "läuft": "lauft",
        "aufhören": "aufhor",
        "mädchen": "madch",
        "schönheit": "schonheit",
        "größe": "gross",
        "bedürfnisse": "bedurfnis",   # (b) deletion then niss → nis
        "abenteuer": "abenteu",
        "zulässig": "zulass",         # ig in R2
        "wichtig": "wichtig",         # ig NOT in R2 → kept
        "verfahren": "verfahr",
        "aufeinander": "aufeinand",
        "bauen": "bau",               # u between vowels marked consonant
        "zzhäuser": "zzhaus",
        "zzkatzen": "zzkatz",
        "zzlaufen": "zzlauf",
        "zzschönheit": "zzschonheit",
        "zzmädchen": "zzmadch",
    }
    for w, exp in cases.items():
        assert german_stem(w) == exp, (w, german_stem(w), exp)


def test_snowball_language_registry():
    from lucene_solr_ray.analysis.filters import build_filter_chain

    de = build_filter_chain([{"name": "snowball_stem", "language": "german"}])
    assert de("katzen") == "katz"
    en = build_filter_chain(["snowball_stem"])
    assert en("running") == "run"
    import pytest as _pytest

    with _pytest.raises(KeyError, match="snowball language"):
        build_filter_chain([{"name": "snowball_stem", "language": "klingon"}])


def test_icu_folding_filter():
    from lucene_solr_ray.analysis.filters import build_filter_chain

    fold = build_filter_chain(["icu_folding"])
    assert fold("Müller") == "muller"
    assert fold("CAFÉ") == "cafe"
    assert fold("straße") == "strasse"
    assert fold("ǅungla") == "dzungla"   # titlecase digraph: NFKD+casefold
    # non-Latin scripts survive (normalized + case-folded), not dropped
    assert fold("ΣΟΦΙΑ") == "σοφια"
    assert fold("plain") == "plain"


def test_analyze_debug_entry_point():
    """analyze() (FieldAnalysisRequestHandler / analyze() evaluator
    analog): ordered token output through full specs."""
    from lucene_solr_ray.stages.analyzer import analyze

    assert analyze("Hello World FOO") == ["hello", "world", "foo"]
    spec = {
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", {"name": "stop", "words": ["the"]}, "porter_stem"],
    }
    assert analyze("the Running runner", spec) == ["run", "runner"]
    de = {"filters": ["lowercase", {"name": "snowball_stem", "language": "german"},
                      "icu_folding"]}
    assert analyze("Häuser und Katzen", de) == ["haus", "und", "katz"]
    sh = {"filters": ["lowercase", {"name": "shingle", "min_shingle": 2,
                                    "max_shingle": 2}]}
    assert analyze("a b c", sh) == ["a", "b", "c", "a b", "b c"]
    assert analyze("", spec) == []


def test_swedish_snowball_goldens():
    """Hand-verified vectors of the published Snowball swedish algorithm:
    step-1 a-suffixes + s-ending rule, step-2 doubled-consonant trim,
    step-3 lig/ig/els + fullt/löst replacements, R1 >= 3."""
    from lucene_solr_ray.analysis.swedish import swedish_stem

    cases = {
        "jakten": "jakt",
        "klockor": "klock",
        "klockornas": "klock",
        "vackraste": "vackr",
        "stämningsfullt": "stämningsfull",
        "möjligt": "möj",            # gt trim then lig delete
        "hästen": "häst",
        "flickorna": "flick",
        "dagarnas": "dag",
        "huset": "huset",            # "et" not a suffix; unchanged
        "husets": "huset",           # s after valid t
        "verkligheten": "verk",      # heten delete then lig delete
        "nn": "nn",                  # too short for R1
        # setlimit semantics: the among only sees suffixes STARTING in R1,
        # so an out-of-R1 longer match must not shadow the in-R1 one
        "handen": "hand",            # "anden" starts before R1; "en" wins
        "stranden": "strand",        # same
        "bens": "ben",               # "ens" starts before R1; s-rule wins
    }
    for w, exp in cases.items():
        assert swedish_stem(w) == exp, (w, swedish_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    sv = build_filter_chain([{"name": "snowball_stem", "language": "sv"}])
    assert sv("klockor") == "klock"


def test_french_snowball_goldens():
    """Hand-traced vectors of the published Snowball french algorithm:
    prelude marking (U/I/Y), RV exceptions (par/col/tap, two-vowel),
    step-1 groups incl. the amment/emment/ment fail-through into the verb
    steps, 2a's non-vowel-in-RV condition, residual step 4, undouble and
    un-accent. Documented deviation: Snowball-2.0 ë→He/ï→Hi not applied."""
    from lucene_solr_ray.analysis.french import french_stem

    cases = {
        "mangeaient": "mang",          # prelude I mark + 2b a-group + e
        "continuelle": "continuel",    # step 4 e + undouble ell
        "adoration": "ador",           # step 1 ation in R2
        "voudriez": "voudr",           # 2b e-group iez
        "jouissance": "jouiss",        # prelude U; step 1 ance
        "simplement": "simpl",         # ement in RV
        "remerciements": "remerci",
        "vraiment": "vrai",            # ment fail-through, 2a/2b fail, step 4
        "finissait": "fin",            # 2a issait after non-vowel
        "chevaux": "cheval",           # aux → al in R1
        "beaux": "beau",               # eaux → eau
        "vendeuse": "vendeux",         # euse: R2 fails, R1 → eux
        "abondamment": "abond",        # amment → ant, then 2b deletes ant
        "majestueusement": "majestu",  # ement then eus in R2
        "nationale": "national",
        "propositions": "proposit",    # 2b ions in R2
        "payer": "pai",                # prelude Y; 2b er; step 3 Y → i
        "barils": "baril",             # step 4 s after l
    }
    for w, exp in cases.items():
        assert french_stem(w) == exp, (w, french_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    fr = build_filter_chain([{"name": "snowball_stem", "language": "french"}])
    assert fr("adoration") == "ador"

    # contract plants (ft_french_stem_stats) pin these exact stems
    from lucene_solr_ray.pipelines.entry_queries import FRENCH_PLANT

    for surface, stem in FRENCH_PLANT:
        assert french_stem(surface.lower()) == stem, (surface, stem)


def test_spanish_snowball_goldens():
    """Hand-traced vectors of the published Snowball spanish algorithm:
    step-0 attached pronouns (incl. the iéndo unaccent), step-1 d-suffix
    groups, 2a y-verbs after u, 2b verb pool with the gu-u rule, residual
    step 3, final de-accenting."""
    from lucene_solr_ray.analysis.spanish import spanish_stem

    cases = {
        "canciones": "cancion",        # 2b es
        "atrevida": "atrev",           # 2b ida
        "torturadora": "tortur",       # step 1 adora in R2
        "haciéndola": "hac",           # step 0 pronoun + unaccent + 2b iendo
        "distinguen": "disting",       # 2b en + gu-u drop
        "distinguir": "distingu",      # 2b ir (no gu rule in delete group)
        "lógica": "logic",             # step 3 a + de-accent
        "nacionalidad": "nacional",    # step 1 idad in R2
        "rápidamente": "rapid",        # amente in R1
        "trabajando": "trabaj",        # 2b ando
        "construyeron": "constru",     # 2a yeron after u, in RV
    }
    for w, exp in cases.items():
        assert spanish_stem(w) == exp, (w, spanish_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    es = build_filter_chain([{"name": "snowball_stem", "language": "es"}])
    assert es("canciones") == "cancion"

    from lucene_solr_ray.pipelines.entry_queries import SPANISH_PLANT

    for surface, stem in SPANISH_PLANT:
        assert spanish_stem(surface.lower()) == stem, (surface, stem)


def test_portuguese_snowball_goldens():
    """Hand-traced vectors of the published Snowball portuguese
    algorithm: the ã→a~/õ→o~ prelude (tilde = consonant), step-1 groups
    (aça~o/uça~o/ência/amente/mente/idade/ira), the verb pool in RV,
    c-preceded i (step 3) vs residual vowel (step 4) gating, and the
    always-on step 5 (final e + gu/ci undouble, ç→c). Portuguese keeps
    acute/circumflex accents — only the nasal tildes round-trip."""
    from lucene_solr_ray.analysis.portuguese import portuguese_stem

    cases = {
        "quilométricas": "quilométr",  # step 1 icas in R2 (accent kept)
        "bobagem": "bobag",            # step 2 em
        "corações": "coraçõ",          # step-1 aço~es fails R2 → step 2 es
        "coração": "coraçã",           # nothing matches → step 4 o
        "felizmente": "feliz",         # mente in R2
        "grandes": "grand",            # step 2 es
        "aprendizado": "aprendiz",     # step 2 ado
        "cantarão": "cant",            # step 2 ara~o (prelude form)
        "proposta": "propost",         # step 4 a
        "lealdade": "lealdad",         # step 5 final e
        "felicidade": "felic",         # step 1 idade in R2
        "chegue": "cheg",              # step 5 e + gu undouble
        "meninas": "menin",            # step 2 as
        "maçã": "maçã",                # prelude round-trips untouched
        "comunicação": "comunic",      # step 1 aça~o in R2
        "rapidamente": "rapid",        # amente in R1
        "falaríamos": "fal",           # step 2 aríamos
        "pensamento": "pensament",     # amento fails R2 → step 4 o
        "bandeira": "bandeir",         # step 1 ira → ir after e, in RV
        "agência": "agênc",            # ência fails R2 → step 2 ia
        "biologia": "biolog",          # logia fails R2 → step 2 ia
        "abraço": "abrac",             # step 4 o then step 5 ç→c
        "introdução": "introdu",       # step 1 uça~o → u in R2
        "experiência": "experient",    # step 1 ência → ente, step 5 e
        "comportamento": "comport",    # step 1 amento in R2
        "delicia": "delic",            # step 2 ia then step 3 c-preceded i
        "livros": "livr",              # step 4 os
    }
    for w, exp in cases.items():
        assert portuguese_stem(w) == exp, (w, portuguese_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    pt = build_filter_chain([{"name": "snowball_stem", "language": "pt"}])
    assert pt("comunicação") == "comunic"

    from lucene_solr_ray.pipelines.entry_queries import PORTUGUESE_PLANT

    for surface, stem in PORTUGUESE_PLANT:
        assert portuguese_stem(surface.lower()) == stem, (surface, stem)


def test_italian_snowball_goldens():
    """Hand-traced vectors of the published Snowball italian algorithm:
    acute→grave + U/I prelude marks, step-0 attached pronouns (ando/endo
    delete vs ar/er/ir→e), step-1 groups (azione+ic, logia, uzione, enza
    →ente, amento-in-RV, amente-in-R1, ità, ivo), the verb pool in RV,
    step 3a's vowel + preceding-i double delete, and 3b's ch/gh→c/g."""
    from lucene_solr_ray.analysis.italian import italian_stem

    cases = {
        "abbandonata": "abbandon",     # step 2 ata
        "pronunciamento": "pronunc",   # amento in RV + 3a i
        "cioccolata": "cioccol",       # step 2 ata
        "nazionale": "nazional",       # 3a final e
        "nazione": "nazion",           # azione fails R2 → 3a e
        "organizzazione": "organizz",  # azione in R2
        "rapidamente": "rapid",        # amente in R1
        "felicità": "felic",           # ità in R2
        "guardando": "guard",          # step 2 ando
        "questione": "question",       # qU prelude mark round-trips
        "arrivederci": "arrived",      # step 0 ci after er → e, step 2 ere
        "mangiandolo": "mang",         # step 0 lo after ando, step 2 ando
        "bellezza": "bellezz",         # nothing matches but 3a a
        "pagherebbero": "pag",         # step 2 erebbero + 3b gh→g
        "amici": "amic",               # ici fails R2 → 3a i
        "psicologia": "psicolog",      # logia fails R2 → 3a a then i
        "distribuzione": "distribu",   # uzione → u in R2 (u survives 3a)
        "differenza": "different",     # enza → ente in R2, 3a e
    }
    for w, exp in cases.items():
        assert italian_stem(w) == exp, (w, italian_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    it = build_filter_chain([{"name": "snowball_stem", "language": "it"}])
    assert it("organizzazione") == "organizz"

    from lucene_solr_ray.pipelines.entry_queries import ITALIAN_PLANT

    for surface, stem in ITALIAN_PLANT:
        assert italian_stem(surface.lower()) == stem, (surface, stem)


def test_russian_snowball_goldens():
    """Hand-traced vectors of the published Snowball russian algorithm:
    ё→е folding, the RV setlimit (a suffix extending before RV cannot
    match), among semantics (longest in-RV match, then the а/я
    condition, no backtracking — so пила's verb 'ла' fails on и and the
    noun 'а' wins), reflexive + conditioned-verb chains, derivational
    ост/ость wholly in R2, superlative ейш + нн undoubling."""
    from lucene_solr_ray.analysis.russian import russian_stem

    cases = {
        "книгами": "книг",            # noun ами
        "красивый": "красив",         # adjective ый, no participle
        "читавшие": "чита",           # adjective ие + participle вш после а
        "читать": "чита",             # verb ть после а
        "читается": "чита",           # reflexive ся + verb ет после а
        "книга": "книг",              # noun а
        "новейший": "нов",            # adjective ий + step-4 superlative ейш
        "остановившись": "останов",   # perfective gerund ившись (group 2)
        "женщинами": "женщин",        # noun ами
        "важность": "важност",        # noun ь; ост NOT in R2
        "активность": "активн",       # noun ь; ост in R2
        "странный": "стран",          # adjective ый + нн→н
        "ёлка": "елк",                # ё fold + noun а
        "жизнью": "жизн",             # noun ью
        "быстрая": "быстр",           # adjective ая
        "пила": "пил",                # verb ла fails (и before) → noun а
    }
    for w, exp in cases.items():
        assert russian_stem(w) == exp, (w, russian_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    ru = build_filter_chain([{"name": "snowball_stem", "language": "ru"}])
    assert ru("книгами") == "книг"

    from lucene_solr_ray.pipelines.entry_queries import RUSSIAN_PLANT

    for surface, stem in RUSSIAN_PLANT:
        assert russian_stem(surface.lower()) == stem, (surface, stem)


def test_arabic_persian_filters():
    """ArabicNormalizationFilter / ArabicStemFilter (light10) /
    PersianNormalizationFilter analogs: harakat + tatweel stripping,
    alef/yeh/teh-marbuta folding, one-prefix + iterated-suffix stemming
    with the published length gates, and the Farsi letterform folds."""
    from lucene_solr_ray.analysis.arabic import (
        arabic_normalize, arabic_stem, persian_normalize,
    )

    # normalization: diacritics stripped, hamza'd alef folded
    assert arabic_normalize("الْكِتَابُ") == "الكتاب"
    assert arabic_normalize("أحمد") == "احمد"
    assert arabic_normalize("آمن") == "امن"
    assert arabic_normalize("مكتبة") == "مكتبه"     # teh marbuta → heh
    assert arabic_normalize("مستشفى") == "مستشفي"   # dotless yeh → yeh
    assert arabic_normalize("كتــــاب") == "كتاب"    # tatweel removed

    # stemming: one prefix, iterated suffixes, length gates
    assert arabic_stem("الكتاب") == "كتاب"          # ال prefix
    assert arabic_stem("والكتاب") == "كتاب"         # وال prefix
    assert arabic_stem("كتابها") == "كتاب"          # ها suffix
    assert arabic_stem("مكتبات") == "مكتب"          # ات suffix
    assert arabic_stem("وعد") == "وعد"              # و gate: len<4 keeps
    assert arabic_stem("وكتب") == "كتب"             # و strips at len≥4
    assert arabic_stem("بلد") == "بلد"              # nothing to strip
    # normalization feeds the stemmer (the Lucene chain order)
    assert arabic_stem(arabic_normalize("مكتبة")) == "مكتب"

    # persian letterform folds
    assert persian_normalize("کتاب") == "كتاب"      # keheh → kaf
    assert persian_normalize("می‌خواهم") == "ميخواهم"  # farsi yeh + ZWNJ

    from lucene_solr_ray.analysis.filters import build_filter_chain

    ar = build_filter_chain(["arabic_normalization", "arabic_stem"])
    assert ar("الْكِتَابُ") == "كتاب"
    fa = build_filter_chain(["persian_normalization"])
    assert fa("کتاب") == "كتاب"


def test_dutch_snowball_goldens():
    """Hand-traced vectors of the published Snowball dutch algorithm:
    the ≥3-letter R1 floor (R2 unadjusted), valid en-/s-ending tests,
    kk/dd/tt undoubling, heden→heid, the step-2 e flag gating 3b's bar,
    lijk's step-2 rerun, end/ing's ig follow-up, and step 4's
    consonant-VV-consonant vowel undoubling."""
    from lucene_solr_ray.analysis.dutch import dutch_stem

    cases = {
        "lichamelijk": "licham",        # lijk in R2 + step-2 rerun
        "lichamelijkheden": "licham",   # heden→heid, heid, lijk, e
        "bomen": "bom",                 # en after non-vowel
        "katten": "kat",                # en + tt undouble
        "lopen": "lop",
        "straten": "strat",
        "muren": "mur",
        "boten": "bot",
        "boot": "bot",                  # step 4 oo undouble
        "openbaar": "open",             # baar in R2
        "openbaarheid": "open",         # heid then baar
        "openbare": "open",             # step-2 e then bar (flag gated)
        "vrijwillig": "vrijwill",       # ig in R2
        "opleiding": "opleid",          # ing in R2, no ig follow-up
        "verdediging": "verded",        # ing then ig follow-up
        "betalen": "betal",
        "mogelijkheden": "mogelijk",    # lijk NOT in R2 here
        "apen": "apen",                 # R1 floor blocks en
        "gemakkelijk": "gemak",         # lijk + e + kk undouble
    }
    for w, exp in cases.items():
        assert dutch_stem(w) == exp, (w, dutch_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    nl = build_filter_chain([{"name": "snowball_stem", "language": "nl"}])
    assert nl("lichamelijkheden") == "licham"

    from lucene_solr_ray.pipelines.entry_queries import DUTCH_PLANT

    for surface, stem in DUTCH_PLANT:
        assert dutch_stem(surface.lower()) == stem, (surface, stem)


def test_norwegian_danish_snowball_goldens():
    """Hand-traced vectors of the published Snowball norwegian + danish
    algorithms: the shared R1 ≥3 floor, Norwegian's k-after-non-vowel
    s-ending and erte/ert→er, Danish's igst→st + step-2 rerun and
    any-double-consonant undouble."""
    from lucene_solr_ray.analysis.norwegian import danish_stem, norwegian_stem

    no_cases = {
        "bilene": "bil", "bilen": "bil", "huset": "hus",
        "kvinnene": "kvinn", "viktig": "vikt",
        "vakkert": "vakker",       # erte/ert → er
        "hemmelig": "hemm",        # step 3 elig
        "mulighetene": "mul",      # hetene then ig
        "hans": "han",             # s after valid n
        "huskes": "husk",          # es (group a beats bare s)
        "sendt": "send",           # step 2 dt
    }
    for w, exp in no_cases.items():
        assert norwegian_stem(w) == exp, (w, norwegian_stem(w), exp)

    da_cases = {
        "bilerne": "bil", "huset": "hus", "dagens": "dag",
        "venligst": "ven",         # igst → st, then lig
        "hellige": "hel",          # e then lig
        "trygt": "tryg",           # step 2 gt
        "kattens": "kat",          # ens then tt undouble
        "forløst": "forløs",       # løst → løs in R1
    }
    for w, exp in da_cases.items():
        assert danish_stem(w) == exp, (w, danish_stem(w), exp)

    from lucene_solr_ray.analysis.filters import build_filter_chain

    assert build_filter_chain([{"name": "snowball_stem", "language": "no"}])("bilene") == "bil"
    assert build_filter_chain([{"name": "snowball_stem", "language": "da"}])("bilerne") == "bil"

    from lucene_solr_ray.pipelines.entry_queries import DANISH_PLANT, NORWEGIAN_PLANT

    for surface, stem in NORWEGIAN_PLANT:
        assert norwegian_stem(surface.lower()) == stem, (surface, stem)
    for surface, stem in DANISH_PLANT:
        assert danish_stem(surface.lower()) == stem, (surface, stem)


def test_icu_normalizer_nfkc_cf():
    """ICUNormalizer2Filter (nfkc_cf): compatibility normalization + case
    fold, diacritics KEPT (unlike icu_folding)."""
    from lucene_solr_ray.analysis.filters import build_filter_chain

    f = build_filter_chain(["icu_normalizer"])
    assert f("ＡＢＣ") == "abc"          # fullwidth -> latin, folded
    assert f("ﬁnale") == "finale"        # ligature decomposed
    assert f("İstanbul") == "i̇stanbul"   # dotted capital I -> i + dot above
    assert f("Σίσυφος") == "σίσυφοσ"     # case FOLD maps final sigma ς -> σ
    assert f("café") == "café"           # diacritics preserved
    assert f("Straße") == "strasse"      # casefold expansion, recomposed
    assert f("soft­hyphen") == "softhyphen"  # default ignorable removed
    assert f("plain") == "plain"


def test_cjk_width_chain():
    from lucene_solr_ray.analysis.filters import build_filter_chain

    f = build_filter_chain(["cjk_width"])
    assert f("ｔｏｋｙｏ") == "tokyo"
    assert f("ﾄｳｷｮｳ") == "トウキョウ"
    assert f("ﾊﾞｲｸ") == "バイク"
    # width fold then bigram is the CJKAnalyzer chain shape; at the
    # vocabulary level the bigram entry is identity (sequence filter)
    g = build_filter_chain(["cjk_width", "cjk_bigram"])
    assert g("ﾃｽﾄ") == "テスト"


def test_greek_lowercase_filter():
    """GreekLowerCaseFilter analog goldens (published switch table:
    lowercase + tonos/dialytika strip + final-sigma fold)."""
    from lucene_solr_ray.analysis.filters import build_filter_chain

    f = build_filter_chain(["greek_lowercase"])
    assert f("ΜΆΪΟΣ") == "μαιοσ"          # tonos + dialytika stripped
    assert f("ΟΛΥΜΠΙΑΚΌΣ") == "ολυμπιακοσ"
    assert f("καλός") == "καλοσ"           # final sigma folds
    assert f("ΐΰ") == "ιυ"                # dialytika+tonos combos
    assert f("Athens") == "athens"         # non-Greek: plain lowercase


def test_turkish_lowercase_filter():
    """TurkishLowerCaseFilter analog goldens: İ→i, I→ı, I+combining dot
    above → i (dot consumed)."""
    from lucene_solr_ray.analysis.filters import build_filter_chain

    f = build_filter_chain(["turkish_lowercase"])
    assert f("İSTANBUL") == "istanbul"
    assert f("DİYARBAKIR") == "diyarbakır"
    assert f("I") == "ı"
    assert f("İ") == "i"             # dotted capital I decomposed
    assert f("AĞACI") == "ağacı"
    assert f("LILI") == "lılı"             # plain I is dotless in Turkish


def test_pattern_replace_trim_reverse_filters():
    """PatternReplaceFilter / TrimFilter / ReverseStringFilter analogs:
    behavior is fully parameter-defined (regex replace, strip, reverse);
    empty results drop the token per the builder's zero-length-term
    convention."""
    from lucene_solr_ray.analysis.filters import build_filter_chain

    pr = build_filter_chain([
        {"name": "pattern_replace", "pattern": r"\d+", "replacement": "#"}])
    assert pr("abc123def456") == "abc#def#"
    assert pr("123") == "#"
    first_only = build_filter_chain([
        {"name": "pattern_replace", "pattern": r"\d+", "replacement": "#",
         "all": False}])
    assert first_only("a1b2") == "a#b2"
    drops = build_filter_chain([
        {"name": "pattern_replace", "pattern": r".*", "replacement": ""}])
    assert drops("anything") is None

    tr = build_filter_chain(["trim"])
    assert tr("  spaced  ") == "spaced"
    assert tr("   ") is None

    rev = build_filter_chain(["reverse_string"])
    assert rev("wildcard") == "dracdliw"

    # compose through an analyze() chain end to end
    from lucene_solr_ray.stages.analyzer import analyze

    toks = analyze(
        "Order42 shipped  FAST",
        {"filters": [
            "lowercase",
            {"name": "pattern_replace", "pattern": r"\d+", "replacement": ""},
            "reverse_string",
        ]},
    )
    assert toks == ["redro", "deppihs", "tsaf"]


def test_keyword_repeat_filter():
    """KeywordRepeatFilter(+stemmer+RemoveDuplicates) net effect: token →
    [original, stem] at one position; unchanged-by-stemming tokens emit
    once (the RemoveDuplicates step)."""
    from lucene_solr_ray.analysis.filters import build_filter_chain
    from lucene_solr_ray.stages.analyzer import analyze

    f = build_filter_chain([{"name": "keyword_repeat"}])
    assert f("running") == ["running", "run"]
    assert f("data") == "data"  # stem == original: single emission

    toks = analyze("Running quickly",
                   {"filters": ["lowercase", "keyword_repeat"]})
    assert sorted(toks) == ["quickli", "quickly", "run", "running"]

    g = build_filter_chain([{"name": "keyword_repeat",
                             "stemmer": "german"}])
    assert g("häuser") == ["häuser", "haus"]


def test_common_grams_list_semantics():
    """CommonGramsFilter analog: grams only where either member is common;
    unigrams always kept; dl = unigram count."""
    from lucene_solr_ray.analysis.commongrams import (
        CommonGramsConfig,
        common_grams_token_list,
    )

    cfg = CommonGramsConfig(words=["the", "a"])
    toks, dl = common_grams_token_list(
        ["the", "quick", "fox", "a", "dog"], cfg)
    assert toks == ["the", "quick", "fox", "a", "dog",
                    "the_quick", "fox_a", "a_dog"]
    assert dl == 5
    assert common_grams_token_list([], cfg) == ([], 0)
    assert common_grams_token_list(["x"], cfg) == (["x"], 1)
    assert common_grams_token_list(["x", "y"], cfg) == (["x", "y"], 2)


def test_common_grams_stream_matches_list():
    """Flat-stream kernel == per-doc list reference on random multi-doc
    streams (doc boundaries never glue), incl. docs with no commons."""
    import numpy as np
    import pyarrow as pa
    from collections import Counter
    from lucene_solr_ray.analysis.commongrams import (
        CommonGramsConfig,
        common_grams_token_list,
        common_grams_token_stream,
    )

    rng = np.random.default_rng(3)
    vocab = ["the", "a", "x", "y", "zz"]
    cfg = CommonGramsConfig(words=["the", "a"])
    for trial in range(50):
        docs = [
            [vocab[int(i)] for i in rng.integers(0, 5, size=rng.integers(0, 9))]
            for _ in range(int(rng.integers(1, 6)))
        ]
        flat = [t for d in docs for t in d]
        doc_ids = np.repeat(
            np.arange(len(docs)), [len(d) for d in docs]).astype(np.int64)
        toks, dids, dl = common_grams_token_stream(
            pa.array(flat, type=pa.string()), doc_ids, len(docs), cfg)
        got = Counter(zip(dids.tolist(), toks.to_pylist()))
        want = Counter()
        for i, d in enumerate(docs):
            out, dl_i = common_grams_token_list(d, cfg)
            assert dl[i] == dl_i
            for t in out:
                want[(i, t)] += 1
        assert got == want, (trial, docs)


def test_common_grams_analyzer_spec_exclusive():
    """shingle + common_grams in one spec must refuse (same slot)."""
    import pytest
    from lucene_solr_ray.stages.analyzer import AnalyzerStage, analyze

    spec = {"filters": ["lowercase", "shingle",
                        {"name": "common_grams", "words": ["the"]}]}
    with pytest.raises(ValueError, match="common_grams"):
        AnalyzerStage(4, spec=spec)
    with pytest.raises(ValueError, match="common_grams"):
        analyze("x", spec)
    assert analyze(
        "The fast THE dog",
        {"filters": ["lowercase",
                     {"name": "common_grams", "words": ["the"]}]},
    ) == ["the", "fast", "the", "dog", "the_fast", "fast_the", "the_dog"]
