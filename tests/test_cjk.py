"""CJKBigramFilter / CJKWidthFilter analogs (SURVEY.md §2.2): goldens,
stream==list property, analyzer end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.analysis.cjk import (
    CjkBigramConfig,
    cjk_bigram_token_list,
    cjk_bigram_token_stream,
    cjk_width_fold,
    is_cjk_token,
)
from lucene_solr_ray.analysis.tokenizer import StandardTokenizer

CFG = CjkBigramConfig()


def _tok(text):
    return StandardTokenizer().tokenize_lower(text)


def test_bigram_goldens():
    # han singles from the tokenizer -> run bigrams
    toks, dl = cjk_bigram_token_list(_tok("日本語"), CFG)
    assert toks == ["日本", "本語"] and dl == 2
    # katakana arrives as one multi-char token -> bigrams across it
    toks, _ = cjk_bigram_token_list(_tok("アメリカ"), CFG)
    assert toks == ["アメ", "メリ", "リカ"]
    # hangul run
    toks, _ = cjk_bigram_token_list(_tok("한국어"), CFG)
    assert toks == ["한국", "국어"]
    # mixed scripts bridge into ONE buffer (hiragana + han, CJKAnalyzer
    # behavior with all flags on)
    toks, _ = cjk_bigram_token_list(_tok("これは日本"), CFG)
    assert toks == ["これ", "れは", "は日", "日本"]
    # latin interrupts the run; lone CJK char -> unigram
    toks, dl = cjk_bigram_token_list(_tok("i like 寿司 and 茶 too"), CFG)
    assert toks == ["i", "like", "寿司", "and", "茶", "too"] and dl == 6
    # empty / pure-latin pass through
    assert cjk_bigram_token_list([], CFG) == ([], 0)
    assert cjk_bigram_token_list(["abc", "def"], CFG) == (["abc", "def"], 2)


def test_bigram_flags():
    only_han = CjkBigramConfig(hiragana=False, katakana=False, hangul=False)
    toks, _ = cjk_bigram_token_list(_tok("これは日本"), only_han)
    # hiragana chars pass through as single tokens; han pair bigrams
    assert toks == ["こ", "れ", "は", "日本"]
    with pytest.raises(ValueError):
        CjkBigramConfig(han=False, hiragana=False, katakana=False,
                        hangul=False)


def test_output_unigrams_goldens():
    """CJKBigramFilter outputUnigrams=true: unigrams (posInc 1) with
    bigrams overlaid (posInc 0, excluded from dl)."""
    uni = CjkBigramConfig(output_unigrams=True)
    toks, dl = cjk_bigram_token_list(_tok("一二三"), uni)
    assert toks == ["一", "一二", "二", "二三", "三"]
    assert dl == 3
    toks, dl = cjk_bigram_token_list(["ray", "日", "本", "data"], uni)
    assert toks == ["ray", "日", "日本", "本", "data"]
    assert dl == 4  # the overlaid bigram does not count
    toks, dl = cjk_bigram_token_list(["水"], uni)
    assert toks == ["水"] and dl == 1


@pytest.mark.parametrize(
    "cfg", [CFG, CjkBigramConfig(output_unigrams=True)],
    ids=["bigrams", "unigrams+bigrams"])
def test_stream_matches_list_property(cfg):
    CFG = cfg
    rng = np.random.default_rng(7)
    pool = (["hello", "world", "the", "x1"]
            + list("日本語中国字水火") + ["テスト", "カタカナ", "한국", "어절",
                                      "これ", "は"])
    for trial in range(60):
        n_docs = int(rng.integers(1, 6))
        docs = [
            [pool[int(j)] for j in rng.integers(0, len(pool),
                                                int(rng.integers(0, 12)))]
            for _ in range(n_docs)
        ]
        flat = [t for d in docs for t in d]
        doc_ids = np.repeat(
            np.arange(n_docs, dtype=np.int64),
            [len(d) for d in docs])
        out_t, out_d, dl = cjk_bigram_token_stream(
            pa.array(flat, type=pa.string()), doc_ids, n_docs, CFG)
        got = out_t.to_pylist()
        exp_tokens, exp_dl = [], []
        for d in docs:
            t, l = cjk_bigram_token_list(d, CFG)
            exp_tokens.append(t)
            exp_dl.append(l)
        # per-doc token sequences must match exactly
        for i in range(n_docs):
            mask = out_d == i
            assert [got[j] for j in np.nonzero(mask)[0]] == exp_tokens[i], (
                trial, i, docs[i])
        assert dl.tolist() == exp_dl


def test_stream_memo():
    memo = {}
    toks = pa.array(["日", "本", "abc"], type=pa.string())
    ids = np.zeros(3, dtype=np.int64)
    out1, _, _ = cjk_bigram_token_stream(toks, ids, 1, CFG, memo=memo)
    assert memo == {"日": True, "本": True, "abc": False}
    out2, _, _ = cjk_bigram_token_stream(toks, ids, 1, CFG, memo=memo)
    assert out1.to_pylist() == out2.to_pylist() == ["日本", "abc"]


def test_width_fold():
    assert cjk_width_fold("ｔｅｓｔ") == "test"
    assert cjk_width_fold("ﾃｽﾄ") == "テスト"
    # voiced sound mark composes: ﾊ + ﾞ -> バ ; ﾊ + ﾟ -> パ
    assert cjk_width_fold("ﾊﾞｶ") == "バカ"
    assert cjk_width_fold("ﾊﾟﾝ") == "パン"
    # non-width compat chars untouched (that's icu_normalizer's job)
    assert cjk_width_fold("ﬁnd") == "ﬁnd"
    assert cjk_width_fold("plain") == "plain"


def test_is_cjk_token():
    assert is_cjk_token("日", CFG) and is_cjk_token("テスト", CFG)
    assert is_cjk_token("한국", CFG)
    assert not is_cjk_token("abc", CFG)
    assert not is_cjk_token("日a", CFG)
    assert not is_cjk_token("", CFG)


def test_analyze_debug_path():
    from lucene_solr_ray.stages.analyzer import analyze

    spec = {"tokenizer": "standard_uax29", "max_token_length": 255,
            "filters": ["lowercase", "cjk_bigram"]}
    assert analyze("Ray で日本語 Data", spec) == [
        "ray", "で日", "日本", "本語", "data"]


def test_analyze_table_end_to_end(ray_session):
    """Batch path (mixed ASCII + CJK docs) == brute-force list path."""
    from lucene_solr_ray.stages.analyzer import analyze_table

    texts = ["pure ascii doc", "日本語のテキスト", "mixed 寿司 bar",
             "", "한국어 문서 테스트", "茶"]
    table = pa.table({
        "url": [f"u{i}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
    })
    out = analyze_table(table, StandardTokenizer(), 4, cjk=CFG)
    for i, text in enumerate(texts):
        exp, exp_dl = cjk_bigram_token_list(_tok(text), CFG)
        from collections import Counter

        tf = Counter(exp)
        got_terms = out["terms"][i].as_py()
        got_freqs = out["freqs"][i].as_py()
        assert dict(zip(got_terms, got_freqs)) == dict(tf), (i, text)
        assert out["dl"][i].as_py() == exp_dl


def test_cjk_query_expansion(ray_session, tmp_path):
    """search() against a bigram index analyzes CJK query terms into
    bigram conjunctions (the QueryBuilder-through-CJKAnalyzer shape)."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    texts = [
        "this doc mentions 日本語 processing",   # all bigrams adjacent
        "only 日本 here",                        # one bigram only
        "nothing relevant",
        "テスト run テスト run",                  # katakana, tf 2
        "lone char 茶 appears",
    ]
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["xx"] * len(texts)),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2, lang=None, analyzer_spec={
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", "cjk_bigram"],
    })

    # term query on a 3-char word -> AND of its two bigrams
    res = search(idx, [{"query_id": 0, "kind": "term",
                        "terms": ["日本語"]}], k=10)
    assert list(res["url"]) == ["u://000"]
    # prefix of it still matches both docs containing 日本
    res = search(idx, [{"query_id": 0, "kind": "term", "terms": ["日本"]}],
                 k=10)
    assert set(res["url"]) == {"u://000", "u://001"}
    # or-query mixing latin + CJK word
    res = search(idx, [{"query_id": 0, "kind": "or",
                        "terms": ["nothing", "テスト"]}], k=10)
    assert set(res["url"]) == {"u://002", "u://003"}
    # lone char unigram is searchable
    res = search(idx, [{"query_id": 0, "kind": "term", "terms": ["茶"]}],
                 k=10)
    assert list(res["url"]) == ["u://004"]
    # exclusion of a CJK word removes only full-conjunction matches
    res = search(idx, [{"query_id": 0, "kind": "or",
                        "terms": ["doc", "here", "char"],
                        "exclude": ["日本語"]}], k=10)
    assert set(res["url"]) == {"u://001", "u://004"}


def test_multiterm_term_kind_stays_disjunction(ray_session, tmp_path):
    """Review regression: a multi-term 'term' query is a SHOULD
    disjunction — CJK expansion must not collapse it to one AND."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    texts = ["alpha 日本語 beta", "gamma 寿司 delta", "both 日本語 寿司"]
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["xx"] * len(texts)),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2, lang=None, analyzer_spec={
        "tokenizer": "standard_uax29", "max_token_length": 255,
        "filters": ["lowercase", "cjk_bigram"],
    })
    res = search(idx, [{"query_id": 0, "kind": "term",
                        "terms": ["日本語", "寿司"]}], k=10)
    assert set(res["url"]) == {"u://000", "u://001", "u://002"}
    # single-word multi-bigram term query is still the conjunction
    res = search(idx, [{"query_id": 0, "kind": "term",
                        "terms": ["日本語"]}], k=10)
    assert set(res["url"]) == {"u://000", "u://002"}


def test_width_fold_before_bigram(ray_session, tmp_path):
    """Review regression: cjk_width listed BEFORE cjk_bigram must fold the
    token stream before bigramming (CJKAnalyzer order) — halfwidth
    katakana docs must be findable by fullwidth word queries."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search
    from lucene_solr_ray.stages.analyzer import analyze

    spec = {"tokenizer": "standard_uax29", "max_token_length": 255,
            "filters": ["cjk_width", "lowercase", "cjk_bigram"]}
    # debug path: fold first, then bigram
    assert analyze("ﾃｽﾄ run", spec) == ["テス", "スト", "run"]

    texts = ["halfwidth ﾃｽﾄ doc", "fullwidth テスト doc", "neither one"]
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["xx"] * len(texts)),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2, lang=None, analyzer_spec=spec)
    res = search(idx, [{"query_id": 0, "kind": "term",
                        "terms": ["テスト"]}], k=10)
    assert set(res["url"]) == {"u://000", "u://001"}
    # halfwidth query folds too
    res = search(idx, [{"query_id": 0, "kind": "term", "terms": ["ﾃｽﾄ"]}],
                 k=10)
    assert set(res["url"]) == {"u://000", "u://001"}
