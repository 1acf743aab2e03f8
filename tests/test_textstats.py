"""Curation-kernel unit tests (textstats.py): n-gram repetition plus the
brute-force cross-check of the vectorized quality kernels on adversarial
token shapes (empty docs, 1-token docs, all-repeat docs, batch-boundary
neighbors)."""

from collections import Counter

import pyarrow as pa

from lucene_solr_ray.functions.textstats import (
    ngram_repetition_batch,
    quality_score_batch,
)


def _brute_topgram(text: str, order: int) -> int:
    toks = text.split(" ")
    n = len(toks)
    if n < order:
        return 0
    grams = Counter(
        " ".join(toks[i : i + order]) for i in range(n - order + 1)
    )
    return order * max(grams.values()) * 1_000_000 // max(n, 1)


def test_ngram_repetition_matches_bruteforce():
    texts = [
        "a b a b a b",          # top bigram covers all tokens
        "x y z",                # every bigram unique
        "",                     # empty
        "w",                    # shorter than any gram
        "p p p p p",            # degenerate single-token repeat
        "one two one two three one two",
        "a a b a a b a a",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    r = ngram_repetition_batch(t).to_pandas()
    for i, text in enumerate(texts):
        assert r.top_bigram_frac_e6[i] == _brute_topgram(text, 2), text
        assert r.top_trigram_frac_e6[i] == _brute_topgram(text, 3), text


def test_ngram_repetition_batch_isolation():
    # neighbors in the flat token array must not form cross-doc grams
    t = pa.table({"doc_id": [0, 1], "text": ["q q", "q q"]})
    r = ngram_repetition_batch(t).to_pandas()
    # each doc: one bigram "q q" x1 over 2 tokens -> 1.0; if the boundary
    # leaked, doc 0 would see "q q" twice
    assert list(r.top_bigram_frac_e6) == [1_000_000, 1_000_000]
    assert list(r.top_trigram_frac_e6) == [0, 0]


def test_quality_scores_empty_and_single():
    t = pa.table({"doc_id": [0, 1], "text": ["", "word"]})
    r = quality_score_batch(t).to_pandas()
    assert r.repetition_ratio_e6[0] == 0
    assert r.mean_word_len_e6[1] == 4_000_000


def test_url_normalize_rules():
    from lucene_solr_ray.functions.textstats import url_normalize_batch

    cases = {
        "HTTPS://Site1.Example/P/?id=9&utm_source=f&utm_campaign=x#frag":
            "https://site1.example/P/?id=9",
        "https://a.example/p?utm_source=x": "https://a.example/p",
        "http://B.example/q?utm_a=1&id=2&utm_b=3": "http://b.example/q?id=2",
        "https://c.example/": "https://c.example",
        "https://d.example/x/": "https://d.example/x",
        "https://e.example/x?id=1#f": "https://e.example/x?id=1",
        "https://f.example/CaseKept/Path": "https://f.example/CaseKept/Path",
        # scheme-less / malformed crawl URLs pass through the host step
        # untouched instead of failing the whole batch (ArrowInvalid on
        # list_element — the round-3 advice finding); later rules still run
        "Relative/Path/": "Relative/Path",
        "no-scheme.example/x?utm_source=f#frag": "no-scheme.example/x",
        "": "",
    }
    t = pa.table({"url": list(cases)})
    got = url_normalize_batch(t)["url_norm"].to_pylist()
    assert got == list(cases.values())


def test_path_prefix_explode_matches_bruteforce():
    """PathHierarchyTokenizer analog: per-depth RE2 output == pure-Python
    split+cumjoin (empty tokens excluded), incl. leading/double/trailing
    delimiters, empty strings, and delimiter-free rows."""
    import numpy as np
    import pyarrow as pa
    from lucene_solr_ray.functions.textstats import path_prefix_explode

    rng = np.random.default_rng(5)
    segs = ["a", "bb", "ccc", ""]
    paths = []
    for _ in range(300):
        k = int(rng.integers(0, 5))
        p = "/".join(segs[int(i)] for i in rng.integers(0, 4, size=k))
        if rng.integers(0, 2):
            p = "/" + p
        paths.append(p)
    paths += ["", "/", "//", "abc", "a/b/c", "/a/b/c/"]
    t = pa.table({"id": list(range(len(paths))), "p": paths})
    got = [(r["id"], r["path_prefix"], r["depth"])
           for r in path_prefix_explode(t, "p", keep_cols=["id"]).to_pylist()]

    want = []
    for i, p in enumerate(paths):
        parts = p.split("/")
        for d in range(1, len(parts) + 1):
            pref = "/".join(parts[:d])
            if pref != "":
                want.append((i, pref, d))
    assert sorted(got) == sorted(want)


def test_term_vectors_batch_matches_bruteforce():
    """TermVectorComponent analog: tf/first/last per (doc, term) == pure
    Python Counter over split tokens, incl. empty text and repeats."""
    import numpy as np
    import pyarrow as pa
    from lucene_solr_ray.functions.textstats import term_vectors_batch

    rng = np.random.default_rng(9)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    texts = [" ".join(vocab[int(i)] for i in rng.integers(0, 5, size=k))
             for k in rng.integers(0, 12, size=200)]
    texts += ["", "a", "a a a"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = {(r["doc_id"], r["term"]): (r["tf"], r["first_pos"], r["last_pos"])
           for r in term_vectors_batch(t).to_pylist()}
    want = {}
    for i, tx in enumerate(texts):
        toks = tx.split(" ")
        for p, tok in enumerate(toks):
            if (i, tok) in want:
                tf, fp, _ = want[(i, tok)]
                want[(i, tok)] = (tf + 1, fp, p)
            else:
                want[(i, tok)] = (1, p, p)
    assert got == want
