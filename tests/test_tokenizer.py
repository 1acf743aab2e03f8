"""UAX#29 tokenizer goldens + property tests (SURVEY.md §5 pattern 3)."""

import numpy as np
import pytest

from lucene_solr_ray.analysis.tokenizer import StandardTokenizer, lowercase, tokenize_lower

TOK = StandardTokenizer()

GOLDEN = [
    ("Hello, World!", ["Hello", "World"]),
    ("can't stop won't stop", ["can't", "stop", "won't", "stop"]),
    ("3.14 plus 1,000 items", ["3.14", "plus", "1,000", "items"]),
    ("Foo-Bar", ["Foo", "Bar"]),             # hyphen splits (UAX#29)
    ("HTTP2 x86_64", ["HTTP2", "x86_64"]),   # alnum join; _ is ExtendNumLet
    ("I.B.M. cat", ["I.B.M", "cat"]),        # MidNumLet dot joins letters
    ("foo_bar _lead trail_", ["foo_bar", "_lead", "trail_"]),
    ("e.g. i.e.", ["e.g", "i.e"]),
    ("a@b.com", ["a", "b.com"]),             # @ splits; dot joins
    ("日本語です", ["日", "本", "語", "で", "す"]),  # Han+Hiragana single-char
    ("カタカナとtext", ["カタカナ", "と", "text"]),   # Katakana run
    ("naïve café", ["naïve", "café"]),
    ("", []),
    ("   \t\n ", []),
    ("'quoted' words", ["quoted", "words"]),  # leading/trailing ' drop
    ("O'Neill's", ["O'Neill's"]),
    # kana voiced marks are WB:Extend — they attach to the preceding
    # kana/Han token (halfwidth ﾞﾟ and combining U+3099/309A)
    ("ﾆﾎﾝｺﾞ", ["ﾆﾎﾝｺﾞ"]),
    ("ﾊﾟﾝﾁ", ["ﾊﾟﾝﾁ"]),
    ("がき", ["が", "き"]),       # NFD hiragana
    ("ガナ", ["ガナ"]),           # NFD katakana run
    ("一ﾞ二", ["一ﾞ", "二"]),                 # Han + mark
    ("abcﾞ def", ["abc", "def"]),             # unattached mark drops
    ("ﾞｶ", ["ｶ"]),                            # leading mark drops
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    assert TOK.tokenize(text) == expected


def test_max_token_length_split():
    t = "x" * 600
    toks = TOK.tokenize(t)
    assert [len(x) for x in toks] == [255, 255, 90]
    assert "".join(toks) == t
    short = StandardTokenizer(max_token_length=5)
    assert short.tokenize("abcdefghij") == ["abcde", "fghij"]


def test_lowercase_java_semantics():
    # codepoint-wise: İ → i (single char), Σ → σ (no final-sigma context)
    assert lowercase("İstanbul") == "istanbul"
    assert lowercase("ΣΙΣΥΦΟΣ") == "σισυφοσ"  # trailing Σ stays σ, not ς
    assert lowercase("Straße") == "straße"    # ß unchanged (no SS expansion)
    assert lowercase("ABC def") == "abc def"


def test_tokenize_lower():
    assert tokenize_lower("The QUICK brown") == ["the", "quick", "brown"]


def test_random_unicode_properties():
    """Random text never crashes; tokens contain no whitespace; token chars
    are a subset of the input; concatenation order preserved."""
    rng = np.random.default_rng(1234)
    alphabet = list("abc XYZ 012 .,'-_ \t\néü日カ本ナ語")
    for trial in range(200):
        n = int(rng.integers(0, 200))
        s = "".join(rng.choice(alphabet, size=n))
        toks = TOK.tokenize(s)
        joined = "".join(toks)
        for t in toks:
            assert t, f"empty token (seed trial {trial})"
            assert not any(c.isspace() for c in t), (trial, s, toks)
            assert len(t) <= 255
        # order-preservation: tokens appear in s left-to-right
        pos = 0
        for t in toks:
            found = s.find(t, pos)
            assert found >= 0, (trial, s, toks)
            pos = found + 1


def _via_utf8_buffer(texts, m=255):
    import pyarrow as pa
    import pyarrow.compute as pc

    from lucene_solr_ray.analysis.fast_tokenizer import (
        _string_buffers,
        tokenize_utf8_buffer,
        tokens_to_string_array,
    )

    arr = pa.array(texts, type=pa.string())
    data, offs = _string_buffers(arr)
    starts, lens, dids = tokenize_utf8_buffer(data, offs, m)
    toks = pc.utf8_lower(tokens_to_string_array(data, starts, lens)).to_pylist()
    out = [[] for _ in texts]
    for t, d in zip(toks, dids):
        out[int(d)].append(t)
    return out


def test_utf8_buffer_matches_regex_goldens():
    """The vectorized Unicode buffer path is token-identical (post
    lowercase) to the reference regex tokenizer on every golden."""
    texts = [g[0] for g in GOLDEN]
    assert _via_utf8_buffer(texts) == [TOK.tokenize_lower(t) for t in texts]


def test_utf8_buffer_matches_regex_fuzz():
    """Multi-script fuzz: vectorized Unicode path == regex path, including
    short max_token_length (codepoint-counted splits)."""
    rng = np.random.default_rng(4242)
    pools = [
        "abcXYZ019_",
        "'.:,;’·״‧ ",
        "äöüßéñçøπΣσ"
        "ія汉字中文ひらカタァ"
        "ーㇰ",
        " \t\n-!?#@()[]",
        "٣٤٥०१२",
        "\U0001f600\U0001f44d\U0001f3fd\U0001f389",
        "́̈",
        # kana voiced marks (WB:Extend) + halfwidth katakana + NFD kana
        "゙゚ﾞﾟｦｱﾝﾊｺかカ",
    ]
    flat = list("".join(pools))
    for trial in range(120):
        m = int(rng.choice([255, 255, 3, 7, 1]))
        tok = StandardTokenizer(m)
        texts = [
            "".join(rng.choice(flat, size=int(rng.integers(0, 80))))
            for _ in range(int(rng.integers(1, 8)))
        ]
        got = _via_utf8_buffer(texts, m)
        want = [tok.tokenize_lower(t) for t in texts]
        assert got == want, (trial, m, texts)


def test_analyze_table_mixed_batch_matches_bruteforce():
    """analyze_table on a mixed ASCII/Unicode batch (the branch that now
    runs tokenize_utf8_buffer) == the per-row regex brute force, including
    positions."""
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.stages.analyzer import _analyze_rows_regex, analyze_table

    texts = [
        "plain ascii only doc",
        "héllo wörld Ünïted",
        "русский текст",
        "日本語のテキスト カタカナ",
        "mixed 中ascii文 and 3.14 x_y",
        "",
        "emoji \U0001f600 test",
    ]
    t = pa.table(
        {
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
            "text": pa.array(texts),
        }
    )
    tok = StandardTokenizer()
    got = analyze_table(t, tok, 4, want_positions=True)
    terms, freqs, dl, pos = _analyze_rows_regex(texts, tok, want_positions=True)
    for i in range(len(texts)):
        assert got["terms"][i].as_py() == terms[i], i
        assert got["freqs"][i].as_py() == list(freqs[i]), i
        assert got["dl"][i].as_py() == int(dl[i]), i
        assert got["positions"][i].as_py() == list(pos[i]), i


def test_empty_doc_mid_batch_no_phantom_token():
    """Regression: an EMPTY doc between two docs whose boundary chars are
    both in-token used to insert a duplicated run split in _alnum_runs —
    a zero-length (empty-string) token credited to the NEXT doc,
    corrupting its terms, dl, and positions. Pure-ASCII and Unicode
    fallback paths both share the fixed core."""
    import pyarrow as pa

    from lucene_solr_ray.stages.analyzer import _analyze_rows_regex, analyze_table

    cases = [
        ["x y", "", "z"],                    # ascii, single empty
        ["x y", "", "", "z"],                # ascii, run of empties
        ["tail", "", "héad next", "", "m"],  # mixed ascii/unicode
        ["русский", "", "текст"],            # unicode fallback path
        ["", "lead"], ["trail", ""],         # edges
    ]
    tok = StandardTokenizer()
    for texts in cases:
        t = pa.table({
            "url": [f"u{i}" for i in range(len(texts))],
            "warc_ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
            "text": pa.array(texts),
        })
        got = analyze_table(t, tok, 4, want_positions=True)
        terms, freqs, dl, pos = _analyze_rows_regex(texts, tok, want_positions=True)
        for i in range(len(texts)):
            assert got["terms"][i].as_py() == terms[i], (texts, i)
            assert got["freqs"][i].as_py() == list(freqs[i]), (texts, i)
            assert got["dl"][i].as_py() == int(dl[i]), (texts, i)
            assert got["positions"][i].as_py() == list(pos[i]), (texts, i)
