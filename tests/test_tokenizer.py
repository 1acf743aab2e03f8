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
