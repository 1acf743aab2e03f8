"""Snowball English (Porter2) stemmer — pure-Python, dependency-free.

Analog of Lucene's SnowballPorterFilterFactory with language=English
(reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
snowball/SnowballPorterFilterFactory.java + the generated EnglishStemmer,
branch_8x; SURVEY.md §2.2). Implemented from the published Porter2
algorithm description (snowballstem.org/algorithms/english/stemmer.html),
not from the generated Java. Used vocabulary-wise by the filter registry
(analysis/filters.py), so per-term cost is amortized across the corpus.

Deviations: none intended; goldens in tests/test_analyzer_filters.py pin
~70 published input/output pairs including every special-case list.
"""

from __future__ import annotations

__all__ = ["snowball_stem"]

_VOWELS = frozenset("aeiouy")
_DOUBLES = frozenset(["bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"])
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)

_STEP2 = [  # longest-match order; (suffix, replacement)
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),  # ogi/li special-cased
]
_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ative", None),  # delete, only if in R2
    ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
    "ion", "al", "er", "ic",
]


def _is_vowel(w: str, i: int) -> bool:
    return w[i] in _VOWELS  # Y (capital) marks consonant-y, not in set


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets per the Porter2 definition, with the
    gener/commun/arsen prefix exception for R1."""
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(w, i) and _is_vowel(w, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(w, i) and _is_vowel(w, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """True if the word ends in a short syllable: non-vowel + vowel +
    non-vowel(not w/x/Y), or vowel + non-vowel at the very start."""
    n = len(w)
    if n == 2:
        return _is_vowel(w, 0) and not _is_vowel(w, 1)
    if n >= 3:
        return (
            not _is_vowel(w, n - 3)
            and _is_vowel(w, n - 2)
            and not _is_vowel(w, n - 1)
            and w[n - 1] not in "wxY"
        )
    return False


def _has_vowel(w: str, end: int) -> bool:
    return any(_is_vowel(w, i) for i in range(end))


def snowball_stem(word: str) -> str:
    """Porter2 stem of a lowercase word. Non-alphabetic tokens and words
    of length <= 2 pass through unchanged (matching the Snowball driver)."""
    if len(word) <= 2 or not word.isascii():
        return word
    w = word
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    if len(w) <= 2:
        return w
    # mark consonant-y as Y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _regions(w)

    # step 0: 's'  's  '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _has_vowel(w, len(w) - 2):
        w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w

    # step 1b
    def _post_del(v: str) -> str:
        if v.endswith(("at", "bl", "iz")):
            return v + "e"
        if v[-2:] in _DOUBLES:
            return v[:-1]
        if r1 >= len(v) and _ends_short_syllable(v):
            return v + "e"
        return v

    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    elif w.endswith("ingly") and _has_vowel(w, len(w) - 5):
        w = _post_del(w[:-5])
    elif w.endswith("edly") and _has_vowel(w, len(w) - 4):
        w = _post_del(w[:-4])
    elif w.endswith("ing") and _has_vowel(w, len(w) - 3):
        w = _post_del(w[:-3])
    elif w.endswith("ed") and _has_vowel(w, len(w) - 2):
        w = _post_del(w[:-2])

    # step 1c: y -> i after a non-vowel that is not the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and not _is_vowel(w, len(w) - 2)
    ):
        w = w[:-1] + "i"

    # step 2 (suffix must lie in R1)
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3 (suffix in R1; ative needs R2)
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - 5 >= r2:
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (suffix in R2)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("ll") and len(w) - 1 >= r2:
        w = w[:-1]

    return w.lower()
