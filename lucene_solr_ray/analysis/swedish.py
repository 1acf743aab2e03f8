"""Swedish Snowball stemmer — implemented from the published Snowball
"swedish" algorithm description (snowballstem.org, public; the analog of
the generated org/tartarus/snowball/ext/SwedishStemmer.java in
lucene/analysis/common, branch_8x; SURVEY.md §2.2 language packs).

Steps (longest-suffix-match-first, all conditions on R1 with the start
of R1 moved to ≥ 3):
  step 1 — a long a-suffix list deleted in R1; ``s`` deleted in R1 after
           a valid s-ending (b c d f g h j k l m n o p r t v y)
  step 2 — dd/gd/nn/dt/gt/kt/tt in R1 → drop the last letter
  step 3 — lig/ig/els deleted in R1; löst→lös; fullt→full
"""

from __future__ import annotations

__all__ = ["swedish_stem"]

_VOWELS = frozenset("aeiouyäåö")
_S_ENDING = frozenset("bcdfghjklmnoprtvy")

# step-1 group (a), longest first
_STEP1 = sorted(
    [
        "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
        "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
        "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
        "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
        "ast",
    ],
    key=len,
    reverse=True,
)
_STEP2 = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")


def _r1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    r1 = min(i + 1, n) if i < n else n
    return max(r1, 3)


def swedish_stem(word: str) -> str:
    w = word
    if len(w) <= 1:
        return w
    r1 = _r1(w)

    # step 1: Snowball runs the among under ``setlimit tomark p1`` — only
    # suffixes that START within R1 are candidates, and the longest such
    # candidate wins (an out-of-R1 longer match like "anden" in "handen"
    # must NOT shadow the in-R1 "en").  "s" competes in the same pool; if
    # it wins, its s_ending condition gates the delete (no backtracking).
    best = None
    for suf in _STEP1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            best = suf
            break  # _STEP1 is longest-first
    if best is None and w.endswith("s") and len(w) - 1 >= r1:
        best = "s"
        pos = len(w) - 1
        if pos >= 1 and w[pos - 1] in _S_ENDING:
            w = w[:pos]
    elif best is not None:
        w = w[: len(w) - len(best)]

    # step 2
    for suf in _STEP2:
        if w.endswith(suf) and len(w) - 2 >= r1:
            w = w[:-1]
            break

    # step 3 — same setlimit semantics: longest suffix STARTING in R1 wins
    # (löst→lös and fullt→full replace, rest delete)
    for suf in ("fullt", "löst", "lig", "els", "ig"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            if suf in ("fullt", "löst"):
                w = w[:-1]
            else:
                w = w[: len(w) - len(suf)]
            break
    return w
