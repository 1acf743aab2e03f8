"""German Snowball stemmer — implemented from the published Snowball
"german" algorithm description (snowballstem.org, public; the analog of
lucene/analysis/common/src/java/org/tartarus/snowball/ext/GermanStemmer
.java, branch_8x, which is generated from the same public .sbl source;
SURVEY.md §2.2 stemmer row, round-3 verdict task 10 "ICU-lite analysis
pack... one non-English stemmer through the existing registry").

Algorithm outline (all steps longest-suffix-match-first):
  prelude  — ß→ss; u/y between vowels marked as consonants (uppercased)
  regions  — standard R1/R2, with R1's start moved to ≥ 3
  step 1   — em/ern/er (R1) · e/en/es (R1, then niss→nis) · s (R1, after
             a valid s-ending b d f g h k l m n r t)
  step 2   — en/er/est (R1) · st (R1, after a valid st-ending b d f g h
             k l m n t itself preceded by ≥3 letters)
  step 3   — d-suffixes end/ung (R2, then ig not after e) · ig/ik/isch
             (R2, not after e) · lich/heit (R2, then er/en in R1) ·
             keit (R2, then lich/ig in R2)
  postlude — unmark U/Y, strip umlauts ä→a ö→o ü→u
"""

from __future__ import annotations

__all__ = ["german_stem"]

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _regions(w: str) -> tuple:
    """(r1, r2) start offsets: region after the first non-vowel following
    a vowel, and the same applied again inside R1."""
    n = len(w)

    def after_vc(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return r1, r2


def german_stem(word: str) -> str:
    w = word.replace("ß", "ss")
    if len(w) <= 1:
        return w
    # mark u/y between vowels as consonants
    chars = list(w)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    w = "".join(chars)
    r1, r2 = _regions(w)
    r1 = max(r1, 3)  # the region before R1 must hold at least 3 letters

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 1 (longest match among all three groups first)
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("ern", "em", "er"):
            if in_r1(pos):
                w = w[:pos]
        elif suf in ("en", "es", "e"):
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("niss"):
                    w = w[:-1]
        else:  # "s"
            if in_r1(pos) and pos >= 1 and w[pos - 1] in _S_ENDING:
                w = w[:pos]
        break

    # ---- step 2
    for suf in ("est", "en", "er", "st"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("est", "en", "er"):
            if in_r1(pos):
                w = w[:pos]
        else:  # "st"
            if in_r1(pos) and pos >= 4 and w[pos - 1] in _ST_ENDING:
                w = w[:pos]
        break

    # ---- step 3 (d-suffixes)
    for suf in ("lich", "heit", "keit", "isch", "end", "ung", "ig", "ik"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ung"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ig") and not w.endswith("eig") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ig", "ik", "isch"):
            if in_r2(pos) and not (pos >= 1 and w[pos - 1] == "e"):
                w = w[:pos]
        elif suf in ("lich", "heit"):
            if in_r2(pos):
                w = w[:pos]
                for pre in ("er", "en"):
                    if w.endswith(pre) and in_r1(len(w) - 2):
                        w = w[:-2]
                        break
        else:  # "keit"
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("lich") and in_r2(len(w) - 4):
                    w = w[:-4]
                elif w.endswith("ig") and in_r2(len(w) - 2):
                    w = w[:-2]
        break

    # ---- postlude
    out = []
    for c in w:
        if c == "U":
            out.append("u")
        elif c == "Y":
            out.append("y")
        elif c == "ä":
            out.append("a")
        elif c == "ö":
            out.append("o")
        elif c == "ü":
            out.append("u")
        else:
            out.append(c)
    return "".join(out)
