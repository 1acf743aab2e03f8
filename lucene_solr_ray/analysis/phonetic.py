"""Phonetic encoders behind the ``phonetic`` token filter — the
lucene-analysis-phonetic PhoneticFilter encoder set (reference:
lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilter.java, branch_8x, which delegates to commons-codec).

Implemented from the PUBLISHED algorithm descriptions:

- :func:`metaphone` — Lawrence Philips' original Metaphone (Computer
  Language 7(12), 1990), with the commons-codec rule set (maxCodeLen=4,
  the Lucene default) including its documented quirks (initial
  ``CH`` + vowel encodes hard K, ``GNED`` silent G, duplicate letters
  except C collapse before coding).
- :func:`refined_soundex` — commons-codec RefinedSoundex (US English
  mapping): first letter retained, EVERY letter coded 0-9 with adjacent
  duplicate codes collapsed, no length cap.

American Soundex itself lives in ``analysis/filters.py#_soundex`` (the
original encoder slot); this module widens the pack.
"""

from __future__ import annotations

_VOWELS = "AEIOU"
_FRONTV = "EIY"   # letters that make a preceding C/G soft
_VARSON = "CSPTG"  # letters after which H is silent


def metaphone(token: str, max_code_len: int = 4) -> str:
    """Metaphone code of ``token`` (letters only; non-alpha stripped).
    Returns the token unchanged when no letters survive the strip, so
    numerics pass through the filter like the soundex encoder does."""
    word = "".join(c for c in token.upper() if "A" <= c <= "Z")
    if not word:
        return token
    if len(word) == 1:
        return word

    # --- initial-pair exceptions -------------------------------------
    c0, c1 = word[0], word[1]
    if c0 == "A" and c1 == "E":
        word = word[1:]
    elif c0 in "GKP" and c1 == "N":
        word = word[1:]
    elif c0 == "W" and c1 == "R":
        word = word[1:]
    elif c0 == "W" and c1 == "H":
        word = "W" + word[2:]
    elif c0 == "X":
        word = "S" + word[1:]

    wdsz = len(word)
    code: list = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and word[i] in _VOWELS

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and word[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and word[i + 1] == c

    def region(i: int, s: str) -> bool:
        return word.startswith(s, i)

    while n < wdsz and len(code) < max_code_len:
        symb = word[n]
        # duplicate letters (except C) collapse before coding
        if symb != "C" and prev_is(n, symb):
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            # silent terminal -MB ("dumb", "thumb")
            if not (prev_is(n, "M") and n == wdsz - 1):
                code.append("B")
        elif symb == "C":
            if prev_is(n, "S") and n + 1 < wdsz and word[n + 1] in _FRONTV:
                pass  # SCE/SCI/SCY: C silent (S already coded)
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and word[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH → K ("school")
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")  # initial CH + vowel: hard ("chorus")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and next_is(n, "G") and word[n + 2] in _FRONTV:
                code.append("J")  # DGE/DGI/DGY ("dodge" → TJ)
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            if n + 2 == wdsz and next_is(n, "H"):
                pass  # terminal -GH: G silent
            elif n + 2 < wdsz and next_is(n, "H") and not is_vowel(n + 2):
                pass  # GH + consonant: silent ("night")
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                pass  # silent G in -GN / -GNED ("signed")
            else:
                hard = prev_is(n, "G")
                if n + 1 < wdsz and word[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n == wdsz - 1:
                pass  # terminal H silent
            elif n > 0 and word[n - 1] in _VARSON:
                pass  # after C/S/P/T/G: part of a digraph, silent
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if not prev_is(n, "C"):
                code.append("K")  # CK collapses to the C's K
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in -TCH ("watch")
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if is_vowel(n + 1):
                code.append(symb)  # sounded only before a vowel
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1

    return "".join(code[:max_code_len])


_REFINED_CODE = {}
for _chars, _d in [("BP", "1"), ("FV", "2"), ("CKS", "3"), ("GJ", "4"),
                   ("QXZ", "5"), ("DT", "6"), ("L", "7"), ("MN", "8"),
                   ("R", "9"), ("AEIOUYHW", "0")]:
    for _c in _chars:
        _REFINED_CODE[_c] = _d


def refined_soundex(token: str) -> str:
    """RefinedSoundex (commons-codec US-English mapping): first letter +
    one digit per letter with adjacent duplicate digits collapsed; no
    4-char truncation and vowels code '0' (unlike American Soundex)."""
    word = "".join(c for c in token.upper() if "A" <= c <= "Z")
    if not word:
        return token
    out = [word[0]]
    last = None
    for c in word:
        d = _REFINED_CODE[c]
        if d != last:
            out.append(d)
            last = d
    return "".join(out)
