"""Dutch Snowball stemmer — implemented from the published Snowball
"dutch" algorithm description (snowballstem.org, public; the analog of
lucene/analysis/common/src/java/org/tartarus/snowball/ext/DutchStemmer
.java, branch_8x, generated from the same public .sbl source; SURVEY.md
§2.2 language packs).

Prelude: umlauts/acutes are stripped (è keeps its accent and stays a
vowel), then initial y, y after a vowel, and i between vowels are
upper-cased (Y/I = consonant marks); the postlude lowers them back.
R1/R2 are standard, but R1 is adjusted so at least 3 letters precede it
(R2 uses the unadjusted positions). Undouble removes one letter of a
final kk/dd/tt only. Step 1 is one among (heden→heid | ene/en with the
valid en-ending test | se/s with the valid s-ending test; longest match,
no backtracking); step 2 drops a final e after a non-vowel in R1 and
records that for step 3b's ``bar``; step 3a handles heid (not after c)
plus a second en pass; step 3b the d-suffixes (end/ing with the ig
follow-up, ig not after e, lijk then a step-2 rerun, baar, bar only if
step 2 fired); step 4 undoubles aa/ee/oo/uu between consonants (final
consonant not I).
"""

from __future__ import annotations

__all__ = ["dutch_stem"]

_VOWELS = frozenset("aeiouyè")  # marked I/Y are consonants by design

_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _prelude(w: str) -> str:
    w = w.translate(_UNACCENT)
    out = list(w)
    n = len(out)
    for i, ch in enumerate(out):
        if ch == "y" and (i == 0 or out[i - 1] in _VOWELS):
            out[i] = "Y"
        elif ch == "i" and 0 < i < n - 1:
            if out[i - 1] in _VOWELS and out[i + 1] in _VOWELS:
                out[i] = "I"
    return "".join(out)


def _regions(w: str):
    n = len(w)

    def after_vc(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)  # R2 from the unadjusted R1
    return max(r1, 3), r2


def _undouble(w: str) -> str:
    if w.endswith(("kk", "dd", "tt")):
        return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    w = _prelude(word)
    if len(w) <= 2:
        return w.lower()
    r1, r2 = _regions(w)

    def ends_in(word_, suf, region_start):
        return word_.endswith(suf) and len(word_) - len(suf) >= region_start

    def en_ending_ok(base: str) -> bool:
        # a non-vowel, and the base must not end in gem
        return (
            len(base) >= 1
            and base[-1] not in _VOWELS
            and not base.endswith("gem")
        )

    # ---- step 1: one among, longest match, no backtracking
    cands = []
    if w.endswith("heden"):
        cands.append((5, "heden"))
    for suf in ("ene", "en"):
        if w.endswith(suf):
            cands.append((len(suf), suf))
            break
    for suf in ("se", "s"):
        if w.endswith(suf):
            cands.append((len(suf), suf))
            break
    if cands:
        _, suf = max(cands, key=lambda c: c[0])
        pos = len(w) - len(suf)
        if suf == "heden":
            if pos >= r1:
                w = w[:pos] + "heid"
        elif suf in ("ene", "en"):
            if pos >= r1 and en_ending_ok(w[:pos]):
                w = _undouble(w[:pos])
        else:  # se / s: valid s-ending = a non-vowel other than j
            if pos >= r1 and pos >= 1 and w[pos - 1] not in _VOWELS and w[pos - 1] != "j":
                w = w[:pos]

    # ---- step 2: final e after a non-vowel, in R1
    e_removed = False
    if (
        ends_in(w, "e", r1)
        and len(w) >= 2
        and w[-2] not in _VOWELS
    ):
        w = _undouble(w[:-1])
        e_removed = True

    # ---- step 3a: heid (not after c), then another en pass
    if ends_in(w, "heid", r1) and not w[: -4].endswith("c"):
        w = w[:-4]
        if ends_in(w, "en", r1) and en_ending_ok(w[:-2]):
            w = _undouble(w[:-2])

    # ---- step 3b: d-suffixes (longest match, no backtracking)
    cands = []
    for suf in ("end", "ing", "lijk", "baar", "bar", "ig"):
        if w.endswith(suf):
            cands.append((len(suf), suf))
    if cands:
        _, suf = max(cands, key=lambda c: c[0])
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if pos >= r2:
                w = w[:pos]
                if ends_in(w, "ig", r2) and not w[:-2].endswith("e"):
                    w = w[:-2]
                else:
                    w = _undouble(w)
        elif suf == "ig":
            if pos >= r2 and not w[:pos].endswith("e"):
                w = w[:pos]
        elif suf == "lijk":
            if pos >= r2:
                w = w[:pos]
                # repeat step 2
                if ends_in(w, "e", r1) and len(w) >= 2 and w[-2] not in _VOWELS:
                    w = _undouble(w[:-1])
        elif suf == "baar":
            if pos >= r2:
                w = w[:pos]
        elif suf == "bar":
            if pos >= r2 and e_removed:
                w = w[:pos]

    # ---- step 4: undouble vowel (C VV D, D a non-vowel other than I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _VOWELS
            and d not in _VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            w = w[:-2] + w[-1]

    return w.lower()
