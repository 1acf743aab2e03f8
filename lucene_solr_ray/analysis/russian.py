"""Russian Snowball stemmer — implemented from the published Snowball
"russian" algorithm description (snowballstem.org, public; the analog of
lucene/analysis/common/src/java/org/tartarus/snowball/ext/RussianStemmer
.java, branch_8x, generated from the same public .sbl source; SURVEY.md
§2.2 language packs).

All suffix matching runs inside RV (the region after the first vowel) —
Snowball's ``setlimit`` means a suffix that would extend before RV simply
does not match, so a shorter in-RV entry can win instead. Within one
among, the longest in-RV match is chosen and THEN its condition (the
"preceded by а/я" test, whose а/я must itself sit inside RV) is tested;
on failure the whole among fails with no backtracking to shorter
entries. ё is folded to е up front (the published algorithm treats them
as identical).

Step 1: perfective gerund, else [reflexive] + (adjectival | verb |
noun), first success ends the step. Adjectival = adjective ending, then
optionally a participle ending directly before it. Step 2: final и.
Step 3: derivational ост/ость wholly in R2. Step 4: нн→н, or
superlative ейш/ейше (then нн→н), or final ь.
"""

from __future__ import annotations

__all__ = ["russian_stem"]

_VOWELS = frozenset("аеиоуыэюя")

# (suffixes, needs preceding а/я) pools; longest-first within each pool
_GERUND = (
    (("вшись", "вши", "в"), True),
    (("ившись", "ывшись", "ивши", "ывши", "ив", "ыв"), False),
)
_ADJECTIVE = sorted(
    ["ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем",
     "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую",
     "юю", "ая", "яя", "ою", "ею"],
    key=len, reverse=True,
)
_PARTICIPLE = (
    (("ем", "нн", "вш", "ющ", "щ"), True),
    (("ивш", "ывш", "ующ"), False),
)
_VERB = (
    (("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
      "ет", "ют", "ны", "ть", "ешь", "нно"), True),
    (("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
      "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
      "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю"),
     False),
)
_NOUN = sorted(
    ["а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии",
     "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам",
     "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия",
     "ья", "я"],
    key=len, reverse=True,
)


def _regions(w: str):
    n = len(w)
    rv = n
    for i, ch in enumerate(w):
        if ch in _VOWELS:
            rv = i + 1
            break

    def after_vc(start: int) -> int:
        i = start
        while i < n and w[i] not in _VOWELS:
            i += 1
        while i < n and w[i] in _VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    return rv, r2


def _match_conditional(w: str, pools, rv: int):
    """Longest in-RV match across the conditional pools; returns the new
    word on success, None when nothing matched or the longest match's
    а/я condition failed (Snowball among: no backtracking)."""
    best = None  # (len, suffix, cond)
    for sufs, cond in pools:
        for suf in sufs:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                if best is None or len(suf) > best[0]:
                    best = (len(suf), suf, cond)
                break  # pools are longest-first
    if best is None:
        return None
    _, suf, cond = best
    pos = len(w) - len(suf)
    if cond:
        # the preceding а/я must itself lie inside the RV limit
        if pos - 1 < rv or w[pos - 1] not in "ая":
            return None
    return w[:pos]


def _match_plain(w: str, pool, rv: int):
    for suf in pool:  # longest-first
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            return w[: len(w) - len(suf)]
    return None


def russian_stem(word: str) -> str:
    w = word.replace("ё", "е")
    rv, r2 = _regions(w)

    # ---- step 1
    g = _match_conditional(w, _GERUND, rv)
    if g is not None:
        w = g
    else:
        if w.endswith("ся") and len(w) - 2 >= rv:
            w = w[:-2]
        elif w.endswith("сь") and len(w) - 2 >= rv:
            w = w[:-2]
        a = _match_plain(w, _ADJECTIVE, rv)
        if a is not None:
            w = a
            p = _match_conditional(w, _PARTICIPLE, rv)
            if p is not None:
                w = p
        else:
            v = _match_conditional(w, _VERB, rv)
            if v is not None:
                w = v
            else:
                n = _match_plain(w, _NOUN, rv)
                if n is not None:
                    w = n

    # ---- step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # ---- step 3: derivational, wholly in R2
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: len(w) - len(suf)]
            break

    # ---- step 4
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        s = _match_plain(w, ("ейше", "ейш"), rv)
        if s is not None:
            w = s
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w
