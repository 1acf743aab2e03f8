"""Norwegian + Danish Snowball stemmers — implemented from the published
Snowball "norwegian" and "danish" algorithm descriptions
(snowballstem.org, public; analogs of lucene/analysis/common/src/java/
org/tartarus/snowball/ext/{Norwegian,Danish}Stemmer.java, branch_8x;
SURVEY.md §2.2 language packs). Both share the Scandinavian shape the
Swedish pack uses: a single R1 with the ≥3-letter floor, an s-ending
letter class, and small suffix amongs — they differ in the among lists,
the s-ending class (Norwegian admits k only after a non-vowel; Danish
admits a/k/å unconditionally), Danish's any-double-consonant undouble,
and Norwegian's erte/ert→er rule.
"""

from __future__ import annotations

__all__ = ["norwegian_stem", "danish_stem"]

_VOWELS = frozenset("aeiouyæåø")


def _r1(w: str) -> int:
    n = len(w)
    i = 0
    while i < n and w[i] not in _VOWELS:
        i += 1
    while i < n and w[i] in _VOWELS:
        i += 1
    r1 = min(i + 1, n) if i < n else n
    return max(r1, 3)


_NO_S1 = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
     "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast"],
    key=len, reverse=True,
)
_NO_S3 = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len, reverse=True,
)
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")


def norwegian_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # ---- step 1: one among (longest match across the three groups)
    cands = []
    for suf in _NO_S1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            cands.append((len(suf), "del", suf))
            break
    for suf in ("erte", "ert"):
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            cands.append((len(suf), "er", suf))
            break
    if w.endswith("s") and len(w) - 1 >= r1:
        pre = w[-2] if len(w) >= 2 else ""
        ok = pre in _NO_S_END or (
            pre == "k" and (len(w) < 3 or w[-3] not in _VOWELS)
        )
        if ok:
            cands.append((1, "del", "s"))
    if cands:
        _, kind, suf = max(cands, key=lambda c: c[0])
        if kind == "er":
            w = w[: len(w) - len(suf)] + "er"
        else:
            w = w[: len(w) - len(suf)]

    # ---- step 2: final t of dt/vt in R1
    if (w.endswith("dt") or w.endswith("vt")) and len(w) - 1 >= r1:
        w = w[:-1]

    # ---- step 3
    for suf in _NO_S3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: len(w) - len(suf)]
            break
    return w


_DA_S1 = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
     "erne", "ere", "en", "heden", "eren", "er", "heder", "erer",
     "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
     "hedens", "erens", "ers", "ets", "erets", "et", "eret"],
    key=len, reverse=True,
)
_DA_S3 = sorted(["ig", "lig", "elig", "els"], key=len, reverse=True)
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")


def _da_step2(w: str, r1: int) -> str:
    if w.endswith(("gd", "dt", "gt", "kt")) and len(w) - 1 >= r1:
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    r1 = _r1(w)

    # ---- step 1
    cands = []
    for suf in _DA_S1:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            cands.append((len(suf), suf))
            break
    if (
        w.endswith("s")
        and len(w) - 1 >= r1
        and len(w) >= 2
        and w[-2] in _DA_S_END
    ):
        cands.append((1, "s"))
    if cands:
        _, suf = max(cands, key=lambda c: c[0])
        w = w[: len(w) - len(suf)]

    # ---- step 2
    w = _da_step2(w, r1)

    # ---- step 3: igst's st, then the among (with a step-2 rerun), løst
    if w.endswith("igst"):
        w = w[:-2]
    matched = False
    for suf in _DA_S3:
        if w.endswith(suf) and len(w) - len(suf) >= r1:
            w = w[: len(w) - len(suf)]
            w = _da_step2(w, r1)
            matched = True
            break
    if not matched and w.endswith("løst") and len(w) - 4 >= r1:
        w = w[:-1]

    # ---- step 4: undouble ANY final double consonant in R1
    if (
        len(w) >= 2
        and w[-1] == w[-2]
        and w[-1] not in _VOWELS
        and len(w) - 1 >= r1
    ):
        w = w[:-1]
    return w
