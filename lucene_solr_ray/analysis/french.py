"""French Snowball stemmer — implemented from the published Snowball
"french" algorithm description (snowballstem.org, public; the analog of
lucene/analysis/common/src/java/org/tartarus/snowball/ext/FrenchStemmer
.java, branch_8x, generated from the same public .sbl source; SURVEY.md
§2.2 language packs, round-4 verdict task 6).

Control flow (the part that differs from the German/Swedish packs): the
amment/emment/ment/ments branches of step 1 ALTER the word and then FAIL
(the .sbl ``fail`` trick), which routes execution into the verb steps 2a
→ 2b and, when those remove nothing, into the residual step 4 — while
the Y→i / ç→c step 3 runs only when step 1/2a/2b *succeeded*. Steps 5
(undouble) and 6 (un-accent) always run.

Prelude marks u/i between vowels, y next to a vowel, and u after q as
non-vowels (U/I/Y); the verb-suffix conditions ("preceded by a
non-vowel") rely on those marks. Documented deviation: the Snowball-2.0
ë→He / ï→Hi handling is not implemented (ë/ï stay plain vowels; affects
only rare diaeresis words).
"""

from __future__ import annotations

__all__ = ["french_stem"]

_V = frozenset("aeiouyâàëéêèïîôûù")

_S1_GROUP_A = sorted(
    ["ance", "iqUe", "isme", "able", "iste", "eux",
     "ances", "iqUes", "ismes", "ables", "istes"],
    key=len, reverse=True,
)
_S1_ATION = sorted(
    ["atrice", "ateur", "ation", "atrices", "ateurs", "ations"],
    key=len, reverse=True,
)
_S2A = sorted(
    ["îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
     "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
     "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
     "issant", "issante", "issantes", "issants", "isse", "issent",
     "isses", "issez", "issiez", "issions", "issons", "it"],
    key=len, reverse=True,
)
_S2B_E_GROUP = sorted(
    ["é", "ée", "ées", "és", "èrent", "er", "era", "erai", "eraIent",
     "erais", "erait", "eras", "erez", "eriez", "erions", "erons",
     "eront", "ez", "iez"],
    key=len, reverse=True,
)
_S2B_A_GROUP = sorted(
    ["âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
     "ante", "antes", "ants", "as", "asse", "assent", "asses",
     "assiez", "assions"],
    key=len, reverse=True,
)


def _prelude(w: str) -> str:
    """Mark u/i between vowels, y next to a vowel, u after q as U/I/Y."""
    n = len(w)
    ch = list(w)
    i = 0
    while i < n:
        c = ch[i]
        if c in _V:
            if i + 2 < n and ch[i + 1] == "u" and ch[i + 2] in _V:
                ch[i + 1] = "U"
                i += 3
                continue
            if i + 2 < n and ch[i + 1] == "i" and ch[i + 2] in _V:
                ch[i + 1] = "I"
                i += 3
                continue
            if i + 1 < n and ch[i + 1] == "y":
                ch[i + 1] = "Y"
                i += 2
                continue
        if c == "y" and i + 1 < n and ch[i + 1] in _V:
            ch[i] = "Y"
            i += 2
            continue
        if c == "q" and i + 1 < n and ch[i + 1] == "u":
            ch[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(ch)


def _regions(w: str):
    """(r1, r2, rv) start offsets on the prelude form (marks ∉ vowels)."""
    n = len(w)

    def after_vc(start: int) -> int:
        i = start
        while i < n and w[i] not in _V:
            i += 1
        while i < n and w[i] in _V:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_vc(0)
    r2 = after_vc(r1)
    if w[:3] in ("par", "col", "tap"):
        rv = 3
    elif n >= 2 and w[0] in _V and w[1] in _V:
        rv = min(3, n)
    else:
        # region after the first vowel not at the beginning of the word
        i = 1
        while i < n and w[i] not in _V:
            i += 1
        rv = min(i + 1, n) if i < n else n
    return r1, r2, rv


def french_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's shape
    w = _prelude(word)
    if len(w) <= 2:
        return w.replace("U", "u").replace("I", "i").replace("Y", "y")
    r1, r2, rv = _regions(w)

    def in_(pos, region):
        return pos >= region

    def ends_in(word_, suf, region):
        return word_.endswith(suf) and len(word_) - len(suf) >= region

    # ---------- step 1: standard suffix removal ----------
    # Gather the longest matching suffix across every group, then apply
    # that group's action (among semantics: no backtracking).
    cands = []

    def cand(suf, kind):
        if w.endswith(suf):
            cands.append((len(suf), kind, suf))

    for suf in _S1_GROUP_A:
        if w.endswith(suf):
            cands.append((len(suf), "a", suf))
            break
    for suf in _S1_ATION:
        if w.endswith(suf):
            cands.append((len(suf), "ation", suf))
            break
    for suf in ("logies", "logie"):
        cand(suf, "logie")
    for suf in ("usions", "utions", "usion", "ution"):
        cand(suf, "usion")
    for suf in ("ences", "ence"):
        cand(suf, "ence")
    for suf in ("ements", "ement"):
        cand(suf, "ement")
    for suf in ("ités", "ité"):
        cand(suf, "ite")
    for suf in ("ives", "ifs", "ive", "if"):
        cand(suf, "if")
    cand("eaux", "eaux")
    if not w.endswith("eaux"):
        cand("aux", "aux")
    for suf in ("euses", "euse"):
        cand(suf, "euse")
    for suf in ("issements", "issement"):
        cand(suf, "issement")
    cand("amment", "amment")
    cand("emment", "emment")
    if not (w.endswith("amment") or w.endswith("emment")):
        for suf in ("ments", "ment"):
            cand(suf, "ment")

    altered = False          # word changed by the successful step
    s1_success = None        # None = no suffix matched; True/False = action outcome
    into_verbs = False       # the m-group fail-through

    if cands:
        _, kind, suf = max(cands, key=lambda c: c[0])
        pos = len(w) - len(suf)
        s1_success = False
        if kind == "a":
            if in_(pos, r2):
                w = w[:pos]
                s1_success = altered = True
        elif kind == "ation":
            if in_(pos, r2):
                w = w[:pos]
                s1_success = altered = True
                if ends_in(w, "ic", r2):
                    w = w[:-2]
                elif w.endswith("ic"):
                    w = w[:-2] + "iqU"
        elif kind == "logie":
            if in_(pos, r2):
                w = w[:pos] + "log"
                s1_success = altered = True
        elif kind == "usion":
            if in_(pos, r2):
                w = w[:pos] + "u"
                s1_success = altered = True
        elif kind == "ence":
            if in_(pos, r2):
                w = w[:pos] + "ent"
                s1_success = altered = True
        elif kind == "ement":
            if in_(pos, rv):
                w = w[:pos]
                s1_success = altered = True
                if ends_in(w, "iv", r2):
                    w = w[:-2]
                    if ends_in(w, "at", r2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_(len(w) - 3, r2):
                        w = w[:-3]
                    elif in_(len(w) - 3, r1):
                        w = w[:-3] + "eux"
                elif ends_in(w, "abl", r2) or ends_in(w, "iqU", r2):
                    w = w[:-3]
                elif ends_in(w, "ièr", rv) or ends_in(w, "Ièr", rv):
                    w = w[:-3] + "i"
        elif kind == "ite":
            if in_(pos, r2):
                w = w[:pos]
                s1_success = altered = True
                if w.endswith("abil"):
                    if in_(len(w) - 4, r2):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_(len(w) - 2, r2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif ends_in(w, "iv", r2):
                    w = w[:-2]
        elif kind == "if":
            if in_(pos, r2):
                w = w[:pos]
                s1_success = altered = True
                if ends_in(w, "at", r2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_(len(w) - 2, r2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif kind == "eaux":
            w = w[:pos] + "eau"
            s1_success = altered = True
        elif kind == "aux":
            if in_(pos, r1):
                w = w[:pos] + "al"
                s1_success = altered = True
        elif kind == "euse":
            if in_(pos, r2):
                w = w[:pos]
                s1_success = altered = True
            elif in_(pos, r1):
                w = w[:pos] + "eux"
                s1_success = altered = True
        elif kind == "issement":
            if in_(pos, r1) and pos >= 1 and w[pos - 1] not in _V:
                w = w[:pos]
                s1_success = altered = True
        elif kind == "amment":
            if in_(pos, rv):
                w = w[:pos] + "ant"
                altered = True
            into_verbs = True          # fail-through regardless
            s1_success = False
        elif kind == "emment":
            if in_(pos, rv):
                w = w[:pos] + "ent"
                altered = True
            into_verbs = True
            s1_success = False
        elif kind == "ment":
            if pos >= 1 and w[pos - 1] in _V and in_(pos - 1, rv):
                w = w[:pos]
                altered = True
            into_verbs = True
            s1_success = False

    # ---------- steps 2a / 2b (verb suffixes, confined to RV) ----------
    verb_success = False
    if s1_success is not True or into_verbs:
        if s1_success is None or into_verbs or s1_success is False:
            # 2a: i-verb suffixes, preceded by a non-vowel itself in RV
            did_2a = False
            for suf in _S2A:
                if ends_in(w, suf, rv):
                    pos = len(w) - len(suf)
                    if pos - 1 >= rv and w[pos - 1] not in _V:
                        w = w[:pos]
                        did_2a = verb_success = True
                    break  # longest match only
            if not did_2a:
                # 2b: other verb suffixes (longest across the three pools)
                best = None
                if ends_in(w, "ions", rv):
                    best = (4, "ions", "ions")
                for suf in _S2B_E_GROUP:
                    if ends_in(w, suf, rv):
                        if best is None or len(suf) > best[0]:
                            best = (len(suf), "e", suf)
                        break
                for suf in _S2B_A_GROUP:
                    if ends_in(w, suf, rv):
                        if best is None or len(suf) > best[0]:
                            best = (len(suf), "a", suf)
                        break
                if best is not None:
                    _, kind2, suf = best
                    pos = len(w) - len(suf)
                    if kind2 == "ions":
                        if in_(pos, r2):
                            w = w[:pos]
                            verb_success = True
                    elif kind2 == "e":
                        w = w[:pos]
                        verb_success = True
                    else:  # a-group: delete, then a preceding e in RV too
                        w = w[:pos]
                        verb_success = True
                        if w.endswith("e") and len(w) - 1 >= rv:
                            w = w[:-1]

    step_succeeded = (s1_success is True) or verb_success

    if step_succeeded:
        # ---------- step 3 ----------
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # ---------- step 4: residual suffix ----------
        if (
            w.endswith("s")
            and len(w) >= 2
            and w[-2] not in ("a", "i", "o", "u", "è", "s")
        ):
            w = w[:-1]
        best = None
        for suf in ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"):
            if ends_in(w, suf, rv):
                best = suf
                break
        if best == "ion":
            pos = len(w) - 3
            if in_(pos, r2) and pos - 1 >= rv and w[pos - 1] in ("s", "t"):
                w = w[:pos]
        elif best in ("Ière", "ière", "Ier", "ier"):
            w = w[: len(w) - len(best)] + "i"
        elif best == "e":
            w = w[:-1]
        elif best == "ë":
            if w[-3:-1] == "gu":
                w = w[:-1]

    # ---------- step 5: undouble ----------
    for suf in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(suf):
            w = w[:-1]
            break

    # ---------- step 6: un-accent ----------
    i = len(w) - 1
    seen_nonv = False
    while i >= 0 and w[i] not in _V:
        seen_nonv = True
        i -= 1
    if seen_nonv and i >= 0 and w[i] in ("é", "è"):
        w = w[:i] + "e" + w[i + 1 :]

    return w.replace("U", "u").replace("I", "i").replace("Y", "y")
