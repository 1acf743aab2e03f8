"""Spanish Snowball stemmer — implemented from the published Snowball
"spanish" algorithm description (snowballstem.org, public; the analog of
lucene/analysis/common/src/java/org/tartarus/snowball/ext/SpanishStemmer
.java, branch_8x, generated from the same public .sbl source; SURVEY.md
§2.2 language packs, round-4 verdict task 6).

Steps (longest-suffix-match-first; RV per the Spanish definition):
  step 0  — attached pronoun (me/se/sela/…/nos) deleted when it follows
            one of iéndo/ándo/ár/ér/ír (a — then unaccent), ando/iendo/
            ar/er/ir (b), or u+yendo (c), with the preceding element in RV
  step 1  — standard d-suffixes with R1/R2 conditions (anza…, ación…,
            logía→log, ución→u, encia→ente, amente/mente, idad, iva…)
  step 2a — verb y-suffixes in RV when preceded by u (only if step 1
            removed nothing)
  step 2b — verb suffixes in RV (only if 2a removed nothing); en/es/éis/
            emos additionally drop a preceding gu's u
  step 3  — residual os/a/o/á/í/ó in RV; e/é in RV (then gu's u in RV)
  post    — remove acute accents
"""

from __future__ import annotations

__all__ = ["spanish_stem"]

_VOWELS = frozenset("aeiouáéíóúü")

_STEP0_PRON = sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"],
    key=len, reverse=True,
)
# preceding element groups (longest-first within the combined pool)
_STEP0_A = ("iéndo", "ándo", "ár", "ér", "ír")           # unaccent after del
_STEP0_B = ("iendo", "ando", "ar", "er", "ir")
_STEP0_UNACCENT = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
                   "ér": "er", "ír": "ir"}

_S1_DELETE_R2 = sorted(
    ["anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
     "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
     "osos", "osas", "amiento", "amientos", "imiento", "imientos"],
    key=len, reverse=True,
)
_S1_ADOR = sorted(
    ["adora", "ador", "ación", "adoras", "adores", "aciones",
     "ante", "antes", "ancia", "ancias"],
    key=len, reverse=True,
)
_S1_IDAD = ("idades", "idad")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_ACCENT_MAP = str.maketrans("áéíóú", "aeiou")

# step-2b long verb-suffix pool (delete in RV); the gu-group handled apart
_S2B_GU = ("en", "es", "éis", "emos")
_S2B_DELETE = sorted(
    ["arían", "arías", "arán", "arás", "aríais", "aría", "aréis",
     "aríamos", "aremos", "ará", "aré", "erían", "erías", "erán", "erás",
     "eríais", "ería", "eréis", "eríamos", "eremos", "erá", "eré",
     "irían", "irías", "irán", "irás", "iríais", "iría", "iréis",
     "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida", "ía", "ara",
     "iera", "ad", "ed", "id", "ase", "iese", "aste", "iste", "an",
     "aban", "ían", "aran", "ieran", "asen", "iesen", "aron", "ieron",
     "ado", "ido", "ando", "iendo", "ió", "ar", "er", "ir", "as", "abas",
     "adas", "idas", "ías", "aras", "ieras", "ases", "ieses", "ís",
     "áis", "abais", "íais", "arais", "ierais", "aseis", "ieseis",
     "asteis", "isteis", "ados", "idos", "amos", "ábamos", "íamos",
     "imos", "áramos", "iéramos", "iésemos", "ásemos"],
    key=len, reverse=True,
)
_S2A = sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó", "yas",
     "yes", "yais", "yamos"],
    key=len, reverse=True,
)


def _regions(w: str):
    """(r1, r2, rv) start offsets per the Snowball definitions."""
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
    # RV: if the second letter is a consonant, RV is the region after the
    # next following vowel; if the first two letters are vowels, RV is the
    # region after the next consonant; otherwise (consonant-vowel) RV is
    # after the third letter. End of word if not found.
    rv = n
    if n >= 2:
        if w[1] not in _VOWELS:
            i = 2
            while i < n and w[i] not in _VOWELS:
                i += 1
            rv = min(i + 1, n)
        elif w[0] in _VOWELS and w[1] in _VOWELS:
            i = 2
            while i < n and w[i] in _VOWELS:
                i += 1
            rv = min(i + 1, n)
        else:
            rv = min(3, n)
    return r1, r2, rv


def spanish_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w.translate(_ACCENT_MAP)
    r1, r2, rv = _regions(w)

    # ---- step 0: attached pronoun
    for pron in _STEP0_PRON:
        if not w.endswith(pron):
            continue
        stem_end = len(w) - len(pron)
        base = w[:stem_end]
        done = False
        for grp, unaccent in ((_STEP0_A, True), (_STEP0_B, False)):
            for pre in grp:
                if base.endswith(pre) and stem_end - len(pre) >= rv:
                    w = base
                    if unaccent:
                        w = w[: -len(pre)] + _STEP0_UNACCENT[pre]
                    done = True
                    break
            if done:
                break
        if not done and base.endswith("yendo") and stem_end - 5 >= rv:
            if stem_end - 6 >= 0 and base[stem_end - 6] == "u":
                w = base
        break  # pronoun pool: longest match only (no backtracking)

    # re-derive regions? No: Snowball computes p1/p2/pV once on the
    # PRELUDE form and they remain fixed through all steps.

    removed_s1 = False

    def ends_in(word_, suf, region_start):
        return word_.endswith(suf) and len(word_) - len(suf) >= region_start

    # ---- step 1: standard suffix removal (longest match over ALL groups)
    cands = []
    for suf in _S1_DELETE_R2:
        if w.endswith(suf):
            cands.append((len(suf), "del_r2", suf))
            break
    for suf in _S1_ADOR:
        if w.endswith(suf):
            cands.append((len(suf), "ador", suf))
            break
    for suf in ("logías", "logía"):
        if w.endswith(suf):
            cands.append((len(suf), "logia", suf))
            break
    for suf in ("uciones", "ución"):
        if w.endswith(suf):
            cands.append((len(suf), "ucion", suf))
            break
    for suf in ("encias", "encia"):
        if w.endswith(suf):
            cands.append((len(suf), "encia", suf))
            break
    if w.endswith("amente"):
        cands.append((6, "amente", "amente"))
    elif w.endswith("mente"):
        cands.append((5, "mente", "mente"))
    for suf in _S1_IDAD:
        if w.endswith(suf):
            cands.append((len(suf), "idad", suf))
            break
    for suf in _S1_IVA:
        if w.endswith(suf):
            cands.append((len(suf), "iva", suf))
            break
    if cands:
        _, kind, suf = max(cands, key=lambda c: c[0])
        pos = len(w) - len(suf)
        if kind == "del_r2":
            if pos >= r2:
                w = w[:pos]
                removed_s1 = True
        elif kind == "ador":
            if pos >= r2:
                w = w[:pos]
                removed_s1 = True
                if ends_in(w, "ic", r2):
                    w = w[:-2]
        elif kind == "logia":
            if pos >= r2:
                w = w[:pos] + "log"
                removed_s1 = True
        elif kind == "ucion":
            if pos >= r2:
                w = w[:pos] + "u"
                removed_s1 = True
        elif kind == "encia":
            if pos >= r2:
                w = w[:pos] + "ente"
                removed_s1 = True
        elif kind == "amente":
            if pos >= r1:
                w = w[:pos]
                removed_s1 = True
                if ends_in(w, "iv", r2):
                    w = w[:-2]
                    if ends_in(w, "at", r2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if ends_in(w, pre, r2):
                            w = w[:-2]
                            break
        elif kind == "mente":
            if pos >= r2:
                w = w[:pos]
                removed_s1 = True
                for pre in ("ante", "able", "ible"):
                    if ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif kind == "idad":
            if pos >= r2:
                w = w[:pos]
                removed_s1 = True
                for pre in ("abil", "ic", "iv"):
                    if ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif kind == "iva":
            if pos >= r2:
                w = w[:pos]
                removed_s1 = True
                if ends_in(w, "at", r2):
                    w = w[:-2]

    # ---- step 2a (only if step 1 removed nothing): y-verb suffixes
    removed_s2a = False
    if not removed_s1:
        for suf in _S2A:
            if ends_in(w, suf, rv):
                pos = len(w) - len(suf)
                if pos >= 1 and w[pos - 1] == "u":
                    w = w[:pos]
                    removed_s2a = True
                break  # longest match only

        # ---- step 2b (only if 2a removed nothing)
        if not removed_s2a:
            best = None
            for suf in _S2B_GU:
                if ends_in(w, suf, rv):
                    best = ("gu", suf)
                    break
            for suf in _S2B_DELETE:
                if ends_in(w, suf, rv):
                    if best is None or len(suf) > len(best[1]):
                        best = ("del", suf)
                    break
            if best is not None:
                kind, suf = best
                w = w[: len(w) - len(suf)]
                if kind == "gu" and w.endswith("gu"):
                    # drop the u of a preceding gu (u need not be in RV)
                    w = w[:-1]

    # ---- step 3: residual suffix
    for suf in ("os", "a", "o", "á", "í", "ó", "e", "é"):
        if not ends_in(w, suf, rv):
            continue
        pos = len(w) - len(suf)
        w = w[:pos]
        if suf in ("e", "é") and w.endswith("gu") and len(w) - 1 >= rv:
            w = w[:-1]  # the u of gu, itself in RV
        break

    return w.translate(_ACCENT_MAP)
