"""Portuguese Snowball stemmer — implemented from the published Snowball
"portuguese" algorithm description (snowballstem.org, public; the analog
of lucene/analysis/common/src/java/org/tartarus/snowball/ext/
PortugueseStemmer.java, branch_8x, generated from the same public .sbl
source; SURVEY.md §2.2 language packs, round-4 verdict "What's missing"
item 1 — pt is the next web-share language after fr/es).

Control flow: prelude rewrites the nasal vowels ã→a~ and õ→o~ so the
tilde acts as a consonant; R1/R2/RV are computed ONCE on the prelude
form and stay fixed (Snowball cursor-limit semantics — deletions only
shorten the tail). Step 1 picks the longest suffix across ALL groups,
then tests that one suffix's region condition (no backtracking to a
shorter suffix). Step 2 (verb suffixes in RV) runs only when step 1
changed nothing; step 3 (c-preceded i) only when step 1 or 2 changed
the word; step 4 (residual vowel) only when NEITHER did; step 5
(final e/é/ê + gu/ci undoubling, ç→c) always runs. Postlude restores
ã/õ — Portuguese keeps all other accents (unlike the Spanish pack's
final unaccent).
"""

from __future__ import annotations

__all__ = ["portuguese_stem"]

# prelude form: ã/õ are already rewritten, so the vowel set excludes them
_VOWELS = frozenset("aeiouáéíóúâêô")

# ---- step 1 groups (prelude spellings: ação→aça~o etc.)
_S1_DELETE_R2 = sorted(
    ["eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
     "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
     "amento", "amentos", "imento", "imentos", "adora", "ador",
     "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância"],
    key=len, reverse=True,
)
_S1_LOGIA = ("logias", "logia")
_S1_UCAO = ("uço~es", "uça~o")
_S1_ENCIA = ("ências", "ência")
_S1_IDADE = ("idades", "idade")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

# ---- step 2: verb suffixes (delete when the suffix lies in RV)
_S2_VERB = sorted(
    ["ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
     "era", "irá", "ava", "asse", "esse", "isse", "aste", "este",
     "iste", "ei", "arei", "erei", "irei", "am", "iam", "ariam",
     "eriam", "iriam", "aram", "eram", "iram", "avam", "em", "arem",
     "erem", "irem", "assem", "essem", "issem", "ado", "ido", "ando",
     "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as",
     "adas", "idas", "ias", "arias", "erias", "irias", "arás", "aras",
     "erás", "eras", "irás", "avas", "es", "ardes", "erdes", "irdes",
     "ares", "eres", "ires", "asses", "esses", "isses", "astes",
     "estes", "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis",
     "iríeis", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
     "ásseis", "ésseis", "ísseis", "áveis", "ados", "idos", "ámos",
     "amos", "íamos", "aríamos", "eríamos", "iríamos", "áramos",
     "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
     "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
     "ermos", "irmos", "eu", "iu", "ou", "ira", "iras"],
    key=len, reverse=True,
)


def _regions(w: str):
    """(r1, r2, rv) start offsets per the Snowball definitions, on the
    prelude form ('~' counts as a consonant)."""
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
    # RV: if the second letter is a consonant, RV is after the next
    # following vowel; if the first two letters are vowels, RV is after
    # the next consonant; otherwise (consonant-vowel) RV is after the
    # third letter. End of word if not found.
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


def portuguese_stem(word: str) -> str:
    w = word.replace("ã", "a~").replace("õ", "o~")
    if len(w) <= 2:
        return w.replace("a~", "ã").replace("o~", "õ")
    r1, r2, rv = _regions(w)

    def ends_in(word_, suf, region_start):
        return word_.endswith(suf) and len(word_) - len(suf) >= region_start

    altered = False

    # ---- step 1: standard suffix removal (longest match over ALL groups)
    cands = []
    for pool, kind in (
        (_S1_DELETE_R2, "del_r2"),
        (_S1_LOGIA, "logia"),
        (_S1_UCAO, "ucao"),
        (_S1_ENCIA, "encia"),
        (_S1_IDADE, "idade"),
        (_S1_IVA, "iva"),
    ):
        for suf in pool:
            if w.endswith(suf):
                cands.append((len(suf), kind, suf))
                break
    if w.endswith("amente"):
        cands.append((6, "amente", "amente"))
    elif w.endswith("mente"):
        cands.append((5, "mente", "mente"))
    for suf in ("iras", "ira"):
        if w.endswith(suf):
            cands.append((len(suf), "ira", suf))
            break
    if cands:
        _, kind, suf = max(cands, key=lambda c: c[0])
        pos = len(w) - len(suf)
        if kind == "del_r2":
            if pos >= r2:
                w = w[:pos]
                altered = True
        elif kind == "logia":
            if pos >= r2:
                w = w[:pos] + "log"
                altered = True
        elif kind == "ucao":
            if pos >= r2:
                w = w[:pos] + "u"
                altered = True
        elif kind == "encia":
            if pos >= r2:
                w = w[:pos] + "ente"
                altered = True
        elif kind == "amente":
            if pos >= r1:
                w = w[:pos]
                altered = True
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
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif kind == "idade":
            if pos >= r2:
                w = w[:pos]
                altered = True
                for pre in ("abil", "ic", "iv"):
                    if ends_in(w, pre, r2):
                        w = w[: -len(pre)]
                        break
        elif kind == "iva":
            if pos >= r2:
                w = w[:pos]
                altered = True
                if ends_in(w, "at", r2):
                    w = w[:-2]
        elif kind == "ira":
            # replace with "ir" when in RV and preceded by 'e'
            if pos >= rv and pos >= 1 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
                altered = True

    # ---- step 2: verb suffixes (only if step 1 changed nothing)
    if not altered:
        for suf in _S2_VERB:
            if w.endswith(suf):
                if len(w) - len(suf) >= rv:
                    w = w[: len(w) - len(suf)]
                    altered = True
                break  # longest match only, no backtracking

    # ---- step 3: c-preceded final i (only if step 1 or 2 altered)
    if altered:
        if ends_in(w, "i", rv) and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        # ---- step 4: residual suffix (only if neither step altered)
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if ends_in(w, suf, rv):
                w = w[: len(w) - len(suf)]
                break

    # ---- step 5: always
    dropped_e = False
    for suf in ("e", "é", "ê"):
        if ends_in(w, suf, rv):
            w = w[:-1]
            dropped_e = True
            break
    if dropped_e:
        # the undoubled u/i must itself be in RV
        if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
