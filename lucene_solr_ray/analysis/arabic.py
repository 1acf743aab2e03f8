"""Arabic + Persian normalization and the Arabic light10 stemmer —
implemented from the published algorithm (Larkey, Ballesteros & Connell,
"Light Stemming for Arabic Information Retrieval", 2002/2007; the analog
of lucene/analysis/common/src/java/org/apache/lucene/analysis/ar/
ArabicNormalizer.java + ArabicStemmer.java and .../fa/PersianNormalizer
.java, branch_8x; SURVEY.md §2.2 filter packs — non-Latin normalization,
round-4 verdict "What's missing" item 2).

Normalization: strip tatweel and the harakat diacritics, fold the
hamza'd/madda alef forms to bare alef, dotless yeh → yeh, teh marbuta →
heh. Stemming (after normalization): remove ONE prefix (longest listed
form whose removal leaves ≥2 letters; the bare و conjunction only from
words of ≥4 letters), then iterate the suffix list in published order,
stripping each match that leaves ≥2 letters.

Persian normalization folds the Farsi yeh/keheh letterforms to their
Arabic counterparts, heh-with-yeh / heh-goal to heh, drops the hamza
mark, and maps zero-width non-joiner to a plain space (the
PersianCharFilter analog — at token level ZWNJ is simply dropped since
tokenization already happened).
"""

from __future__ import annotations

__all__ = ["arabic_normalize", "arabic_stem", "persian_normalize"]

_TATWEEL = "ـ"
_HARAKAT = "ًٌٍَُِّْ"  # fathatan…sukun
_AR_FOLD = str.maketrans(
    {
        "آ": "ا",  # alef madda → alef
        "أ": "ا",  # alef hamza above → alef
        "إ": "ا",  # alef hamza below → alef
        "ى": "ي",  # dotless yeh → yeh
        "ة": "ه",  # teh marbuta → heh
        **{c: None for c in _TATWEEL + _HARAKAT},
    }
)


def arabic_normalize(token: str) -> str:
    return token.translate(_AR_FOLD)


# prefix list in the published order (وال before و is irrelevant — ال is
# tried first and never overlaps; the one-char و has its own length gate)
_AR_PREFIXES = ("ال",            # ال
                "وال",      # وال
                "بال",      # بال
                "كال",      # كال
                "فال",      # فال
                "لل",            # لل
                "و")                  # و
_AR_SUFFIXES = ("ها",            # ها
                "ان",            # ان
                "ات",            # ات
                "ون",            # ون
                "ين",            # ين
                "يه",            # يه
                "ية",            # ية
                "ه",                  # ه
                "ة",                  # ة
                "ي")                  # ي


def arabic_stem(token: str) -> str:
    w = token
    for pre in _AR_PREFIXES:
        if len(pre) == 1:
            if len(w) < 4:
                continue
        elif len(w) < len(pre) + 2:
            continue
        if w.startswith(pre):
            w = w[len(pre):]
            break  # at most one prefix
    for suf in _AR_SUFFIXES:
        if len(w) >= len(suf) + 2 and w.endswith(suf):
            w = w[: len(w) - len(suf)]
    return w


_FA_FOLD = str.maketrans(
    {
        "ی": "ي",  # farsi yeh → yeh
        "ے": "ي",  # yeh barree → yeh
        "ک": "ك",  # keheh → kaf
        "ۀ": "ه",  # heh with yeh above → heh
        "ہ": "ه",  # heh goal → heh
        "ٔ": None,      # hamza above (combining) removed
        "‌": None,      # ZWNJ dropped (post-tokenization)
    }
)


def persian_normalize(token: str) -> str:
    return token.translate(_FA_FOLD)
