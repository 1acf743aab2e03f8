"""Composable token-filter registry — the analysis-factory SPI analog.

Re-creates the extension surface of Lucene's TokenFilterFactory SPI
(reference: lucene/core/src/java/org/apache/lucene/analysis/util/
TokenFilterFactory.java + analysis/common factories, branch_8x; SURVEY.md
§2.2, §2.11): an analyzer spec is a JSON-able dict naming the tokenizer
and an ordered filter list; the spec hash is part of index lineage, so a
config change invalidates resume.

A filter is ``(token: str) -> str | None`` (None drops the token, like
StopFilter). Filters run AFTER tokenize+lowercase, applied vocabulary-wise
(once per unique term per batch, memoized per actor) rather than
token-wise — same result, ~100x less work on Zipf text.

Registry: ``stop`` (args: words), ``porter_stem``, ``ascii_folding``
(common Latin-1/Latin-A diacritics, the head of Lucene's
ASCIIFoldingFilter table), ``length`` (args: min,max), ``truncate``
(args: length).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

__all__ = ["build_filter_chain", "FILTER_BUILDERS"]

_FOLD = {}
for src, dst in [
    ("àáâãäåāăą", "a"), ("çćĉċč", "c"), ("ďđ", "d"), ("èéêëēĕėęě", "e"),
    ("ĝğġģ", "g"), ("ĥħ", "h"), ("ìíîïĩīĭįı", "i"), ("ĵ", "j"), ("ķ", "k"),
    ("ĺļľŀł", "l"), ("ñńņňŉ", "n"), ("òóôõöøōŏő", "o"), ("ŕŗř", "r"),
    ("śŝşš", "s"), ("ţťŧ", "t"), ("ùúûüũūŭůűų", "u"), ("ŵ", "w"),
    ("ýÿŷ", "y"), ("źżž", "z"), ("æ", "ae"), ("œ", "oe"), ("ß", "ss"),
    ("þ", "th"), ("ð", "d"),
]:
    for ch in src:
        _FOLD[ch] = dst


def _ascii_fold(token: str) -> str:
    if all(ord(c) < 128 for c in token):
        return token
    return "".join(_FOLD.get(c, c) for c in token)


def _ascii_fold_full(token: str) -> str:
    """Full-table ASCIIFoldingFilter analog: explicit table first (covers
    the non-decomposable cases — ss/ae/oe/th/o-slash/d-stroke), then NFKD
    decomposition with combining marks stripped, matching the breadth of
    Lucene's ~2000-entry generated table for Latin script."""
    if all(ord(c) < 128 for c in token):
        return token
    import unicodedata

    out = []
    for c in token:
        if ord(c) < 128:
            out.append(c)
            continue
        f = _FOLD.get(c)
        if f is not None:
            out.append(f)
            continue
        dec = unicodedata.normalize("NFKD", c)
        kept = "".join(d for d in dec if not unicodedata.combining(d) and ord(d) < 128)
        out.append(kept if kept else c)
    return "".join(out)


def _build_stop(args: dict) -> Callable[[str], Optional[str]]:
    words = frozenset(args.get("words", ()))
    return lambda t: None if t in words else t


def _build_porter(args: dict) -> Callable[[str], Optional[str]]:
    from .porter import porter_stem

    protected = frozenset(args.get("protected", ()))
    if protected:  # KeywordMarkerFilter analog: protected terms skip stemming
        return lambda t: t if t in protected else porter_stem(t)
    return porter_stem


def _build_snowball(args: dict) -> Callable[[str], Optional[str]]:
    """SnowballPorterFilterFactory analog (reference: lucene/analysis/
    common/.../snowball/SnowballPorterFilterFactory.java, branch_8x).
    ``language``: "english"/"porter2" (default), "german", "swedish",
    "french" or "spanish" (the language packs under analysis/; each
    implemented from the published Snowball algorithm). ``protected``
    lists terms exempt from stemming (KeywordMarkerFilter analog)."""
    lang = str(args.get("language", "english")).lower()
    if lang in ("english", "porter2", "en"):
        from .snowball import snowball_stem as stem
    elif lang in ("german", "de"):
        from .german import german_stem as stem
    elif lang in ("swedish", "sv"):
        from .swedish import swedish_stem as stem
    elif lang in ("french", "fr"):
        from .french import french_stem as stem
    elif lang in ("spanish", "es"):
        from .spanish import spanish_stem as stem
    elif lang in ("portuguese", "pt"):
        from .portuguese import portuguese_stem as stem
    elif lang in ("italian", "it"):
        from .italian import italian_stem as stem
    elif lang in ("russian", "ru"):
        from .russian import russian_stem as stem
    elif lang in ("dutch", "nl"):
        from .dutch import dutch_stem as stem
    elif lang in ("norwegian", "no", "nb"):
        from .norwegian import norwegian_stem as stem
    elif lang in ("danish", "da"):
        from .norwegian import danish_stem as stem
    else:
        raise KeyError(f"unknown snowball language {lang!r}")

    protected = frozenset(args.get("protected", ()))
    if protected:
        return lambda t: t if t in protected else stem(t)
    return stem


def _build_length(args: dict) -> Callable[[str], Optional[str]]:
    lo, hi = int(args.get("min", 1)), int(args.get("max", 255))
    return lambda t: t if lo <= len(t) <= hi else None


def _build_truncate(args: dict) -> Callable[[str], Optional[str]]:
    n = int(args.get("length", 10))
    return lambda t: t[:n]


def _build_pattern_replace(args: dict) -> Callable[[str], Optional[str]]:
    """PatternReplaceFilter analog (reference: lucene/analysis/common/.../
    pattern/PatternReplaceFilter.java, branch_8x): regex replace on each
    token; ``all=True`` (replaceAll, the factory default) or first-only.
    A token that becomes empty is dropped (zero-length-term convention —
    the builder never emits empty terms)."""
    import re as _re

    pat = _re.compile(args["pattern"])
    rep = str(args.get("replacement", ""))
    count = 0 if args.get("all", True) else 1

    def f(t: str) -> Optional[str]:
        out = pat.sub(rep, t, count=count)
        return out if out else None

    return f


def _build_trim(args: dict) -> Callable[[str], Optional[str]]:
    """TrimFilter analog (…/miscellaneous/TrimFilter.java, branch_8x):
    strips leading/trailing whitespace (tokens embedding whitespace come
    from synonym/keep lists, not the tokenizer); empty after trim drops."""
    return lambda t: (t.strip() or None)


def _build_reverse(args: dict) -> Callable[[str], Optional[str]]:
    """ReverseStringFilter analog (…/reverse/ReverseStringFilter.java,
    branch_8x) — the leading-wildcard-acceleration building block."""
    return lambda t: t[::-1]


def _build_synonym(args: dict):
    """SynonymGraphFilter analog (reference: lucene/analysis/common/.../
    synonym/SynonymGraphFilter.java, branch_8x), single-token synonyms,
    expand=true semantics: every member of a group maps to ALL members
    (emitted at the same position — posIncr 0 — so expansion terms do not
    count toward doc length, matching discountOverlaps=true). Returns a
    LIST from the filter, which the vocabulary-wise applier expands.
    ``args``: {"groups": [[...], ...]} equivalence classes and/or
    {"map": {term: [replacements...]}} one-way rules."""
    table: Dict[str, List[str]] = {}
    for group in args.get("groups", ()):
        members = list(dict.fromkeys(group))
        for m in members:
            table[m] = members
    for src, dst in (args.get("map") or {}).items():
        table[src] = list(dst) if isinstance(dst, (list, tuple)) else [dst]

    def fn(t: str):
        return table.get(t, t)

    return fn


def _build_keyword_repeat(args: dict):
    """KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter net
    effect (reference: lucene/analysis/common/.../miscellaneous/
    KeywordRepeatFilter.java + RemoveDuplicatesTokenFilter.java,
    branch_8x — the standard chain for indexing BOTH the original and the
    stemmed form at one position): token → unique [original, stem], a
    posInc-0 expansion exactly like synonym lists. ``stemmer``: "porter"
    (default) or any snowball language name."""
    name = str(args.get("stemmer", "porter")).lower()
    if name in ("porter", "porter_stem"):
        inner = _build_porter({})
    else:
        inner = _build_snowball({"language": name})

    def fn(t: str):
        s = inner(t)
        return t if (s is None or s == t) else [t, s]

    return fn


def _build_edge_ngram(args: dict):
    """EdgeNGramTokenFilter analog (reference: lucene/analysis/common/.../
    ngram/EdgeNGramTokenFilter.java, branch_8x): each token expands to its
    prefixes of length min_gram..max_gram. Lucene 8 emits all grams of a
    token at the SAME position (first gram takes the original posIncr,
    later grams posIncr 0), so the list-expansion semantics of this
    registry apply exactly: grams share the token's freq and the token
    counts once toward dl (discountOverlaps). Tokens shorter than
    ``min_gram`` are dropped unless ``preserve_original``; tokens longer
    than ``max_gram`` additionally keep their full form when
    ``preserve_original`` (keepShortTerm/keepLongTerm in 8.x)."""
    lo = int(args.get("min_gram", 1))
    hi = int(args.get("max_gram", 2))
    preserve = bool(args.get("preserve_original", False))
    if not (1 <= lo <= hi):
        raise ValueError("edge_ngram needs 1 <= min_gram <= max_gram")

    def fn(t: str):
        if len(t) < lo:
            return t if preserve else None
        grams = [t[:g] for g in range(lo, min(hi, len(t)) + 1)]
        if preserve and len(t) > hi:
            grams.append(t)
        return grams if len(grams) > 1 else grams[0]

    return fn


def _build_ngram(args: dict):
    """NGramTokenFilter analog (reference: lucene/analysis/common/.../
    ngram/NGramTokenFilter.java, branch_8x): each token expands to ALL its
    substrings of length min_gram..max_gram, emitted at the token's
    position (posIncr-0 list semantics, same as edge_ngram: grams share
    the token's freq, the token counts once toward dl). Tokens shorter
    than min_gram drop unless ``preserve_original``."""
    lo = int(args.get("min_gram", 1))
    hi = int(args.get("max_gram", 2))
    preserve = bool(args.get("preserve_original", False))
    if not (1 <= lo <= hi):
        raise ValueError("ngram needs 1 <= min_gram <= max_gram")

    def fn(t: str):
        n = len(t)
        if n < lo:
            return t if preserve else None
        grams = [
            t[i : i + g]
            for g in range(lo, min(hi, n) + 1)
            for i in range(n - g + 1)
        ]
        if preserve and n > hi:
            grams.append(t)
        return grams if len(grams) > 1 else grams[0]

    return fn


def _build_word_delimiter(args: dict):
    """WordDelimiterGraphFilter analog (reference: lucene/analysis/common/
    .../miscellaneous/WordDelimiterGraphFilter.java, branch_8x), operating
    post-lowercase so splitOnCaseChange is unavailable (documented
    deviation — pair with a whitespace-ish source if case-split matters).
    Splits a token into alpha and digit runs at non-alphanumerics and
    (optionally) letter<->digit boundaries; subwords emit at the original
    token's position (posIncr-0 list semantics — the graph's stacked
    positions collapse, same approximation as edge_ngram/synonym).

    args: generate_word_parts (default True), generate_number_parts
    (default True), split_on_numerics (default True), catenate_words,
    catenate_numbers, catenate_all (defaults False), preserve_original
    (default False), stem_english_possessive (default True)."""
    gen_words = bool(args.get("generate_word_parts", True))
    gen_nums = bool(args.get("generate_number_parts", True))
    split_num = bool(args.get("split_on_numerics", True))
    cat_words = bool(args.get("catenate_words", False))
    cat_nums = bool(args.get("catenate_numbers", False))
    cat_all = bool(args.get("catenate_all", False))
    preserve = bool(args.get("preserve_original", False))
    possessive = bool(args.get("stem_english_possessive", True))

    def fn(t: str):
        orig = t
        if possessive and t.endswith("'s"):
            t = t[:-2]
        # split into maximal alnum runs, then optionally at digit boundaries
        runs: List[str] = []
        cur = []
        kinds = []  # parallel: True if digit run

        def flush():
            if cur:
                runs.append("".join(cur))
                kinds.append(cur[0].isdigit())

        prev_digit = None
        for ch in t:
            if not ch.isalnum():
                flush()
                cur, prev_digit = [], None
                continue
            d = ch.isdigit()
            if cur and split_num and d != prev_digit:
                flush()
                cur = []
            cur.append(ch)
            prev_digit = d
        flush()

        out: List[str] = []
        if len(runs) <= 1 and runs and runs[0] == orig:
            return orig  # nothing to delimit
        for r, is_num in zip(runs, kinds):
            if (is_num and gen_nums) or (not is_num and gen_words):
                out.append(r)
        if cat_words:
            wcat = "".join(r for r, k in zip(runs, kinds) if not k)
            if wcat:
                out.append(wcat)
        if cat_nums:
            ncat = "".join(r for r, k in zip(runs, kinds) if k)
            if ncat:
                out.append(ncat)
        if cat_all:
            acat = "".join(runs)
            if acat:
                out.append(acat)
        if preserve:
            out.append(orig)
        out = list(dict.fromkeys(out))
        if not out:
            return None
        return out if len(out) > 1 else out[0]

    return fn


def _build_keep(args: dict) -> Callable[[str], Optional[str]]:
    """KeepWordFilter analog: drop every token NOT in the word set."""
    words = frozenset(args.get("words", ()))
    return lambda t: t if t in words else None


_SOUNDEX_CODE = {}
for chars, code in [("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                    ("l", "4"), ("mn", "5"), ("r", "6")]:
    for ch in chars:
        _SOUNDEX_CODE[ch] = code


def _soundex(token: str) -> str:
    """American Soundex (the algorithm behind lucene-analysis-phonetic's
    SoundexFilter via commons-codec, branch_8x): first letter kept, the
    rest coded 1-6, adjacent duplicate codes collapsed, h/w transparent
    between duplicates, vowels reset the run, padded/truncated to 4."""
    t = [c for c in token.lower() if "a" <= c <= "z"]
    if not t:
        return token
    out = [t[0].upper()]
    prev = _SOUNDEX_CODE.get(t[0], "")
    for c in t[1:]:
        code = _SOUNDEX_CODE.get(c)
        if code:
            if code != prev:
                out.append(code)
                prev = code
        elif c not in "hw":
            # vowels (and y) separate duplicate codes
            prev = ""
        if len(out) == 4:
            break
    return ("".join(out) + "000")[:4]


def _build_phonetic(args: dict) -> Callable[[str], Optional[str]]:
    """PhoneticFilter(Factory) analog (lucene/analysis/phonetic, branch_8x):
    encoder ∈ soundex | metaphone | refined_soundex; ``inject=True`` emits
    BOTH the original token and its code (Lucene's default — the code
    rides at the same position, here as a synonym-style expansion),
    ``inject=False`` (our default, back-compat) replaces the token."""
    enc_name = args.get("encoder", "soundex")
    if enc_name == "soundex":
        enc = _soundex
    elif enc_name == "metaphone":
        from .phonetic import metaphone

        max_len = int(args.get("max_code_len", 4))
        enc = lambda t: metaphone(t, max_len)  # noqa: E731
    elif enc_name == "refined_soundex":
        from .phonetic import refined_soundex

        enc = refined_soundex
    else:
        raise ValueError(
            f"phonetic encoder {enc_name!r} not supported "
            "(soundex | metaphone | refined_soundex)"
        )
    if not args.get("inject", False):
        return enc

    def inject(t: str):
        c = enc(t)
        return [t, c] if c != t else t

    return inject


def _icu_fold(token: str) -> str:
    """ICUFoldingFilter analog (reference: lucene/analysis/icu/.../
    ICUFoldingFilter.java, branch_8x — UTR#30 folding ≈ NFKC + case fold
    + diacritic removal): explicit fold table (the non-decomposable
    cases), then NFKD with combining marks stripped, case-folded, NFKC
    re-composed. A superset of ascii_folding: non-Latin scripts keep
    their (normalized, case-folded) form instead of being dropped."""
    import unicodedata

    if all(ord(c) < 128 for c in token):
        return token.casefold()
    out = []
    for c in token:
        if ord(c) < 128:
            out.append(c)
            continue
        f = _FOLD.get(c)
        if f is not None:
            out.append(f)
            continue
        dec = unicodedata.normalize("NFKD", c)
        kept = "".join(d for d in dec if not unicodedata.combining(d))
        out.append(kept if kept else c)
    return unicodedata.normalize("NFKC", "".join(out)).casefold()


# Default_Ignorable_Code_Points commonly seen in web text — NFKC_CF maps
# these to nothing (the full property set is larger; these are the ones
# that actually occur in crawled corpora: soft hyphen, zero-width
# space/joiners, BOM/word-joiner, bidi marks).
_DEFAULT_IGNORABLES = dict.fromkeys(
    (0x00AD, 0x200B, 0x200C, 0x200D, 0x200E, 0x200F, 0x2060, 0xFEFF)
)


def _icu_normalize(token: str) -> str:
    """ICUNormalizer2Filter analog, default mode nfkc_cf (reference:
    lucene/analysis/icu/.../ICUNormalizer2Filter.java + ICU
    Normalizer2.getNFKCCasefoldInstance, branch_8x): NFKC_Casefold =
    NFKC(CaseFold(NFKD(x))) with Default_Ignorable_Code_Points removed.
    Python's unicodedata has no one-shot nfkc_cf, so this applies the
    defining composition (NFKC → casefold → NFKC — the second pass
    re-composes sequences the casefold expansion decomposed) plus the
    web-text ignorable strip; unlike icu_folding it KEEPS diacritics
    (normalization, not folding)."""
    import unicodedata

    if token.isascii():
        return token.casefold()
    t = token.translate(_DEFAULT_IGNORABLES)
    return unicodedata.normalize(
        "NFKC", unicodedata.normalize("NFKC", t).casefold()
    )


def _build_cjk_width(args: dict):
    from .cjk import cjk_width_fold

    return cjk_width_fold


def _build_arabic_normalization(args: dict):
    from .arabic import arabic_normalize

    return arabic_normalize


def _build_arabic_stem(args: dict):
    from .arabic import arabic_stem

    return arabic_stem


def _build_persian_normalization(args: dict):
    from .arabic import persian_normalize

    return persian_normalize


# GreekLowerCaseFilter analog (reference: lucene/analysis/common/src/java/
# org/apache/lucene/analysis/el/GreekLowerCaseFilter.java, branch_8x):
# lowercase + strip tonos/dialytika on vowels + fold final sigma, per the
# published switch table; everything else is plain toLowerCase.
_GREEK_FOLD = {}
for _tgt, _srcs in (
    ("α", "Άά"), ("ε", "Έέ"), ("η", "Ήή"), ("ι", "ΊίΪϊΐ"),
    ("ο", "Όό"), ("υ", "ΎύΫϋΰ"), ("ω", "Ώώ"), ("σ", "ς"),
):
    for _c in _srcs:
        _GREEK_FOLD[_c] = _tgt


def _greek_lower(token: str) -> str:
    out = []
    for ch in token.lower():
        out.append(_GREEK_FOLD.get(ch, ch))
    return "".join(out)


# TurkishLowerCaseFilter analog (reference: lucene/analysis/common/src/
# java/org/apache/lucene/analysis/tr/TurkishLowerCaseFilter.java,
# branch_8x): İ→i, I→ı unless followed by combining dot above (which is
# consumed: I+U+0307→i); other chars plain toLowerCase.
_COMBINING_DOT_ABOVE = "̇"


def _turkish_lower(token: str) -> str:
    out = []
    i, n = 0, len(token)
    while i < n:
        ch = token[i]
        if ch == "İ":  # LATIN CAPITAL LETTER I WITH DOT ABOVE
            out.append("i")
        elif ch == "I":
            if i + 1 < n and token[i + 1] == _COMBINING_DOT_ABOVE:
                out.append("i")
                i += 1  # consume the dot
            else:
                out.append("ı")  # dotless ı
        else:
            out.append(ch.lower())
        i += 1
    return "".join(out)


FILTER_BUILDERS: Dict[str, Callable[[dict], Callable[[str], Optional[str]]]] = {
    "icu_folding": lambda args: _icu_fold,
    "icu_normalizer": lambda args: _icu_normalize,
    "cjk_width": _build_cjk_width,
    "arabic_normalization": _build_arabic_normalization,
    "arabic_stem": _build_arabic_stem,
    "persian_normalization": _build_persian_normalization,
    "greek_lowercase": lambda args: _greek_lower,
    "turkish_lowercase": lambda args: _turkish_lower,
    "phonetic": _build_phonetic,
    "stop": _build_stop,
    "porter_stem": _build_porter,
    "snowball_stem": _build_snowball,
    "ascii_folding": lambda args: (
        _ascii_fold_full if args.get("full") else _ascii_fold
    ),
    "length": _build_length,
    "truncate": _build_truncate,
    "pattern_replace": _build_pattern_replace,
    "trim": _build_trim,
    "reverse_string": _build_reverse,
    "synonym": _build_synonym,
    "keyword_repeat": _build_keyword_repeat,
    "edge_ngram": _build_edge_ngram,
    "ngram": _build_ngram,
    "word_delimiter": _build_word_delimiter,
    "keep": _build_keep,
}


def build_filter_chain(spec_filters: List) -> Optional[Callable[[str], Optional[str]]]:
    """Compose the post-lowercase filters of an analyzer spec into one
    ``token -> token|None`` callable (None once any stage drops).

    Spec entries are either a bare name or ``{"name": ..., **args}``;
    ``lowercase`` is handled by the tokenizer fast path and skipped here.
    Unknown names raise (a misspelled spec must not silently no-op)."""
    fns = []
    for entry in spec_filters:
        if isinstance(entry, str):
            name, args = entry, {}
        else:
            entry = dict(entry)
            name, args = entry.pop("name"), entry
        if name == "lowercase":
            continue
        if name in ("shingle", "cjk_bigram"):
            # sequence filters, applied at tokenize time (stages/analyzer.py);
            # at query time a shingle ("a b") or CJK bigram ("日本") IS the
            # term, so identity here
            continue
        if name not in FILTER_BUILDERS:
            raise KeyError(f"unknown token filter: {name!r}")
        fns.append(FILTER_BUILDERS[name](args))
    if not fns:
        return None

    def chain(token: str):
        """token -> None (dropped) | str | list[str] (synonym expansion).
        A list fans the remaining stages out over every expansion."""
        out = [token]
        for fn in fns:
            nxt: List[str] = []
            for t in out:
                r = fn(t)
                if r is None or r == "":
                    continue
                if isinstance(r, list):
                    nxt.extend(x for x in r if x)
                else:
                    nxt.append(r)
            out = list(dict.fromkeys(nxt))  # stable-dedup across expansions
            if not out:
                return None
        return out[0] if len(out) == 1 else out

    return chain
