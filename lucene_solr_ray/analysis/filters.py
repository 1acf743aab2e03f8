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


def _build_stop(args: dict) -> Callable[[str], Optional[str]]:
    words = frozenset(args.get("words", ()))
    return lambda t: None if t in words else t


def _build_porter(args: dict) -> Callable[[str], Optional[str]]:
    from .porter import porter_stem

    return porter_stem


def _build_length(args: dict) -> Callable[[str], Optional[str]]:
    lo, hi = int(args.get("min", 1)), int(args.get("max", 255))
    return lambda t: t if lo <= len(t) <= hi else None


def _build_truncate(args: dict) -> Callable[[str], Optional[str]]:
    n = int(args.get("length", 10))
    return lambda t: t[:n]


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


FILTER_BUILDERS: Dict[str, Callable[[dict], Callable[[str], Optional[str]]]] = {
    "stop": _build_stop,
    "porter_stem": _build_porter,
    "ascii_folding": lambda args: _ascii_fold,
    "length": _build_length,
    "truncate": _build_truncate,
    "synonym": _build_synonym,
    "edge_ngram": _build_edge_ngram,
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
        if name == "shingle":
            # sequence filter, applied at tokenize time (stages/analyzer.py);
            # at query time a shingle IS the term ("a b"), so identity here
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
