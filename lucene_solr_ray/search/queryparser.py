"""Classic Lucene query-string parser → engine query tree.

Re-creates the user-facing grammar of Lucene's classic QueryParser
(reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/
classic/QueryParser.jj ~500 LoC + QueryParserBase.java ~1,000 LoC,
branch_8x; SURVEY.md §3.2 step 2 "QueryComponent.prepare: parse query
(classic parser JavaCC grammar)") as a hand-rolled lexer + recursive
descent parser producing this engine's query-spec dicts:

  ``jakarta apache``          → OR of two terms (default operator OR)
  ``+jakarta -solr lucene``   → bool MUST / MUST_NOT / SHOULD
  ``a AND b``, ``a && b``     → both clauses MUST (addClause semantics)
  ``a OR b``, ``NOT a``, ``!a``
  ``"ray data"``              → PhraseQuery; ``"ray data"~2`` sloppy
  ``pre*``                    → PrefixQuery; ``wi*rd`` / ``w?rd`` wildcard
  ``/r[ae]y/``                → RegexpQuery (pattern taken verbatim)
  ``roam~`` / ``roam~1``      → FuzzyQuery (engine: Lev ≤2, prefix 1)
  ``term^2.5``, ``(...)^2``, ``"..."^2`` → BoostQuery wrapper
  ``(a OR b) AND c``          → nested BooleanQuery trees
  ``[a TO b]`` / ``{a TO b}`` → TermRangeQuery (incl/excl, ``*`` open)
  ``text:term``               → field prefix (single-field engine: only
                                the indexed field name is accepted)

Boolean-occur resolution is a faithful transcription of
``QueryParserBase.addClause`` with the default operator (OR): ``AND``
promotes the *preceding* clause to MUST unless it is prohibited, ``+``
forces MUST, ``-``/``NOT``/``!`` force MUST_NOT, everything else is
SHOULD. ``a AND b OR c`` therefore parses — exactly like Lucene — to
``+a +b c``, not to an algebraic precedence tree.

The parser emits RAW (un-analyzed) leaf terms; ``search()``'s prepare
step runs every leaf through the index's analyzer chain (and lowercases
patterns), so parsed queries hit the same normalization path as
hand-built trees.
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple


class QueryParseError(ValueError):
    pass


# occur markers (BooleanClause.Occur)
_SHOULD, _MUST, _MUST_NOT = "should", "must", "must_not"
# conj / mods states (QueryParser.jj token classes)
_CONJ_NONE, _CONJ_AND, _CONJ_OR = 0, 1, 2
_MOD_NONE, _MOD_REQ, _MOD_NOT = 0, 1, 2

_LEX = re.compile(
    r"""
  (?P<ws>\s+)
| (?P<lparen>\()
| (?P<rparen>\))
| (?P<and>AND(?![^\s()"^\\])|&&)
| (?P<or>OR(?![^\s()"^\\])|\|\|)
| (?P<not>NOT(?![^\s()"^\\])|!)
| (?P<plus>\+)
| (?P<minus>-)
| (?P<range>(?P<rob>[\[\{])\s*(?P<rlo>[^\s\]\}]+)\s+TO\s+(?P<rhi>[^\s\]\}]+)\s*(?P<rcb>[\]\}])(?:\^(?P<rgb>\d+(?:\.\d+)?))?)
| (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?)
| (?P<regexp>/(?P<rx>(?:[^/\\]|\\.)*)/(?:\^(?P<rboost>\d+(?:\.\d+)?))?)
| (?P<boost>\^(?P<gboost>\d+(?:\.\d+)?))
| (?P<term>(?:[^\s()"^\\\[\{]|\\.)+)
""",
    re.VERBOSE,
)

# a term token, split into body / fuzzy suffix / boost suffix
_TERM_SUFFIX = re.compile(
    r"^(?P<body>.*?)(?:(?<!\\)~(?P<edits>\d+)?)?(?:(?<!\\)\^(?P<boost>\d+(?:\.\d+)?))?$"
)
_UNESCAPED_WILD = re.compile(r"(?<!\\)[*?]")
_TRAILING_PREFIX = re.compile(r"^(?P<stem>(?:[^*?\\]|\\.)+)\*$")


def _tokens(q: str) -> List[Tuple[str, dict]]:
    out: List[Tuple[str, dict]] = []
    pos = 0
    while pos < len(q):
        m = _LEX.match(q, pos)
        if m is None:
            raise QueryParseError(f"cannot lex query at offset {pos}: {q[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.groupdict()))
    return out


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _classify_term(tok: dict, field: str) -> Tuple[dict, Optional[float]]:
    """One bare term token → (leaf node, boost|None). Wildcard/prefix/
    fuzzy detection matches QueryParserBase.handleBareTokenQuery: unescaped
    ``*``/``?`` → wildcard (single trailing ``*`` → PrefixQuery), ``~`` →
    fuzzy (``~0`` degenerates to a TermQuery, like maxEdits=0)."""
    raw = tok["term"]
    m = _TERM_SUFFIX.match(raw)
    body = m.group("body")
    edits = m.group("edits")
    boost = float(m.group("boost")) if m.group("boost") else None
    fuzzy = raw[len(body) :].startswith("~") if body != raw else False
    if ":" in body.replace("\\:", ""):
        fld, _, rest = body.partition(":")
        if _unescape(fld) != field:
            raise QueryParseError(
                f"unknown field {fld!r} (index has a single field {field!r})"
            )
        body = rest
    if not body:
        raise QueryParseError(f"empty term in token {raw!r}")
    if fuzzy and edits != "0":
        # FuzzyQuery maxEdits: bare ``~`` = defaultMaxEdits 2, ``~N``
        # clamped to LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE (2)
        # (reference: QueryParserBase#handleBareFuzzy + FuzzyQuery ctor,
        # branch_8x); carried in the node and honored at expansion time
        me = 2 if edits is None else min(int(edits), 2)
        return {"kind": "fuzzy", "terms": [_unescape(body)], "max_edits": me}, boost
    if _UNESCAPED_WILD.search(body):
        pm = _TRAILING_PREFIX.match(body)
        if pm and not _UNESCAPED_WILD.search(pm.group("stem")):
            return {"kind": "prefix", "terms": [_unescape(pm.group("stem"))]}, boost
        return {"kind": "wildcard", "terms": [_unescape(body)]}, boost
    return {"kind": "term", "terms": [_unescape(body)]}, boost


def _add_clause(clauses: List[Tuple[str, dict]], conj: int, mods: int, q: Optional[dict]) -> None:
    """QueryParserBase.addClause, default operator OR (branch_8x)."""
    if clauses and conj == _CONJ_AND:
        occ, prev = clauses[-1]
        if occ != _MUST_NOT:
            clauses[-1] = (_MUST, prev)
    if q is None:
        return
    prohibited = mods == _MOD_NOT
    required = mods == _MOD_REQ or (conj == _CONJ_AND and not prohibited)
    if prohibited:
        clauses.append((_MUST_NOT, q))
    elif required:
        clauses.append((_MUST, q))
    else:
        clauses.append((_SHOULD, q))


def _finish(clauses: List[Tuple[str, dict]]) -> dict:
    if not clauses:
        raise QueryParseError("query has no clauses")
    if len(clauses) == 1 and clauses[0][0] == _SHOULD:
        # single optional clause: scores identically to the bare query and
        # keeps term/and/or queries on the WAND-eligible fast path
        return clauses[0][1]
    node: dict = {"kind": "bool"}
    for occ, q in clauses:
        node.setdefault(occ, []).append(q)
    return node


def _with_boost(node: dict, boost: Optional[float]) -> dict:
    if boost is not None and boost != 1.0:
        node = dict(node)
        node["boost"] = float(node.get("boost", 1.0)) * boost
    return node


def _parse(tokens: List[Tuple[str, dict]], pos: int, field: str, depth: int) -> Tuple[dict, int]:
    """Parse one Query production; returns (node, next_pos). ``depth`` > 0
    means inside parentheses (stop at the matching rparen)."""
    clauses: List[Tuple[str, dict]] = []
    conj, mods = _CONJ_NONE, _MOD_NONE
    pending_field: Optional[str] = None

    def fieldcheck(name: str) -> None:
        if _unescape(name) != field:
            raise QueryParseError(
                f"unknown field {name!r} (index has a single field {field!r})"
            )

    while pos < len(tokens):
        kind, tok = tokens[pos]
        if kind == "rparen":
            if depth == 0:
                raise QueryParseError("unbalanced ')'")
            return _finish(clauses), pos
        if kind == "and":
            conj = _CONJ_AND
        elif kind == "or":
            conj = _CONJ_OR
        elif kind in ("not",):
            mods = _MOD_NOT
        elif kind == "minus":
            mods = _MOD_NOT
        elif kind == "plus":
            mods = _MOD_REQ
        elif kind == "lparen":
            sub, pos = _parse(tokens, pos + 1, field, depth + 1)
            if pos >= len(tokens) or tokens[pos][0] != "rparen":
                raise QueryParseError("unbalanced '('")
            boost = None
            if pos + 1 < len(tokens) and tokens[pos + 1][0] == "boost":
                boost = float(tokens[pos + 1][1]["gboost"])
                pos += 1
            _add_clause(clauses, conj, mods, _with_boost(sub, boost))
            conj, mods, pending_field = _CONJ_NONE, _MOD_NONE, None
        elif kind == "phrase":
            if pending_field is not None:
                fieldcheck(pending_field)
                pending_field = None
            words = tok["ph"].split()
            if not words:
                node: Optional[dict] = None  # analyzer-empty phrase → null query
            elif len(words) == 1:
                node = {"kind": "term", "terms": [words[0]]}
            else:
                node = {"kind": "phrase", "terms": words}
                if tok["slop"]:
                    node["slop"] = int(tok["slop"])
            if node is not None and tok["pboost"]:
                node = _with_boost(node, float(tok["pboost"]))
            _add_clause(clauses, conj, mods, node)
            conj, mods = _CONJ_NONE, _MOD_NONE
        elif kind == "range":
            # TermRangeQuery syntax: [a TO b] inclusive, {a TO b} exclusive,
            # * = open bound (QueryParser.jj RangeQuery production)
            if pending_field is not None:
                fieldcheck(pending_field)
                pending_field = None
            node = {
                "kind": "term_range",
                "lo": None if tok["rlo"] == "*" else _unescape(tok["rlo"]),
                "hi": None if tok["rhi"] == "*" else _unescape(tok["rhi"]),
                "lo_inc": tok["rob"] == "[",
                "hi_inc": tok["rcb"] == "]",
            }
            if tok["rgb"]:
                node = _with_boost(node, float(tok["rgb"]))
            _add_clause(clauses, conj, mods, node)
            conj, mods = _CONJ_NONE, _MOD_NONE
        elif kind == "regexp":
            if pending_field is not None:
                fieldcheck(pending_field)
                pending_field = None
            node = {"kind": "regexp", "terms": [tok["rx"].replace("\\/", "/")]}
            if tok["rboost"]:
                node = _with_boost(node, float(tok["rboost"]))
            _add_clause(clauses, conj, mods, node)
            conj, mods = _CONJ_NONE, _MOD_NONE
        elif kind == "term":
            # ``text:`` immediately before a phrase/regexp/group: field prefix
            if (
                tok["term"].endswith(":")
                and pos + 1 < len(tokens)
                and tokens[pos + 1][0] in ("phrase", "regexp", "range", "lparen")
            ):
                pending_field = tok["term"][:-1]
                if tokens[pos + 1][0] == "lparen":
                    fieldcheck(pending_field)  # field applies to whole group
                    pending_field = None
                pos += 1
                continue
            node, boost = _classify_term(tok, field)
            _add_clause(clauses, conj, mods, _with_boost(node, boost))
            conj, mods = _CONJ_NONE, _MOD_NONE
        elif kind == "boost":
            # ``term^2.5`` lexes as term + boost tokens: apply to the clause
            # just added (phrase/regexp/group boosts are captured inline)
            if not clauses:
                raise QueryParseError("dangling '^' boost with no preceding clause")
            occ, prev = clauses[-1]
            clauses[-1] = (occ, _with_boost(prev, float(tok["gboost"])))
        pos += 1
    if depth > 0:
        raise QueryParseError("unbalanced '('")
    return _finish(clauses), pos


def parse_query(qstring: str, field: str = "text") -> dict:
    """Parse a classic-syntax query string into an engine query-spec dict
    (no ``query_id``; caller attaches one). Leaf terms are RAW — analysis
    happens inside ``search()``'s prepare step, same as hand-built trees."""
    tokens = _tokens(qstring)
    node, pos = _parse(tokens, 0, field, 0)
    if pos != len(tokens):
        raise QueryParseError("unbalanced ')'")
    return node
