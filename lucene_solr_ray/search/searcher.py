"""Per-partition BM25 top-k scoring: exhaustive vectorized path + actor stage.

Re-creates the semantics of Lucene's IndexSearcher.search → Weight.bulkScorer
→ TopScoreDocCollector pipeline (reference: lucene/core/src/java/org/apache/
lucene/search/TopScoreDocCollector.java, BooleanWeight.java, branch_8x;
SURVEY.md §2.3, §2.7, §3.2):

- every query is a predicate over docIDs realized as posting-list algebra;
- ``term`` / ``or``  → disjunction: sum of per-term BM25 contributions
  over the union of postings (minShouldMatch=1);
- ``and``            → conjunction (MUST): all terms present, score = sum;
- per-partition top-k heap keeps k best by (score desc, local_docid asc) —
  the strictly-greater insert while scanning ascending docIDs, which is
  exactly TopScoreDocCollector's tie behavior;
- scores are float32 end-to-end; per-doc contributions are accumulated in
  QUERY TERM ORDER so results are bit-identical between the exhaustive
  path, the WAND path, and any partitioning of the corpus.

The exhaustive path is dense-vectorized (numpy scatter-add over a float32
score array) — on partitions up to a few million docs this beats a Python
block-at-a-time loop; block-max WAND (wand.py) wins when partitions are
huge and the threshold prunes most blocks. ``method="auto"`` picks by
partition size.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..index.segment import DOCMAP_ROW_GROUP, SegmentReader
from .similarity import Bm25Similarity, similarity_from_config

__all__ = ["score_query_exhaustive", "topk_select", "SearcherStage", "lookup_urls"]


def topk_select(cand: np.ndarray, scores: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, docid asc) over candidate docids + scores.
    Preserves the score dtype: the default paths accumulate in float32
    (Lucene semantics), the float64 oracle-parity similarity must not be
    rounded back to float32 here or e6-floored scores flip at boundaries."""
    if len(cand) == 0:
        return cand.astype(np.int64), scores
    nsc = -scores
    if len(cand) > k:
        kth = np.partition(nsc, k - 1)[k - 1]
        mask = nsc <= kth
        cand, nsc = cand[mask], nsc[mask]
    order = np.lexsort((cand, nsc))[:k]
    return cand[order].astype(np.int64), -nsc[order]


def score_query_exhaustive(
    reader: SegmentReader,
    terms: Sequence[str],
    kind: str,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    exclude: Sequence[str] = (),
    min_should_match: int = 1,
    max_edits: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full-evaluation scoring over one segment (CheckHits-style ground
    truth for WAND; also the fast path for small/medium partitions).

    Kinds (BooleanQuery clause semantics, reference BooleanWeight.java +
    ReqExclScorer.java + MultiTermQuery CONSTANT_SCORE_REWRITE, branch_8x):
    - ``term``/``or``: SHOULD disjunction, ``min_should_match`` matching
      clauses required (default 1);
    - ``and``: MUST conjunction;
    - ``prefix``: terms are prefixes, expanded against this segment's term
      dictionary; constant score 1.0 per matching doc (Lucene's
      constant-score rewrite), tie → lowest docID;
    - any kind may carry ``exclude`` (MUST_NOT): matching docs are removed
      before top-k selection.
    """
    n_docs = reader.num_docs
    if kind in ("prefix", "wildcard", "regexp", "fuzzy"):
        # multi-term expansion against the sorted term dictionary with
        # CONSTANT_SCORE_REWRITE (reference MultiTermQuery semantics;
        # wildcard/regexp/fuzzy expansion in multiterm.py)
        from .multiterm import expand_fuzzy, expand_regexp, expand_wildcard

        matched = np.zeros(n_docs, dtype=bool)
        for pat in terms:
            if kind == "prefix":
                lo, hi = reader.prefix_range(pat)
                ords = range(lo, hi)
            elif kind == "wildcard":
                ords = expand_wildcard(reader, pat)
            elif kind == "regexp":
                ords = expand_regexp(reader, pat)
            else:
                ords = expand_fuzzy(reader, pat, max_edits=max_edits, prefix_len=1)
            for o in ords:
                matched[reader.postings(int(o)).docids] = True
        cand = np.nonzero(matched)[0]
        scores_c = np.ones(len(cand), dtype=np.float32)
    else:
        # accumulate in the similarity's dtype: float32 (Lucene semantics)
        # by default; float64 end-to-end for the SQL-oracle-parity mode —
        # a float32 round-trip here flips e6-floored scores at boundaries
        scores = np.zeros(n_docs, dtype=sim.dtype)
        hits = np.zeros(n_docs, dtype=np.uint16)
        n_terms = len(terms)
        missing = False
        for term in terms:
            o = reader.lookup(term)
            if o < 0:
                missing = True
                continue
            tp = reader.postings(o)
            contrib = sim.score_freqs(
                weights[term], tp.freqs, reader.norms[tp.docids], cache_inv
            )
            scores[tp.docids] += contrib
            hits[tp.docids] += 1
        if kind == "and":
            if missing:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
            cand = np.nonzero(hits == n_terms)[0]
        else:
            cand = np.nonzero(hits >= max(1, min_should_match))[0]
        scores_c = scores[cand]
    if len(exclude) and len(cand):
        banned = np.zeros(n_docs, dtype=bool)
        for term in exclude:
            o = reader.lookup(term)
            if o >= 0:
                banned[reader.postings(o).docids] = True
        keep = ~banned[cand]
        cand, scores_c = cand[keep], scores_c[keep]
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores_c = cand[keep], scores_c[keep]
    return topk_select(cand, scores_c, k)


def _bool_eval_node(
    reader: SegmentReader,
    node: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    tcache: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """FULL (no top-k) evaluation of one query-tree node over a segment →
    (sorted docids, scores). Inner nodes must never truncate: a clause's
    low-scoring match can still be required for the parent's conjunction.

    Nested-BooleanQuery semantics (reference: lucene/core/src/java/org/
    apache/lucene/search/BooleanQuery.java + BooleanWeight.java ~550+400
    LoC, branch_8x): a doc matches a ``bool`` node iff ALL ``must``
    children match, at least ``min_should_match`` ``should`` children
    match (Lucene's default: 0 when must clauses exist, else 1), and no
    ``must_not`` child matches; its score is the SUM of the scores of all
    matching scoring clauses (must + should — should adds score even when
    not required for the match)."""
    n = reader.num_docs
    kind = node.get("kind", "term")
    boost = sim.dtype(node.get("boost", 1.0))
    if kind == "const":
        # ConstantScoreQuery (reference: lucene/core/.../search/
        # ConstantScoreQuery.java ~200 LoC, branch_8x): matching docs of the
        # wrapped query score exactly ``boost`` — the filter-context wrapper
        cid, _ = _bool_eval_node(reader, node["of"], weights, cache_inv, sim, tcache)
        return cid, np.full(len(cid), boost, dtype=sim.dtype)
    if kind == "dis_max":
        # DisjunctionMaxQuery (reference: lucene/core/src/java/org/apache/
        # lucene/search/DisjunctionMaxQuery.java + DisjunctionMaxScorer,
        # branch_8x; the dismax/edismax combiner): a doc matches if ANY
        # clause matches; score = max(clause scores) + tie_breaker *
        # (sum(clause scores) - max) — DisjunctionMaxScorer computes
        # scoreMax + (scoreSum - scoreMax) * tieBreakerMultiplier, mirrored
        # here in sim.dtype so float32/float64 parity holds.
        tb = sim.dtype(node.get("tie_breaker", 0.0))
        best = np.zeros(n, dtype=sim.dtype)
        ssum = np.zeros(n, dtype=sim.dtype)
        mask = np.zeros(n, dtype=bool)
        for c in node["clauses"]:
            cid, csc = _bool_eval_node(reader, c, weights, cache_inv, sim, tcache)
            if not len(cid):
                continue
            best[cid] = np.maximum(best[cid], csc)
            ssum[cid] += csc
            mask[cid] = True
        cand = np.nonzero(mask)[0].astype(np.int64)
        out = best[cand]
        if tb != sim.dtype(0.0):
            out = out + tb * (ssum[cand] - out)
        return (cand, out * boost) if boost != sim.dtype(1.0) else (cand, out)
    if kind == "bool":
        must = node.get("must", ())
        filt = node.get("filter", ())
        should = node.get("should", ())
        mnot = node.get("must_not", ())
        msm = int(node.get("min_should_match", 0 if (must or filt) else 1))
        scores = np.zeros(n, dtype=sim.dtype)
        mask = None
        for c in must:
            cid, csc = _bool_eval_node(reader, c, weights, cache_inv, sim, tcache)
            scores[cid] += csc
            m = np.zeros(n, dtype=bool)
            m[cid] = True
            mask = m if mask is None else (mask & m)
        for c in filt:
            # Occur.FILTER (reference BooleanClause.Occur.FILTER, branch_8x;
            # the solr fq= analog): required for the match, contributes NO
            # score — matching docs of a filter-only bool score 0.0
            cid, _ = _bool_eval_node(reader, c, weights, cache_inv, sim, tcache)
            m = np.zeros(n, dtype=bool)
            m[cid] = True
            mask = m if mask is None else (mask & m)
        if should:
            sh_cnt = np.zeros(n, dtype=np.uint16)
            for c in should:
                cid, csc = _bool_eval_node(reader, c, weights, cache_inv, sim, tcache)
                scores[cid] += csc
                sh_cnt[cid] += 1
            need = max(1, msm) if mask is None else msm
            if need > 0:
                m = sh_cnt >= need
                mask = m if mask is None else (mask & m)
        if mask is None:
            # no scoring clauses at all: nothing can match
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=sim.dtype)
        for c in mnot:
            cid, _ = _bool_eval_node(reader, c, weights, cache_inv, sim, tcache)
            mask[cid] = False
        cand = np.nonzero(mask)[0]
        out = scores[cand]
        # BoostQuery wrapper (reference: lucene/core/.../search/
        # BoostQuery.java, branch_8x): multiplies the wrapped query's score
        return (cand, out * boost) if boost != sim.dtype(1.0) else (cand, out)
    if kind == "phrase":
        # PhraseQuery as a boolean clause (parser output like
        # ``+"ray data" fast``): full evaluation, boost multiplies
        cid, csc = _phrase_full(
            reader, node["terms"], weights, cache_inv, sim,
            slop=int(node.get("slop", 0)),
        )
        return (cid, csc * boost) if boost != sim.dtype(1.0) else (cid, csc)
    if kind == "multi_phrase":
        cid, csc = _multi_phrase_full(
            reader, node["positions"], weights, cache_inv, sim,
            slop=int(node.get("slop", 0)),
        )
        return (cid, csc * boost) if boost != sim.dtype(1.0) else (cid, csc)
    if kind in ("span_near", "span_first", "span_not"):
        cid, csc = _span_full(reader, node, weights, cache_inv, sim)
        return (cid, csc * boost) if boost != sim.dtype(1.0) else (cid, csc)
    if kind == "term_range":
        # TermRangeQuery (reference: lucene/core/.../search/
        # TermRangeQuery.java, branch_8x): every vocab term in the
        # lexicographic [lo, hi] range, CONSTANT_SCORE_REWRITE. ``*`` or
        # None = open bound; lo_inc/hi_inc default true (the [a TO b]
        # parser syntax; {a TO b} is exclusive).
        lo, hi = node.get("lo"), node.get("hi")
        lo_i = (
            0 if lo in (None, "*")
            else reader.terms.searchsorted(
                lo, side="left" if node.get("lo_inc", True) else "right")
        )
        hi_i = (
            len(reader.terms) if hi in (None, "*")
            else reader.terms.searchsorted(
                hi, side="right" if node.get("hi_inc", True) else "left")
        )
        matched = np.zeros(n, dtype=bool)
        for o in range(lo_i, hi_i):
            matched[reader.postings(int(o)).docids] = True
        cid = np.nonzero(matched)[0].astype(np.int64)
        return cid, np.full(len(cid), boost, dtype=sim.dtype)
    if kind == "term_set":
        # TermInSetQuery (reference: lucene/core/.../search/
        # TermInSetQuery.java, branch_8x; Solr {!terms} TermsQParserPlugin):
        # constant-score union over an EXPLICIT term set — the filter form
        # of a huge OR (Lucene builds a DocIdSet, never per-term scorers).
        # Terms are raw index terms (TermsQParser does not analyze).
        matched = np.zeros(n, dtype=bool)
        for term in node.get("values") or node.get("terms", ()):
            o = reader.lookup(term)
            if o >= 0:
                matched[reader.postings(int(o)).docids] = True
        cid = np.nonzero(matched)[0].astype(np.int64)
        return cid, np.full(len(cid), boost, dtype=sim.dtype)
    if kind in ("prefix", "wildcard", "regexp", "fuzzy"):
        # MultiTermQuery CONSTANT_SCORE_REWRITE as a boolean clause:
        # matching docs score exactly ``boost`` (default 1.0)
        from .multiterm import expand_fuzzy, expand_regexp, expand_wildcard

        matched = np.zeros(n, dtype=bool)
        for pat in node["terms"]:
            if kind == "prefix":
                lo, hi = reader.prefix_range(pat)
                ords = range(lo, hi)
            elif kind == "wildcard":
                ords = expand_wildcard(reader, pat)
            elif kind == "regexp":
                ords = expand_regexp(reader, pat)
            else:
                ords = expand_fuzzy(
                    reader, pat,
                    max_edits=int(node.get("max_edits", 2)), prefix_len=1)
            for o in ords:
                matched[reader.postings(int(o)).docids] = True
        cid = np.nonzero(matched)[0].astype(np.int64)
        return cid, np.full(len(cid), boost, dtype=sim.dtype)
    if kind not in ("term", "or", "and"):
        raise ValueError(f"bool sub-clause kind {kind!r} not supported")
    terms = node["terms"]
    scores = np.zeros(n, dtype=sim.dtype)
    hits = np.zeros(n, dtype=np.uint16)
    missing = False
    for term in terms:
        entry = tcache.get(term) if tcache is not None else False
        if entry is False or (entry is not None and entry[1] is None):
            o = reader.lookup(term)
            if o < 0:
                entry = None
            else:
                tp = reader.postings(o)
                entry = (
                    tp.docids,
                    sim.score_freqs(
                        weights.get(term, sim.dtype(0.0)), tp.freqs,
                        reader.norms[tp.docids], cache_inv,
                    ),
                )
        if entry is None:
            missing = True
            continue
        docids, contrib = entry
        scores[docids] += contrib
        hits[docids] += 1
    if kind == "and":
        if missing:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=sim.dtype)
        cand = np.nonzero(hits == len(terms))[0]
    else:
        cand = np.nonzero(hits >= max(1, int(node.get("min_should_match", 1))))[0]
    out = scores[cand]
    return (cand, out * boost) if boost != sim.dtype(1.0) else (cand, out)


def score_query_bool(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    tcache: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Nested BooleanQuery top-k over one segment: full tree evaluation,
    liveDocs filter, then the standard (score desc, docid asc) top-k."""
    cand, scores = _bool_eval_node(reader, q, weights, cache_inv, sim, tcache)
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    return topk_select(cand, scores, k)


# ---------------------------------------------------------------------------
# FunctionScoreQuery: index-backed value sources + boost(q, vs)
# ---------------------------------------------------------------------------

#: value-source leaves resolved against the INDEX rather than a batch column
#: (reference: solr/core/.../search/ValueSourceParser.java registrations
#: "termfreq"/"docfreq"/"totaltermfreq"/"idf"/"norm"/"numdocs"/"maxdoc"/
#: "sumtotaltermfreq", branch_8x). Terms are the ANALYZED index terms.
INDEX_VS_LEAVES = frozenset(
    ("termfreq", "docfreq", "ttf", "totaltermfreq", "idf", "norm",
     "numdocs", "maxdoc", "sumtotaltermfreq", "query")
)


def _query_node_terms(node) -> List[str]:
    """Leaf terms of a query-tree dict (bool/const/term/or/and; pattern and
    range kinds need no stats)."""
    out: List[str] = []
    if not isinstance(node, dict):
        return out
    kind = node.get("kind", "term")
    if kind == "const":
        return _query_node_terms(node.get("of"))
    if kind == "bool":
        for sec in ("must", "filter", "should", "must_not"):
            for c in node.get(sec, ()):
                out.extend(_query_node_terms(c))
        return out
    if kind == "dis_max":
        for c in node.get("clauses", ()):
            out.extend(_query_node_terms(c))
        return out
    if kind == "multi_phrase":
        return [t for slot in node.get("positions", ()) for t in slot]
    if kind == "span_not":
        # only include spans are scored (SpanNotQuery inner SpanWeight)
        return _query_node_terms(node.get("include"))
    if kind in ("prefix", "wildcard", "regexp", "fuzzy", "term_range",
                "term_set"):
        return out
    if node.get("slots"):
        return [t for slot in node["slots"] for t in slot]
    return list(node.get("terms", ()))


def index_vs_terms(spec) -> List[str]:
    """Every term referenced by index-stat or query() leaves inside a vs
    spec tree (so the stats phase resolves their global df/idf once and
    the per-actor term cache covers them)."""
    out: List[str] = []
    if isinstance(spec, list) and spec and isinstance(spec[0], str):
        if spec[0] in ("termfreq", "docfreq", "ttf", "totaltermfreq", "idf"):
            out.append(str(spec[-1]))
        elif spec[0] == "query":
            out.extend(_query_node_terms(spec[1]))
        else:
            for a in spec[1:]:
                out.extend(index_vs_terms(a))
    return out


def _eval_index_vs(reader, spec, docids, gstats, sim,
                   weights=None, cache_inv=None, tcache=None) -> np.ndarray:
    """Evaluate a value-source spec per doc against one segment: index-stat
    leaves become precomputed float64 columns, the rewritten tree then runs
    through the scalar registry (functions/scalars.py) — FunctionValues
    re-expressed as one vectorized pass over the candidate docids.

    Leaf semantics (single indexed text field, so the field arg is
    accepted and ignored): termfreq = raw within-doc tf (0 if absent);
    docfreq/ttf = GLOBAL stats from the ExactStatsCache broadcast (not
    per-segment — distributed parity with the SQL oracle); idf = the
    active similarity's idf of that global df; norm = the DECODED
    SmallFloat length byte (the quantized dl BM25 scores against);
    numdocs/maxdoc = global live doc count; sumtotaltermfreq = global
    token count."""
    from ..analysis.smallfloat import byte4_to_int
    from ..functions.scalars import compile_value_source

    term_stats = gstats.get("term_stats", {})
    n_docs = float(gstats.get("n_docs", 0))
    sum_dl = float(gstats.get("sum_dl", 0))
    leaves: Dict[str, np.ndarray] = {}

    def rewrite(node):
        if isinstance(node, list) and node and isinstance(node[0], str):
            name = node[0]
            if name == "termfreq":
                term = str(node[-1])
                col = f"__tf::{term}"
                if col not in leaves:
                    arr = np.zeros(len(docids), dtype=np.float64)
                    o = reader.lookup(term)
                    if o >= 0 and len(docids):
                        tp = reader.postings(o)
                        pos = np.searchsorted(tp.docids, docids)
                        pos_c = np.minimum(pos, len(tp.docids) - 1)
                        hit = tp.docids[pos_c] == docids
                        arr[hit] = tp.freqs[pos_c[hit]].astype(np.float64)
                    leaves[col] = arr
                return col
            if name in ("docfreq", "ttf", "totaltermfreq", "idf"):
                term = str(node[-1])
                df, ttf = term_stats.get(term, (0, 0))
                if name == "docfreq":
                    return float(df)
                if name == "idf":
                    return float(sim.idf(df, int(n_docs))) if df > 0 else 0.0
                return float(ttf)
            if name == "norm":
                col = "__norm"
                if col not in leaves:
                    leaves[col] = byte4_to_int(
                        reader.norms[docids]
                    ).astype(np.float64) if len(docids) else np.zeros(0)
                return col
            if name in ("numdocs", "maxdoc"):
                return n_docs
            if name == "sumtotaltermfreq":
                return sum_dl
            if name == "query":
                # QueryValueSource (ValueSourceParser "query": the wrapped
                # query's SCORE per doc, 0 where it doesn't match — the
                # bf=/boost= building block)
                col = f"__q::{node[1]!r}"
                if col not in leaves:
                    arr = np.zeros(len(docids), dtype=np.float64)
                    cid, csc = _bool_eval_node(
                        reader, node[1], weights or {}, cache_inv, sim, tcache)
                    if len(cid) and len(docids):
                        order = np.argsort(cid, kind="stable")
                        cid, csc = cid[order], csc[order]
                        pos = np.searchsorted(cid, docids)
                        pos_c = np.minimum(pos, len(cid) - 1)
                        hit = cid[pos_c] == docids
                        arr[hit] = csc[pos_c[hit]].astype(np.float64)
                    leaves[col] = arr
                return col
            return [name] + [rewrite(a) for a in node[1:]]
        return node

    spec = rewrite(spec)
    if not leaves:  # pure-constant tree still needs a row count
        leaves["__ones"] = np.ones(len(docids), dtype=np.float64)
        spec = ["product", spec, "__ones"] if not (
            isinstance(spec, str)
        ) else spec
    fn = compile_value_source(spec)
    out = fn(pa.table(leaves))
    return np.broadcast_to(np.asarray(out, dtype=np.float64),
                           (len(docids),)).astype(np.float64)


def score_query_func_boost(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    gstats: dict,
    tcache: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """boost(q, vs) / FunctionScoreQuery (reference: lucene/queries/.../
    function/FunctionScoreQuery.java + solr's {!boost} QParser, branch_8x):
    matching docs of the wrapped query, each score MULTIPLIED by the
    value source evaluated at that doc. Top-level query kind
    ``{"kind": "func_boost", "of": <node>, "vs": <scalar spec>}`` — the
    wrapped node is any _bool_eval_node tree."""
    cand, scores = _bool_eval_node(reader, q["of"], weights, cache_inv, sim, tcache)
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    vals = _eval_index_vs(reader, q["vs"], cand, gstats, sim,
                          weights=weights, cache_inv=cache_inv, tcache=tcache)
    return topk_select(cand, scores.astype(np.float64) * vals, k)


def _frange_match(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    gstats: dict,
    tcache: Optional[dict] = None,
) -> np.ndarray:
    """Matching docids of a {!frange} query over one segment: the value
    source evaluated on the candidate set (the wrapped query's matches
    via ``of``, else every live doc), kept where l ≤ v ≤ u (bounds
    optional; ``incl_l``/``incl_u`` open the ends like Solr's incl
    params)."""
    if "of" in q:
        cand, _ = _bool_eval_node(reader, q["of"], weights, cache_inv, sim, tcache)
    else:
        cand = np.arange(reader.num_docs, dtype=np.int64)
    if reader.deleted is not None and len(cand):
        cand = cand[~reader.deleted[cand]]
    vals = _eval_index_vs(reader, q["vs"], cand, gstats, sim,
                          weights=weights, cache_inv=cache_inv, tcache=tcache)
    mask = np.ones(len(cand), dtype=bool)
    if q.get("l") is not None:
        lo = float(q["l"])
        mask &= (vals >= lo) if q.get("incl_l", True) else (vals > lo)
    if q.get("u") is not None:
        hi = float(q["u"])
        mask &= (vals <= hi) if q.get("incl_u", True) else (vals < hi)
    return cand[mask]


def score_query_frange(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    gstats: dict,
    tcache: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """{!frange l=.. u=..} / FunctionRangeQuery (reference: solr/core/src/
    java/org/apache/solr/search/FunctionRangeQParserPlugin.java +
    FunctionRangeQuery, branch_8x; SURVEY.md §2.9): docs whose value
    source lands in the range, constant score = ``boost``
    (SolrConstantScoreQuery semantics, tie-break docid asc). Query kind
    ``{"kind": "frange", "vs": <scalar spec>, "l": .., "u": ..,
    "incl_l"/"incl_u": bool, "of": <optional wrapped node>}``."""
    cand = _frange_match(reader, q, weights, cache_inv, sim, gstats, tcache)
    scores = np.full(len(cand), float(q.get("boost", 1.0)), dtype=np.float64)
    return topk_select(cand, scores, k)


def score_query_rerank(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    tcache: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """ReRankQParser (reference: solr/core/src/java/org/apache/solr/
    search/ReRankQParserPlugin.java + ReRankCollector, branch_8x;
    SURVEY.md §2.7): the main query's top ``rerank_docs`` docs get
    ``rerank_weight`` × the rerank query's score ADDED; docs below the
    cut keep their original score and can only be outranked, never
    re-scored. Distributed semantics match SolrCloud: the reRankDocs cut
    applies PER SHARD (each shard reranks its local top before the
    merge) — so P-invariance holds only when rerank_docs covers every
    shard-local match, exactly as in Solr. Query kind ``{"kind":
    "rerank", "of": <main node>, "rq": <rerank node>, "rerank_docs": N,
    "rerank_weight": w}``."""
    cand, scores = _bool_eval_node(reader, q["of"], weights, cache_inv, sim, tcache)
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    scores = scores.astype(np.float64)
    n_top = min(int(q.get("rerank_docs", 200)), len(cand))
    if n_top > 0:
        # segment-local top-N indices under the collector order
        # (score desc, docid asc) — same tie-break as topk_select
        order = np.lexsort((cand, -scores))[:n_top]
        rq_cand, rq_scores = _bool_eval_node(
            reader, q["rq"], weights, cache_inv, sim, tcache)
        if len(rq_cand):
            ro = np.argsort(rq_cand, kind="stable")
            rq_cand, rq_scores = rq_cand[ro], rq_scores[ro]
            sel = cand[order]
            pos = np.searchsorted(rq_cand, sel)
            pos_c = np.minimum(pos, len(rq_cand) - 1)
            hit = rq_cand[pos_c] == sel
            add = np.zeros(len(sel), dtype=np.float64)
            add[hit] = rq_scores[pos_c[hit]].astype(np.float64)
            scores[order] += float(q.get("rerank_weight", 2.0)) * add
    return topk_select(cand, scores, k)


def sloppy_phrase_freq(pos_lists: List[np.ndarray], slop: int) -> int:
    """Sloppy-phrase frequency for ONE doc: the number of MINIMAL windows
    containing at least one occurrence of every term with
    ``(window_width − k) ≤ slop`` — SpanNearQuery(inOrder=false)-style
    semantics (reference: lucene/core/src/java/org/apache/lucene/search/
    SloppyPhraseMatcher.java ~600 LoC, branch_8x; our matcher uses the
    minimal-covering-window formulation rather than Lucene's
    edit-distance weighting — a documented deviation pinned by the
    pure-Python oracle — but is REPEATS-AWARE like SloppyPhraseMatcher:
    identical position lists are a repeated query term ("a b a"), and a
    window must contain at least multiplicity-many DISTINCT positions of
    that term; without this, one occurrence would satisfy every repeat
    slot (SloppyPhraseMatcher's PhrasePositions repeats groups)."""
    kterms = len(pos_lists)
    # group repeated terms: within one doc a position holds exactly one
    # term, so identical lists ⇔ the same query term repeated
    uniq: List[np.ndarray] = []
    mult: List[int] = []
    for p in pos_lists:
        p = np.asarray(p, dtype=np.int64)
        for ui, u in enumerate(uniq):
            if len(u) == len(p) and np.array_equal(u, p):
                mult[ui] += 1
                break
        else:
            uniq.append(p)
            mult.append(1)
    mults = np.asarray(mult, dtype=np.int64)
    n_uniq = len(uniq)
    events = np.concatenate(uniq)
    labels = np.concatenate(
        [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(uniq)]
    )
    order = np.argsort(events, kind="stable")
    events, labels = events[order], labels[order]
    count = np.zeros(n_uniq, dtype=np.int64)
    have = 0
    left = 0
    freq = 0
    for right in range(len(events)):
        lr = labels[right]
        count[lr] += 1
        if count[lr] == mults[lr]:
            have += 1
        # shrink to the minimal window ending at `right` (drop events a
        # covering window does not need)
        while count[labels[left]] > mults[labels[left]]:
            count[labels[left]] -= 1
            left += 1
        if have == n_uniq:
            width = int(events[right] - events[left]) + 1
            if width - kterms <= slop:
                freq += 1
    return freq


def span_near_ordered_spans(
    pos_lists: List[np.ndarray], slop: int
) -> Tuple[np.ndarray, np.ndarray]:
    """SpanNearQuery(inOrder=true) matching spans for ONE doc (reference:
    lucene/core/src/java/org/apache/lucene/search/spans/NearSpansOrdered
    .java ~200 LoC, branch_8x): the start positions p₁ whose MINIMAL
    in-order chain p₁<p₂<…<p_k (greedy smallest-next, which is
    width-optimal for a fixed start) satisfies (p_k − p₁ + 1) − k ≤ slop,
    returned as (starts, ends) with ends INCLUSIVE (= p_k). Vectorized:
    one searchsorted per term over ALL candidate starts."""
    k = len(pos_lists)
    cur = pos_lists[0].astype(np.int64)
    nothing = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if len(cur) == 0:
        return nothing
    end = cur
    valid = np.ones(len(cur), dtype=bool)
    for nxt in pos_lists[1:]:
        nxt = np.asarray(nxt, dtype=np.int64)
        if len(nxt) == 0:
            return nothing
        idx = np.searchsorted(nxt, end, side="right")
        ok = idx < len(nxt)
        valid &= ok
        end = np.where(ok, nxt[np.minimum(idx, len(nxt) - 1)], end)
    hit = valid & ((end - cur + 1) - k <= slop)
    return cur[hit], end[hit]


def span_near_ordered_freq(pos_lists: List[np.ndarray], slop: int) -> int:
    """Frequency = number of matching minimal in-order chains (see
    span_near_ordered_spans; bit-identical count)."""
    return int(len(span_near_ordered_spans(pos_lists, slop)[0]))


def _span_full(
    reader: SegmentReader,
    node: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
) -> Tuple[np.ndarray, np.ndarray]:
    """FULL evaluation of a span query over one segment → (docids, scores).

    Kinds (reference: lucene/core/src/java/org/apache/lucene/search/spans/
    SpanNearQuery.java + SpanFirstQuery.java, branch_8x; SURVEY.md §2.3):
    - ``span_near``: terms within ``slop`` extra positions of each other;
      ``in_order`` (default True) requires p₁<p₂<…<p_k (NearSpansOrdered),
      else the minimal-covering-window matcher shared with sloppy phrase
      (NearSpansUnordered-style, same documented deviation).
    - ``span_first``: single term with an occurrence at position < ``end``.
    - ``span_not``: include spans (``include`` = a term / ordered
      span_near / span_first node) that do NOT overlap any occurrence of
      an ``exclude_terms`` term, the overlap window widened ``pre``
      positions before the span start and ``post`` after its end
      (reference: lucene/core/.../search/spans/SpanNotQuery.java,
      branch_8x — excl.end > incl.start − pre ∧ excl.start < incl.end +
      post, rewritten for single-width exclude spans and inclusive ends).
    Scored like a phrase pseudo-term: weight = Σ idf(term_i), BM25 on the
    span frequency — consistent with the sloppy-phrase treatment (span_not
    weighs ONLY the include terms, like SpanNotQuery's inner SpanWeight)."""
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            f"span query requires an index built with store_positions=True "
            f"({reader.seg_dir} has no positions.bin)"
        )
    kind = node["kind"]
    inc = node["include"] if kind == "span_not" else node
    inc_kind = inc.get("kind", "term") if kind == "span_not" else kind
    if kind == "span_not" and inc_kind == "span_near" and not inc.get(
            "in_order", True):
        raise ValueError(
            "span_not include must be a term / ordered span_near / "
            "span_first (unordered spans have no well-defined minimal "
            "span enumeration here)")
    # slot alternatives = SpanNearQuery over SpanOrQuery clauses
    # (reference: lucene/core/.../search/spans/SpanOrQuery.java, branch_8x):
    # a slot matches at the union of its variants' positions. Plain
    # ``terms`` is the single-variant special case.
    slots = inc.get("slots") or [[t] for t in inc["terms"]]
    if inc_kind == "span_first" and len(slots) != 1:
        raise ValueError("span_first takes exactly one term/slot")
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32))
    slot_variants = []  # per slot: [(tp, flat_positions)] for LIVE variants
    for slot in slots:
        live = []
        for term in slot:
            o = reader.lookup(term)
            if o >= 0:
                live.append((reader.postings(o), reader.positions(o)))
        if not live:
            return empty  # a slot with no live variant can never match
        slot_variants.append(live)
    cand = None
    for live in slot_variants:
        ids = live[0][0].docids
        for tp, _ in live[1:]:
            ids = np.union1d(ids, tp.docids)
        cand = ids if cand is None else np.intersect1d(
            cand, ids, assume_unique=True)
    if len(cand) == 0:
        return empty
    slot_slices = []  # per slot: [(flat, starts, idx, member)] per variant
    for live in slot_variants:
        per_var = []
        for tp, flat in live:
            starts = np.concatenate(
                ([0], np.cumsum(tp.freqs.astype(np.int64))))
            idx = np.searchsorted(tp.docids, cand)
            idx_c = np.minimum(idx, len(tp.docids) - 1)
            member = tp.docids[idx_c] == cand
            per_var.append((flat, starts, idx_c, member))
        slot_slices.append(per_var)

    def slot_pos(si: int, ci: int) -> np.ndarray:
        parts = []
        for flat, starts, idx, member in slot_slices[si]:
            if member[ci]:
                j = int(idx[ci])
                parts.append(np.asarray(flat[starts[j]:starts[j + 1]],
                                        dtype=np.int64))
        if len(parts) == 1:
            return parts[0]
        # posInc-0 synonym copies can duplicate a position across variants
        return np.unique(np.concatenate(parts))

    excl_slices = []  # span_not: [(flat, starts, idx, member)] per excl term
    if kind == "span_not":
        for term in node.get("exclude_terms", ()):
            o = reader.lookup(term)
            if o < 0:
                continue  # absent exclude term can never kill a span
            tp, flat = reader.postings(o), reader.positions(o)
            starts = np.concatenate(
                ([0], np.cumsum(tp.freqs.astype(np.int64))))
            idx = np.searchsorted(tp.docids, cand)
            idx_c = np.minimum(idx, len(tp.docids) - 1)
            member = tp.docids[idx_c] == cand
            excl_slices.append((flat, starts, idx_c, member))

    def excl_pos(ci: int) -> np.ndarray:
        parts = []
        for flat, starts, idx, member in excl_slices:
            if member[ci]:
                j = int(idx[ci])
                parts.append(np.asarray(flat[starts[j]:starts[j + 1]],
                                        dtype=np.int64))
        if not parts:
            return np.empty(0, dtype=np.int64)
        if len(parts) == 1:
            return parts[0]
        return np.unique(np.concatenate(parts))

    def inc_spans(ci: int) -> Tuple[np.ndarray, np.ndarray]:
        """Matching include spans of one candidate doc as (starts, ends),
        ends INCLUSIVE — single-width for term/span_first leaves."""
        if inc_kind == "span_first":
            p = slot_pos(0, ci)
            p = p[p < int(inc.get("end", 1))]
            return p, p
        if inc_kind == "span_near":
            return span_near_ordered_spans(
                [slot_pos(si, ci) for si in range(len(slots))],
                int(inc.get("slop", 0)))
        p = slot_pos(0, ci)  # plain term / SpanOr slot
        return p, p

    freq = np.zeros(len(cand), dtype=np.int64)
    if kind == "span_not":
        pre = int(node.get("pre", 0))
        post = int(node.get("post", 0))
        for ci in range(len(cand)):
            s, e = inc_spans(ci)
            if len(s) == 0:
                continue
            q = excl_pos(ci)
            if len(q) == 0:
                freq[ci] = len(s)
                continue
            lo = np.searchsorted(q, s - pre, side="left")
            hi = np.searchsorted(q, e + post, side="right")
            freq[ci] = int(np.count_nonzero(hi == lo))
    elif kind == "span_first":
        endpos = int(node.get("end", 1))
        for ci in range(len(cand)):
            freq[ci] = int(np.count_nonzero(slot_pos(0, ci) < endpos))
    else:
        slop = int(node.get("slop", 0))
        in_order = bool(node.get("in_order", True))
        for ci in range(len(cand)):
            doc_pos = [slot_pos(si, ci) for si in range(len(slots))]
            freq[ci] = (
                span_near_ordered_freq(doc_pos, slop)
                if in_order
                else sloppy_phrase_freq(doc_pos, slop)
            )
    hit = freq > 0
    cand, freq = cand[hit], freq[hit]
    if len(cand) == 0:
        return empty
    # weight = Σ idf over every variant in every slot (the multi_phrase
    # convention — SpanOr contributes each clause's idf)
    w = np.float32(0.0)
    for slot in slots:
        for term in slot:
            w = np.float32(w + weights.get(term, np.float32(0.0)))
    scores = sim.score_freqs(w, freq.astype(np.uint32), reader.norms[cand], cache_inv)
    return cand.astype(np.int64), scores


def score_query_span(
    reader: SegmentReader,
    node: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    exclude: Sequence[str] = (),
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k span query over one segment: full span evaluation, MUST_NOT
    exclusion, liveDocs filter, (score desc, docid asc) top-k."""
    cand, scores = _span_full(reader, node, weights, cache_inv, sim)
    if len(exclude) and len(cand):
        banned = np.zeros(reader.num_docs, dtype=bool)
        for term in exclude:
            o = reader.lookup(term)
            if o >= 0:
                banned[reader.postings(o).docids] = True
        keep = ~banned[cand]
        cand, scores = cand[keep], scores[keep]
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    return topk_select(cand, scores, k)


def match_query_full(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
) -> np.ndarray:
    """ALL docids of one segment matching the query (no top-k, no score
    output, still-live docs only) — the matching primitive behind
    deleteByQuery. Supports every query kind the searcher does."""
    kind = q.get("kind", "term")
    if kind == "func_boost":
        # the value source only rescales scores — MATCHING is the wrapped
        # query's; falling through would OR over q["terms"] (which also
        # carries vs stat terms) and silently over-delete
        return match_query_full(reader, q["of"], weights, cache_inv, sim)
    if kind == "rerank":
        # reranking only reorders — matching is the main query's
        return match_query_full(reader, q["of"], weights, cache_inv, sim)
    if kind == "frange":
        # per-segment value-source leaves (termfreq/norm) are available
        # here; GLOBAL-stat leaves need the searcher's ExactStatsCache,
        # which the delete path doesn't carry — refuse loudly rather than
        # silently evaluating df/idf as 0 and over/under-deleting
        def _has_global_leaf(node) -> bool:
            if isinstance(node, list) and node and isinstance(node[0], str):
                if node[0] in ("docfreq", "ttf", "totaltermfreq", "idf",
                               "numdocs", "maxdoc", "sumtotaltermfreq"):
                    return True
                return any(_has_global_leaf(a) for a in node[1:])
            return False

        if _has_global_leaf(q["vs"]):
            raise ValueError(
                "deleteByQuery {!frange} cannot use global-stat value "
                "sources (docfreq/idf/numdocs/...) — per-segment leaves "
                "(termfreq/norm) only"
            )
        cand = _frange_match(reader, q, weights, cache_inv, sim, {}, None)
        if len(cand) and reader.deleted is not None:
            cand = cand[~reader.deleted[cand]]
        return np.asarray(cand, dtype=np.int64)
    if kind in ("bool", "const", "dis_max", "term_range", "term_set",
                "prefix", "wildcard", "regexp", "fuzzy"):
        # any kind _bool_eval_node supports must route through it —
        # score_query_exhaustive would see q['terms'] == [] for e.g.
        # term_range and silently match nothing (deleteByQuery bug)
        cand, _ = _bool_eval_node(reader, q, weights, cache_inv, sim)
    elif kind == "multi_phrase":
        cand, _ = _multi_phrase_full(
            reader, q["positions"], weights, cache_inv, sim,
            slop=int(q.get("slop", 0)),
        )
    elif kind == "phrase":
        cand, _ = _phrase_full(
            reader, q["terms"], weights, cache_inv, sim,
            slop=int(q.get("slop", 0)),
        )
    elif kind in ("span_near", "span_first", "span_not"):
        cand, _ = _span_full(reader, q, weights, cache_inv, sim)
    else:
        cand, _ = score_query_exhaustive(
            reader, q["terms"], kind, weights, cache_inv, sim,
            k=max(reader.num_docs, 1),
            exclude=q.get("exclude", ()),
            min_should_match=int(q.get("min_should_match", 1)),
        )
    if len(cand) and reader.deleted is not None:
        cand = cand[~reader.deleted[cand]]
    return np.asarray(cand, dtype=np.int64)


def _phrase_full(
    reader: SegmentReader,
    terms: Sequence[str],
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    slop: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact PhraseQuery (reference: lucene/core/src/java/org/apache/
    lucene/search/ExactPhraseMatcher.java + PhraseWeight, branch_8x;
    SURVEY.md §2.3): candidate docs from the posting conjunction, then
    position verification — doc matches where ∩_i (positions(term_i) − i)
    is non-empty, phrase freq = |intersection|. Scored like a single
    pseudo-term: weight = Σ idf(term_i) (Lucene sums TermStatistics idfs),
    score = w − w/(1 + freq·normInverse). FULL evaluation (no liveDocs /
    exclude / top-k) so it can also serve as a bool-tree sub-clause."""
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            f"phrase query requires an index built with store_positions=True "
            f"({reader.seg_dir} has no positions.bin)"
        )
    ords, plists, posits = [], [], []
    for term in terms:
        o = reader.lookup(term)
        if o < 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        ords.append(o)
        plists.append(reader.postings(o))
        posits.append(reader.positions(o))
    cand = plists[0].docids
    for tp in plists[1:]:
        cand = np.intersect1d(cand, tp.docids, assume_unique=True)
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

    # per-term: index of each candidate doc in that term's posting list,
    # and the doc's position-slice boundaries within the term's flat array
    slices = []
    for tp, flat in zip(plists, posits):
        starts = np.concatenate(([0], np.cumsum(tp.freqs.astype(np.int64))))
        idx = np.searchsorted(tp.docids, cand)
        slices.append((flat, starts, idx))
    phrase_freq = np.zeros(len(cand), dtype=np.int64)
    for ci in range(len(cand)):
        if slop > 0:
            plists = []
            for flat_i, starts_i, idx_i in slices:
                ji = int(idx_i[ci])
                plists.append(
                    np.asarray(flat_i[starts_i[ji] : starts_i[ji + 1]], dtype=np.int64)
                )
            phrase_freq[ci] = sloppy_phrase_freq(plists, slop)
            continue
        flat, starts, idx = slices[0]
        j = int(idx[ci])
        inter = flat[starts[j] : starts[j + 1]].astype(np.int64)
        for off, (flat_i, starts_i, idx_i) in enumerate(slices[1:], start=1):
            ji = int(idx_i[ci])
            nxt = flat_i[starts_i[ji] : starts_i[ji + 1]].astype(np.int64) - off
            inter = np.intersect1d(inter, nxt, assume_unique=True)
            if len(inter) == 0:
                break
        phrase_freq[ci] = len(inter)
    hit = phrase_freq > 0
    cand, phrase_freq = cand[hit], phrase_freq[hit]
    if len(cand) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

    w = np.float32(0.0)
    for term in terms:
        w = np.float32(w + weights[term])
    scores = sim.score_freqs(w, phrase_freq.astype(np.uint32), reader.norms[cand], cache_inv)
    return cand.astype(np.int64), scores


def _multi_phrase_full(
    reader: SegmentReader,
    positions: Sequence[Sequence[str]],
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    slop: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """MultiPhraseQuery (reference: lucene/core/src/java/org/apache/
    lucene/search/MultiPhraseQuery.java + UnionPostingsEnum, branch_8x;
    the query the classic parser emits when the analyzer expands a quoted
    phrase position into several terms — posInc-0 synonyms): ``positions``
    is one term LIST per phrase slot; slot i matches where ANY of its
    terms occurs, and the doc's positions for the slot are the UNION of
    the variants' positions. freq/scoring then follow PhraseQuery exactly:
    weight = Σ idf over every term with df>0 (MultiPhraseWeight collects
    allTermStats for all terms, IndexSearcher.termStatistics drops df=0),
    score = one pseudo-term BM25 at the phrase freq. Vocab-missing
    variants are skipped; a slot with NO present variant matches nothing
    in this segment. FULL evaluation (no liveDocs / top-k) so it can also
    serve as a bool-tree sub-clause."""
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            f"multi_phrase query requires an index built with "
            f"store_positions=True ({reader.seg_dir} has no positions.bin)"
        )
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=sim.dtype))
    # per slot: list of (docids, pos_starts, flat_positions) for each
    # PRESENT variant; candidate docs = ∩_slots (∪_variants docids)
    slots = []
    cand = None
    for variants in positions:
        vlists = []
        docs_any = None
        for term in variants:
            o = reader.lookup(term)
            if o < 0:
                continue
            tp = reader.postings(o)
            starts = np.concatenate(([0], np.cumsum(tp.freqs.astype(np.int64))))
            vlists.append((tp.docids, starts, reader.positions(o)))
            docs_any = (
                tp.docids if docs_any is None
                else np.union1d(docs_any, tp.docids)
            )
        if docs_any is None:
            return empty
        slots.append(vlists)
        cand = docs_any if cand is None else np.intersect1d(
            cand, docs_any, assume_unique=True)
        if not len(cand):
            return empty

    freq = np.zeros(len(cand), dtype=np.int64)
    for ci, d in enumerate(cand):
        plists = []
        for vlists in slots:
            parts = []
            for docids, starts, flat in vlists:
                j = int(np.searchsorted(docids, d))
                if j < len(docids) and docids[j] == d:
                    parts.append(flat[starts[j]:starts[j + 1]].astype(np.int64))
            if not parts:
                plists = None
                break
            merged = parts[0] if len(parts) == 1 else np.unique(
                np.concatenate(parts))
            plists.append(merged)
        if plists is None:
            continue
        if slop > 0:
            freq[ci] = sloppy_phrase_freq(plists, slop)
        else:
            inter = plists[0]
            for off in range(1, len(plists)):
                inter = np.intersect1d(
                    inter, plists[off] - off, assume_unique=True)
                if not len(inter):
                    break
            freq[ci] = len(inter)
    hit = freq > 0
    cand, freq = cand[hit], freq[hit]
    if not len(cand):
        return empty
    w = sim.dtype(0.0)
    for variants in positions:
        for term in variants:
            w = sim.dtype(w + weights.get(term, sim.dtype(0.0)))
    scores = sim.score_freqs(
        w, freq.astype(np.uint32), reader.norms[cand], cache_inv)
    return cand.astype(np.int64), scores


def score_query_multi_phrase(
    reader: SegmentReader,
    q: dict,
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    exclude: Sequence[str] = (),
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k MultiPhraseQuery over one segment: full evaluation, MUST_NOT
    exclusion, liveDocs filter, then the standard (score desc, docid asc)
    top-k selection."""
    cand, scores = _multi_phrase_full(
        reader, q["positions"], weights, cache_inv, sim,
        slop=int(q.get("slop", 0)),
    )
    if len(exclude) and len(cand):
        banned = np.zeros(reader.num_docs, dtype=bool)
        for term in exclude:
            o = reader.lookup(term)
            if o >= 0:
                banned[reader.postings(o).docids] = True
        keep = ~banned[cand]
        cand, scores = cand[keep], scores[keep]
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    return topk_select(cand, scores, k)


def score_query_phrase(
    reader: SegmentReader,
    terms: Sequence[str],
    weights: Dict[str, np.float32],
    cache_inv: np.ndarray,
    sim: Bm25Similarity,
    k: int,
    exclude: Sequence[str] = (),
    slop: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k PhraseQuery over one segment: full phrase evaluation
    (``_phrase_full``), then MUST_NOT exclusion, liveDocs filter, and the
    standard (score desc, docid asc) top-k selection."""
    cand, scores = _phrase_full(reader, terms, weights, cache_inv, sim, slop)
    if len(exclude):
        banned = np.zeros(reader.num_docs, dtype=bool)
        for term in exclude:
            o = reader.lookup(term)
            if o >= 0:
                banned[reader.postings(o).docids] = True
        keep = ~banned[cand]
        cand, scores = cand[keep], scores[keep]
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores = cand[keep], scores[keep]
    return topk_select(cand, scores, k)


def _score_query_cached(
    reader: SegmentReader,
    terms: Sequence[str],
    kind: str,
    tcache: dict,
    k: int,
    exclude: Sequence[str] = (),
    min_should_match: int = 1,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray]:
    """score_query_exhaustive with per-term (docids, contrib) reuse —
    bit-identical results (same contribs, same accumulation order and
    dtype: float32 default, float64 in the SQL-oracle-parity mode)."""
    n_docs = reader.num_docs
    scores = np.zeros(n_docs, dtype=dtype)
    hits = np.zeros(n_docs, dtype=np.uint16)
    n_terms = len(terms)
    missing = False
    for term in terms:
        e = tcache[term]
        if e is None:
            missing = True
            continue
        docids, contrib = e
        scores[docids] += contrib
        hits[docids] += 1
    if kind == "and":
        if missing:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        cand = np.nonzero(hits == n_terms)[0]
    else:
        cand = np.nonzero(hits >= max(1, min_should_match))[0]
    scores_c = scores[cand]
    if len(exclude) and len(cand):
        banned = np.zeros(n_docs, dtype=bool)
        for term in exclude:
            e = tcache.get(term)
            if e is not None:
                banned[e[0]] = True
        keep = ~banned[cand]
        cand, scores_c = cand[keep], scores_c[keep]
    if reader.deleted is not None and len(cand):
        keep = ~reader.deleted[cand]
        cand, scores_c = cand[keep], scores_c[keep]
    return topk_select(cand, scores_c, k)


def lookup_urls(seg_dir: str, local_docids: np.ndarray) -> List[str]:
    """Fetch urls for winner docids only — reads just the row groups that
    contain them (docmap is written sorted with fixed row_group_size), the
    analog of Solr's second-phase GET_FIELDS fetch (SURVEY.md §3.2 step 6)."""
    if len(local_docids) == 0:
        return []
    pf = pq.ParquetFile(os.path.join(seg_dir, "docmap.parquet"))
    need = sorted(set(int(d) // DOCMAP_ROW_GROUP for d in local_docids))
    tables = [pf.read_row_group(g, columns=["local_docid", "url"]) for g in need]
    t = pa.concat_tables(tables)
    ids = t["local_docid"].to_numpy()
    urls = t["url"].to_pylist()
    pos = np.searchsorted(ids, local_docids)
    return [urls[p] for p in pos]


class SearcherStage:
    """Actor-pool stage: one batch row = one partition to search.

    State loaded once per actor (SURVEY.md §2.4 — the SolrIndexSearcher
    analog): the broadcast query set + global stats arrive via an object
    store reference (``ray.put`` once on the driver, NOT re-shipped per
    task); segment readers are cached per actor across batches."""

    def __init__(self, ctx_ref):
        import ray

        ctx = ray.get(ctx_ref) if not isinstance(ctx_ref, dict) else ctx_ref
        self.queries: List[dict] = ctx["queries"]
        self.weights: Dict[str, np.float32] = ctx["weights"]
        self.gstats: dict = {
            "term_stats": ctx.get("term_stats", {}),
            "n_docs": ctx.get("n_docs", 0),
            "sum_dl": ctx.get("sum_dl", 0),
        }
        self.avgdl = ctx["avgdl"]
        self.k = ctx["k"]
        self.method = ctx.get("method", "auto")
        self.sim = similarity_from_config(ctx.get("sim"))
        self.cache_inv = self.sim.norm_inverse_cache(self.avgdl)
        self._readers: Dict[str, SegmentReader] = {}
        self._term_caches: Dict[str, dict] = {}

    def _reader(self, seg_dir: str) -> SegmentReader:
        r = self._readers.get(seg_dir)
        if r is None:
            r = self._readers[seg_dir] = SegmentReader(seg_dir)
        return r

    def _term_cache(self, reader: SegmentReader):
        """Per-(reader, query-set) cache: each unique query term's postings
        decoded ONCE and its BM25 contribution array computed ONCE — the
        analog of Solr's documentCache/filterCache hot-term reuse
        (reference: solr/core/src/java/org/apache/solr/search/
        SolrIndexSearcher.java caches, branch_8x). Contributions depend only
        on (term, doc), not on the query, so they are shared by every query
        in the batch; per-query float32 sums still accumulate in query term
        order, keeping results bit-identical to the uncached path."""
        cache = self._term_caches.get(reader.seg_dir)
        if cache is None:
            cache = {}
            # positive terms first (they need contributions), then excludes
            for q in self.queries:
                if q["kind"] in ("prefix", "wildcard", "regexp", "fuzzy"):
                    continue
                for term in q["terms"]:
                    if term in cache:
                        continue
                    o = reader.lookup(term)
                    if o < 0:
                        cache[term] = None
                        continue
                    tp = reader.postings(o)
                    contrib = self.sim.score_freqs(
                        self.weights[term], tp.freqs, reader.norms[tp.docids], self.cache_inv
                    )
                    cache[term] = (tp.docids, contrib)
            for q in self.queries:
                for term in q.get("exclude", ()):
                    if term not in cache:
                        o = reader.lookup(term)
                        cache[term] = (reader.postings(o).docids, None) if o >= 0 else None
            self._term_caches[reader.seg_dir] = cache
        return cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .wand import score_query_wand

        out_qid, out_pid, out_doc, out_score = [], [], [], []
        self._emit_ranges = []  # (seg_dir, start, end) into the out arrays
        for row in batch.to_pylist():
            seg_dir, pid = row["seg_dir"], row["partition_id"]
            reader = self._reader(seg_dir)
            if reader.num_docs == 0:
                continue
            seg_emit_start = len(out_doc)
            use_wand = getattr(self.sim, "wand_safe", True) and (
                self.method == "wand"
                or (self.method == "auto" and reader.num_docs > 4_000_000)
            )
            tcache = None if use_wand else self._term_cache(reader)
            for q in self.queries:
                exclude = q.get("exclude", ())
                msm = int(q.get("min_should_match", 1))
                # WAND covers plain term/and/or; the extended clauses
                # (MUST_NOT, minShouldMatch>1, prefix, phrase) score
                # exhaustively
                plain = q["kind"] in ("term", "and", "or") and not exclude and msm <= 1
                if q["kind"] == "phrase":
                    docids, scores = score_query_phrase(
                        reader, q["terms"], self.weights, self.cache_inv,
                        self.sim, self.k, exclude=exclude,
                        slop=int(q.get("slop", 0)),
                    )
                elif q["kind"] == "multi_phrase":
                    docids, scores = score_query_multi_phrase(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, exclude=exclude,
                    )
                elif q["kind"] in ("span_near", "span_first", "span_not"):
                    docids, scores = score_query_span(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, exclude=exclude,
                    )
                elif q["kind"] in ("bool", "const", "dis_max", "term_range",
                                   "term_set"):
                    docids, scores = score_query_bool(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, tcache=tcache,
                    )
                elif q["kind"] == "func_boost":
                    docids, scores = score_query_func_boost(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, self.gstats, tcache=tcache,
                    )
                elif q["kind"] == "frange":
                    docids, scores = score_query_frange(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, self.gstats, tcache=tcache,
                    )
                elif q["kind"] == "rerank":
                    docids, scores = score_query_rerank(
                        reader, q, self.weights, self.cache_inv,
                        self.sim, self.k, tcache=tcache,
                    )
                elif use_wand and plain:
                    docids, scores = score_query_wand(
                        reader, q["terms"], q["kind"], self.weights,
                        self.cache_inv, self.sim, self.k,
                    )
                elif tcache is not None and q["kind"] not in (
                    "prefix", "wildcard", "regexp", "fuzzy"
                ):
                    docids, scores = _score_query_cached(
                        reader, q["terms"], q["kind"], tcache, self.k,
                        exclude=exclude, min_should_match=msm,
                        dtype=self.sim.dtype,
                    )
                else:
                    docids, scores = score_query_exhaustive(
                        reader, q["terms"], q["kind"], self.weights,
                        self.cache_inv, self.sim, self.k,
                        exclude=exclude, min_should_match=msm,
                        max_edits=int(q.get("max_edits", 2)),
                    )
                out_qid.extend([q["query_id"]] * len(docids))
                out_pid.extend([pid] * len(docids))
                out_doc.extend(docids.tolist())
                out_score.extend(scores.tolist())
            self._emit_ranges.append((seg_dir, seg_emit_start, len(out_doc)))

        # attach urls for the (few) winners — needed for the deterministic
        # global tie-break and the final result payload
        qid = np.array(out_qid, dtype=np.int32)
        pid = np.array(out_pid, dtype=np.int32)
        doc = np.array(out_doc, dtype=np.int64)
        urls: List[str] = [""] * len(doc)
        # resolve urls per segment dir over ITS OWN emitted row range (a
        # partition can have several segments after appends, so pid alone
        # is ambiguous)
        for seg_dir_u, lo, hi in self._emit_ranges:
            if hi <= lo:
                continue
            ids = doc[lo:hi]
            order = np.argsort(ids)
            fetched = lookup_urls(seg_dir_u, ids[order])
            for j, u in zip(np.arange(lo, hi)[order], fetched):
                urls[j] = u
        return pa.table(
            {
                "query_id": qid,
                "partition_id": pid,
                "local_docid": doc.astype(np.int32),
                "url": pa.array(urls, type=pa.string()),
                "score": np.array(out_score, dtype=self.sim.dtype),
            }
        )
