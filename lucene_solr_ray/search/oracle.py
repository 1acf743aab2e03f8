"""Deliberately-slow pure-Python BM25 oracle — the test ground truth.

Stand-in for Lucene's TestBM25Similarity / CheckHits reference outputs
(reference: lucene/core/src/test/org/apache/lucene/search/similarities/
TestBM25Similarity.java, lucene/test-framework/.../search/CheckHits.java,
branch_8x; SURVEY.md §5 patterns 2+5): an independent, dict-and-loop
implementation of the exact scoring semantics of SURVEY.md Appendix A —
no shared code with the engine's vectorized path beyond the SmallFloat
table and the tokenizer (which have their own golden tests). The engine
must reproduce this oracle's top-k docIDs (urls) and float32 scores
bit-exactly at every partition count.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np

from ..analysis.smallfloat import LENGTH_TABLE, _int_to_byte4_scalar
from ..analysis.tokenizer import StandardTokenizer

__all__ = ["OracleIndex"]

F32 = np.float32


class OracleIndex:
    """In-memory single-node index over raw page rows (url, warc_ts, text)."""

    def __init__(self, rows, lang: str = "en", k1: float = 1.2, b: float = 0.75):
        if rows and isinstance(rows[0], str):  # parquet path(s) accepted too
            import pyarrow.parquet as pq

            rows = [
                r
                for p in rows
                for r in pq.read_table(p, columns=["url", "warc_ts", "text", "lang"]).to_pylist()
            ]
        tok = StandardTokenizer()
        # last-wins dedup by url (max warc_ts)
        best: Dict[str, tuple] = {}
        for r in rows:
            if lang is not None and r.get("lang") != lang:
                continue
            prev = best.get(r["url"])
            if prev is None or r["warc_ts"] > prev[0]:
                best[r["url"]] = (r["warc_ts"], r["text"])
        self.urls = sorted(best)
        self.n_docs = len(self.urls)
        self.k1, self.b = k1, b

        self.postings: Dict[str, List[Tuple[int, int]]] = {}
        self.positions: Dict[str, Dict[int, List[int]]] = {}
        self.norm_bytes: List[int] = []
        sum_dl = 0
        for docid, url in enumerate(self.urls):
            toks = tok.tokenize_lower(best[url][1])
            sum_dl += len(toks)
            self.norm_bytes.append(_int_to_byte4_scalar(len(toks)))
            tf: Dict[str, int] = {}
            for p, t in enumerate(toks):
                tf[t] = tf.get(t, 0) + 1
                self.positions.setdefault(t, {}).setdefault(docid, []).append(p)
            for t, f in tf.items():
                self.postings.setdefault(t, []).append((docid, f))
        self.sum_dl = sum_dl
        # float avgdl = (float)(sumTotalTermFreq / (double) docCount)
        self.avgdl = F32(sum_dl / self.n_docs) if self.n_docs else F32(1)
        # 256-entry reciprocal norm cache, float32 arithmetic
        one, k1f, bf = F32(1), F32(k1), F32(b)
        # evaluation order pinned to match BM25Similarity's float expression:
        # 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
        self.cache = [
            F32(one / F32(k1f * F32(F32(one - bf) + F32(F32(bf * F32(LENGTH_TABLE[i])) / self.avgdl))))
            for i in range(256)
        ]

    def idf(self, term: str) -> F32:
        df = len(self.postings.get(term, ()))
        if df == 0:
            return F32(0)
        return F32(math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def score_term_doc(self, term: str, docid: int, freq: int) -> F32:
        w = self.idf(term)
        ni = self.cache[self.norm_bytes[docid]]
        return F32(w - F32(w / F32(F32(1) + F32(F32(freq) * ni))))

    def query(
        self,
        terms: List[str],
        kind: str,
        k: int,
        exclude: List[str] = (),
        min_should_match: int = 1,
        slop: int = 0,
        max_edits: int = 2,
    ) -> List[Tuple[str, float]]:
        """Top-k (url, float32 score) with tie-break (score desc, url asc).

        Kinds mirror the engine: term/or (SHOULD + minShouldMatch), and
        (MUST), prefix (constant-score 1.0); ``exclude`` = MUST_NOT."""
        if kind == "phrase":
            doc_scores = {}
            cands = []
            docsets = [set(self.positions.get(t, {})) for t in terms]
            if not docsets or not all(docsets):
                return []
            common = set.intersection(*docsets)
            w = F32(0)
            for t in terms:
                w = F32(w + self.idf(t))
            for d in sorted(common):
                if slop > 0:
                    import numpy as _np

                    from .searcher import sloppy_phrase_freq

                    plists = [
                        _np.asarray(sorted(self.positions[t][d]), dtype=_np.int64)
                        for t in terms
                    ]
                    freq = sloppy_phrase_freq(plists, slop)
                else:
                    match = set(self.positions[terms[0]][d])
                    for i, t in enumerate(terms[1:], start=1):
                        match &= {p - i for p in self.positions[t][d]}
                        if not match:
                            break
                    freq = len(match)
                if freq:
                    ni = self.cache[self.norm_bytes[d]]
                    doc_scores[d] = F32(w - F32(w / F32(F32(1) + F32(F32(freq) * ni))))
                    cands.append(d)
        elif kind in ("prefix", "wildcard", "regexp", "fuzzy"):
            import re as _re

            docs = set()
            for p in terms:
                if kind == "prefix":
                    pred = lambda t, p=p: t.startswith(p)
                elif kind == "wildcard":
                    from .multiterm import wildcard_to_regex

                    rx = _re.compile(wildcard_to_regex(p)[1])
                    pred = lambda t, rx=rx: rx.match(t) is not None
                elif kind == "regexp":
                    rx = _re.compile(f"^(?:{p})$")
                    pred = lambda t, rx=rx: rx.match(t) is not None
                else:
                    from .multiterm import levenshtein_batch
                    import numpy as _np

                    pred = lambda t, p=p: (
                        t[:1] == p[:1]
                        and int(levenshtein_batch(_np.array([t], dtype=object), p)[0])
                        <= max_edits
                    )
                for t, plist in self.postings.items():
                    if pred(t):
                        docs.update(d for d, _ in plist)
            doc_scores: Dict[int, F32] = {d: F32(1.0) for d in docs}
            cands = list(docs)
        else:
            doc_scores = {}
            doc_hits: Dict[int, int] = {}
            missing = any(t not in self.postings for t in terms)
            if kind == "and" and missing:
                return []
            for t in terms:
                for docid, freq in self.postings.get(t, ()):
                    contrib = self.score_term_doc(t, docid, freq)
                    doc_scores[docid] = F32(doc_scores.get(docid, F32(0)) + contrib)
                    doc_hits[docid] = doc_hits.get(docid, 0) + 1
            if kind == "and":
                cands = [d for d, h in doc_hits.items() if h == len(terms)]
            else:
                need = max(1, min_should_match)
                cands = [d for d, h in doc_hits.items() if h >= need]
        if exclude:
            banned = set()
            for t in exclude:
                banned.update(d for d, _ in self.postings.get(t, ()))
            cands = [d for d in cands if d not in banned]
        ranked = sorted(cands, key=lambda d: (-float(doc_scores[d]), self.urls[d]))[:k]
        return [(self.urls[d], float(doc_scores[d])) for d in ranked]

    def query_multi_phrase(
        self, positions: List[List[str]], k: int, slop: int = 0,
    ) -> List[Tuple[str, float]]:
        """MultiPhraseQuery twin (reference: lucene/core/.../search/
        MultiPhraseQuery.java + UnionPostingsEnum, branch_8x): slot i
        matches ANY of its variant terms, slot positions are the variant
        UNION, freq/score follow PhraseQuery with w = Σ idf over every
        variant with df > 0."""
        docsets = []
        for variants in positions:
            ds = set()
            for t in variants:
                ds.update(self.positions.get(t, {}))
            if not ds:
                return []
            docsets.append(ds)
        common = set.intersection(*docsets) if docsets else set()
        w = F32(0)
        for variants in positions:
            for t in variants:
                w = F32(w + self.idf(t))
        doc_scores, cands = {}, []
        for d in sorted(common):
            plists = []
            for variants in positions:
                merged = sorted({
                    p for t in variants
                    for p in self.positions.get(t, {}).get(d, ())
                })
                plists.append(merged)
            if slop > 0:
                import numpy as _np

                from .searcher import sloppy_phrase_freq

                freq = sloppy_phrase_freq(
                    [_np.asarray(pl, dtype=_np.int64) for pl in plists], slop)
            else:
                match = set(plists[0])
                for i, pl in enumerate(plists[1:], start=1):
                    match &= {p - i for p in pl}
                    if not match:
                        break
                freq = len(match)
            if freq:
                ni = self.cache[self.norm_bytes[d]]
                doc_scores[d] = F32(w - F32(w / F32(F32(1) + F32(F32(freq) * ni))))
                cands.append(d)
        ranked = sorted(
            cands, key=lambda d: (-float(doc_scores[d]), self.urls[d]))[:k]
        return [(self.urls[d], float(doc_scores[d])) for d in ranked]

    def search(self, queries: List[dict], k: int = 10):
        """Engine-shaped result frame: (query_id, rank, url, score), rank 1..k."""
        import pandas as pd

        out = []
        for q in queries:
            if q.get("kind") == "multi_phrase":
                res = self.query_multi_phrase(
                    q["positions"], k, slop=int(q.get("slop", 0)))
                for rank, (url, score) in enumerate(res, start=1):
                    out.append((q["query_id"], rank, url, score))
                continue
            res = self.query(
                q["terms"],
                q["kind"],
                k,
                exclude=q.get("exclude", ()),
                min_should_match=int(q.get("min_should_match", 1)),
                slop=int(q.get("slop", 0)),
                max_edits=int(q.get("max_edits", 2)),
            )
            for rank, (url, score) in enumerate(res, start=1):
                out.append((q["query_id"], rank, url, score))
        df = pd.DataFrame(out, columns=["query_id", "rank", "url", "score"])
        return df.astype({"query_id": "int32", "rank": "int32", "score": "float32"})
