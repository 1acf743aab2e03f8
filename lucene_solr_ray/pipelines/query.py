"""Distributed query pipeline: scatter to partition searchers, merge top-k.

The Ray-Data re-expression of Solr's distributed query (SURVEY.md §3.2;
reference trace: SearchHandler → stats phase (ExactStatsCache) → per-shard
GET_TOP_IDS with BM25+WAND → mergeIds → GET_FIELDS, branch_8x):

    queries + global stats  → ray.put (ONE broadcast, not per task)
    Dataset of partitions   → map_batches(SearcherStage actor pool)
    per-(query, partition) top-k rows
                            → groupby(query_id).map_groups(merge_topk)
    winner url lookup happens partition-side (docmap row-group reads)

Global (N, avgdl, df) come from the build-time stats table (the
ExactStatsCache behavior — per-shard IDF would NOT be rank-identical).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..index.stats import read_query_term_stats
from ..search.searcher import SearcherStage
from ..search.similarity import Bm25Similarity, similarity_from_config
from ..search.topk import merge_topk_group
from ..state.manifest import partition_segments, read_root_manifest

__all__ = ["search", "prepare_search_context", "realtime_get", "explain",
           "subquery"]


def subquery(
    index_root: str,
    parents,
    make_query,
    sub_k: int = 3,
    sim_config: Optional[dict] = None,
    method: str = "auto",
    exclude_parent: bool = True,
):
    """``[subquery]`` document transformer (reference: solr/core/src/java/
    org/apache/solr/response/transform/SubQueryAugmenterFactory.java ~300
    LoC, branch_8x; SURVEY.md §2.2 document transformers): enrich every
    parent result row with its own child top-k.

    ``parents``: a result DataFrame (query_id, rank, url, ...);
    ``make_query(row) -> query-spec dict`` parameterizes the child query
    from the parent row (the fl=[subquery] v= substitution analog). All
    child queries run as ONE batched distributed search — the scatter
    happens once for the whole parent set, never per parent.
    ``exclude_parent`` drops the parent doc itself from its children
    (Solr's common uniq-key != v exclusion).

    Returns (parent_query_id, parent_rank, parent_url, sub_rank, url,
    score) with sub_rank 1..sub_k per parent."""
    import pandas as pd

    parents = parents.reset_index(drop=True)
    specs = []
    for i, row in parents.iterrows():
        q = dict(make_query(row))
        q["query_id"] = int(i)
        specs.append(q)
    if not specs:
        return pd.DataFrame(
            columns=["parent_query_id", "parent_rank", "parent_url",
                     "sub_rank", "url", "score"]
        )
    child = search(
        index_root, specs, k=sub_k + (1 if exclude_parent else 0),
        method=method, sim_config=sim_config,
    )
    rows = []
    for i, prow in parents.iterrows():
        mine = child[child["query_id"] == i]
        if exclude_parent:
            mine = mine[mine["url"] != prow["url"]]
        mine = mine.head(sub_k)
        for sub_rank, (_, crow) in enumerate(mine.iterrows(), start=1):
            rows.append(
                {
                    "parent_query_id": prow["query_id"],
                    "parent_rank": prow["rank"],
                    "parent_url": prow["url"],
                    "sub_rank": sub_rank,
                    "url": crow["url"],
                    "score": crow["score"],
                }
            )
    return pd.DataFrame(
        rows, columns=["parent_query_id", "parent_rank", "parent_url",
                       "sub_rank", "url", "score"]
    )


def prepare_search_context(
    index_root: str, queries: List[dict], k: int, method: str = "auto",
    sim_config: Optional[dict] = None,
) -> dict:
    """Resolve global stats for the query terms and precompute weights
    (the reference's stats phase + Weight creation, done once)."""
    # classic-syntax sugar: {"query_id": i, "qstr": "+a (b OR c)"} parses
    # through the classic QueryParser grammar before normalization
    if any("qstr" in q for q in queries):
        from ..search.queryparser import parse_query

        queries = [
            {**{k: v for k, v in q.items() if k != "qstr"}, **parse_query(q["qstr"])}
            if "qstr" in q
            else q
            for q in queries
        ]
    root = read_root_manifest(index_root)
    n_docs = root["num_docs"]
    sum_dl = root["sum_dl"]
    sim = similarity_from_config(sim_config)
    avgdl = sim.avgdl(sum_dl, max(n_docs, 1))

    # query terms pass through the index's analyzer chain (lowercase +
    # configured filters) — Lucene analyzes query text with the field
    # analyzer; a filter-dropped term (stopword) drops its clause
    from ..analysis.filters import build_filter_chain
    from ..analysis.tokenizer import lowercase

    spec_filters = (root.get("analyzer_spec") or {}).get("filters", [])
    chain = build_filter_chain(spec_filters)

    # CJK-bigram index: query text must analyze the same way (Lucene's
    # QueryBuilder runs the field analyzer over query terms, so a CJK
    # query string becomes its bigrams — ALL of which must match, the
    # CJKAnalyzer search convention). Applied after the vocab filters.
    from ..analysis.cjk import CjkBigramConfig

    cjk_cfg, _, _ = CjkBigramConfig.from_spec_filters(
        [f for f in spec_filters
         if f != "shingle" and not (
             isinstance(f, dict) and f.get("name") == "shingle")]
    )

    def cjk_expand(term):
        """term → list of index terms (bigrams) or [term] unchanged."""
        if cjk_cfg is None:
            return [term]
        from ..analysis.cjk import cjk_bigram_token_list

        out, _ = cjk_bigram_token_list([term], cjk_cfg)
        return out

    def norm_term(t):
        t = lowercase(t)
        if chain is None:
            return t
        r = chain(t)
        if isinstance(r, list):
            # index-time synonym expansion already indexed every member; the
            # query term matches directly — keep it if it survived, else the
            # first expansion (one-way map rules)
            return t if t in r else r[0]
        return r

    def norm_slot(t):
        """Full expansion of one phrase position → list of index terms
        (Lucene's QueryBuilder keeps EVERY token the analyzer emits at a
        position — posInc-0 synonym expansions become MultiPhraseQuery
        slots; reference: lucene/core/.../util/QueryBuilder.java
        #analyzeMultiPhrase, branch_8x). None when the position
        normalizes away (stopword)."""
        t = lowercase(t)
        if chain is None:
            return [t]
        r = chain(t)
        if r is None:
            return None
        if isinstance(r, list):
            return list(dict.fromkeys(r)) or None
        return [r]

    # multi-term kinds carry PATTERNS, not terms: they bypass the filter
    # chain (prefix/wildcard/fuzzy are lowercased like the index terms;
    # regexp is taken verbatim — lowercasing would mangle \W-style classes)
    _PATTERN_KINDS = ("prefix", "wildcard", "fuzzy")

    def _is_null(node: dict) -> bool:
        """A clause whose every term normalized away (e.g. a stopword-only
        leaf) is a null query — QueryParserBase drops such clauses from the
        enclosing BooleanQuery rather than letting them match nothing and
        kill the conjunction (reference: lucene/queryparser/.../classic/
        QueryParserBase.java#addClause null handling, branch_8x)."""
        k = node.get("kind", "term")
        if k == "bool":
            return not any(
                node.get(s) for s in ("must", "filter", "should", "must_not"))
        if k == "const":
            return _is_null(node["of"])
        if k == "dis_max":
            return not node.get("clauses")
        if k == "multi_phrase":
            return not node.get("positions")
        if k in ("term_range", "prefix", "wildcard", "regexp", "fuzzy"):
            return False
        return not node.get("terms")

    def norm_tree(node: dict) -> dict:
        """Analyze every leaf's terms inside a nested ``bool`` tree
        (``const`` wraps one child under ``of``; boosts pass through).
        Analyzer-emptied leaves are pruned from every occur section."""
        if node.get("kind") == "bool":
            out = {k: v for k, v in node.items()
                   if k not in ("must", "filter", "should", "must_not")}
            for sec in ("must", "filter", "should", "must_not"):
                if node.get(sec):
                    kept = [c for c in (norm_tree(c) for c in node[sec])
                            if not _is_null(c)]
                    if kept:
                        out[sec] = kept
            return out
        if node.get("kind") == "const":
            return dict(node, of=norm_tree(node["of"]))
        if node.get("kind") == "dis_max":
            kept = [c for c in (norm_tree(c) for c in node.get("clauses", ()))
                    if not _is_null(c)]
            return dict(node, clauses=kept)
        if node.get("kind") == "phrase":
            # analyze each position with the FULL expansion: a slot the
            # analyzer expands into several terms upgrades the query to
            # MultiPhraseQuery, mirroring QueryBuilder#analyzeMultiPhrase
            slots = [s for s in (norm_slot(t) for t in node["terms"]) if s]
            if any(len(s) > 1 for s in slots):
                nn = {k: v for k, v in node.items()
                      if k not in ("kind", "terms")}
                nn["kind"] = "multi_phrase"
                nn["positions"] = slots
                return nn
            return dict(node, terms=[s[0] for s in slots])
        if node.get("kind") == "multi_phrase":
            slots = []
            for variants in node["positions"]:
                merged: list = []
                for t in variants:
                    s = norm_slot(t)
                    if s:
                        merged.extend(x for x in s if x not in merged)
                if merged:
                    slots.append(merged)
            return dict(node, positions=slots)
        if node.get("kind") == "term_range":
            # bounds are lowercased like index terms; open bounds pass through
            return dict(
                node,
                **{k: (lowercase(node[k]) if node.get(k) not in (None, "*")
                       else node.get(k))
                   for k in ("lo", "hi") if k in node},
            )
        if node.get("kind") == "term_set":
            # TermsQParser semantics: raw index terms, no analysis
            return dict(node, terms=list(node["terms"]))
        if node.get("kind") == "span_not":
            # SpanNotQuery: analyze include like any span node; exclude
            # terms analyze per-token with synonym variants flattened in
            # (any variant occurrence kills the span). Top-level "terms"
            # = include leaves only — exclude needs postings, not idf.
            inc = norm_tree(node["include"])
            ex: list = []
            for t in node.get("exclude_terms", ()):
                for v in norm_slot(t) or ():
                    if v not in ex:
                        ex.append(v)
            inc_terms = (
                [t for s in inc["slots"] for t in s]
                if inc.get("slots") else list(inc.get("terms", ()))
            )
            return dict(node, include=inc, exclude_terms=ex,
                        terms=sorted(set(inc_terms)))
        if node.get("kind") in ("span_near", "span_first") and node.get("slots"):
            # SpanNear over SpanOr clauses: analyze every variant per slot
            # (posInc-0 expansions merge in, like multi_phrase); a slot
            # whose variants ALL normalize away is dropped (hole)
            slots = []
            for slot in node["slots"]:
                merged = []
                for t in slot:
                    s = norm_slot(t)
                    if s:
                        merged.extend(x for x in s if x not in merged)
                if merged:
                    slots.append(merged)
            return dict(node, slots=slots,
                        terms=sorted({t for s in slots for t in s}))
        if node.get("kind") in ("prefix", "wildcard", "regexp", "fuzzy"):
            # patterns bypass the filter chain, same as top-level norm_query
            return dict(
                node,
                terms=[lowercase(t) for t in node["terms"]]
                if node["kind"] in _PATTERN_KINDS
                else list(node["terms"]),
            )
        return dict(
            node,
            terms=[nt for nt in (norm_term(t) for t in node["terms"]) if nt is not None],
        )

    def leaf_terms(node: dict) -> List[str]:
        if node.get("kind") == "bool":
            return [
                t
                for sec in ("must", "filter", "should", "must_not")
                for c in node.get(sec, ())
                for t in leaf_terms(c)
            ]
        if node.get("kind") == "const":
            return leaf_terms(node["of"])
        if node.get("kind") == "dis_max":
            return [t for c in node.get("clauses", ()) for t in leaf_terms(c)]
        if node.get("kind") == "multi_phrase":
            return [t for slot in node.get("positions", ()) for t in slot]
        if node.get("kind") in ("prefix", "wildcard", "regexp", "fuzzy",
                                "term_range", "term_set"):
            return []  # constant-score: patterns need no idf stats
        return list(node["terms"])

    def norm_query(q: dict) -> dict:
        if q.get("kind") == "term_range":
            nq = norm_tree(q)
            nq["terms"] = []
            return nq
        if q.get("kind") == "term_set":
            # constant-score: the set rides under "values" so the stats
            # broadcast never resolves df for (possibly millions of) ids;
            # "terms" stays the stats-source key and is empty here
            return dict(q, values=list(q["terms"]), terms=[])
        if q.get("kind") == "span_not":
            return norm_tree(q)
        if q.get("kind") in ("span_near", "span_first") and q.get("slots"):
            nq = norm_tree(q)
            if q.get("exclude"):
                nq["exclude"] = [
                    nt for nt in (norm_term(t) for t in q["exclude"])
                    if nt is not None
                ]
            return nq
        if q.get("kind") in ("bool", "const", "dis_max"):
            nq = norm_tree(q)
            # "terms" = every leaf term in the tree, so the stats broadcast
            # and per-actor contribution cache cover nested clauses too
            nq["terms"] = sorted(set(leaf_terms(nq)))
            return nq
        if q.get("kind") in ("phrase", "multi_phrase"):
            nq = norm_tree(q)
            if nq.get("kind") == "multi_phrase":
                # scorer reads "positions"; "terms" only feeds the stats
                # broadcast (weight = Σ idf over every slot variant)
                nq["terms"] = sorted(set(leaf_terms(nq)))
            if q.get("exclude"):
                nq["exclude"] = [
                    nt for nt in (norm_term(t) for t in q["exclude"])
                    if nt is not None
                ]
            return nq
        if q.get("kind") in ("func_boost", "frange"):
            # boost(q, vs) / {!frange}: normalize the wrapped tree; vs
            # termfreq/docfreq/idf leaves analyze their term like any
            # query term (Solr's value sources take the INDEXED term)
            from ..search.searcher import index_vs_terms

            def norm_vs(spec):
                if isinstance(spec, list) and spec and isinstance(spec[0], str):
                    if spec[0] in ("termfreq", "docfreq", "ttf",
                                   "totaltermfreq", "idf"):
                        nt = norm_term(str(spec[-1]))
                        return spec[:-1] + [nt if nt is not None else spec[-1]]
                    if spec[0] == "query":
                        # query(subq) analyzes its tree like any query
                        return ["query", norm_tree(spec[1])] + list(spec[2:])
                    return [spec[0]] + [norm_vs(a) for a in spec[1:]]
                return spec

            vs = norm_vs(q["vs"])
            vs_terms = sorted(set(index_vs_terms(vs)))
            extra = {}
            of_terms: set = set()
            if q.get("kind") == "func_boost" or "of" in q:
                of = norm_tree(q["of"])
                of_terms = set(leaf_terms(of))
                extra["of"] = of
            return dict(
                q, vs=vs, **extra,
                # "terms" feeds the per-actor term cache + weights: the
                # wrapped tree's leaves AND every term a vs query()/stat
                # leaf scores or resolves
                terms=sorted(of_terms | set(vs_terms)),
                vs_terms=vs_terms,
            )
        if q.get("kind") == "rerank":
            of = norm_tree(q["of"])
            rq = norm_tree(q["rq"])
            return dict(
                q, of=of, rq=rq,
                terms=sorted(set(leaf_terms(of)) | set(leaf_terms(rq))),
            )
        return dict(
            q,
            terms=[nt for nt in (norm_term(t) for t in q["terms"]) if nt is not None]
            if q.get("kind") not in ("prefix", "wildcard", "regexp", "fuzzy")
            else [lowercase(t) for t in q["terms"]]
            if q.get("kind") in _PATTERN_KINDS
            else list(q["terms"]),
            **(
                {"exclude": [nt for nt in (norm_term(t) for t in q.get("exclude", ())) if nt is not None]}
                if q.get("exclude")
                else {}
            ),
        )

    queries = [norm_query(q) for q in queries]

    def cjk_rewrite(q: dict) -> dict:
        """Flat term/and/or queries against a bigram index: every CJK
        term becomes the conjunction of its bigrams (one bigram alone
        must not match). Tree/pattern kinds pass through — patterns
        address the bigram vocabulary directly."""
        kind = q.get("kind", "term")
        if kind not in ("term", "and", "or"):
            return q
        groups = [cjk_expand(t) for t in q.get("terms", ())]
        ex_groups = [cjk_expand(t) for t in q.get("exclude", ())]
        if all(len(g) == 1 for g in groups + ex_groups):
            return q
        flat_ex = sorted({t for g in ex_groups for t in g})
        # a multi-term "term" query is a SHOULD disjunction, same as "or"
        # (score_query_exhaustive semantics) — only a true conjunction
        # ("and", or a single-word "term") may absorb bigrams directly
        is_conj = kind == "and" or (kind == "term" and len(groups) <= 1)
        if is_conj and all(len(g) == 1 for g in ex_groups):
            # conjunction absorbs the bigrams directly
            return dict(q, kind="and",
                        terms=[t for g in groups for t in g])
        # disjunction (or a multi-bigram exclusion): bool tree —
        # should = per-word AND groups, must_not = per-word AND groups
        nq = {k: v for k, v in q.items()
              if k not in ("kind", "terms", "exclude", "min_should_match")}
        nq["kind"] = "bool"
        if is_conj:
            nq["must"] = [
                {"kind": "and", "terms": g} if len(g) > 1
                else {"kind": "term", "terms": g} for g in groups
            ]
        else:
            nq["should"] = [
                {"kind": "and", "terms": g} if len(g) > 1
                else {"kind": "term", "terms": g} for g in groups
            ]
            nq["min_should_match"] = int(q.get("min_should_match", 1))
        if ex_groups:
            nq["must_not"] = [
                {"kind": "and", "terms": g} if len(g) > 1
                else {"kind": "term", "terms": g} for g in ex_groups
            ]
        nq["terms"] = sorted({t for g in groups for t in g} | set(flat_ex))
        return nq

    if cjk_cfg is not None:
        queries = [cjk_rewrite(q) for q in queries]
    all_terms = sorted(
        {t for q in queries for t in q["terms"]}
        | {t for q in queries for t in q.get("vs_terms", ())}
    )
    stats = read_query_term_stats(index_root, all_terms)
    weights: Dict[str, np.floating] = {}
    for t in all_terms:
        df = stats.get(t, (0, 0))[0]
        weights[t] = sim.idf(df, n_docs)[()] if df > 0 else sim.dtype(0.0)
    return {
        "queries": queries,
        "weights": weights,
        # raw global (df, ttf) + corpus scalars for index-backed value
        # sources (docfreq/ttf/idf/numdocs/sumtotaltermfreq leaves)
        "term_stats": {t: tuple(stats.get(t, (0, 0))) for t in all_terms},
        "n_docs": int(n_docs),
        "sum_dl": int(sum_dl),
        "avgdl": float(avgdl),
        "k": k,
        "method": method,
        "sim": sim_config,
        "num_partitions": root["num_partitions"],
    }


def search(
    index_root: str,
    queries: List[dict],
    k: int = 10,
    method: str = "auto",
    concurrency: Optional[Union[int, tuple]] = None,
    as_dataset: bool = False,
    sim_config: Optional[dict] = None,
):
    """Run the fixed query set over the index.

    ``queries``: [{"query_id": int, "kind": "term"|"and"|"or",
                   "terms": [str, ...]}, ...]
    Returns a pandas DataFrame (query_id, rank, partition_id, local_docid,
    url, score:float32) sorted by (query_id, rank) — or the merged Dataset
    when ``as_dataset=True``.
    """
    ctx = prepare_search_context(index_root, queries, k, method, sim_config)
    P = ctx.pop("num_partitions")
    ctx_ref = ray.put(ctx)

    parts = [
        {"partition_id": pid, "seg_dir": seg}
        for pid in range(P)
        for seg in partition_segments(index_root, pid)
    ]
    ds = ray.data.from_items(parts)

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(2, min(ncpu, len(parts) or 1)))
    hits = ds.map_batches(
        SearcherStage,
        fn_constructor_kwargs={"ctx_ref": ctx_ref},
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )

    merged = hits.groupby("query_id").map_groups(
        lambda g: merge_topk_group(g, k), batch_format="pandas"
    )
    if as_dataset:
        return merged
    df = merged.to_pandas()
    if len(df) == 0:
        return df
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def realtime_get(index_root: str, urls: List[str]):
    """Point lookup by unique key (RealTimeGetComponent analog, reference:
    solr/core/src/java/org/apache/solr/handler/component/
    RealTimeGetComponent.java ~1,200 LoC, branch_8x; SURVEY.md §2.10).

    Routes each url to its owning partition (same hash as the build
    router), scans that partition's segments NEWEST generation first, and
    skips tombstoned docs — so an updated url resolves to its live
    version. A point-lookup API: k ≪ N. Docmaps are url-sorted, so the
    lookup reads parquet ROW-GROUP statistics (min/max url per group) and
    fetches only the one row group a url can live in — I/O per probe is
    O(row_group), not O(segment), and a 100M-doc partition costs a
    metadata read plus one ~10k-row group per url. Norms rows align 1:1
    with docmap rows (both are written in url order at build), so dl
    comes from the matching norms row group by global row index.
    """
    import bisect

    import pandas as pd
    import pyarrow.parquet as _pq

    from ..index.partitioner import part_keys
    from ..state.manifest import partition_segments, read_root_manifest

    root = read_root_manifest(index_root)
    P = root["num_partitions"]
    pks = part_keys(list(urls), P)

    meta_cache: Dict[str, tuple] = {}  # seg -> (pf_dm, mins, maxs, rg_off, pf_nn, nn_off, dead)
    rg_cache: Dict[tuple, tuple] = {}  # (seg, rg) -> (urls_list, ids)

    def seg_meta(seg: str):
        ent = meta_cache.get(seg)
        if ent is None:
            pf_dm = _pq.ParquetFile(os.path.join(seg, "docmap.parquet"))
            md = pf_dm.metadata
            url_idx = md.schema.to_arrow_schema().get_field_index("url")
            mins, maxs, off = [], [], [0]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(url_idx).statistics
                if st is None or not st.has_min_max:
                    mins = None  # stats unavailable: scan every group
                    break
                mins.append(st.min)
                maxs.append(st.max)
            for g in range(md.num_row_groups):
                off.append(off[-1] + md.row_group(g).num_rows)
            pf_nn = _pq.ParquetFile(os.path.join(seg, "norms.parquet"))
            nn_off = [0]
            for g in range(pf_nn.metadata.num_row_groups):
                nn_off.append(nn_off[-1] + pf_nn.metadata.row_group(g).num_rows)
            dpath = os.path.join(seg, "deletes.parquet")
            dead = (
                set(_pq.read_table(dpath)["local_docid"].to_pylist())
                if os.path.exists(dpath)
                else frozenset()
            )
            ent = meta_cache[seg] = (pf_dm, mins, maxs, off, pf_nn, nn_off, dead)
        return ent

    def probe(seg: str, url: str):
        """-> (local_docid, dl) | 'dead' | None."""
        pf_dm, mins, maxs, off, pf_nn, nn_off, dead = seg_meta(seg)
        if mins is None:
            groups = list(range(pf_dm.metadata.num_row_groups))
        else:
            # urls sorted across groups: the owning group is the last one
            # whose min <= url. Parquet may PREFIX-TRUNCATE string min
            # stats, which only makes recorded mins smaller — the bisect
            # lands at-or-RIGHT-of the true owner, so walk LEFT from it;
            # the loop stops once a loaded group's actual first url <= url
            # (see SegmentReader.docid_of_url).
            g = bisect.bisect_right(mins, url) - 1
            groups = list(range(g, -1, -1))
        for g in groups:
            ent = rg_cache.get((seg, g))
            if ent is None:
                t = pf_dm.read_row_group(g, columns=["local_docid", "url"])
                ent = rg_cache[(seg, g)] = (
                    t["url"].to_pylist(),
                    t["local_docid"].to_numpy(),
                )
            seg_urls, ids = ent
            i = bisect.bisect_left(seg_urls, url)
            if i < len(seg_urls) and seg_urls[i] == url:
                d = int(ids[i])
                if d in dead:
                    return "dead"
                row = off[g] + i  # global docmap row == norms row
                ng = bisect.bisect_right(nn_off, row) - 1
                dl = pf_nn.read_row_group(ng, columns=["dl"])["dl"][
                    row - nn_off[ng]
                ].as_py()
                return d, int(dl)
            if mins is not None and seg_urls and seg_urls[0] <= url:
                break  # true owner reached and url absent; stop walking
        return None

    rows = []
    for url, pid in zip(urls, pks):
        for seg in reversed(partition_segments(index_root, int(pid))):
            r = probe(seg, url)
            if r == "dead":
                continue  # tombstoned here; a newer generation owns it
            if r is not None:
                rows.append(
                    {"url": url, "partition_id": int(pid),
                     "local_docid": r[0], "dl": r[1]}
                )
                break
    return pd.DataFrame(rows, columns=["url", "partition_id", "local_docid", "dl"])


class ExplainStage:
    """Actor-pool stage for ``explain``: one batch row = one winner doc.
    Readers cached per actor; the probe finds the doc's owning segment
    (newest live generation, same rule the searcher scores under)."""

    def __init__(self, ctx_ref):
        import ray as _ray

        ctx = _ray.get(ctx_ref) if not isinstance(ctx_ref, dict) else ctx_ref
        self.index_root = ctx["index_root"]
        self.terms_by_q = ctx["terms_by_q"]
        self.weights = ctx["weights"]
        self.dfs = ctx["dfs"]
        self.sim = similarity_from_config(ctx.get("sim"))
        self.cache_inv = self.sim.norm_inverse_cache(ctx["avgdl"])
        self._readers: Dict[str, object] = {}

    def _reader(self, seg):
        from ..search.searcher import SegmentReader

        r = self._readers.get(seg)
        if r is None:
            r = self._readers[seg] = SegmentReader(seg)
        return r

    def _find(self, pid: int, url: str):
        """(reader, local_docid) of the live version of url, or None."""
        for seg in reversed(partition_segments(self.index_root, pid)):
            reader = self._reader(seg)
            if reader.num_docs == 0:
                continue
            d = reader.docid_of_url(url)
            if d is None:
                continue
            if reader.deleted is not None and reader.deleted[d]:
                continue
            return reader, d
        return None

    def __call__(self, batch: pa.Table):
        out = {"query_id": [], "url": [], "term": [], "freq": [],
               "df": [], "weight": [], "norm_length": [], "contribution": []}
        from ..analysis.smallfloat import LENGTH_TABLE

        for row in batch.to_pylist():
            qid, url, pid = row["query_id"], row["url"], row["partition_id"]
            hit = self._find(int(pid), url)
            if hit is None:
                continue
            reader, d = hit
            nb = int(reader.norms[d])
            for term in self.terms_by_q[qid]:
                o = reader.lookup(term)
                freq = 0
                if o >= 0:
                    tp = reader.postings(o)
                    i = int(np.searchsorted(tp.docids, d))
                    if i < len(tp.docids) and tp.docids[i] == d:
                        freq = int(tp.freqs[i])
                w = self.weights.get(term, self.sim.dtype(0.0))
                contrib = (
                    float(self.sim.score_freqs(
                        w, np.array([freq], dtype=np.uint32),
                        np.array([nb], dtype=np.uint8), self.cache_inv,
                    )[0])
                    if freq > 0
                    else 0.0
                )
                out["query_id"].append(qid)
                out["url"].append(url)
                out["term"].append(term)
                out["freq"].append(freq)
                out["df"].append(int(self.dfs.get(term, 0)))
                out["weight"].append(float(w))
                out["norm_length"].append(int(LENGTH_TABLE[nb]))
                out["contribution"].append(contrib)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "url": pa.array(out["url"], type=pa.string()),
                "term": pa.array(out["term"], type=pa.string()),
                "freq": pa.array(out["freq"], type=pa.int64()),
                "df": pa.array(out["df"], type=pa.int64()),
                "weight": pa.array(out["weight"], type=pa.float64()),
                "norm_length": pa.array(out["norm_length"], type=pa.int64()),
                "contribution": pa.array(out["contribution"], type=pa.float64()),
            }
        )


def explain(index_root: str, queries: List[dict], k: int = 10,
            sim_config: Optional[dict] = None, method: str = "auto"):
    """Per-term score breakdown for each query's top-k docs — the
    ``[explain]`` document transformer / ``IndexSearcher.explain`` analog
    (reference: solr/core/src/java/org/apache/solr/response/transform/
    ExplainAugmenterFactory.java + lucene IndexSearcher#explain, branch_8x;
    SURVEY.md §2.2 document transformers, §2.9 tf/idf/norm debug scalars).

    Runs the normal distributed search, then fans the k·Q winner rows
    through an ExplainStage actor pool that recomputes each (doc, term)
    contribution from the same postings/norms/global-stats state the
    scorer used. Flat term/and/or kinds only (nested trees explain their
    leaves poorly in tabular form). Returns a DataFrame
    (query_id, url, term, freq, df, weight, norm_length, contribution);
    per-(query_id, url) float32 term-order sums equal the search score."""
    for q in queries:
        if q.get("kind", "term") not in ("term", "and", "or"):
            raise ValueError("explain supports flat term/and/or queries")
    res = search(index_root, queries, k=k, sim_config=sim_config, method=method)
    ctx = prepare_search_context(index_root, queries, k, method, sim_config)
    from ..index.stats import read_query_term_stats

    all_terms = sorted({t for q in ctx["queries"] for t in q["terms"]})
    stats = read_query_term_stats(index_root, all_terms)
    ectx = {
        "index_root": index_root,
        "terms_by_q": {q["query_id"]: q["terms"] for q in ctx["queries"]},
        "weights": ctx["weights"],
        "dfs": {t: stats.get(t, (0, 0))[0] for t in all_terms},
        "avgdl": ctx["avgdl"],
        "sim": sim_config,
    }
    ectx_ref = ray.put(ectx)
    winners = ray.data.from_pandas(
        res[["query_id", "partition_id", "url"]]
    )
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    out = winners.map_batches(
        ExplainStage,
        fn_constructor_kwargs={"ctx_ref": ectx_ref},
        batch_format="pyarrow",
        concurrency=(1, max(2, min(ncpu, 8))),
    )
    import pandas as pd

    df = out.to_pandas()
    if len(df):
        df = df.sort_values(["query_id", "url", "term"]).reset_index(drop=True)
    return df
