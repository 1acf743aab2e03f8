"""Analyzer stage: the stateful actor-pool map over zero-copy Arrow batches.

Analog of Lucene's per-thread reused analysis chain (reference:
lucene/core/src/java/org/apache/lucene/analysis/Analyzer.java#ReuseStrategy,
branch_8x; SURVEY.md §2.2, §2.4): the compiled tokenizer chain is built
ONCE per actor in ``__init__`` and applied per batch in ``__call__``. Used
as ``ds.map_batches(AnalyzerStage, fn_constructor_kwargs=..., batch_format=
"pyarrow", zero_copy_batch=True, concurrency=N)``.

Output per doc is the compact per-field term-frequency map (unique terms +
freqs + field length) rather than the raw token stream — the analog of
Lucene's in-DWPT TermsHashPerField accumulation, emitted early so the
downstream shuffle moves tf maps, not text.
"""

from __future__ import annotations

import hashlib
import json
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.tokenizer import StandardTokenizer
from ..index.partitioner import part_keys

__all__ = ["AnalyzerStage", "analyzer_spec_hash", "analyze_table", "analyze"]


def analyze(text: str, spec: dict = None) -> list:
    """``analyze()`` debug entry point — the Solr
    FieldAnalysisRequestHandler / streaming-expression ``analyze()``
    evaluator analog (reference: solr/solrj/.../io/eval/AnalyzeEvaluator
    .java + solr/core/.../handler/FieldAnalysisRequestHandler.java,
    branch_8x; SURVEY.md §2.9 "analyze() ... ✦ as our analyzer debug
    entry point"): run a full analyzer spec over ONE string and return
    the emitted tokens IN ORDER — filter-dropped tokens omitted, synonym
    expansions emitted in place, shingles after their source unigrams.
    Driver-side convenience; the batch path is AnalyzerStage."""
    from ..analysis.cjk import CjkBigramConfig, cjk_bigram_token_list
    from ..analysis.filters import build_filter_chain
    from ..analysis.shingle import ShingleConfig, shingle_token_list

    spec = spec or DEFAULT_SPEC
    cf = spec.get("char_filters")
    if cf:
        from ..analysis.html import build_char_filter_chain

        chain = build_char_filter_chain(cf)
        text = chain(pa.array([text or ""], type=pa.string()))[0].as_py()
    tok = StandardTokenizer(
        max_token_length=int(spec.get("max_token_length", 255))
    )
    filters = list(spec.get("filters", []))
    sh = [
        f for f in filters
        if (isinstance(f, dict) and f.get("name") == "shingle") or f == "shingle"
    ]
    cg = [
        f for f in filters
        if isinstance(f, dict) and f.get("name") == "common_grams"
    ]
    if len(sh) > 1 or len(cg) > 1 or (sh and cg):
        raise ValueError(
            "at most one shingle/common_grams entry per analyzer spec")
    if sh or cg:
        filters = [f for f in filters if f not in sh and f not in cg]
    cjk_cfg, pre, post = CjkBigramConfig.from_spec_filters(filters)
    toks = tok.tokenize_lower(text or "")
    if cjk_cfg is not None:
        # vocabulary filters listed BEFORE cjk_bigram fold the stream
        # first (CJKAnalyzer: width fold precedes bigramming)
        pre_chain = build_filter_chain(pre)
        if pre_chain is not None:
            folded = []
            for t in toks:
                r = pre_chain(t)
                if r is None or r == "":
                    continue
                if isinstance(r, list):
                    raise ValueError(
                        "expanding filters are unsupported before cjk_bigram")
                folded.append(r)
            toks = folded
        toks, _dl = cjk_bigram_token_list(toks, cjk_cfg)
        filters = post
    if sh:
        args = dict(sh[0]) if isinstance(sh[0], dict) else {}
        args.pop("name", None)
        toks, _dl = shingle_token_list(toks, ShingleConfig.from_args(args))
    if cg:
        from ..analysis.commongrams import (
            CommonGramsConfig,
            common_grams_token_list,
        )

        args = dict(cg[0])
        args.pop("name", None)
        toks, _dl = common_grams_token_list(
            toks, CommonGramsConfig.from_args(args))
    chain = build_filter_chain(filters)
    if chain is None:
        return toks
    out = []
    for t in toks:
        r = chain(t)
        if r is None or r == "":
            continue
        out.extend(r if isinstance(r, list) else [r])
    return out


def analyzer_spec_hash(spec: dict) -> str:
    """Stable hash of the analyzer config — part of every segment's lineage
    (a stale-config resume must invalidate old segments; SURVEY.md §7.4.6)."""
    return hashlib.sha256(json.dumps(spec, sort_keys=True).encode()).hexdigest()[:16]


DEFAULT_SPEC = {"tokenizer": "standard_uax29", "max_token_length": 255, "filters": ["lowercase"]}


def _tokenize_rows_regex(texts: list, tokenizer: StandardTokenizer):
    """Regex-tokenize a list of texts → (lowercased token pa.Array, doc_ids
    int64). Token boundaries come from the per-doc reference regex (exact
    semantics for non-ASCII docs); LOWERCASE runs as one Arrow
    ``utf8_lower`` kernel — codepoint-wise like Java
    ``Character.toLowerCase(int)`` (İ→i single codepoint, Σ→σ context-free;
    verified identical to tokenizer.lowercase across BMP+SMP in
    tests/test_tokenizer.py) — instead of per-token Python."""
    n = len(texts)
    toks_all: list = []
    counts = np.empty(n, dtype=np.int64)
    tokenize = tokenizer.tokenize
    for i, text in enumerate(texts):
        toks = tokenize(text) if text else []
        counts[i] = len(toks)
        toks_all.extend(toks)
    doc_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    arr = pc.utf8_lower(pa.array(toks_all, type=pa.string()))
    return arr, doc_ids


def _seq_token_list(toks, cfg):
    """Dispatch the per-doc list form of the shingle-slot sequence filter
    (ShingleConfig or CommonGramsConfig — both occupy the same analyzer
    slot; at most one per spec)."""
    from ..analysis.commongrams import CommonGramsConfig, common_grams_token_list
    from ..analysis.shingle import shingle_token_list

    if isinstance(cfg, CommonGramsConfig):
        return common_grams_token_list(toks, cfg)
    return shingle_token_list(toks, cfg)


def _seq_token_stream(tokens, doc_ids, n_docs, cfg):
    """Dispatch the flat-stream form of the shingle-slot sequence filter."""
    from ..analysis.commongrams import CommonGramsConfig, common_grams_token_stream
    from ..analysis.shingle import shingle_token_stream

    if isinstance(cfg, CommonGramsConfig):
        return common_grams_token_stream(tokens, doc_ids, n_docs, cfg)
    return shingle_token_stream(tokens, doc_ids, n_docs, cfg)


def _analyze_rows_regex(
    texts: list, tokenizer: StandardTokenizer, want_positions: bool = False,
    shingles=None, cjk=None,
) -> tuple:
    """Reference regex path for a list of texts → (per-doc term lists,
    per-doc freq arrays, dl array[, per-doc flat position arrays]).
    Exact; kept as the brute-force twin for property tests (the batch
    pipeline uses _tokenize_rows_regex + doc_tf_from_tokens)."""
    from ..analysis.shingle import shingle_token_list

    n = len(texts)
    terms_per_doc: list = []
    freqs_per_doc: list = []
    pos_per_doc: list = []
    dl = np.empty(n, dtype=np.int32)
    tokenize = tokenizer.tokenize_lower
    for i, text in enumerate(texts):
        toks = tokenize(text) if text else []
        if cjk is not None:
            from ..analysis.cjk import cjk_bigram_token_list

            toks, dl_c = cjk_bigram_token_list(toks, cjk)
            if shingles is None:
                tf = Counter(toks)
                dl[i] = dl_c
                terms_per_doc.append(list(tf.keys()))
                freqs_per_doc.append(
                    np.fromiter(tf.values(), dtype=np.int32, count=len(tf)))
                continue
        if shingles is not None:
            toks, dl_i = _seq_token_list(toks, shingles)
            tf = Counter(toks)
            dl[i] = dl_i
            terms_per_doc.append(list(tf.keys()))
            freqs_per_doc.append(np.fromiter(tf.values(), dtype=np.int32, count=len(tf)))
            continue
        tf = Counter(toks)
        dl[i] = len(toks)
        terms_per_doc.append(list(tf.keys()))
        freqs_per_doc.append(np.fromiter(tf.values(), dtype=np.int32, count=len(tf)))
        if want_positions:
            posmap = {t: [] for t in tf}
            for p, t in enumerate(toks):
                posmap[t].append(p)
            flat = [p for t in tf for p in posmap[t]]  # same term order as tf
            pos_per_doc.append(np.asarray(flat, dtype=np.int32))
    if want_positions:
        return terms_per_doc, freqs_per_doc, dl, pos_per_doc
    return terms_per_doc, freqs_per_doc, dl


def _map_vocab_stream(tokens, doc_ids, chain, memo: dict):
    """Apply a 1:1 vocabulary filter chain to a flat token stream BEFORE a
    sequence filter (the CJKAnalyzer shape: CJKWidthFilter → LowerCase →
    CJKBigramFilter — width variants must fold before bigramming).
    Dropping filters (stop) remove the token; expanding filters (synonym)
    are position-sensitive and refused here."""
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    if len(tokens) == 0:
        return tokens, doc_ids
    enc = pc.dictionary_encode(tokens)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    mapped = []
    for t in vocab:
        m = memo.get(t, False)
        if m is False:
            m = chain(t)
            memo[t] = m
        if isinstance(m, list):
            raise ValueError(
                "expanding filters (synonym) are unsupported before a "
                "sequence filter — list them after cjk_bigram/shingle")
        mapped.append(m)
    if all(m == t for m, t in zip(mapped, vocab)):  # identity fast path
        return tokens, doc_ids
    keep_v = np.array([m is not None and m != "" for m in mapped], dtype=bool)
    vocab_m = pa.array([m if m else "" for m in mapped], type=pa.string())
    keep = keep_v[codes]
    codes_k = codes[keep]
    return vocab_m.take(pa.array(codes_k)), doc_ids[keep]


def _apply_seq_filters(tokens, doc_ids, n_docs, cjk, shingles, cjk_memo=None,
                       pre_chain=None, pre_memo=None):
    """Sequence filters over the flat (tokens, doc_ids) stream, in Lucene
    chain order: pre-sequence vocabulary filters (width folds etc.), CJK
    bigrams (they form the terms), shingles over the result. Returns
    (tokens, doc_ids, dl_override)."""
    dl = None
    if pre_chain is not None:
        tokens, doc_ids = _map_vocab_stream(
            tokens, doc_ids, pre_chain,
            pre_memo if pre_memo is not None else {})
        dl = np.bincount(doc_ids, minlength=n_docs).astype(np.int32)
    if cjk is not None:
        from ..analysis.cjk import cjk_bigram_token_stream

        tokens, doc_ids, dl = cjk_bigram_token_stream(
            tokens, doc_ids, n_docs, cjk, memo=cjk_memo
        )
    if shingles is not None:
        tokens, doc_ids, dl = _seq_token_stream(
            tokens, doc_ids, n_docs, shingles
        )
    return tokens, doc_ids, dl


def analyze_table(
    table: pa.Table,
    tokenizer: StandardTokenizer,
    num_partitions: int,
    want_positions: bool = False,
    shingles=None,
    cjk=None,
    cjk_memo=None,
    cjk_pre=None,
    cjk_pre_memo=None,
    char_filter=None,
) -> pa.Table:
    """Pure function core (also used by tests without Ray): pages table
    (url, warc_ts, text) → (url, warc_ts, part_key, terms, freqs, dl
    [, positions]). ``positions``: per doc, the within-doc token positions
    of its terms flattened in term-list order (inner lengths == freqs) —
    the .pos data PhraseQuery needs.

    Pure-ASCII docs run through the vectorized numpy/Arrow fast path
    (analysis/fast_tokenizer.py); docs with any non-ASCII byte use the
    regex tokenizer — identical token output either way (property-tested)."""
    from ..analysis.fast_tokenizer import (
        _string_buffers,
        ascii_doc_mask,
        doc_tf_from_tokens,
        tokenize_ascii_buffer,
        tokens_to_string_array,
    )

    text_col = table["text"].combine_chunks()
    if isinstance(text_col, pa.ChunkedArray):
        text_col = (
            text_col.combine_chunks()
            if text_col.num_chunks
            else pa.array([], type=pa.string())
        )
    if char_filter is not None and len(text_col):
        # CharFilter slot: raw text → text, whole column, before tokenize
        text_col = char_filter(text_col)
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
    n = len(text_col)
    ascii_mask = ascii_doc_mask(text_col) if n else np.zeros(0, dtype=bool)
    m = tokenizer.max_token_length

    flat_pos = None
    if n == 0:
        empty_off = pa.array(np.zeros(1, dtype=np.int32))
        terms_arr = pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.string()))
        freqs_arr = pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32()))
        dl = np.empty(0, dtype=np.int32)
        flat_pos = np.empty(0, dtype=np.int32)
    elif ascii_mask.all():
        data, offs = _string_buffers(text_col)
        starts, lens, doc_ids = tokenize_ascii_buffer(data, offs, m)
        tokens = tokens_to_string_array(data, starts, lens)
        if shingles is not None or cjk is not None:
            tokens, doc_ids, dl_override = _apply_seq_filters(
                tokens, doc_ids, n, cjk, shingles, cjk_memo=cjk_memo,
                pre_chain=cjk_pre, pre_memo=cjk_pre_memo,
            )
            values, list_off, freqs, _ = doc_tf_from_tokens(tokens, doc_ids, n)
            dl = dl_override
        elif want_positions:
            values, list_off, freqs, dl, flat_pos = doc_tf_from_tokens(
                tokens, doc_ids, n, want_positions=True
            )
        else:
            values, list_off, freqs, dl = doc_tf_from_tokens(tokens, doc_ids, n)
        terms_arr = pa.ListArray.from_arrays(
            pa.array(list_off, type=pa.int32()), values
        )
        freqs_arr = pa.ListArray.from_arrays(
            pa.array(list_off, type=pa.int32()), pa.array(freqs)
        )
    else:
        # mixed batch: fast path on the ASCII docs, regex tokenization +
        # the SAME vectorized tf accumulation on the rest, reassembled in
        # original doc order
        ascii_idx = np.nonzero(ascii_mask)[0]
        fb_idx = np.nonzero(~ascii_mask)[0]
        sub = text_col.take(pa.array(ascii_idx))
        data, offs = _string_buffers(sub)
        starts, lens, doc_ids = tokenize_ascii_buffer(data, offs, m)
        tokens = tokens_to_string_array(data, starts, lens)
        fb = text_col.take(pa.array(fb_idx))
        if fb.null_count:
            f_tokens, f_doc_ids = _tokenize_rows_regex(fb.to_pylist(), tokenizer)
        else:
            # vectorized Unicode twin of the regex path (fast_tokenizer.
            # tokenize_utf8_buffer, property-pinned token-identical):
            # lowercase stays the one Arrow utf8_lower kernel
            from ..analysis.fast_tokenizer import tokenize_utf8_buffer

            f_data, f_offs = _string_buffers(fb)
            f_starts, f_lens, f_doc_ids = tokenize_utf8_buffer(f_data, f_offs, m)
            f_tokens = pc.utf8_lower(tokens_to_string_array(f_data, f_starts, f_lens))
        a_pos = f_pos = None
        if shingles is not None or cjk is not None:
            tokens, doc_ids, a_dl = _apply_seq_filters(
                tokens, doc_ids, len(sub), cjk, shingles, cjk_memo=cjk_memo,
                pre_chain=cjk_pre, pre_memo=cjk_pre_memo,
            )
            a_values, a_off, a_freqs, _ = doc_tf_from_tokens(tokens, doc_ids, len(sub))
            f_tokens, f_doc_ids, f_dl = _apply_seq_filters(
                f_tokens, f_doc_ids, len(fb_idx), cjk, shingles,
                cjk_memo=cjk_memo,
                pre_chain=cjk_pre, pre_memo=cjk_pre_memo,
            )
            f_values, f_off, f_freqs, _ = doc_tf_from_tokens(
                f_tokens, f_doc_ids, len(fb_idx)
            )
        elif want_positions:
            a_values, a_off, a_freqs, a_dl, a_pos = doc_tf_from_tokens(
                tokens, doc_ids, len(sub), want_positions=True
            )
            f_values, f_off, f_freqs, f_dl, f_pos = doc_tf_from_tokens(
                f_tokens, f_doc_ids, len(fb_idx), want_positions=True
            )
        else:
            a_values, a_off, a_freqs, a_dl = doc_tf_from_tokens(tokens, doc_ids, len(sub))
            f_values, f_off, f_freqs, f_dl = doc_tf_from_tokens(
                f_tokens, f_doc_ids, len(fb_idx)
            )

        def _chunkless(a):
            return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

        combined = pa.concat_arrays([_chunkless(a_values), _chunkless(f_values)])
        na_total = len(a_values)
        combined_freqs = np.concatenate([a_freqs, f_freqs]).astype(np.int32)

        # vectorized reassembly: per-doc source start in `combined`, then
        # one concat_ranges gather (same cumsum trick as the byte gather)
        from ..analysis.fast_tokenizer import concat_ranges

        counts = np.empty(n, dtype=np.int64)
        src_start = np.empty(n, dtype=np.int64)
        dl = np.empty(n, dtype=np.int32)
        counts[ascii_idx] = np.diff(a_off)
        counts[fb_idx] = np.diff(f_off)
        src_start[ascii_idx] = a_off[:-1]
        src_start[fb_idx] = na_total + f_off[:-1]
        dl[ascii_idx] = a_dl
        dl[fb_idx] = f_dl
        take_idx, list_off = concat_ranges(src_start, counts)
        values = combined.take(pa.array(take_idx))
        flat_freqs = combined_freqs[take_idx]
        terms_arr = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), values)
        freqs_arr = pa.ListArray.from_arrays(
            pa.array(list_off, type=pa.int32()), pa.array(flat_freqs)
        )
        if want_positions:
            # positions follow the SAME entry reorder as terms: gather each
            # entry's [src_off, src_off+freq) range from the combined flat
            # position array
            combined_pos = np.concatenate([a_pos, f_pos]).astype(np.int32)
            src_pos_off = np.zeros(len(combined_freqs) + 1, dtype=np.int64)
            np.cumsum(combined_freqs.astype(np.int64), out=src_pos_off[1:])
            gather, _ = concat_ranges(
                src_pos_off[take_idx], flat_freqs.astype(np.int64)
            )
            flat_pos = combined_pos[gather]

    # the route stage already computed part_key for resume filtering —
    # reuse it instead of re-hashing every url
    if "part_key" in table.column_names:
        pk = table["part_key"]
    else:
        pk = part_keys(table["url"], num_partitions)
    cols = {
        "url": table["url"],
        "warc_ts": table["warc_ts"],
        "part_key": pk,
        "terms": terms_arr,
        "freqs": freqs_arr,
        "dl": dl,
    }
    if want_positions:
        pos_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dl.astype(np.int64), out=pos_off[1:])
        cols["positions"] = pa.ListArray.from_arrays(
            pa.array(pos_off, type=pa.int32()), pa.array(flat_pos)
        )
    return pa.table(cols)


def apply_token_filters(table: pa.Table, chain, memo: dict) -> pa.Table:
    """Apply a post-lowercase filter chain to the analyzer output table,
    VOCABULARY-wise: each unique term maps through the chain once (memoized
    across batches in ``memo``); dropped terms shrink dl, collapsed terms
    (stemming) merge their freqs.

    Positions-aware: when the table carries a ``positions`` column, each
    surviving occurrence keeps its ORIGINAL within-doc position — dropped
    terms (stopwords) leave holes, exactly Lucene's StopFilter with
    enablePositionIncrements=true; collapsed terms merge + re-sort their
    position lists; expansions (synonyms) copy the source positions
    (posInc-0 overlay). Output stays in the writer's invariant: per doc,
    positions flattened in term-list order, inner lengths == freqs."""
    terms_col = table["terms"].combine_chunks()
    values = pc.list_flatten(terms_col)
    offsets = np.asarray(pc.list_value_length(terms_col).to_numpy(), dtype=np.int64)
    doc_ids = np.repeat(np.arange(len(table), dtype=np.int64), offsets)
    freqs = pc.list_flatten(table["freqs"].combine_chunks()).to_numpy()
    has_pos = "positions" in table.column_names
    if has_pos:
        flat_pos_src = pc.list_flatten(
            table["positions"].combine_chunks()).to_numpy().astype(np.int32)
        ent_off = np.zeros(len(freqs) + 1, dtype=np.int64)
        np.cumsum(freqs.astype(np.int64), out=ent_off[1:])

    enc = pc.dictionary_encode(values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    mapped = []
    for t in vocab:
        m = memo.get(t, False)
        if m is False:
            m = chain(t)
            memo[t] = m
        mapped.append(m)

    # a chain result may be None (dropped), a str (1:1), or a list
    # (synonym expansion, posIncr-0 semantics: expansion terms share the
    # original's freq and do NOT count toward dl — discountOverlaps=true)
    out_lists = [
        [] if m is None else ([m] if isinstance(m, str) else list(m)) for m in mapped
    ]
    fanout = np.fromiter((len(l) for l in out_lists), dtype=np.int64, count=len(out_lists))
    rep = fanout[codes]
    doc_ids_k = np.repeat(doc_ids, rep)
    freqs_k = np.repeat(freqs, rep)
    # expanded entry's output code: code_start[code] + within-entry index
    flat_out = [s for l in out_lists for s in l]
    code_start = np.zeros(len(out_lists) + 1, dtype=np.int64)
    np.cumsum(fanout, out=code_start[1:])
    out_enc = pc.dictionary_encode(pa.array(flat_out, type=pa.string()))
    flat_codes = out_enc.indices.to_numpy().astype(np.int64)
    new_dict = out_enc.dictionary
    total_k = int(rep.sum())
    within = np.arange(total_k, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(rep)[:-1])), rep
    )
    entry_codes = flat_codes[np.repeat(code_start[codes], rep) + within]

    key = (doc_ids_k << 32) | entry_codes
    if has_pos:
        # occurrence-level positions: expanded entry e inherits its source
        # entry's position slice; lexsort groups by (doc, out-term) in the
        # same ascending-key order as the entry argsort below, with merged
        # position lists re-sorted ascending
        from ..analysis.fast_tokenizer import concat_ranges

        src_entry = np.repeat(np.arange(len(codes), dtype=np.int64), rep)
        gat, _ = concat_ranges(ent_off[src_entry], freqs_k.astype(np.int64))
        occ_pos = flat_pos_src[gat]
        occ_key = np.repeat(key, freqs_k)
        occ_ord = np.lexsort((occ_pos, occ_key))
        occ_pos_s = occ_pos[occ_ord]
    order = np.argsort(key, kind="stable")
    key_s, freqs_s = key[order], freqs_k[order]
    boundary = np.ones(len(key_s), dtype=bool)
    boundary[1:] = key_s[1:] != key_s[:-1]
    grp = np.cumsum(boundary.view(np.int8), dtype=np.int64) - 1
    uniq_key = key_s[boundary]
    sum_freq = (
        np.bincount(grp, weights=freqs_s.astype(np.float64)).astype(np.int32)
        if len(grp)
        else np.empty(0, dtype=np.int32)
    )
    u_docs = (uniq_key >> 32).astype(np.int64)
    u_codes = (uniq_key & 0xFFFFFFFF).astype(np.int64)
    n = len(table)
    list_off = np.searchsorted(u_docs, np.arange(n + 1, dtype=np.int64))
    out_values = new_dict.take(pa.array(u_codes))
    # dl counts each ORIGINAL surviving token once (expansions are
    # position-overlapping and discounted)
    survived = rep > 0
    dl = np.bincount(
        doc_ids[survived], weights=freqs[survived].astype(np.float64), minlength=n
    ).astype(np.int32)

    terms_arr = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), out_values)
    freqs_arr = pa.ListArray.from_arrays(pa.array(list_off, type=pa.int32()), pa.array(sum_freq))
    out = table.set_column(table.schema.get_field_index("terms"), "terms", terms_arr)
    out = out.set_column(out.schema.get_field_index("freqs"), "freqs", freqs_arr)
    if has_pos:
        doc_occ = (
            np.bincount(u_docs, weights=sum_freq.astype(np.float64),
                        minlength=n).astype(np.int64)
            if len(grp) else np.zeros(n, dtype=np.int64)
        )
        pos_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(doc_occ, out=pos_off[1:])
        pos_arr = pa.ListArray.from_arrays(
            pa.array(pos_off, type=pa.int32()),
            pa.array(occ_pos_s if len(grp) else
                     np.empty(0, dtype=np.int32)),
        )
        out = out.set_column(
            out.schema.get_field_index("positions"), "positions", pos_arr)
    return out.set_column(out.schema.get_field_index("dl"), "dl", pa.array(dl))


class AnalyzerStage:
    """Callable class → Ray actor pool; tokenizer + filter chain compiled
    once per actor (the Analyzer.ReuseStrategy analog); term→filtered-term
    results memoized across batches."""

    def __init__(
        self,
        num_partitions: int,
        max_token_length: int = 255,
        spec: dict = None,
        store_positions: bool = False,
    ):
        from ..analysis.filters import build_filter_chain
        from ..analysis.shingle import ShingleConfig

        spec = spec or DEFAULT_SPEC
        self.tokenizer = StandardTokenizer(
            max_token_length=int(spec.get("max_token_length", max_token_length))
        )
        self.num_partitions = num_partitions
        # shingle is a SEQUENCE filter (needs adjacent tokens), so it is
        # pulled out of the filter list and applied at tokenize time; the
        # remaining vocabulary-wise filters then see shingled terms too
        # (matching a Lucene chain with ShingleFilter first)
        filters = list(spec.get("filters", []))
        sh = [
            f for f in filters
            if (isinstance(f, dict) and f.get("name") == "shingle") or f == "shingle"
        ]
        cg = [
            f for f in filters
            if isinstance(f, dict) and f.get("name") == "common_grams"
        ]
        if len(sh) > 1 or len(cg) > 1 or (sh and cg):
            raise ValueError(
                "at most one shingle/common_grams entry per analyzer spec")
        self.shingles = None
        if sh:
            args = dict(sh[0]) if isinstance(sh[0], dict) else {}
            args.pop("name", None)
            self.shingles = ShingleConfig.from_args(args)
            filters = [f for f in filters if f not in sh]
        if cg:
            # CommonGramsFilter occupies the same sequence-filter slot as
            # shingle (dispatched by config type in _seq_token_*)
            from ..analysis.commongrams import CommonGramsConfig

            args = dict(cg[0])
            args.pop("name", None)
            self.shingles = CommonGramsConfig.from_args(args)
            filters = [f for f in filters if f not in cg]
        # cjk_bigram is a SEQUENCE filter too (adjacent-token state);
        # vocabulary filters listed BEFORE it fold the token stream first
        # (CJKAnalyzer: width fold precedes bigramming), filters AFTER it
        # see bigram terms
        from ..analysis.cjk import CjkBigramConfig
        from ..analysis.html import build_char_filter_chain

        self.char_filter = build_char_filter_chain(spec.get("char_filters"))
        self.cjk, pre, post = CjkBigramConfig.from_spec_filters(filters)
        self._cjk_memo: dict = {}
        self._cjk_pre_memo: dict = {}
        self.cjk_pre = build_filter_chain(pre) if self.cjk is not None else None
        self.chain = build_filter_chain(
            post if self.cjk is not None else filters)
        if store_positions and (
            self.shingles is not None or self.cjk is not None
        ):
            # vocabulary-wise filters (stop/stem/synonym) ARE supported
            # with positions (apply_token_filters keeps original positions
            # — Lucene enablePositionIncrements=true hole semantics);
            # sequence filters re-tokenize the stream and would need their
            # own position algebra
            raise ValueError(
                "store_positions with sequence filters (shingle/cjk_bigram) "
                "is unsupported"
            )
        self.store_positions = store_positions
        self._memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = analyze_table(
            batch, self.tokenizer, self.num_partitions,
            want_positions=self.store_positions,
            shingles=self.shingles, cjk=self.cjk, cjk_memo=self._cjk_memo,
            cjk_pre=self.cjk_pre, cjk_pre_memo=self._cjk_pre_memo,
            char_filter=self.char_filter,
        )
        if self.chain is not None:
            out = apply_token_filters(out, self.chain, self._memo)
        return out
