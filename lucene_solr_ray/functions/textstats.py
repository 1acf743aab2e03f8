"""Text-analysis stages for training-data curation over a documents table.

Ray-Data-native re-creations of the reference's ingest-time text analytics
(reference anchors, branch_8x: token counting ≈ the analysis chain +
FreqProxTermsWriter term stats, SURVEY.md §2.2/§2.6; language-ID ≈
solr/contrib/langid/.../LangDetectLanguageIdentifierUpdateProcessor.java,
SURVEY.md §2.2; signatures ≈ solr/core/.../processor/SignatureUpdate-
ProcessorFactory.java + TextProfileSignature.java, SURVEY.md §2.7), plus
the quality-scoring stages a 100 TB pretraining pipeline needs.

All stages are vectorized ``map_batches`` bodies over Arrow batches; the
language-ID model (character n-gram profiles) is compiled once per actor.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "token_count_batch",
    "doc_stats_batch",
    "fingerprint_batch",
    "rolling_fingerprint",
    "LangIdStage",
    "quality_score_batch",
    "ngram_repetition_batch",
]

_WS = re.compile(r"\s+")
# BPE-ish pre-tokenizer: word pieces / numbers / punctuation runs (the
# GPT-2-style pre-split regex shape, public knowledge)
_BPEISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+")

STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to was were will with".split()
)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(id..., n_tokens, n_bpeish) — whitespace count vectorized via Arrow
    split; BPE-ish count via the compiled regex."""
    texts = batch[text_col].to_pylist()
    ws = pc.list_value_length(pc.split_pattern_regex(batch[text_col], r"\s+")).to_numpy(
        zero_copy_only=False
    )
    # empty string → split gives [''] (len 1); fix to 0
    empty = pc.equal(batch[text_col], "").to_numpy(zero_copy_only=False)
    ws = np.where(empty, 0, ws)
    bpe = np.fromiter(
        (len(_BPEISH.findall(t)) for t in texts), dtype=np.int64, count=len(texts)
    )
    return batch.append_column("n_tokens", pa.array(ws.astype(np.int64))).append_column(
        "n_bpeish", pa.array(bpe)
    )


def _split_tokens(texts, pattern: str = " "):
    """(lens, flat_tokens, doc_index) via Arrow kernels — single-space
    split to match the SQL ``string_split(text, ' ')`` oracle exactly."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, pattern)
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return lens, flat, idx


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc term statistics: n_tokens, n_unique_tokens, max term freq —
    one Arrow group_by over the batch's (doc, token) pairs instead of a
    Python Counter per row."""
    n = batch.num_rows
    lens, flat, idx = _split_tokens(batch[text_col])
    n_uniq = np.zeros(n, dtype=np.int64)
    max_f = np.zeros(n, dtype=np.int64)
    if len(flat):
        tf = (
            pa.table({"i": idx, "t": flat})
            .group_by(["i", "t"])
            .aggregate([("t", "count")])
        )
        per = tf.group_by("i").aggregate([("t_count", "count"), ("t_count", "max")])
        ii = per["i"].to_numpy()
        n_uniq[ii] = per["t_count_count"].to_numpy()
        max_f[ii] = per["t_count_max"].to_numpy()
    return (
        batch.append_column("n_tokens", pa.array(lens))
        .append_column("n_unique", pa.array(n_uniq))
        .append_column("max_freq", pa.array(max_f))
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Exact content signature: md5 hex of the raw text bytes (the
    SignatureUpdateProcessor MD5Signature analog)."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, type=pa.string()))


def rolling_fingerprint(text: str, window: int = 8, base: int = 1_000_003) -> int:
    """Deterministic rolling-hash document fingerprint (TextProfileSignature
    spirit: content-shape hash robust to trailing noise): polynomial hash of
    token-window hashes, XOR-combined so token order within windows matters
    but global order perturbations degrade gracefully."""
    toks = text.split()
    if not toks:
        return 0
    hs = [int(hashlib.blake2b(t.encode(), digest_size=8).hexdigest(), 16) for t in toks]
    acc = 0
    h = 0
    for i, v in enumerate(hs):
        h = (h * base + v) % (1 << 61)
        if i >= window - 1:
            acc ^= h
    return acc if len(hs) >= window else h


class LangIdStage:
    """Character-n-gram language identification (public n-gram-profile
    technique; the langid contrib analog). Profiles are tiny built-in
    priors over frequent trigrams + stopwords per language — compiled once
    per actor, applied per batch."""

    PROFILES: Dict[str, List[str]] = {
        "en": ["the", "and", "ing", "ion", " th", "of ", "to ", " a ", "is "],
        "de": ["der", "die", "und", "ein", "sch", "ich", "en ", " de", "ung"],
        "fr": ["les", "de ", "ent", "le ", "la ", "des", "que", " et", "ion"],
        "es": ["de ", "la ", "que", "el ", "en ", "los", "ión", " es", "ado"],
        "zh": [],  # CJK detected by codepoint class below
    }

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {
            lang: frozenset(grams) for lang, grams in self.PROFILES.items()
        }
        # ordered (lang, gram) pairs compiled once per actor — scoring runs
        # as one vectorized match_substring per profile gram (few dozen C
        # kernel calls per batch instead of a Python trigram set per row)
        self.scored_langs = [l for l, p in self.PROFILES.items() if p]
        self.cjk = re.compile(r"[一-鿿㐀-䶿]")

    def detect(self, text: str) -> str:
        """Scalar reference path (kept for tests/debug)."""
        if self.cjk.search(text):
            return "zh"
        t = f" {text.lower()} "
        grams = {t[i : i + 3] for i in range(len(t) - 2)}
        best, best_score = "und", 0
        for lang, prof in self.profiles.items():
            if not prof:
                continue
            score = len(grams & prof)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        padded = pc.binary_join_element_wise(
            pa.array([" "] * n), pc.utf8_lower(texts), pa.array([" "] * n), ""
        )
        scores = np.zeros((n, len(self.scored_langs)), dtype=np.int64)
        for j, lang in enumerate(self.scored_langs):
            for gram in self.PROFILES[lang]:
                scores[:, j] += pc.match_substring(padded, gram).to_numpy(
                    zero_copy_only=False
                )
        best_j = scores.argmax(axis=1)
        best_s = scores[np.arange(n), best_j]
        langs = np.array(self.scored_langs, dtype=object)
        preds = np.where(best_s > 0, langs[best_j], "und")
        is_cjk = pc.match_substring_regex(texts, r"[一-鿿㐀-䶿]").to_numpy(
            zero_copy_only=False
        )
        preds = np.where(is_cjk, "zh", preds)
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), type=pa.string())
        )


def ngram_repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style top n-gram repetition signals (published pretraining
    curation heuristic): the fraction of a document's tokens covered by its
    single most frequent word bigram / trigram, integer-scaled x1e6 (token
    fraction; the paper's char-fraction variant differs only in the weight
    column). Fully vectorized: n-grams materialize as shifted views over the
    batch's flat token array (an n-gram exists where the shifted doc index
    matches), one Arrow group_by counts (doc, gram) pairs, a second takes
    the per-doc max — no Python loop over rows or tokens."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = batch.num_rows
    lens, flat, idx = _split_tokens(texts)
    out = {}
    for order, name in ((2, "top_bigram_frac_e6"), (3, "top_trigram_frac_e6")):
        top = np.zeros(n, dtype=np.int64)
        if len(flat) >= order:
            same = idx[: -(order - 1)] == idx[order - 1 :]
            parts = [flat.slice(k, len(flat) - order + 1) for k in range(order)]
            grams = pc.binary_join_element_wise(*parts, " ")
            gidx = idx[: -(order - 1)][same]
            per = (
                pa.table({"i": gidx, "g": pa.array(grams.filter(pa.array(same)))})
                .group_by(["i", "g"])
                .aggregate([("g", "count")])
            )
            if per.num_rows:
                mx = per.group_by("i").aggregate([("g_count", "max")])
                top[mx["i"].to_numpy()] = mx["g_count_max"].to_numpy()
        frac = order * top * 1_000_000 // np.maximum(lens, 1)
        frac[lens < order] = 0
        out[name] = frac
    res = batch
    for name, arr in out.items():
        res = res.append_column(name, pa.array(arr))
    return res


def url_normalize_batch(batch: pa.Table, url_col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    """URL canonicalization for webtext dedup keys (public crawl-pipeline
    practice; the uniqueKey-normalization step ahead of
    SignatureUpdateProcessor-style dedup). Rules, in order:

    1. drop the #fragment;
    2. lowercase scheme and host (path/query case-sensitive per RFC 3986);
    3. strip utm_* tracking query params (tidying separators);
    4. drop a trailing slash (not after another slash).

    All steps are RE2/Arrow kernels over the whole column — each rule is
    one C call per batch, mirrored 1:1 by a SQL regexp_replace chain."""
    u = batch[url_col]
    if isinstance(u, pa.ChunkedArray):
        u = u.combine_chunks()
    # 1. fragment
    u = pc.replace_substring_regex(u, r"#.*$", "")
    # 2. lowercase scheme://host. Scheme-less rows (no '://' — malformed
    # crawl URLs) pass through untouched: list_element(parts, 1) would
    # raise ArrowInvalid for the whole batch on a single such row.
    has_scheme = pc.match_substring_regex(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    scheme = pc.utf8_lower(pc.replace_substring_regex(u, r"://.*$", ""))
    rest = pc.replace_substring_regex(u, r"^[^:/?#]*://", "")
    host = pc.utf8_lower(pc.replace_substring_regex(rest, r"/.*$", ""))
    path = pc.replace_substring_regex(rest, r"^[^/]*", "")
    norm = pc.binary_join_element_wise(
        pc.binary_join_element_wise(scheme, host, "://"), path, ""
    )
    u = pc.if_else(has_scheme, norm, u)
    # 3. utm params: mid-query (followed by &) then trailing (with its sep)
    u = pc.replace_substring_regex(u, r"utm_[a-z]+=[^&#]*&", "")
    u = pc.replace_substring_regex(u, r"[?&]utm_[a-z]+=[^&#]*$", "")
    # 4. trailing slash
    u = pc.replace_substring_regex(u, r"([^/])/$", r"\1")
    return batch.append_column(out_col, u)


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals (Gopher/C4-style public heuristics):
    mean word length, stopword ratio, alpha ratio, repetition ratio —
    integer-scaled (x1e6). Fully vectorized: Arrow split/length/is_in
    kernels + per-doc ``add.reduceat`` + one group_by for distincts (the
    per-character Python loop was the slowest possible inner loop for a
    map-heavy curation stage)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = batch.num_rows
    lens, flat, idx = _split_tokens(texts)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    mean_wl = np.zeros(n, dtype=np.int64)
    stop_r = np.zeros(n, dtype=np.int64)
    alpha_r = np.zeros(n, dtype=np.int64)
    rep_r = np.zeros(n, dtype=np.int64)
    if len(flat):
        tok_len = pc.utf8_length(flat).to_numpy().astype(np.int64)
        is_stop = (
            pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS)))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        safe_starts = np.minimum(starts, len(flat) - 1)
        sum_len = np.add.reduceat(tok_len, safe_starts)
        n_stop = np.add.reduceat(is_stop, safe_starts)
        sum_len[lens == 0] = 0
        n_stop[lens == 0] = 0
        uniq = np.zeros(n, dtype=np.int64)
        per = (
            pa.table({"i": idx, "t": flat})
            .group_by(["i", "t"])
            .aggregate([])
            .group_by("i")
            .aggregate([("i", "count")])
        )
        uniq[per["i"].to_numpy()] = per["i_count"].to_numpy()
        n_chars = pc.utf8_length(texts).to_numpy().astype(np.int64)
        n_alpha = (
            pc.utf8_length(pc.replace_substring_regex(texts, "[^a-z]", ""))
            .to_numpy()
            .astype(np.int64)
        )
        total = np.maximum(lens, 1)
        mean_wl = sum_len * 1_000_000 // total
        stop_r = n_stop * 1_000_000 // total
        alpha_r = n_alpha * 1_000_000 // np.maximum(n_chars, 1)
        rep_r = (lens - uniq) * 1_000_000 // total
        zero = lens == 0
        mean_wl[zero] = 0
        stop_r[zero] = 0
        rep_r[zero] = 0
    return (
        batch.append_column("mean_word_len_e6", pa.array(mean_wl))
        .append_column("stopword_ratio_e6", pa.array(stop_r))
        .append_column("alpha_ratio_e6", pa.array(alpha_r))
        .append_column("repetition_ratio_e6", pa.array(rep_r))
    )


def path_prefix_explode(batch: pa.Table, col: str,
                        keep_cols: List[str] = (),
                        out_col: str = "path_prefix",
                        delimiter: str = "/") -> pa.Table:
    """PathHierarchyTokenizer analog (reference: lucene/analysis/common/
    src/java/org/apache/lucene/analysis/path/PathHierarchyTokenizer.java
    ~150 LoC, branch_8x; SURVEY.md §2.2): one output row per cumulative
    path prefix — "/a/b/c" emits "/a", "/a/b", "/a/b/c" (the bare empty
    token a leading delimiter would produce is not emitted, matching the
    reference's behavior of including the leading delimiter in the first
    token). The classic use is hierarchical faceting on URL paths.

    Vectorized as one RE2 ``extract_regex`` kernel PER DEPTH over the
    whole column (depth-k prefix = first k delimiter-separated segments);
    path depth is small and bounded, so this is ~max-depth C passes, no
    per-row Python. A ``map_batches`` body: output rows carry
    ``keep_cols`` + (out_col, depth)."""
    d = re.escape(delimiter)
    s = pc.cast(batch[col], pa.string())
    n_seg = pc.list_value_length(pc.split_pattern(s, delimiter))
    max_depth = int(pc.max(n_seg).as_py() or 0) if batch.num_rows else 0
    prefixes, depths, take_idx = [], [], []
    for k in range(1, max_depth + 1):
        pat = f"^(?P<p>[^{d}]*(?:{d}[^{d}]*){{{k - 1}}})"
        m = pc.struct_field(pc.extract_regex(s, pat), "p")
        # a row emits depth k iff it has ≥ k segments AND the prefix is
        # non-empty (excludes the empty leading-segment token)
        ok = pc.and_(
            pc.and_(pc.is_valid(m), pc.greater_equal(n_seg, k)),
            pc.not_equal(m, ""),
        )
        idx = np.nonzero(ok.to_numpy(zero_copy_only=False))[0]
        if len(idx) == 0:
            continue
        prefixes.append(pc.take(m, pa.array(idx)))
        depths.append(np.full(len(idx), k, dtype=np.int64))
        take_idx.append(idx)
    if not prefixes:
        out = {c: batch[c].slice(0, 0) for c in keep_cols}
        out[out_col] = pa.array([], type=pa.string())
        out["depth"] = pa.array([], type=pa.int64())
        return pa.table(out)
    all_idx = pa.array(np.concatenate(take_idx))
    out = {c: pc.take(batch[c], all_idx) for c in keep_cols}
    out[out_col] = pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
         for p in prefixes])
    out["depth"] = pa.array(np.concatenate(depths))
    return pa.table(out)


def term_vectors_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """TermVectorComponent analog (reference: solr/core/src/java/org/
    apache/solr/handler/component/TermVectorComponent.java ~450 LoC,
    branch_8x; SURVEY.md §2.6): per-document term vectors — one row per
    (doc, term) with tf and the first/last 0-based within-doc positions
    (the positions/offsets payload a MoreLikeThis or highlight consumer
    reads). Solr serves these from stored term vectors; this engine
    re-derives them from the stored text in one streaming pass, which is
    the reference's own documented fallback when termVectors="false".

    Fully map-side (a doc's tokens never split across rows): Arrow split
    + dictionary-encode, then one lexsort + run-length reduce per batch —
    no shuffle, no per-row Python."""
    lens, flat, idx = _split_tokens(batch[text_col])
    if len(idx) == 0:
        return pa.table({
            id_col: batch[id_col].slice(0, 0),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "first_pos": pa.array([], type=pa.int64()),
            "last_pos": pa.array([], type=pa.int64()),
        })
    starts_of_doc = np.cumsum(lens) - lens
    pos = np.arange(len(idx), dtype=np.int64) - np.repeat(starts_of_doc, lens)
    de = flat.dictionary_encode()
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pos, codes, idx))
    di, ci, pi = idx[order], codes[order], pos[order]
    new = np.empty(len(di), dtype=bool)
    new[:1] = True
    new[1:] = (di[1:] != di[:-1]) | (ci[1:] != ci[:-1])
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], len(di))
    ids = pc.take(batch[id_col], pa.array(di[starts]))
    terms = pc.take(de.dictionary, pa.array(ci[starts]))
    return pa.table({
        id_col: ids,
        "term": pc.cast(terms, pa.string()),
        "tf": pa.array((ends - starts).astype(np.int64)),
        "first_pos": pa.array(pi[starts]),
        "last_pos": pa.array(pi[ends - 1]),
    })
