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


def doc_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc term statistics: n_tokens, n_unique_tokens, max term freq."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_tok = np.empty(n, dtype=np.int64)
    n_uniq = np.empty(n, dtype=np.int64)
    max_f = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        n_tok[i] = len(toks)
        if toks:
            c = Counter(toks)
            n_uniq[i] = len(c)
            max_f[i] = max(c.values())
        else:
            n_uniq[i] = 0
            max_f[i] = 0
    return (
        batch.append_column("n_tokens", pa.array(n_tok))
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
        self.cjk = re.compile(r"[一-鿿㐀-䶿]")

    def detect(self, text: str) -> str:
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
        preds = [self.detect(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, type=pa.string()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality signals (Gopher/C4-style public heuristics):
    mean word length, stopword ratio, alpha ratio, repetition ratio —
    emitted as integer-scaled columns (x1e6) for stable comparison."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    mean_wl = np.zeros(n, dtype=np.int64)
    stop_r = np.zeros(n, dtype=np.int64)
    alpha_r = np.zeros(n, dtype=np.int64)
    rep_r = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            continue
        total = len(toks)
        mean_wl[i] = int(sum(map(len, toks)) * 1_000_000 // total)
        stop_r[i] = int(sum(w in STOPWORDS for w in toks) * 1_000_000 // total)
        alpha_chars = sum(c.isalpha() for c in t)
        alpha_r[i] = int(alpha_chars * 1_000_000 // max(len(t), 1))
        c = Counter(toks)
        rep_r[i] = int((total - len(c)) * 1_000_000 // total)
    return (
        batch.append_column("mean_word_len_e6", pa.array(mean_wl))
        .append_column("stopword_ratio_e6", pa.array(stop_r))
        .append_column("alpha_ratio_e6", pa.array(alpha_r))
        .append_column("repetition_ratio_e6", pa.array(rep_r))
    )
