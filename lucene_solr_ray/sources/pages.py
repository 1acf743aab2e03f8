"""Deterministic synthetic Common-Crawl-style pages corpus + query set.

Implements FIXTURES.md §1/§2 exactly: seeded generators (no wall clock, no
external data) producing the engine's only ingest schema
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)
with a Zipf(a=1.07) vocabulary over 50k words so head-term skew is real at
test scale, ~1% duplicated urls (differing warc_ts) for last-wins dedup,
and 10% non-"en" rows for the lang filter.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_pages", "generate_query_set", "corpus_df_stats"]

VOCAB_SIZE = 50_000
SPECIAL_FORMS = [
    "Foo-Bar", "3.14", "can't", "HTTP2", "O'Neill", "U.S.A", "e.g", "1,000",
    "x86_64", "C3PO", "naïve", "Zürich", "café", "résumé", "don't", "it's",
] + [f"Mix{i}Case" for i in range(184)]
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)

_BASE36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _base36(n: int) -> str:
    if n == 0:
        return "0"
    out = []
    while n:
        n, r = divmod(n, 36)
        out.append(_BASE36[r])
    return "".join(reversed(out))


def _zipf_cdf(a: float, size: int) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, size + 1, dtype=np.float64), a)
    p /= p.sum()
    return np.cumsum(p)


def generate_pages(
    out_dir: str,
    n_docs: int,
    n_shards: int,
    seed: int = 42,
    zipf_a: float = 1.07,
    mean_tokens: float = 420.0,
    sigma: float = 0.6,
    dup_frac: float = 0.01,
    special_frac: float = 0.004,
) -> List[str]:
    """Write ``pages/part-{shard:05d}.parquet`` files; returns their paths.

    Deterministic: rng(seed + shard_id) per shard; doc indices are global
    (shard s owns docs [s*per_shard, ...)); a ~dup_frac tail of each shard
    re-emits earlier urls of the SAME shard with warc_ts + 1h (last-wins
    dedup fodder, FIXTURES.md §1)."""
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array(
        [f"w{i:06d}" for i in range(VOCAB_SIZE)] + SPECIAL_FORMS, dtype=object
    )
    n_vocab = len(vocab)
    cdf = _zipf_cdf(zipf_a, VOCAB_SIZE)
    langs = np.array(["en", "de", "fr", "es", "xx"], dtype=object)
    mu = np.log(mean_tokens) - sigma * sigma / 2.0

    per_shard = (n_docs + n_shards - 1) // n_shards
    paths = []
    for shard in range(n_shards):
        rng = np.random.default_rng(seed + shard)
        lo = shard * per_shard
        hi = min(lo + per_shard, n_docs)
        count = hi - lo
        if count <= 0:
            break
        doc_idx = np.arange(lo, hi, dtype=np.int64)

        lengths = np.clip(
            np.exp(rng.normal(mu, sigma, size=count)), 5, 4000
        ).astype(np.int64)
        total = int(lengths.sum())
        u = rng.random(total)
        token_ids = np.searchsorted(cdf, u, side="right")
        # sprinkle special forms
        sp_mask = rng.random(total) < special_frac
        token_ids[sp_mask] = VOCAB_SIZE + rng.integers(
            0, n_vocab - VOCAB_SIZE, size=int(sp_mask.sum())
        )
        toks = vocab[token_ids]
        bounds = np.concatenate(([0], np.cumsum(lengths)))
        texts = [" ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(count)]

        sites = doc_idx % 997
        urls = [
            f"https://site{s:04d}.example/{_base36(int(d))}"
            for s, d in zip(sites, doc_idx)
        ]
        ts = EPOCH_2024 + doc_idx * 1_000_000
        lang = langs[
            np.where(
                rng.random(count) < 0.9,
                0,
                rng.integers(1, 5, size=count),
            )
        ]

        # duplicated urls: re-emit a sample of this shard's rows, +1h, with
        # regenerated (different) text — last-wins must keep the dup
        n_dup = int(count * dup_frac)
        if n_dup:
            pick = rng.choice(count, size=n_dup, replace=False)
            dup_lengths = np.clip(
                np.exp(rng.normal(mu, sigma, size=n_dup)), 5, 4000
            ).astype(np.int64)
            dtotal = int(dup_lengths.sum())
            dids = np.searchsorted(cdf, rng.random(dtotal), side="right")
            dtoks = vocab[dids]
            dbounds = np.concatenate(([0], np.cumsum(dup_lengths)))
            dup_texts = [
                " ".join(dtoks[dbounds[i] : dbounds[i + 1]]) for i in range(n_dup)
            ]
            urls += [urls[p] for p in pick]
            texts += dup_texts
            ts = np.concatenate([ts, ts[pick] + 3_600_000_000])
            lang = np.concatenate([lang, lang[pick]])
            lengths = np.concatenate([lengths, dup_lengths])

        html = [
            b"<html><body><p>" + t.encode("utf-8") + b"</p></body></html>"
            for t in texts
        ]
        table = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array(html, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(lang, type=pa.string()),
            }
        )
        path = os.path.join(out_dir, f"part-{shard:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths


def corpus_df_stats(paths: List[str], lang: str = "en") -> Dict[str, int]:
    """Document frequency per term over the (deduped, lang-filtered) corpus
    — driver-side helper for query-set construction at test scale only."""
    import pyarrow.compute as pc

    best: Dict[str, tuple] = {}
    for p in paths:
        t = pq.read_table(p, columns=["url", "warc_ts", "text", "lang"])
        t = t.filter(pc.equal(t["lang"], lang))
        for url, ts, text in zip(
            t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["text"].to_pylist()
        ):
            prev = best.get(url)
            if prev is None or ts > prev[0]:
                best[url] = (ts, text)
    df: Dict[str, int] = {}
    for ts, text in best.values():
        for term in set(text.lower().split()):
            df[term] = df.get(term, 0) + 1
    return df


def generate_query_set(df_stats: Dict[str, int], seed: int = 42, k: int = 10) -> List[dict]:
    """FIXTURES.md §2: 60 queries over df classes (term/and/or mixes)."""
    rng = np.random.default_rng(seed)
    terms = np.array(sorted(df_stats), dtype=object)
    dfs = np.array([df_stats[t] for t in terms])
    order = np.argsort(-dfs, kind="stable")
    terms, dfs = terms[order], dfs[order]

    high = [str(t) for t in terms[:20]]
    med_center = int(np.searchsorted(-dfs, -int(np.median(dfs))))
    mid = [str(t) for t in terms[max(0, med_center - 50) : med_center + 50]]
    low = [str(t) for t in terms[(dfs >= 2) & (dfs <= 10)]]

    def pick(pool, n):
        idx = rng.choice(len(pool), size=min(n, len(pool)), replace=False)
        return [pool[i] for i in sorted(idx)]

    queries: List[dict] = []
    qid = 0

    def add(kind, term_lists):
        nonlocal qid
        for ts in term_lists:
            queries.append({"query_id": qid, "kind": kind, "terms": ts, "k": k})
            qid += 1

    add("term", [[t] for t in pick(high, 10)])
    add("term", [[t] for t in pick(mid, 10)])
    add("term", [[t] for t in pick(low, 10)])
    add("and", [[h, l] for h, l in zip(pick(high, 10), pick(low, 10))])
    add("and", [[h, m, l] for h, m, l in zip(pick(high, 5), pick(mid, 5), pick(low, 5))])
    add("or", [[h, l] for h, l in zip(pick(high, 10), pick(low, 10))])
    add("or", [[h, m, l] for h, m, l in zip(pick(high, 5), pick(mid, 5), pick(low, 5))])
    return queries
