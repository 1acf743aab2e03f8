"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

The scale-out generalizations of the reference's ingest dedup (reference:
solr/core/src/java/org/apache/solr/update/processor/SignatureUpdate-
ProcessorFactory.java — MD5Signature exact + TextProfileSignature fuzzy,
branch_8x; SURVEY.md §2.7): at 100 TB, dedup is hash-partition + per-group
reduction, never a driver-side set.

Shuffle discipline (SURVEY.md §4): every variant reduces to ONE
``groupby`` on a bounded-cardinality key — exact: the content hash;
MinHash: (band_id, band_hash) buckets; SimHash: rotated prefix buckets —
and candidate verification happens inside the group. Signatures are
computed batch-local (vectorized / per-actor state), so the shuffle moves
16-64 byte signatures, not documents.
"""

from __future__ import annotations

import hashlib
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "add_content_hash",
    "exact_dedup",
    "MinHashStage",
    "minhash_near_dup_pairs",
    "SimHashStage",
    "simhash_near_dup_pairs",
    "ngram_jaccard",
]


# ---------------------------------------------------------------- exact ----
def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct content: hash → groupby → first.
    (groupby on the 32-hex hash: uniform, unskewed key.)"""

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return (
        ds.map_batches(lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
        .groupby("content_hash")
        .map_groups(keep_first, batch_format="pandas")
    )


# -------------------------------------------------------------- minhash ----
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    n = max(len(toks) - k + 1, 1)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        sh = " ".join(toks[i : i + k])
        out[i] = np.uint64(
            int.from_bytes(hashlib.blake2b(sh.encode(), digest_size=8).digest(), "little")
        )
    return out


class MinHashStage:
    """Per-actor state: the (a, b) permutation coefficients, drawn once from
    a fixed seed. Emits one row per (doc, band): (band_id, band_hash)."""

    MERSENNE = np.uint64((1 << 61) - 1)

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text", seed: int = 42):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.shingle_k)
        # (num_perm, n_shingles) universal hashing, min per row
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % self.MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in enumerate(texts):
            sig = self.signature(t)
            for b in range(self.bands):
                band = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
                out_id.append(ids[i])
                out_band.append(b)
                out_hash.append(h)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "band_id": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.string()),
            }
        )


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact token-k-gram Jaccard — the candidate-pair verifier."""
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(k)]))) if len(a.split()) >= k else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(k)]))) if len(b.split()) >= k else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_near_dup_pairs(ds, texts_lookup_ref, threshold: float = 0.8,
                           num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency=4):
    """MinHash-LSH near-duplicate pairs, verified by exact n-gram Jaccard.

    ``texts_lookup_ref``: ``ray.put`` of {doc_id: text} for the verify step
    (broadcast once; at 100 TB scale this becomes a second co-partitioned
    join on candidate ids instead — documented partitioning assumption:
    candidates per bucket are few, texts of a candidate PAIR fit memory).
    Returns a Dataset of (a, b, jaccard_e6) with a < b, deduplicated."""
    import ray

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"a": a, "b": b})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(texts_lookup_ref) if not isinstance(texts_lookup_ref, dict) else texts_lookup_ref
        jac = [ngram_jaccard(texts[x], texts[y], shingle_k) for x, y in zip(batch.a, batch.b)]
        batch = batch.assign(jaccard_e6=[int(j * 1_000_000) for j in jac])
        return batch[batch.jaccard_e6 >= int(threshold * 1_000_000)]

    pairs = (
        ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs=dict(
                num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                id_col=id_col, text_col=text_col,
            ),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can surface from multiple bands — dedup before verifying
    uniq = pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")
    return uniq.map_batches(verify, batch_format="pandas")


# -------------------------------------------------------------- simhash ----
class SimHashStage:
    """64-bit SimHash over token hashes (public Charikar scheme); one row
    per doc: (id, simhash as uint64-in-int64)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        one = np.uint64(1)
        for t in toks:
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            )
            bits = (h >> shifts) & one
            acc += np.where(bits == one, 1, -1)
        return int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        sh = [self.simhash64(t) for t in batch[self.text_col].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(np.array(sh, dtype=np.uint64).view(np.int64)),
            }
        )


def simhash_near_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                           text_col: str = "text", n_tables: int = 4, concurrency=4):
    """Near-dup pairs with Hamming distance <= max_hamming: bucket by each
    of ``n_tables`` 16-bit slices (pigeonhole: any pair within distance 3
    shares at least one exact slice when split into 4), verify in-bucket."""

    sigs = ds.map_batches(
        SimHashStage, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency,
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().view(np.uint64)
        out_id, out_tbl, out_key, out_sig = [], [], [], []
        for t in range(n_tables):
            key = ((sh >> np.uint64(16 * t)) & np.uint64(0xFFFF)).astype(np.int64)
            out_id.extend(ids.tolist())
            out_tbl.extend([t] * len(ids))
            out_key.extend(key.tolist())
            out_sig.extend(sh.view(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "table_id": pa.array(out_tbl, type=pa.int32()),
                "slice_key": pa.array(out_key, type=pa.int64()),
                "simhash": pa.array(out_sig, type=pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(zip(g.doc_id, g.simhash))
        out: List[Tuple[int, int, int]] = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((int(rows[i][1]) ^ int(rows[j][1])) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming and rows[i][0] != rows[j][0]:
                    out.append((rows[i][0], rows[j][0], d))
        return pd.DataFrame(out, columns=["a", "b", "hamming"]) if out else pd.DataFrame(
            {"a": [], "b": [], "hamming": []}
        )

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["table_id", "slice_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")
