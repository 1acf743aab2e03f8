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
computed batch-local fully vectorized (arrow split → polars 64-bit token
hash → numpy rolling shingle mix → reduceat min / bit-count), so the
shuffle moves 16-byte signatures, not documents, and no hot loop touches
Python per token. Candidate-pair texts are fetched back by two hash JOINS
on the pair ids — never a whole-corpus broadcast.

Skew: LSH buckets are CAPPED at ``max_bucket`` members (all-pairs in a
pathological bucket is O(n²)); overflow is counted in a ``truncated``
diagnostic printed from the reducer, never silently dropped. Collapsing
exact duplicates first (exact_dedup) is the standard pre-pass that keeps
buckets small.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "add_content_hash",
    "exact_dedup",
    "MinHashStage",
    "minhash_near_dup_pairs",
    "near_dup_clusters",
    "SimHashStage",
    "simhash_near_dup_pairs",
    "ngram_jaccard",
    "token_hashes_batch",
    "distinct_pairs",
    "embedding_neardup_remove",
    "embedding_neardup_lsh_pairs",
    "span_dedup_counts",
]

_MIX1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constants
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_MIX3 = np.uint64(0x165667B19E3779F9)


def token_hashes_batch(texts: pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized 64-bit token hashes for a batch of texts.

    arrow ``utf8_split_whitespace`` → flatten → polars hash kernel (one C
    call for every token in the batch). Returns ``(flat_hashes, offsets)``
    with ``offsets`` of length n_docs+1 delimiting each doc's tokens."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.utf8_split_whitespace(pc.coalesce(texts, ""))
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    flat = pc.list_flatten(toks)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if len(flat) == 0:
        return np.empty(0, dtype=np.uint64), offsets
    try:
        import polars as pl

        h = pl.from_arrow(flat).hash(seed=0).to_numpy().astype(np.uint64)
    except Exception:  # pragma: no cover - polars is baked into the image
        h = np.fromiter(
            (
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                for t in flat.to_pylist()
            ),
            dtype=np.uint64,
            count=len(flat),
        )
    return h, offsets


def _shingle_hashes_batch(
    tok_h: np.ndarray, offsets: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Rolling k-token shingle hashes over the flat token-hash array,
    per-doc (shingles never cross doc boundaries). Docs shorter than k
    collapse to ONE shingle mixing all their tokens. Returns
    ``(flat_shingles, shingle_offsets)``."""
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    n_sh = np.maximum(lens - k + 1, 1)
    sh_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_off[1:])
    total = int(sh_off[-1])
    out = np.zeros(total, dtype=np.uint64)

    # vectorized rolling mix over the whole flat array: candidate shingle
    # at flat pos p combines h[p..p+k-1] with position-weighted constants
    T = len(tok_h)
    if T:
        with np.errstate(over="ignore"):
            cand = np.zeros(T, dtype=np.uint64)
            for j in range(k):
                seg = np.zeros(T, dtype=np.uint64)
                upto = T - j
                if upto > 0:
                    seg[:upto] = tok_h[j:]
                cand = (cand * _MIX1) ^ (seg * _MIX2 + _MIX3)
        # gather the valid positions per doc (first len-k+1 of each doc)
        long_docs = lens >= k
        if long_docs.any():
            starts = offsets[:-1][long_docs]
            counts = n_sh[long_docs]
            csum = np.concatenate(([0], np.cumsum(counts)[:-1]))
            rel = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(csum, counts)
            out[np.repeat(sh_off[:-1][long_docs], counts) + rel] = cand[
                np.repeat(starts, counts) + rel
            ]
        # short docs: one shingle = mix of all their tokens. Per-doc sums
        # via cumsum-and-diff over the offsets (exact mod 2^64, wraps are
        # fine) — NOT a clamped reduceat, whose min(offset, T-1) trick
        # would truncate the PRECEDING doc's segment whenever a zero-token
        # doc followed it, making signatures depend on batch neighbors.
        short = ~long_docs
        if short.any():
            with np.errstate(over="ignore"):
                csum = np.zeros(T + 1, dtype=np.uint64)
                np.cumsum(tok_h * _MIX2, out=csum[1:])
                sums = csum[offsets[1:]][short] - csum[offsets[:-1]][short]
            out[sh_off[:-1][short]] = sums
    return out, sh_off


class MinHashStage:
    """Per-actor state: the (a, b) permutation coefficients, drawn once from
    a fixed seed. Emits one row per (doc, band): (band_id, band_hash).
    Fully vectorized: one polars hash over the batch's tokens, 64 universal
    hash rows with ``minimum.reduceat`` per doc, polynomial band mixing."""

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

    def signatures(self, texts: pa.Array) -> np.ndarray:
        """(n_docs, num_perm) MinHash signature matrix for a batch."""
        tok_h, offsets = token_hashes_batch(texts)
        sh, sh_off = _shingle_hashes_batch(tok_h, offsets, self.shingle_k)
        n_docs = len(sh_off) - 1
        sig = np.empty((n_docs, self.num_perm), dtype=np.uint64)
        if len(sh) == 0:
            sig.fill(0)
            return sig
        starts = sh_off[:-1]
        with np.errstate(over="ignore"):
            for p in range(self.num_perm):
                vals = (self.a[p] * sh + self.b[p]) % self.MERSENNE
                sig[:, p] = np.minimum.reduceat(vals, starts)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        sig = self.signatures(batch[self.text_col])
        n_docs = len(ids)
        # polynomial band mix → one int64 key per (doc, band)
        v = sig.reshape(n_docs, self.bands, self.rows_per_band)
        with np.errstate(over="ignore"):
            bh = np.zeros((n_docs, self.bands), dtype=np.uint64)
            for r in range(self.rows_per_band):
                bh = bh * _MIX1 + (v[:, :, r] ^ _MIX3)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
                "band_id": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
                ),
                "band_hash": pa.array(bh.reshape(-1).view(np.int64)),
            }
        )


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact token-k-gram Jaccard — the candidate-pair verifier (runs only
    on the few LSH candidates, inside their group)."""
    sa = set(map(tuple, zip(*[a.split()[i:] for i in range(k)]))) if len(a.split()) >= k else {tuple(a.split())}
    sb = set(map(tuple, zip(*[b.split()[i:] for i in range(k)]))) if len(b.split()) >= k else {tuple(b.split())}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _bucket_pairs_capped(id_col: str, max_bucket: int):
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        if len(ids) > max_bucket:
            # no silent caps: a pathological bucket (mass-duplicated spam)
            # would go O(n²) — keep the deterministic first max_bucket ids
            # and report the truncation in worker logs
            print(
                f"[dedup] LSH bucket truncated: {len(ids)} members > "
                f"cap {max_bucket} ({len(ids) - max_bucket} dropped); "
                "run exact_dedup first to collapse identical docs"
            )
            ids = ids[:max_bucket]
        a, b = zip(*[(x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]])
        return pd.DataFrame({"a": np.asarray(a, dtype=np.int64),
                             "b": np.asarray(b, dtype=np.int64)})

    return bucket_pairs


def _multi_member_rows(sigs, key_col: str, num_partitions: Optional[int] = None):
    """Keep only rows whose ``key_col`` value occurs >= 2 times — the LSH
    singleton prefilter. In a deduplicated web corpus almost every bucket
    is a singleton; dropping them BEFORE the per-bucket pair generator
    means the (unavoidably Python) group callable runs over hundreds of
    real buckets instead of one call per corpus row. Both steps are
    vectorized and distributed: a native count aggregate finds the
    multi-member keys, a hash left_semi join keeps their rows (no driver
    key-set, no broadcast — the multi-key table is unbounded at scale).

    ``sigs`` is consumed TWICE (count side + join probe side) —
    materialize it first or the upstream signature actor pool executes
    twice CONCURRENTLY, and on a small session the two pools' actor
    floors pin every CPU and deadlock the shuffle between them (measured:
    dedup_minhash at num_cpus=4 hung >240 s; the signature rows are
    ~24 B/doc, so the spill is bounded at any corpus size)."""
    from .relational import bucketed_agg, default_shuffle_partitions

    sigs = sigs.materialize()
    # bucket keys are high-cardinality (≈ one per corpus row): count with
    # the bucketed combiner+merge, not a per-key exchange
    multi = (
        bucketed_agg(
            sigs.select_columns([key_col]), key_col,
            [(key_col, "count")], ["cnt"],
        )
        .filter(expr="cnt >= 2")
        .drop_columns(["cnt"])
        # heal block schemas before the join (ray-data notes: schema-less
        # empty bundles from the bucketed map_groups lineage)
        .repartition(default_shuffle_partitions(num_partitions))
    )
    return sigs.join(
        multi,
        join_type="left_semi",
        on=(key_col,),
        num_partitions=default_shuffle_partitions(num_partitions),
    )


_PAIR_B_BITS = 32  # b packs into the low 32 bits, a into the upper 31


def distinct_pairs(pairs, value_col: Optional[str] = None, mode: str = "min"):
    """Dedup (a, b) candidate-pair rows (a pair surfaces once per matching
    LSH band/table) with a NATIVE single-key aggregate: pack the pair into
    one int64 key ``a << 32 | b`` and reduce with Count/Min — no per-group
    Python callable (the groupby(["a","b"]).map_groups(head(1)) family is
    one Python call per group: at 1e8 candidate pairs that is the slow
    path; the packed key runs as an Arrow hash-agg end to end). Requires
    0 <= a < 2^31 and 0 <= b < 2^32 (checked per batch, loud failure —
    corpora with wider doc-id spaces should renumber ids first, which a
    curation pipeline needs anyway for the survivor bitmaps).

    ``value_col``: optional extra column to carry through (reduced with
    min/max — for identical pairs the value is identical, e.g. hamming)."""
    from ray.data.aggregate import Max, Min

    def pack(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy().astype(np.int64, copy=False)
        b = batch["b"].to_numpy().astype(np.int64, copy=False)
        if len(a):
            if a.min() < 0 or b.min() < 0 or a.max() >= (1 << 31) or b.max() >= (1 << _PAIR_B_BITS):
                raise ValueError(
                    "distinct_pairs: ids outside the int64 pack range "
                    "(a < 2^31, b < 2^32) — renumber doc ids before LSH"
                )
        cols = {"ab": pa.array((a << _PAIR_B_BITS) | b)}
        if value_col is not None:
            cols[value_col] = batch[value_col]
        return pa.table(cols)

    def unpack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ab" not in batch.column_names:
            # the hash aggregate emits SCHEMA-LESS bundles for empty output
            # partitions (Ray 2.49); re-assert the schema here or a
            # downstream join resolves an empty left schema and fails with
            # "No match for FieldRef" on tiny candidate sets
            cols = {"a": pa.array([], type=pa.int64()),
                    "b": pa.array([], type=pa.int64())}
            if value_col is not None:
                cols[value_col] = pa.array([], type=pa.int64())
            return pa.table(cols)
        key = batch["ab"].to_numpy()
        cols = {
            "a": pa.array(key >> _PAIR_B_BITS),
            "b": pa.array(key & ((1 << _PAIR_B_BITS) - 1)),
        }
        if value_col is not None:
            cols[value_col] = batch[value_col]
        return pa.table(cols)

    from .relational import bucketed_agg

    packed = pairs.map_batches(pack, batch_format="pyarrow")
    # packed pair keys are high-cardinality by construction — bucketed
    # combiner+merge instead of the per-key exchange
    if value_col is None:
        agg = bucketed_agg(
            packed, "ab", [("ab", "count")], ["_cnt"]
        ).drop_columns(["_cnt"])
    else:
        agg = bucketed_agg(
            packed, "ab", [(value_col, mode)], [value_col]
        )
    return agg.map_batches(unpack, batch_format="pyarrow")


# ---------------------------------------------------------------- exact ----
_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _hex32(h1: np.ndarray, h2: np.ndarray) -> pa.Array:
    """Two uint64 columns → fixed 32-hex Arrow strings, fully vectorized
    (nibble lookup + from_buffers; zero Python per row)."""
    n = len(h1)
    hb = (
        np.ascontiguousarray(np.column_stack([h1, h2]).astype(">u8"))
        .view(np.uint8)
        .reshape(n, 16)
    )
    out = np.empty((n, 32), dtype=np.uint8)
    out[:, 0::2] = _HEX_DIGITS[hb >> 4]
    out[:, 1::2] = _HEX_DIGITS[hb & 15]
    offs = np.arange(n + 1, dtype=np.int32) * 32
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offs.tobytes()), pa.py_buffer(out.reshape(-1).tobytes())
    )


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     algo: str = "fast") -> pa.Table:
    """32-hex content key per row.

    ``algo="fast"`` (default): a 128-bit key from two seeded polars
    (xxhash-family) 64-bit column hashes — one C call per seed per batch,
    no Python per row (the per-row ``hashlib.md5`` loop was the round-3
    hot-path finding). ``algo="md5"``: byte-parity with the reference's
    MD5Signature / SQL ``md5()`` — the oracle/parity path only."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if algo == "fast":
        try:
            import polars as pl

            s = pl.from_arrow(pc.coalesce(texts, ""))
            h1 = s.hash(seed=0).to_numpy().astype(np.uint64)
            h2 = s.hash(seed=1).to_numpy().astype(np.uint64)
            return batch.append_column("content_hash", _hex32(h1, h2))
        except Exception:  # pragma: no cover - polars is baked into the image
            pass
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts.to_pylist()]
    return batch.append_column("content_hash", pa.array(h, type=pa.string()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                algo: str = "fast"):
    """Keep the min-id row per distinct content: hash → bucketed top-1.
    (Key = the 32-hex content hash: uniform, unskewed. Pass ``algo="md5"``
    for byte-parity with MD5Signature / a SQL oracle that compares hash
    VALUES; the default vectorized key dedups identically.) Row-preserving
    via relational.bucketed_top1 — per-block Arrow combiner + bucket merge,
    no per-key Python callable (the old per-group pandas head(1) was the
    1e8-group scale trap)."""
    from .relational import bucketed_top1

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col, algo), batch_format="pyarrow"
    )
    return bucketed_top1(hashed, ["content_hash"], [id_col], [False])


def fingerprint_canonical_batch(batch: pa.Table,
                                text_col: str = "text") -> pa.Table:
    """Canonical token fingerprint per row (reference: lucene/analysis/
    common/.../miscellaneous/FingerprintFilter.java + Solr's
    FingerprintUpdateProcessor pattern, branch_8x — the classic
    word-order-insensitive dedup key): whitespace tokens, sorted, deduped,
    space-joined. Fully vectorized: one dictionary encode gives each
    token an integer rank (dictionary sorted ONCE per batch — no Python
    string comparisons), one numpy lexsort orders tokens within rows, a
    boundary mask dedups, and Arrow take/binary_join rebuild the strings.
    Appends a ``canonical`` string column."""
    toks = pc.split_pattern_regex(
        batch[text_col].combine_chunks()
        if isinstance(batch[text_col], pa.ChunkedArray) else batch[text_col],
        r"\s+")
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    off = off - off[0]
    flat = toks.values
    n_rows = len(off) - 1
    if len(flat) == 0:
        return batch.append_column(
            "canonical", pa.array([""] * n_rows, type=pa.string()))
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictv = enc.dictionary
    sort_idx = pc.array_sort_indices(dictv).to_numpy(zero_copy_only=False)
    rank = np.empty(len(dictv), dtype=np.int64)
    rank[sort_idx] = np.arange(len(dictv))
    seg = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(off))
    order = np.lexsort((rank[codes], seg))
    oc, os_ = codes[order], seg[order]
    boundary = np.ones(len(order), dtype=bool)
    boundary[1:] = (os_[1:] != os_[:-1]) | (oc[1:] != oc[:-1])
    empty_code = pc.index(dictv, "").as_py()
    keep = boundary if empty_code < 0 else boundary & (oc != empty_code)
    new_off = np.concatenate(
        [[0], np.cumsum(np.bincount(os_[keep], minlength=n_rows))])
    la = pa.ListArray.from_arrays(
        pa.array(new_off, type=pa.int32()),
        flat.take(pa.array(order[keep])))
    return batch.append_column("canonical", pc.binary_join(la, " "))


def fingerprint_dedup_ids(ds, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Word-order-insensitive exact dedup: survivors = min(id) per
    canonical sorted-unique-token fingerprint ("b a a c" ≡ "a b c").
    Same native hash-aggregate scale shape as exact_dedup_ids, with the
    canonical string re-keyed through the vectorized 128-bit content
    hash so long vocabularies never shuffle as raw strings."""
    from ray.data.aggregate import Min

    def key(b: pa.Table) -> pa.Table:
        canon = fingerprint_canonical_batch(b, text_col)
        return add_content_hash(
            pa.table({id_col: b[id_col], "text": canon["canonical"]}),
            "text", "fast",
        ).select(["content_hash", id_col])

    hashed = ds.map_batches(key, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col))


def exact_dedup_ids(ds, id_col: str = "doc_id", text_col: str = "text",
                    algo: str = "fast"):
    """(id, content_hash) survivors via a NATIVE hash aggregate — min(id)
    per content hash, no per-group Python. Use when only the surviving ids
    are needed (the common curation case)."""
    from ray.data.aggregate import Min

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col, algo).select(["content_hash", id_col]),
        batch_format="pyarrow",
    )
    agg = hashed.groupby("content_hash").aggregate(Min(id_col, alias_name=id_col))
    return agg


def default_actor_concurrency(n=None):
    """Cluster-derived actor-pool sizing for stateful map stages: an
    autoscaling ``(2, cpus - headroom)`` pool. The cap grows with the
    cluster (a hardcoded small constant serializes the stage on a real
    cluster) while the floor keeps small inputs from paying dozens of
    actor spin-ups + first-touch page-fault costs for a handful of
    blocks. Headroom matters: a pool sized == num_cpus deadlocks the
    pipeline it feeds (measured on this engine). Pass an int or tuple to
    override."""
    if n is not None:
        return n
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (2, max(2, cpus - 4 if cpus > 8 else cpus - 1))


def minhash_near_dup_pairs(ds, threshold: float = 0.8,
                           num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency=None, max_bucket: int = 128,
                           join_partitions: Optional[int] = None,
                           fetch_texts_from: Optional[str] = None):
    """MinHash-LSH near-duplicate pairs, verified by exact n-gram Jaccard.

    Scale shape: signatures shuffle as single-int64 (bkey, doc_id) rows;
    singleton buckets are dropped by a native count + semi join before any
    per-bucket Python runs; buckets are capped at ``max_bucket``.

    Verify texts: with ``fetch_texts_from`` (a parquet path/dir for the
    corpus) each verify task POINT-READS only its pairs' rows via parquet
    predicate pushdown — the FetchStream enrich pattern (reference:
    solr/solrj/.../io/stream/FetchStream.java, branch_8x), zero extra
    shuffles, right whenever |candidates| ≪ |corpus| (the normal dedup
    regime). Without it, texts arrive via TWO co-partitioned hash joins
    on the pair ids (never a whole-corpus broadcast) — the unbounded-safe
    fallback when candidates rival the corpus or the input isn't a
    re-readable file. Returns (a, b, jaccard_e6) rows with a < b."""

    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        concurrency=default_actor_concurrency(concurrency),
    )

    # (band_id, band_hash) mixed into ONE int64 bucket key: single-key
    # shuffles end to end (a collision merely merges two buckets — the
    # extra candidates are rejected by the exact-Jaccard verify)
    def pack_bkey(t: pa.Table) -> pa.Table:
        bid = t["band_id"].to_numpy().astype(np.uint64)
        bh = t["band_hash"].to_numpy().view(np.uint64)
        with np.errstate(over="ignore"):
            k = ((bid + np.uint64(1)) * _MIX1) ^ bh
        return pa.table(
            {"bkey": pa.array((k >> np.uint64(1)).astype(np.int64)), "doc_id": t["doc_id"]}
        )

    # singleton buckets (the overwhelming majority) never reach the
    # per-bucket pair generator — see _multi_member_rows
    cand = _multi_member_rows(sigs.map_batches(pack_bkey, batch_format="pyarrow"), "bkey")
    pairs = cand.groupby("bkey").map_groups(
        _bucket_pairs_capped("doc_id", max_bucket), batch_format="pandas"
    )
    # a pair can surface from multiple bands — dedup before verifying via
    # the packed-key native aggregate (single int64 key: Arrow hash-agg
    # end to end, no per-group Python, no multi-key shuffle aggregator)
    uniq = distinct_pairs(pairs)

    if fetch_texts_from is not None:
        return _fetch_verify_pairs(
            uniq, fetch_texts_from, id_col, text_col, shingle_k, threshold
        )

    from .relational import default_shuffle_partitions

    # verify joins move (pair ids ⋈ texts): the pair side is tiny compared
    # to the corpus, so the fan-out follows it — cpus/4 keeps per-partition
    # fixed costs amortized on one node yet still grows with the cluster
    if join_partitions is None:
        join_partitions = max(8, default_shuffle_partitions(None) // 4)
    texts = ds.select_columns([id_col, text_col])
    t_a = texts.map_batches(
        lambda t: t.rename_columns(["a", "text_a"]), batch_format="pyarrow"
    )
    t_b = texts.map_batches(
        lambda t: t.rename_columns(["b", "text_b"]), batch_format="pyarrow"
    )
    # heal the pair stream's block schemas before joining: the hash
    # aggregate behind distinct_pairs emits SCHEMA-LESS bundles for empty
    # output partitions (Ray 2.49) and map_batches skips empty blocks, so
    # on small candidate sets the join would resolve an empty left schema
    # ("No match for FieldRef.Name(a)"). repartition coalesces blocks and
    # restores the schema; the pair side is ≪ corpus, so this pre-shuffle
    # is noise next to the verify joins themselves.
    uniq = uniq.repartition(join_partitions)
    with_a = uniq.join(t_a, join_type="inner", num_partitions=join_partitions, on=("a",))
    # the join operator emits the same schema-less empty bundles — heal
    # again before chaining into the second join
    with_a = with_a.repartition(join_partitions)
    with_b = with_a.join(t_b, join_type="inner", num_partitions=join_partitions, on=("b",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = [
            ngram_jaccard(x, y, shingle_k)
            for x, y in zip(batch.text_a, batch.text_b)
        ]
        batch = batch.assign(jaccard_e6=[int(j * 1_000_000) for j in jac])
        keep = batch[batch.jaccard_e6 >= int(threshold * 1_000_000)]
        return keep[["a", "b", "jaccard_e6"]]

    return with_b.map_batches(verify, batch_format="pandas")


def _fetch_verify_pairs(uniq, parquet_path: str, id_col: str, text_col: str,
                        shingle_k: int, threshold: float, batch_size: int = 2048):
    """Jaccard-verify candidate pairs by point-reading their texts from the
    corpus parquet (row-group pruning on the id predicate): one targeted
    read per pair batch, no shuffle of the corpus. Stateful stage — the
    pyarrow dataset handle (file footers) opens once per actor."""
    import pyarrow.dataset as pads

    class FetchVerify:
        def __init__(self):
            self.dset = pads.dataset(parquet_path)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            ids = sorted(set(a) | set(b))
            t = self.dset.to_table(
                filter=pc.field(id_col).isin(ids), columns=[id_col, text_col]
            )
            texts = dict(zip(t[id_col].to_pylist(), t[text_col].to_pylist()))
            jac = np.array(
                [
                    int(ngram_jaccard(texts[x], texts[y], shingle_k) * 1_000_000)
                    for x, y in zip(a, b)
                ],
                dtype=np.int64,
            )
            keep = jac >= int(threshold * 1_000_000)
            return pa.table(
                {
                    "a": pa.array(np.asarray(a, dtype=np.int64)[keep]),
                    "b": pa.array(np.asarray(b, dtype=np.int64)[keep]),
                    "jaccard_e6": pa.array(jac[keep]),
                }
            )

    # point-read fetchers: a modest pool is plenty — but its FLOOR must
    # stay clear of the CPU budget: on a 4-CPU session a (2, 8) floor here
    # plus the MinHash pool's floor of 2 pinned every core and DEADLOCKED
    # the shuffle tasks between them (measured: sf0.001 hung >240 s at
    # num_cpus=4; 6 s at 8). Floor 1, cap grown with the cluster.
    try:
        import ray as _ray

        _cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        _cpus = 8
    return uniq.map_batches(
        FetchVerify, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, max(1, min(8, _cpus - 3))),
    )


# -------------------------------------------------------------- simhash ----
class SimHashStage:
    """64-bit SimHash over token hashes (public Charikar scheme); one row
    per doc: (id, simhash as uint64-in-int64). Vectorized: batch token
    hashes → bit matrix → ±1 contributions → add.reduceat per doc."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col, self.text_col = id_col, text_col

    @staticmethod
    def simhash_batch(texts: pa.Array) -> np.ndarray:
        tok_h, offsets = token_hashes_batch(texts)
        n_docs = len(offsets) - 1
        if len(tok_h) == 0:
            return np.zeros(n_docs, dtype=np.uint64)
        lens = np.diff(offsets)
        # the unclamped reduceat below requires every start < T, i.e. no
        # zero-token doc (a clamped start would steal the preceding doc's
        # tail token). utf8_split_whitespace('') yields [''] so lens >= 1
        # always holds today; assert so a tokenizer change fails loudly
        # instead of silently coupling signatures to batch neighbors.
        assert lens.min() >= 1, "simhash_batch: zero-token doc in batch"
        shifts = np.arange(64, dtype=np.uint64)
        # (T, 64) ±1 contributions, summed per doc in one reduceat
        bits = ((tok_h[:, None] >> shifts) & np.uint64(1)).astype(np.int8)
        contrib = (bits * 2 - 1).astype(np.int32)
        acc = np.add.reduceat(contrib, offsets[:-1], axis=0)
        sh = ((acc > 0).astype(np.uint64) << shifts[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        sh = self.simhash_batch(batch[self.text_col])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(sh.view(np.int64)),
            }
        )


def simhash_near_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id",
                           text_col: str = "text", n_tables: int = 4, concurrency=None,
                           max_bucket: int = 256):
    """Near-dup pairs with Hamming distance <= max_hamming: bucket by each
    of ``n_tables`` 16-bit slices (pigeonhole: any pair within distance 3
    shares at least one exact slice when split into 4), verify in-bucket
    (vectorized XOR popcount), buckets capped at ``max_bucket``."""

    sigs = ds.map_batches(
        SimHashStage, fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", concurrency=default_actor_concurrency(concurrency),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().view(np.uint64)
        n = len(ids)
        tbl = np.repeat(np.arange(n_tables, dtype=np.int32), n)
        rep_ids = np.tile(ids, n_tables)
        rep_sh = np.tile(sh, n_tables)
        key = ((rep_sh >> (np.uint64(16) * tbl.astype(np.uint64))) & np.uint64(0xFFFF)).astype(np.int64)
        # (table_id, slice_key) pack losslessly into one int64 bucket key
        return pa.table(
            {
                "doc_id": pa.array(rep_ids, type=pa.int64()),
                "bkey": pa.array((tbl.astype(np.int64) << 16) | key),
                "simhash": pa.array(rep_sh.view(np.int64)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g.doc_id.astype(np.int64), g.simhash.astype(np.int64))))
        if len(rows) > max_bucket:
            print(
                f"[dedup] simhash bucket truncated: {len(rows)} members > "
                f"cap {max_bucket} ({len(rows) - max_bucket} dropped)"
            )
            rows = rows[:max_bucket]
        if len(rows) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        sh = np.array([r[1] for r in rows], dtype=np.int64).view(np.uint64)
        # vectorized all-pairs XOR popcount over the (small, capped) bucket
        x = sh[:, None] ^ sh[None, :]
        ham = np.zeros_like(x, dtype=np.int64)
        for s in range(0, 64, 8):
            ham += np.unpackbits(
                ((x >> np.uint64(s)) & np.uint64(0xFF)).astype(np.uint8)[..., None], axis=-1
            ).sum(axis=-1, dtype=np.int64)
        iu = np.triu_indices(len(ids), k=1)
        d = ham[iu]
        keep = (d <= max_hamming) & (ids[iu[0]] != ids[iu[1]])
        return pd.DataFrame(
            {"a": ids[iu[0]][keep], "b": ids[iu[1]][keep], "hamming": d[keep]}
        )

    # singleton slices skip the pair generator entirely (see
    # _multi_member_rows); the survivors group by the packed key
    cand = _multi_member_rows(sigs.map_batches(explode, batch_format="pyarrow"), "bkey")
    pairs = cand.groupby("bkey").map_groups(bucket_pairs, batch_format="pandas")
    # identical (a, b) rows carry identical hamming — min() just picks it
    return distinct_pairs(pairs, value_col="hamming", mode="min")


# ---------------------------------------------- embedding near-dup --------
def _normalized_blocks(ds, id_col: str, vec_col: str, target_rows: int):
    """Materialize L2-normalized float32 vectors as ~``target_rows``-row
    Arrow blocks in the object store; returns (block_refs, dim). Blocks
    carry (ids:int64, vec:binary fixed 4·d bytes) — compact and
    zero-copy-decodable in the pair tasks."""

    def normalize(batch: pa.Table) -> pa.Table:
        from .ann import decode_fixed_dim

        ids = batch[id_col].to_numpy().astype(np.int64)
        X = decode_fixed_dim(batch[vec_col])
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        v32 = (X / n[:, None]).astype(np.float32)
        d = v32.shape[1]
        off = np.arange(len(ids) + 1, dtype=np.int32) * (4 * d)
        return pa.table(
            {
                "ids": pa.array(ids),
                "vec": pa.BinaryArray.from_buffers(
                    pa.binary(), len(ids),
                    [None, pa.py_buffer(off.tobytes()),
                     pa.py_buffer(v32.reshape(-1).view(np.uint8).tobytes())],
                ),
            }
        )

    mat = (
        ds.map_batches(normalize, batch_format="pyarrow", batch_size=target_rows)
        .materialize()
    )
    return mat.to_arrow_refs()


def _decode_block(t: pa.Table):
    """(ids, float64 matrix) from a normalized block table."""
    ids = t["ids"].to_numpy()
    vcol = t["vec"]
    if isinstance(vcol, pa.ChunkedArray):
        vcol = vcol.combine_chunks()
    offs = np.frombuffer(vcol.buffers()[1], dtype=np.int32)[
        vcol.offset : vcol.offset + len(vcol) + 1
    ]
    width = int(offs[1] - offs[0]) if len(vcol) else 0
    data = np.frombuffer(vcol.buffers()[2], dtype=np.uint8)
    raw = data[offs[0] : offs[0] + len(vcol) * width]
    mat = raw.view(np.float32).reshape(len(vcol), width // 4).astype(np.float64)
    return ids, mat


def embedding_neardup_remove(ds, threshold: float, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             chunk_rows: int = 65536,
                             num_partitions: Optional[int] = None):
    """EXACT embedding-cosine near-duplicate removal: keep every row whose
    id has NO smaller-id neighbor with cosine >= ``threshold`` (the
    min-id-survivor convention shared by exact_dedup / minhash; the vector
    analog of SignatureUpdateProcessor fuzzy dedup, SURVEY.md §2.7).

    Shape: a DISTRIBUTED block-pair sweep — normalized float32 blocks of
    ≤``chunk_rows`` vectors are materialized to the object store once,
    every ordered block pair (i ≤ j) becomes one task that matmuls the
    two blocks and emits the dominated (larger) ids, and survivors come
    from a ``left_anti`` hash join. No driver-side corpus materialization
    and per-task memory is two blocks + one (chunk, chunk) sim slab.
    Exact all-pairs is inherently O(N²/chunk²) tasks: right for exact
    semantics at verification scale; at full-corpus scale compose
    ``embedding_neardup_lsh_pairs`` (approximate candidates) with exact
    verification instead.

    Returns the surviving rows WITHOUT ``vec_col``: Arrow hash joins
    reject list-typed non-key payloads ("not supported in join non-key
    field"), and dedup consumers key on ids — re-attach vectors with a
    semi-join against the source table when needed."""
    import ray
    import ray.data

    from .relational import default_shuffle_partitions

    block_refs = _normalized_blocks(ds, id_col, vec_col, chunk_rows)
    nb = len(block_refs)
    if nb == 0:
        # keep the documented contract (survivors come back WITHOUT
        # vec_col) on the empty-input path too, so callers see one schema
        return ds.drop_columns([vec_col])

    pairs = ray.data.from_items(
        [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    )

    def dominated_ids(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(batch["i"].to_numpy(), batch["j"].to_numpy()):
            ids_a, A = _decode_block(ray.get(block_refs[int(i)]))
            if i == j:
                ids_b, B = ids_a, A
            else:
                ids_b, B = _decode_block(ray.get(block_refs[int(j)]))
            if not len(ids_a) or not len(ids_b):
                continue
            sims = A @ B.T
            hit = sims >= threshold
            if i == j:
                # within-block: only distinct pairs
                np.fill_diagonal(hit, False)
            if not hit.any():
                continue
            p, q = np.nonzero(hit)
            ia, ib = ids_a[p], ids_b[q]
            ne = ia != ib
            out.append(np.maximum(ia[ne], ib[ne]))
        dom = np.unique(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)
        return pa.table({id_col: pa.array(dom, type=pa.int64())})

    dom = pairs.map_batches(dominated_ids, batch_format="pyarrow", batch_size=4)
    P = default_shuffle_partitions(num_partitions)
    # repartition before the join: hash joins on schema-unknown lineage
    # fail on empty shuffle partitions (ray-data notes, BASELINE.md)
    return ds.drop_columns([vec_col]).repartition(P).join(
        dom.repartition(P), join_type="left_anti", on=(id_col,),
        num_partitions=P,
    )


def _exact_small(ds, threshold: float, id_col: str = "vec_id",
                 vec_col: str = "embedding", chunk_rows: int = 65536):
    """The DRIVER-BROADCAST exact kernel: collects the full L2-normalized
    (N, d) matrix driver-side and broadcasts it once; each batch filters
    itself with chunked matmuls — zero shuffle. Bounded inputs ONLY (the
    broadcast must fit in worker memory); the block-pair sweep above is
    the contract/default path."""
    import ray

    from .ann import decode_fixed_dim

    mats, idss = [], []
    for b in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        mats.append(decode_fixed_dim(b[vec_col]))
        idss.append(b[id_col].to_numpy())
    M = np.concatenate(mats) if mats else np.empty((0, 0))
    all_ids = np.concatenate(idss) if idss else np.empty((0,), dtype=np.int64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    M = M / norms[:, None]
    ref = ray.put((all_ids, M))

    def keep_rows(batch: pa.Table) -> pa.Table:
        ids_all, Mn = ray.get(ref) if not isinstance(ref, tuple) else ref
        ids = batch[id_col].to_numpy()
        X = decode_fixed_dim(batch[vec_col])
        n = np.linalg.norm(X, axis=1)
        n[n == 0] = 1.0
        X = X / n[:, None]
        dominated = np.zeros(len(ids), dtype=bool)
        # chunk the reference side so the (B, chunk) sim slab stays bounded
        for s in range(0, Mn.shape[0], chunk_rows):
            sl = slice(s, s + chunk_rows)
            sims = X @ Mn[sl].T  # (B, chunk)
            dominated |= ((sims >= threshold) & (ids_all[sl][None, :] < ids[:, None])).any(axis=1)
        return batch.filter(pa.array(~dominated))

    return ds.map_batches(keep_rows, batch_format="pyarrow")


def embedding_neardup_lsh_pairs(ds, threshold: float, dim: int,
                                id_col: str = "vec_id", vec_col: str = "embedding",
                                n_planes: int = 10, n_tables: int = 8,
                                max_bucket: int = 512, seed: int = 42):
    """Near-dup candidate pairs (a < b, cosine >= threshold) via
    random-hyperplane LSH (public Charikar scheme) — the SCALE path: data
    buckets by sign pattern in ``n_tables`` tables, all-pairs cosine runs
    only inside (capped) buckets, and recovered pairs dedup through the
    packed-key native aggregate. Shuffle volume is ``n_tables`` x the
    normalized vectors; recall at threshold t is
    1-(1-(1-arccos(t)/pi)^n_planes)^n_tables — tuned for HIGH thresholds
    (>= 0.9, the near-duplicate regime); low thresholds need fewer planes
    or the exact kernel."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def explode(batch: pa.Table) -> pa.Table:
        from .ann import decode_fixed_dim

        ids = batch[id_col].to_numpy()
        mat = decode_fixed_dim(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        signs = (np.einsum("tpd,bd->tbp", planes, matn) > 0).astype(np.uint32)
        codes = (signs << np.arange(n_planes, dtype=np.uint32)).sum(axis=2)  # (T, B)
        n, d = matn.shape
        rep_ids = np.tile(ids, n_tables)
        tb = (np.repeat(np.arange(n_tables, dtype=np.int64), n) << 40) | codes.reshape(-1).astype(np.int64)
        # vectors travel as FIXED-WIDTH float32 binary, not list<float>:
        # the singleton-prefilter hash join can't shuffle list-typed
        # non-key fields (Arrow acero limitation), and fixed-width binary
        # halves the shuffle bytes
        v32 = matn.astype(np.float32)
        flat = np.tile(v32.reshape(-1).view(np.uint8), n_tables)
        off = np.arange(n * n_tables + 1, dtype=np.int32) * (4 * d)
        return pa.table(
            {
                "tb": pa.array(tb),
                "vec_id": pa.array(rep_ids, type=pa.int64()),
                "vec": pa.BinaryArray.from_buffers(
                    pa.binary(), n * n_tables,
                    [None, pa.py_buffer(off.tobytes()), pa.py_buffer(flat.tobytes())],
                ),
            }
        )

    def score_bucket(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        vcol = g["vec"]
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        # vectorized fixed-width decode: every value is exactly 4*dim bytes
        offs = np.frombuffer(vcol.buffers()[1], dtype=np.int32)[
            vcol.offset : vcol.offset + len(vcol) + 1
        ]
        assert (np.diff(offs) == 4 * dim).all(), "ragged binary vec column"
        data = np.frombuffer(vcol.buffers()[2], dtype=np.uint8)
        raw = data[offs[0] : offs[0] + len(vcol) * 4 * dim]
        mat = raw.view(np.float32).reshape(len(vcol), dim).astype(np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        if len(ids) > max_bucket:
            print(
                f"[dedup] embedding LSH bucket truncated: {len(ids)} members "
                f"> cap {max_bucket} ({len(ids) - max_bucket} dropped)"
            )
            ids, mat = ids[:max_bucket], mat[:max_bucket]
        empty = pa.table({"a": pa.array([], type=pa.int64()),
                          "b": pa.array([], type=pa.int64())})
        if len(ids) < 2:
            return empty
        sims = mat @ mat.T
        iu = np.triu_indices(len(ids), k=1)
        hit = (sims[iu] >= threshold) & (ids[iu[0]] != ids[iu[1]])
        if not hit.any():
            return empty
        return pa.table(
            {"a": pa.array(ids[iu[0]][hit]), "b": pa.array(ids[iu[1]][hit])}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    cand = _multi_member_rows(exploded, "tb")
    pairs = cand.groupby("tb").map_groups(score_bucket, batch_format="pyarrow")
    return distinct_pairs(pairs)


def span_dedup_counts(ds, id_col: str = "doc_id", text_col: str = "text",
                      window: int = 8, num_partitions: Optional[int] = None):
    """Exact-substring span dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better" — the suffix-array method's
    distributed hash analog): per doc, how many of its ``window``-token
    spans occur more than once ANYWHERE in the corpus. Docs with high
    counts carry memorization-prone duplicated passages.

    Per batch: one polars token-hash call, then a Rabin-Karp polynomial
    rolling hash — token hashes are scaled by per-position powers of an
    odd constant R (mod 2^64), prefix-summed, and every window hash is
    ``(ps[i+W] - ps[i]) * R^{-i}`` so the value depends only on the token
    sequence. Fully vectorized; windows never cross doc boundaries.
    Shuffle: one groupby(span_hash) count over (hash, doc) rows, the
    duplicated hashes join back via one co-partitioned hash join, then a
    per-doc count. 64-bit hashes stand in for exact strings (collision
    probability ~ n²/2⁶⁵ — documented accepted risk)."""
    from .relational import default_shuffle_partitions

    R = np.uint64(0x5851F42D4C957F2D)  # odd -> invertible mod 2^64
    R_INV = np.uint64(pow(0x5851F42D4C957F2D, -1, 1 << 64))
    W = int(window)

    def spans(batch: pa.Table) -> pa.Table:
        h, offsets = token_hashes_batch(batch[text_col])
        total = len(h)
        if total == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "span_hash": pa.array([], type=pa.int64())})
        with np.errstate(over="ignore"):
            pw = np.empty(total, dtype=np.uint64)
            pw[0] = np.uint64(1)
            if total > 1:
                np.multiply.accumulate(
                    np.full(total - 1, R, dtype=np.uint64), out=pw[1:])
            pwinv = np.empty(total, dtype=np.uint64)
            pwinv[0] = np.uint64(1)
            if total > 1:
                np.multiply.accumulate(
                    np.full(total - 1, R_INV, dtype=np.uint64), out=pwinv[1:])
            ps = np.zeros(total + 1, dtype=np.uint64)
            np.cumsum(h * pw, out=ps[1:])
            # window start positions: within-doc, i + W <= doc_end
            lens = np.diff(offsets)
            n_win = np.maximum(lens - W + 1, 0)
            starts = np.repeat(offsets[:-1], n_win) + _ranges(n_win)
            win = (ps[starts + W] - ps[starts]) * pwinv[starts]
        ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), n_win)
        # int64 bit-view: Ray's hash groupby/join path handles signed ints
        return pa.table({id_col: pa.array(ids),
                         "span_hash": pa.array(win.view(np.int64))})

    # rows feed TWO consumers (the hash count and the join probe) —
    # materialize once so the read+rolling-hash lineage runs a single time
    from .relational import bucketed_agg

    rows = ds.map_batches(spans, batch_format="pyarrow").materialize()
    P = default_shuffle_partitions(num_partitions)
    # both counts key on HIGH-cardinality values (span hashes, doc ids):
    # the bucketed combiner+merge replaces the per-key sort exchange
    counts = bucketed_agg(rows.select_columns(["span_hash"]), "span_hash",
                          [("span_hash", "count")], ["c"])
    # heal block schemas before the join: the bucketed map_groups lineage
    # emits schema-less empty bundles on tiny inputs (ray-data notes)
    dups = (counts.filter(expr="c > 1").select_columns(["span_hash"])
            .repartition(P))
    joined = rows.join(dups, join_type="inner", num_partitions=P,
                       on=("span_hash",))
    return bucketed_agg(joined.select_columns([id_col]), id_col,
                        [(id_col, "count")], ["n_dup_spans"])


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated arange(c) for every c in counts, vectorized."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return np.arange(total, dtype=np.int64) - np.repeat(offs, counts)


def near_dup_clusters(ds, **minhash_kwargs):
    """Cluster-level near-dup dedup: MinHash-LSH verified pairs (which may
    CHAIN — A~B, B~C with A≁C) → distributed connected components →
    (node, component) for every doc in at least one pair; the keep-set is
    "everything except non-representative members" (component = min id =
    the representative). Pair-level dedup under-removes on chains; the CC
    step is what Lee et al. 2022-style pipelines run between candidate
    generation and the drop (functions/cc.py)."""
    from .cc import connected_components

    pairs = minhash_near_dup_pairs(ds, **minhash_kwargs)
    return connected_components(pairs, a_col="a", b_col="b")
