"""Adversarial block-max WAND equivalence (regression for the skip-clamp
bug: the lead iterator must never be advanced past the first non-prefix
iterator's current docid — Ding & Suel BMW d' = min(boundary+1, d_{p+1});
reference: lucene/core/src/java/org/apache/lucene/search/WANDScorer.java,
branch_8x).

Builds raw synthetic segments (multi-block posting lists, mixed dense /
sparse terms, random freqs+norms) and asserts WAND == exhaustive
bit-identically for many seeds — the distributions are chosen so the old
unclamped skip reliably drops contributions."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.index.segment import SegmentReader, write_segment_artifact
from lucene_solr_ray.search.searcher import score_query_exhaustive
from lucene_solr_ray.search.similarity import Bm25Similarity
from lucene_solr_ray.search.wand import score_query_wand


def _build_synthetic_segment(tmp_path, seed: int, n_docs: int = 2000):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(6)]
    # term densities: t0/t1 dense (multi-block), t2/t3 medium, t4/t5 sparse
    dfs = [
        int(n_docs * 0.9),
        int(n_docs * 0.6),
        int(n_docs * 0.2),
        int(n_docs * 0.1),
        40,
        15,
    ]
    tids, docids, freqs = [], [], []
    for tid, df in enumerate(dfs):
        docs = np.sort(rng.choice(n_docs, size=df, replace=False))
        tids.append(np.full(df, tid, dtype=np.int64))
        docids.append(docs.astype(np.int64))
        # heavy-tailed freqs so block maxima vary a lot between blocks
        freqs.append((rng.pareto(1.5, size=df) * 3 + 1).astype(np.uint32).clip(1, 50))
    tids_s = np.concatenate(tids)
    docids_s = np.concatenate(docids)
    freqs_s = np.concatenate(freqs)
    dl = rng.integers(5, 400, size=n_docs).astype(np.int64)
    urls = pa.array([f"u{i:06d}" for i in range(n_docs)], type=pa.string())
    ts = pa.array([0] * n_docs, type=pa.timestamp("us"))
    seg = str(tmp_path / f"seg-{seed}")
    write_segment_artifact(
        seg, 0, np.array(sorted(vocab), dtype=object), tids_s, docids_s,
        freqs_s, dl, urls, ts, {"analyzer_hash": "test"}, 0.0,
    )
    reader = SegmentReader(seg)
    n = reader.num_docs
    sim = Bm25Similarity()
    avgdl = sim.avgdl(int(dl.sum()), n)
    cache_inv = sim.norm_inverse_cache(avgdl)
    weights = {
        t: np.float32(sim.idf(int(reader.df[reader.lookup(t)]), n))
        for t in vocab
    }
    return reader, weights, cache_inv, sim


QUERIES = [
    (["t0", "t5"], "or"),   # dense lead + rare tail: the clamp-bug shape
    (["t0", "t4"], "or"),
    (["t1", "t5"], "or"),
    (["t0", "t1", "t5"], "or"),
    (["t0", "t2", "t4"], "or"),
    (["t0", "t1", "t2", "t3", "t4", "t5"], "or"),
    (["t0", "t1"], "and"),
    (["t0", "t2", "t3"], "and"),
]


@pytest.mark.parametrize("seed", range(8))
def test_wand_bit_identical_adversarial(tmp_path, seed):
    reader, weights, cache_inv, sim = _build_synthetic_segment(tmp_path, seed)
    for terms, kind in QUERIES:
        for k in (1, 3, 10):
            exp_d, exp_s = score_query_exhaustive(
                reader, terms, kind, weights, cache_inv, sim, k
            )
            got_d, got_s = score_query_wand(
                reader, terms, kind, weights, cache_inv, sim, k
            )
            assert np.array_equal(exp_d, got_d), (terms, kind, k, seed)
            assert np.array_equal(exp_s, got_s), (terms, kind, k, seed)


def test_wand_tied_cursor_pivot(tmp_path):
    """Iterators tied at the pivot doc must be part of the block-ub test:
    a doc where a rare high-idf term co-occurs with the dense lead must
    not be skipped when the lead-only bound is below theta."""
    n_docs = 1500
    vocab = np.array(["aa", "bb"], dtype=object)
    # aa: every doc, freq 1 (low bound). bb: a few docs, huge freq.
    docs_a = np.arange(n_docs, dtype=np.int64)
    docs_b = np.array([700, 701, 1300], dtype=np.int64)
    tids_s = np.concatenate([np.zeros(n_docs, np.int64), np.ones(3, np.int64)])
    docids_s = np.concatenate([docs_a, docs_b])
    freqs_s = np.concatenate(
        [np.ones(n_docs, np.uint32), np.array([30, 30, 30], np.uint32)]
    )
    dl = np.full(n_docs, 50, dtype=np.int64)
    urls = pa.array([f"u{i:06d}" for i in range(n_docs)], type=pa.string())
    ts = pa.array([0] * n_docs, type=pa.timestamp("us"))
    seg = str(tmp_path / "seg-tied")
    write_segment_artifact(
        seg, 0, vocab, tids_s, docids_s, freqs_s, dl, urls, ts,
        {"analyzer_hash": "test"}, 0.0,
    )
    reader = SegmentReader(seg)
    sim = Bm25Similarity()
    cache_inv = sim.norm_inverse_cache(sim.avgdl(int(dl.sum()), n_docs))
    weights = {
        "aa": np.float32(sim.idf(n_docs, n_docs)),
        "bb": np.float32(sim.idf(3, n_docs)),
    }
    exp = score_query_exhaustive(reader, ["aa", "bb"], "or", weights, cache_inv, sim, 3)
    got = score_query_wand(reader, ["aa", "bb"], "or", weights, cache_inv, sim, 3)
    assert np.array_equal(exp[0], got[0])
    assert np.array_equal(exp[1], got[1])
    assert set(docs_b).issuperset(set(got[0])), "bb docs must win top-3"
