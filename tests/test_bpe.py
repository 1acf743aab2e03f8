"""Distributed BPE vocabulary induction (functions/bpe.py) pinned against
the single-process reference of the published algorithm — identical merge
SEQUENCE (pairs and counts) and identical final segmentations, at several
partition counts."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _corpus(seed=5, n=300):
    rng = np.random.default_rng(seed)
    words = ["low", "lower", "lowest", "newer", "newest", "wide", "widest",
             "stream", "streams", "streaming", "data", "dataset"]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(3, 12))))
             for _ in range(n)]
    return texts


@pytest.mark.parametrize("parallelism", [1, 4])
def test_train_bpe_matches_reference(ray_session, parallelism):
    import ray.data as rd
    from lucene_solr_ray.functions.bpe import bpe_reference, train_bpe

    texts = _corpus()
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(parallelism)
    merges_df, vocab = train_bpe(ds, num_merges=15)

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    ref_merges, ref_seg = bpe_reference(dict(wc), 15)

    got = [(r.left, r.right, int(r.pair_count))
           for r in merges_df.itertuples()]
    assert got == ref_merges

    seg = {}
    for r in vocab.take_all():
        syms = list(r["syms"])
        word = "".join(syms).removesuffix(
            __import__("lucene_solr_ray.functions.bpe",
                       fromlist=["EOW"]).EOW)
        seg[word] = syms
    assert seg == ref_seg
    # word counts survived the rounds untouched
    total = {r["count"] for r in vocab.take_all()}
    assert all(c > 0 for c in total)


def test_train_bpe_chained_same_symbol_merges(ray_session):
    """a==b chains must merge greedy-left ('aaaa' → 'aa','aa', never
    'a','aa','a')."""
    import ray.data as rd
    from lucene_solr_ray.functions.bpe import (
        EOW, bpe_reference, train_bpe)

    texts = ["aaaa aaaa aaaa aaa aa"] * 8
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    merges_df, vocab = train_bpe(ds, num_merges=4)
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    ref_merges, ref_seg = bpe_reference(dict(wc), 4)
    got = [(r.left, r.right, int(r.pair_count)) for r in merges_df.itertuples()]
    assert got == ref_merges
    seg = {"".join(r["syms"]).removesuffix(EOW): list(r["syms"])
           for r in vocab.take_all()}
    assert seg == ref_seg


def test_segment_words_applies_learned_merges(ray_session):
    import ray.data as rd
    from lucene_solr_ray.functions.bpe import segment_words, train_bpe

    texts = _corpus(seed=9)
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    merges_df, vocab = train_bpe(ds, num_merges=12)
    merges = [(r.left, r.right, int(r.pair_count))
              for r in merges_df.itertuples()]
    # a trained word segments identically through the driver-side helper
    seg = {"".join(r["syms"]): list(r["syms"]) for r in vocab.take_all()}
    for w in ["low", "newest", "streaming"]:
        got = segment_words([w], merges)[0]
        assert "".join(got) in seg and seg["".join(got)] == got


@pytest.mark.parametrize("parallelism", [1, 4])
def test_bpe_encode_matches_segment_words(ray_session, parallelism):
    """bpe_encode per-doc subword counts must equal the sum of
    segment_words piece counts, bit-exactly, at P in {1, 4} — incl. empty
    docs (0 tokens) and words unseen at train time."""
    import ray.data as rd
    from lucene_solr_ray.functions.bpe import (
        bpe_encode, segment_words, train_bpe)

    texts = _corpus(seed=13, n=200) + ["", "zzunseen zzword low", "low"]
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"doc_id": ids, "text": texts})
    ).repartition(parallelism)
    merges_df, _ = train_bpe(
        rd.from_arrow(pa.table({"text": texts})).repartition(parallelism),
        num_merges=15,
    )
    merges = [(r.left, r.right, int(r.pair_count))
              for r in merges_df.itertuples()]
    got = (
        bpe_encode(ds, merges, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = []
    for t in texts:
        words = [w for w in t.split(" ") if w]
        exp.append(sum(len(s) for s in segment_words(words, merges)))
    assert got["doc_id"].tolist() == ids.tolist()
    assert got["n_bpe_tokens"].tolist() == exp
    assert got["n_bpe_tokens"].iloc[len(texts) - 3] == 0  # the empty doc
