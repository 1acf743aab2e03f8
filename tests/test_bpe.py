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
