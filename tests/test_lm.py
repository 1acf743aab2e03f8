"""Bigram-LM scoring gates: the distributed join-based pipeline must match
a single-process reference (the float path has no SQL oracle because
float sum order is engine-specific — this is its correctness gate)."""

from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _reference(df, alpha=0.5):
    toks = {r.doc_id: r.text.split(" ") for r in df.itertuples()}
    bg = Counter()
    ctx = Counter()
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] += 1
            ctx[a] += 1
    V = len(vocab)
    scores = {}
    rare = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        lps = [np.log((bg[(a, b)] + alpha) / (ctx[a] + alpha * V))
               for a, b in zip(ts, ts[1:])]
        scores[d] = float(np.mean(lps))
        rare[d] = (len(lps), sum(1 for a, b in zip(ts, ts[1:]) if bg[(a, b)] <= 2))
    return scores, rare


def test_lm_score_matches_reference(ray_session):
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.entry_queries import (
        q_lm_rare_bigrams, q_lm_score_docs)

    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "text"]).to_pandas()
    ref_scores, ref_rare = _reference(df)

    got = q_lm_score_docs(SF).to_pandas()
    assert len(got) == len(ref_scores)
    for d, s in zip(got["doc_id"], got["lm_score"]):
        assert abs(s - ref_scores[int(d)]) < 1e-9, (d, s, ref_scores[int(d)])

    got_r = q_lm_rare_bigrams(SF).to_pandas()
    assert len(got_r) == len(ref_rare)
    for d, nb, nr in zip(got_r["doc_id"], got_r["n_bigrams"], got_r["n_rare"]):
        assert (int(nb), int(nr)) == ref_rare[int(d)], (d, nb, nr, ref_rare[int(d)])
