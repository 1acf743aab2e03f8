"""explain() — the [explain] transformer / IndexSearcher.explain analog:
per-(query, doc, term) contribution rows must recompose the exact float32
search score (same contributions, same term-order accumulation), and the
breakdown's freq/df must match a brute-force corpus recount."""

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from lucene_solr_ray.pipelines.query import explain, search


def test_explain_sums_to_score(built_indexes, corpus_queries):
    idx1, idx4 = built_indexes
    qset = [q for q in corpus_queries if q["kind"] in ("term", "and", "or")][:8]
    res = search(idx4, qset, k=10)
    exp = explain(idx4, qset, k=10)
    by_q = {q["query_id"]: q for q in qset}
    n_checked = 0
    for (qid, url), g in exp.groupby(["query_id", "url"]):
        terms = [t.lower() for t in by_q[qid]["terms"]]
        g = g.set_index("term").loc[terms]
        s = np.float32(0.0)
        for c in g.contribution:
            s = np.float32(s + np.float32(c))
        want = res[(res.query_id == qid) & (res.url == url)]["score"].iloc[0]
        assert np.float32(s) == np.float32(want), (qid, url)
        n_checked += 1
    assert n_checked == len(res)


def test_explain_freq_df_against_corpus(built_indexes, small_corpus, corpus_queries):
    idx1, idx4 = built_indexes
    q = next(q for q in corpus_queries if q["kind"] == "or")
    exp = explain(idx4, [q], k=5)
    best = {}
    for p in small_corpus:
        for row in pq.read_table(
            p, columns=["url", "text", "warc_ts", "lang"]
        ).to_pylist():
            if row["lang"] != "en":  # the build's lang filter
                continue
            # the build's last-wins version rule: max warc_ts per url
            if row["url"] not in best or row["warc_ts"] > best[row["url"]][0]:
                best[row["url"]] = (row["warc_ts"], row["text"])
    tf = {u: Counter(t.lower().split()) for u, (_, t) in best.items()}
    dfs = Counter()
    for cnt in tf.values():
        dfs.update(set(cnt))
    for _, r in exp.iterrows():
        assert r.freq == tf[r.url][r.term], (r.url, r.term)
        assert r.df == dfs[r.term], r.term
