"""Decontamination op: vectorized n-gram window construction pinned by a
brute-force reference; end-to-end overlap counts vs a pure-Python recount
on a tiny deterministic corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.functions.decontam import decontaminate, ngram_table


def _brute_ngrams(text, n):
    toks = text.split(" ")
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_ngram_table_matches_bruteforce():
    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{int(x)}" for x in rng.integers(0, 9, size=m))
        for m in [1, 2, 3, 7, 8, 9, 20]
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts)})
    for n in (2, 3, 8):
        got = ngram_table(batch, n=n)
        exp = [(i, g) for i, t in enumerate(texts) for g in _brute_ngrams(t, n)]
        assert list(zip(got["doc_id"].to_pylist(), got["gram"].to_pylist())) == exp


def test_decontaminate_end_to_end(ray_session, tmp_path):
    # doc 0 is the benchmark (id % 97 == 0); docs 97.. are too. Build a
    # corpus where doc 1 shares one trigram with doc 0, doc 2 shares two
    # DISTINCT trigrams, doc 3 shares none.
    rows = {
        0: "alpha beta gamma delta epsilon",
        1: "x y alpha beta gamma z",
        2: "beta gamma delta q gamma delta epsilon",
        3: "unrelated words only here",
    }
    path = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(list(rows), type=pa.int64()),
                  "text": pa.array(list(rows.values()))}),
        path,
    )
    df = decontaminate(path, n=3, bench_mod=97).to_pandas()
    df = df.sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == [1, 2]
    assert df["n_overlap"].tolist() == [1, 2]
