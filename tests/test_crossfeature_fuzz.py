"""Cross-feature integration fuzz: random analyzer specs × random classic
parser queries × partition counts. The north-rule invariant is
rank-identity at ANY parallelism, so every (spec, query) pair must give
`.equals()`-identical (query_id, rank, url, score) frames at P=1 and
P=3; for the default analyzer the frames must also match the
single-process OracleIndex twin on the same parsed trees."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.pipelines.query import search
from lucene_solr_ray.search.oracle import OracleIndex
from lucene_solr_ray.search.queryparser import parse_query

VOCAB = ["ray", "data", "set", "block", "stream", "merge", "sort",
         "scan", "running", "runner", "jumped", "quickly"]
COLS = ["query_id", "rank", "url", "score"]

SPECS = [
    None,
    {"filters": ["lowercase", {"name": "stop", "words": ["set", "block"]}]},
    {"filters": ["lowercase", "porter_stem"]},
    {"filters": [
        "lowercase",
        {"name": "stop", "words": ["scan"]},
        {"name": "synonym", "groups": [["ray", "beam"]]},
        "porter_stem",
    ]},
]


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    rng = np.random.default_rng(97)
    texts = []
    for _ in range(250):
        m = int(rng.integers(3, 15))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), size=m)]
        # sprinkle punctuation joins + case so the tokenizer paths fire
        if rng.random() < 0.3:
            words[0] = words[0].upper()
        if rng.random() < 0.2 and m >= 2:
            words[1] = f"{words[1]},{words[0]}"
        texts.append(" ".join(words))
    pages = pa.table({
        "url": [f"u://{i:03d}" for i in range(len(texts))],
        "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    base = tmp_path_factory.mktemp("xfuzz")
    p = str(base / "pages.parquet")
    pq.write_table(pages, p)
    return p, str(base)


def _rand_query_strings(rng, n=25):
    out = []
    for _ in range(n):
        kind = int(rng.integers(0, 8))
        a, b = (VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), size=2))
        if kind == 0:
            out.append(a)
        elif kind == 1:
            out.append(f"+{a} {b}")
        elif kind == 2:
            out.append(f"{a} -{b}")
        elif kind == 3:
            out.append(f'"{a} {b}"')
        elif kind == 4:
            out.append(f'"{a} {b}"~1')
        elif kind == 5:
            out.append(f"{a[:3]}*")
        elif kind == 6:
            out.append(f"{a}~1")
        else:
            lo, hi = sorted((a, b))
            out.append(f"[{lo} TO {hi}]")
    return out


def _frame(res):
    return (res[COLS].sort_values(["query_id", "rank"])
            .reset_index(drop=True))


@pytest.mark.parametrize("spec_i", range(len(SPECS)))
def test_partition_invariance_under_specs(corpus, spec_i):
    p, base = corpus
    spec = SPECS[spec_i]
    rng = np.random.default_rng(1000 + spec_i)
    idxs = []
    for P in (1, 3):
        root = f"{base}/idx_s{spec_i}_p{P}"
        build_index([p], root, num_partitions=P, store_positions=True,
                    analyzer_spec=spec)
        idxs.append(root)
    queries = [{"query_id": i, "qstr": s}
               for i, s in enumerate(_rand_query_strings(rng))]
    r1 = search(idxs[0], queries, k=10 ** 9, method="exhaustive")
    r3 = search(idxs[1], queries, k=10 ** 9, method="exhaustive")
    f1, f3 = _frame(r1), _frame(r3)
    assert f1.equals(f3), f"spec {spec_i}: P1 != P3"
    assert len(f1) > 20, "fuzz corpus produced too few hits to be meaningful"

    if spec is None:
        # default analyzer == the OracleIndex twin on the same parsed
        # trees — restricted to the flat kinds the oracle implements
        # (bool/multiterm trees are brute-force-pinned elsewhere)
        trees = [dict(parse_query(s), query_id=i)
                 for i, s in enumerate(_rand_query_strings(
                     np.random.default_rng(1000 + spec_i)))]
        flat = [t for t in trees
                if t.get("kind") in ("term", "and", "or", "phrase")
                and "terms" in t]
        assert len(flat) >= 5, "fuzz drew too few oracle-comparable queries"
        got = _frame(search(idxs[0], flat, k=10 ** 9, method="exhaustive"))
        exp = _frame(OracleIndex([p]).search(flat, k=10 ** 9))
        assert list(got["url"]) == list(exp["url"])
        assert np.allclose(got["score"], exp["score"], rtol=0, atol=0)


def test_spec_changes_results_sanity(corpus):
    """The stop+synonym+stem spec must actually change semantics (guards
    against a silently ignored analyzer_spec): 'scan' is stopped, 'beam'
    reaches 'ray' docs through the synonym group."""
    p, base = corpus
    idx = f"{base}/idx_s3_p1"  # built by the parametrized test (spec 3)
    r_stop = search(idx, [{"query_id": 0, "qstr": "scan"}], k=10)
    assert len(r_stop) == 0
    r_syn = search(idx, [{"query_id": 0, "qstr": "beam"}], k=10)
    assert len(r_syn) == 10
