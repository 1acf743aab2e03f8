"""Driver-contract query registry: every implemented operator/pipeline from
SURVEY.md §2 exposed as a ``(sf_dir) -> result`` callable, with a matching
ANSI-SQL oracle where the semantics are SQL-expressible.

Conventions for oracle parity (the driver hashes values order-insensitively
after sorting columns by name):
- every aggregate / computed column is NAMED, identically in Ray and SQL;
- floats never cross the boundary raw: scores/ratios are integer-scaled
  (``*_e6`` = floor(x * 1e6)) or money is in cents (``*_c``);
- counts / ids / ranks are int64 (SQL BIGINT);
- the fulltext oracle queries score with ``Bm25Similarity(dtype=float64,
  mode="div")`` (SURVEY.md §2.11 Similarity plugin) because SQL cannot
  express Lucene's float32 rounding — the float32 Lucene semantics are
  gated by the pytest oracle suite instead (tests/test_index_search.py).

Ray is initialised by the DRIVER before these run: nothing here may call
ray.init/shutdown.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..analysis.smallfloat import LENGTH_TABLE
from ..functions import relational as rel
from ..functions.ann import brute_force_cosine_topk, lsh_cosine_topk
from ..functions.dedup import exact_dedup, minhash_near_dup_pairs, simhash_near_dup_pairs
from ..functions.multimodal import MediaDecodeStage, binary_meta_batch
from ..functions.textstats import (
    LangIdStage,
    doc_stats_batch,
    fingerprint_batch,
    quality_score_batch,
    token_count_batch,
)
from ..index.segment import SegmentReader
from ..state.manifest import read_root_manifest, segment_dir
from .build import append_index, build_index
from .query import search

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

FT_TERMS_OR = ["query", "join", "fast"]
FT_TERMS_AND = ["query", "join"]
FT_STAT_TERMS = ["the", "data", "query", "join", "window"]
FT_PARTITIONS = 4


# --------------------------------------------------------------- helpers ---
def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _read(sf_dir: str, table: str, columns=None):
    """Pruned-column read with a SIZE-AWARE block split: a table here is
    one parquet file, and a 1-file read is 1 block — which serializes
    every downstream actor stage onto a single batch. Target ~4 MB per
    block, capped at 2 blocks per CPU: small tables stay at 8 blocks (no
    actor-spin-up storm for trivial inputs), big ones fan out with the
    cluster. Measured on dedup_minhash at sf0.1/32 CPUs: 1 block 11.7 s,
    8 blocks 6.6 s, 64 blocks 8.3 s — both extremes lose."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    try:
        nbytes = os.path.getsize(path)
    except OSError:
        nbytes = 0
    blocks = int(np.clip(nbytes // (4 << 20), 8, 2 * ncpu))
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=blocks
    )


def _docs_as_pages(sf_dir: str):
    """documents(doc_id, text, lang, ...) → pages schema adapter
    (FIXTURES.md §4). url embeds the doc_id zero-padded so lexicographic
    url order == numeric doc_id order (docID determinism)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def adapt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        urls = [f"doc://{i:012d}" for i in ids]
        ts = (EPOCH_US + ids).astype("datetime64[us]")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "text": batch["text"],
                "lang": batch["lang"],
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


def _url_to_doc_id(urls) -> np.ndarray:
    return np.array([int(u[6:]) for u in urls], dtype=np.int64)


def ensure_ft_index(sf_dir: str) -> str:
    """Build (once) the fulltext index over the documents table; cached in
    /tmp keyed by the input identity, revalidated via manifest lineage."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if (
                root.get("input_fingerprint") == key
                and root.get("num_partitions") == FT_PARTITIONS
            ):
                return index_root
        except Exception:
            pass
    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,  # index every row; keeps the SQL oracle unconditional
        dataset=_docs_as_pages(sf_dir),
        fingerprint=key,
    )
    return index_root


def ensure_dbq_index(sf_dir: str) -> str:
    """A COPY of the ft index with ``deleteByQuery(term 'slow')`` applied —
    kept separate so the shared ft cache is never mutated. The lifecycle
    sentinel is written only after the delete completes (an interrupted
    first run re-applies the idempotent delete, never serves a half-done
    copy)."""
    import shutil

    src = ensure_ft_index(sf_dir)
    dst = src + "_dbq"
    sentinel = os.path.join(dst, ".dbq_complete")
    if os.path.exists(sentinel):
        return dst
    from .update import delete_by_query

    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    delete_by_query(dst, {"kind": "term", "terms": ["slow"]})
    with open(sentinel, "w") as f:
        f.write("ok")
    return dst


def q_ft_delete_topk(sf_dir: str) -> pd.DataFrame:
    """deleteByQuery semantics (reference: solr/core/.../update/
    DirectUpdateHandler2.java#deleteByQuery, branch_8x; SURVEY.md §2.10):
    after deleting docs containing 'slow', a BM25 top-10 disjunction
    excludes them while SURVIVING docs keep their exact scores — df/N/
    avgdl are NOT adjusted until merge (Lucene docFreq semantics), which
    the oracle reproduces by computing stats over ALL docs and filtering
    matches only."""
    idx = ensure_dbq_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_delete_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
deleted AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'slow'),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE tf.doc_id NOT IN (SELECT doc_id FROM deleted)
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (GPT-3/Gopher-style n-gram collision
    check; SURVEY-adjacent LLM-curation op): corpus docs sharing ≥1
    distinct n-token n-gram with the benchmark slice (doc_id % 97 == 0),
    with the distinct-overlap count. Broadcast bench set + one streaming
    map_batches pass — no shuffle (see functions/decontam.py). n=3 here
    (the synthetic corpus has no natural 8-gram collisions; production
    default is 8-13)."""
    from ..functions.decontam import decontaminate

    ds = decontaminate(_docs_path(sf_dir), n=3, bench_mod=97)
    df = ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "n_overlap": pd.Series(dtype=np.int64)})
    return df.sort_values("doc_id").reset_index(drop=True)


def sql_decontaminate_docs() -> str:
    return """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
ng AS (
  SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram
  FROM toks, UNNEST(range(1, len(l) - 1)) AS t(i)
),
bench AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 97 = 0)
SELECT ng.doc_id, count(DISTINCT ng.gram) AS n_overlap
FROM ng JOIN bench USING (gram)
WHERE ng.doc_id % 97 <> 0
GROUP BY ng.doc_id
ORDER BY ng.doc_id
"""


def _cents(col):
    """Exact money→cents per row BEFORE any sum (double sums of dollar
    amounts are order-dependent; int sums are not)."""
    def fn(batch: pa.Table, c=col) -> pa.Table:
        v = np.floor(batch[c].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return batch.append_column(f"{c}_c", pa.array(v))
    return fn


_SQL_CENTS = "CAST(FLOOR({col} * 100.0 + 0.5) AS BIGINT)"


# ================================================================ fulltext ==
def q_ft_bm25_or_topk(sf_dir: str) -> pd.DataFrame:
    """BM25 top-10 disjunction over the documents corpus through the real
    index + distributed searcher (float64/div similarity for SQL parity)."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def q_ft_subquery_topk(sf_dir: str) -> pd.DataFrame:
    """[subquery] document transformer (SURVEY.md §2.2 document
    transformers; reference: solr/core/.../response/transform/
    SubQueryAugmenterFactory.java, branch_8x): the BM25-or top-5 parents
    each get a child top-3 — child query parameterized by the PARENT's
    top-tf term (tie → lexicographically smallest), parent excluded from
    its own children. All 5 child queries run as one batched distributed
    search via pipelines.query.subquery."""
    from collections import Counter

    import pyarrow.dataset as pads

    from ..analysis.tokenizer import tokenize_lower
    from .query import subquery

    idx = ensure_ft_index(sf_dir)
    sim = {"dtype": "float64", "mode": "div"}
    parents = search(
        idx, [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=5, method="exhaustive", sim_config=sim,
    )
    pids = _url_to_doc_id(parents["url"])
    dset = pads.dataset(_docs_path(sf_dir))
    t = dset.to_table(
        filter=pc.field("doc_id").isin([int(x) for x in pids]),
        columns=["doc_id", "text"],
    )
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def make_query(row):
        did = int(_url_to_doc_id([row["url"]])[0])
        tf = Counter(tokenize_lower(texts[did]))
        term = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        return {"kind": "term", "terms": [term]}

    res = subquery(idx, parents, make_query, sub_k=3,
                   sim_config=sim, method="exhaustive")
    return pd.DataFrame(
        {
            "parent_doc_id": _url_to_doc_id(res["parent_url"]),
            "parent_rank": res["parent_rank"].astype(np.int64),
            "sub_rank": res["sub_rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_subquery_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf0 AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY term),
pscored AS (
  SELECT tf0.doc_id,
         sum(
           ln(1 + (stats.n - dfs0.df + 0.5) / (dfs0.df + 0.5))
           - ln(1 + (stats.n - dfs0.df + 0.5) / (dfs0.df + 0.5))
             / (1 + tf0.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf0
  JOIN dfs0 USING (term)
  JOIN norml ON norml.doc_id = tf0.doc_id
  CROSS JOIN stats
  GROUP BY tf0.doc_id
),
parents AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS parent_rank
  FROM pscored ORDER BY score DESC, doc_id ASC LIMIT 5
),
ptf AS (
  SELECT doc_id, term, count(*) AS c FROM toks
  WHERE doc_id IN (SELECT doc_id FROM parents) GROUP BY doc_id, term
),
pterm AS (
  SELECT doc_id, term FROM (
    SELECT doc_id, term,
           row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, term ASC) AS rn
    FROM ptf
  ) WHERE rn = 1
),
ctf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN (SELECT term FROM pterm) GROUP BY doc_id, term
),
cdfs AS (SELECT term, count(*) AS df FROM ctf GROUP BY term),
cscore AS (
  SELECT ctf.term, ctf.doc_id,
         ln(1 + (stats.n - cdfs.df + 0.5) / (cdfs.df + 0.5))
         - ln(1 + (stats.n - cdfs.df + 0.5) / (cdfs.df + 0.5))
           / (1 + ctf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n)))) AS score
  FROM ctf
  JOIN cdfs USING (term)
  JOIN norml ON norml.doc_id = ctf.doc_id
  CROSS JOIN stats
),
children AS (
  SELECT p.doc_id AS parent_doc_id, p.parent_rank,
         c.doc_id AS child_doc_id, c.score,
         row_number() OVER (
           PARTITION BY p.doc_id ORDER BY c.score DESC, c.doc_id ASC
         ) AS sub_rank
  FROM parents p
  JOIN pterm t ON t.doc_id = p.doc_id
  JOIN cscore c ON c.term = t.term AND c.doc_id <> p.doc_id
)
SELECT CAST(parent_doc_id AS BIGINT) AS parent_doc_id,
       CAST(parent_rank AS BIGINT) AS parent_rank,
       CAST(sub_rank AS BIGINT) AS sub_rank,
       CAST(child_doc_id AS BIGINT) AS doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM children WHERE sub_rank <= 3
"""
    )


def q_ft_filter_topk(sf_dir: str) -> pd.DataFrame:
    """Occur.FILTER clause (reference: lucene BooleanClause.Occur.FILTER,
    branch_8x — the solr fq= analog; SURVEY.md §2.3): docs must match the
    filter term but it contributes NO score — top-10 of or(query, join)
    restricted to docs containing 'data', scores identical to the
    unfiltered disjunction on the surviving docs."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0,
            "kind": "bool",
            "must": [{"kind": "or", "terms": ["query", "join"]}],
            "filter": [{"kind": "term", "terms": ["data"]}],
        }],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def q_ft_function_boost_topk(sf_dir: str) -> pd.DataFrame:
    """FunctionScoreQuery / {!boost} (SURVEY.md §2.9 index-backed value
    sources; reference: lucene/queries/.../function/FunctionScoreQuery.java
    + solr ValueSourceParser "termfreq"/"norm", branch_8x): docs matching
    or(query, join) scored by the INTEGER function
    10000*termfreq(query) + 100*termfreq(join) + norm(text) — raw
    within-doc tf from postings and the decoded SmallFloat length norm,
    evaluated vectorized per segment; top-15."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0,
            "kind": "func_boost",
            "of": {"kind": "const",
                   "of": {"kind": "or", "terms": ["query", "join"]}},
            "vs": ["sum",
                   ["product", ["termfreq", "text", "query"], 10000],
                   ["product", ["termfreq", "text", "join"], 100],
                   ["norm", "text"]],
        }],
        k=15,
        method="exhaustive",
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score": res["score"].to_numpy().astype(np.int64),
        }
    )


def sql_ft_function_boost_topk() -> str:
    return (
        _ft_sql_common()
        + """
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ('query', 'join') GROUP BY doc_id, term
),
piv AS (
  SELECT doc_id,
         max(CASE WHEN term = 'query' THEN freq END) AS f_query,
         max(CASE WHEN term = 'join'  THEN freq END) AS f_join
  FROM tf GROUP BY doc_id
),
scored AS (
  SELECT piv.doc_id,
         COALESCE(f_query, 0) * 10000 + COALESCE(f_join, 0) * 100 + norml.nl
           AS score
  FROM piv JOIN norml ON norml.doc_id = piv.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(score AS BIGINT) AS score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 15
"""
    )


def q_ft_frange_topk(sf_dir: str) -> pd.DataFrame:
    """{!frange} FunctionRangeQuery (SURVEY.md §2.9; reference: solr/core/
    .../search/FunctionRangeQParserPlugin.java, branch_8x): docs whose
    value source 100*termfreq(query) + termfreq(join) lands in
    [200, 400) — l inclusive, u EXCLUSIVE to exercise the open bound —
    constant score, docid-asc tie-break, top-15."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0,
            "kind": "frange",
            "vs": ["sum",
                   ["product", ["termfreq", "text", "query"], 100],
                   ["termfreq", "text", "join"]],
            "l": 200, "u": 400, "incl_u": False,
        }],
        k=15,
        method="exhaustive",
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
        }
    )


def sql_ft_frange_topk() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ('query', 'join') GROUP BY doc_id, term
),
piv AS (
  SELECT doc_id,
         coalesce(max(CASE WHEN term = 'query' THEN freq END), 0) * 100
         + coalesce(max(CASE WHEN term = 'join' THEN freq END), 0) AS val
  FROM tf GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY doc_id ASC) AS rank, doc_id
FROM piv WHERE val >= 200 AND val < 400
ORDER BY doc_id ASC
LIMIT 15
"""


def q_ft_rerank_topk(sf_dir: str) -> pd.DataFrame:
    """ReRankQParser (SURVEY.md §2.7; reference: solr/core/.../search/
    ReRankQParserPlugin.java, branch_8x): main = BM25 or(query, join,
    fast), rerank query = term(data) with weight 2 ADDED to the top
    reRankDocs. rerank_docs=100000 covers every shard-local match, so
    the per-shard cut (SolrCloud semantics) equals the global rescore
    and the result is partition-invariant + SQL-expressible; the small-
    cut path is pinned in tests/test_frange_rerank.py."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0,
            "kind": "rerank",
            "of": {"kind": "or", "terms": FT_TERMS_OR},
            "rq": {"kind": "term", "terms": ["data"]},
            "rerank_docs": 100000,
            "rerank_weight": 2.0,
        }],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_rerank_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    idf = "ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
    bm25 = (
        f"{idf} - {idf} / (1 + tf.freq / (1.2 * "
        "(1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))"
    )
    return (
        _ft_sql_common()
        + f"""
, tf_main AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
tf_rq AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term = 'data' GROUP BY doc_id, term
),
dfs_all AS (
  SELECT term, count(*) AS df FROM (
    SELECT * FROM tf_main UNION ALL SELECT * FROM tf_rq
  ) GROUP BY term
),
main_scored AS (
  SELECT tf.doc_id, sum({bm25}) AS score
  FROM tf_main tf
  JOIN dfs_all dfs ON dfs.term = tf.term
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
rq_scored AS (
  SELECT tf.doc_id, sum({bm25}) AS score
  FROM tf_rq tf
  JOIN dfs_all dfs ON dfs.term = tf.term
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
combined AS (
  SELECT m.doc_id, m.score + 2.0 * coalesce(r.score, 0) AS score
  FROM main_scored m LEFT JOIN rq_scored r ON r.doc_id = m.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM combined
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def sql_ft_filter_topk() -> str:
    terms = ",".join(f"'{t}'" for t in ["query", "join", "data"])
    idf = "ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
persc AS (
  SELECT tf.doc_id, tf.term,
         {idf}
         - {idf}
           / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         AS s
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
),
piv AS (
  SELECT doc_id,
         max(CASE WHEN term = 'query' THEN s END) AS s_query,
         max(CASE WHEN term = 'join'  THEN s END) AS s_join,
         max(CASE WHEN term = 'data'  THEN s END) AS s_data
  FROM persc GROUP BY doc_id
),
scored AS (
  SELECT doc_id,
         COALESCE(s_query, 0) + COALESCE(s_join, 0) AS score
  FROM piv
  WHERE (s_query IS NOT NULL OR s_join IS NOT NULL) AND s_data IS NOT NULL
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_classic_topk(sf_dir: str) -> pd.DataFrame:
    """TF-IDF ClassicSimilarity plugin (reference: lucene/core/.../
    similarities/ClassicSimilarity.java + TFIDFSimilarity.java, branch_8x;
    SURVEY.md §2.11 Similarity SPI): same index, same distributed searcher,
    swapped scoring — idf = ln((N+1)/(df+1))+1, tf = sqrt(freq),
    norm = 1/sqrt(lossy length bucket). float64 for SQL parity; WAND is
    auto-disabled (sqrt(freq) has no per-term upper bound)."""
    idx = ensure_ft_index(sf_dir)
    # contract ranks on the FLOORED e6 score with doc_id tiebreak (both
    # sides): sqrt/division ulp noise between the engine's float64 sum
    # order and duckdb's can reorder docs tied at 1e-6 (observed at
    # sf0.001: same score_e6, ranks 4/5 swapped). k=15 margin keeps the
    # top-10 cut deterministic through e6 boundary ties too.
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=15,
        method="exhaustive",
        sim_config={"name": "classic", "dtype": "float64", "mode": "div"},
    )
    df = pd.DataFrame(
        {
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )
    df = (
        df.sort_values(["score_e6", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return df


def sql_ft_classic_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           (ln((stats.n + 1) / (dfs.df + 1)) + 1)
           * sqrt(tf.freq) / sqrt(norml.nl)
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank,
       doc_id, score_e6
FROM (
  SELECT doc_id, CAST(floor(score * 1000000) AS BIGINT) AS score_e6
  FROM scored
)
ORDER BY score_e6 DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_bool_nested_topk(sf_dir: str) -> pd.DataFrame:
    """Nested BooleanQuery tree (reference BooleanQuery/BooleanWeight,
    branch_8x; SURVEY.md §2.3): must=[or(query, join)],
    should=[window, and(data, fast)], must_not=[slow] — should clauses add
    score without being required (Lucene msm default 0 when must present);
    float64/div similarity for SQL parity."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0,
            "kind": "bool",
            "must": [{"kind": "or", "terms": ["query", "join"]}],
            "should": [
                {"kind": "term", "terms": ["window"]},
                {"kind": "and", "terms": ["data", "fast"]},
            ],
            "must_not": [{"kind": "term", "terms": ["slow"]}],
        }],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_bool_nested_topk() -> str:
    terms = ",".join(f"'{t}'" for t in ["query", "join", "window", "data", "fast", "slow"])
    idf = "ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
persc AS (
  SELECT tf.doc_id, tf.term,
         {idf}
         - {idf}
           / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         AS s
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
),
piv AS (
  SELECT doc_id,
         max(CASE WHEN term = 'query'  THEN s END) AS s_query,
         max(CASE WHEN term = 'join'   THEN s END) AS s_join,
         max(CASE WHEN term = 'window' THEN s END) AS s_window,
         max(CASE WHEN term = 'data'   THEN s END) AS s_data,
         max(CASE WHEN term = 'fast'   THEN s END) AS s_fast,
         max(CASE WHEN term = 'slow'   THEN s END) AS s_slow
  FROM persc GROUP BY doc_id
),
scored AS (
  SELECT doc_id,
         COALESCE(s_query, 0) + COALESCE(s_join, 0)
         + COALESCE(s_window, 0)
         + CASE WHEN s_data IS NOT NULL AND s_fast IS NOT NULL
                THEN s_data + s_fast ELSE 0 END AS score
  FROM piv
  WHERE (s_query IS NOT NULL OR s_join IS NOT NULL) AND s_slow IS NULL
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_parser_topk(sf_dir: str) -> pd.DataFrame:
    """Classic query-STRING parser end-to-end (reference: lucene/
    queryparser/.../classic/QueryParser.jj + QueryParserBase.addClause,
    branch_8x; SURVEY.md §3.2 step 2): the string
    ``+data +(query OR join^2) -slow fast^1.5 win*`` parses to a nested
    BooleanQuery — MUST term, MUST group (OR with a boosted term),
    MUST_NOT term, SHOULD boosted term, SHOULD PrefixQuery
    (constant-score 1.0) — and is scored with the float64/div
    oracle-parity similarity. Exercises the parser, BoostQuery, and the
    multi-term-as-bool-clause path in one oracle-checked pipeline."""
    from ..search.queryparser import parse_query

    idx = ensure_ft_index(sf_dir)
    tree = parse_query("+data +(query OR join^2) -slow fast^1.5 win*")
    res = search(
        idx,
        [{"query_id": 0, **tree}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_parser_topk() -> str:
    terms = ",".join(f"'{t}'" for t in ["data", "query", "join", "slow", "fast"])
    idf = "ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
    # float64 sum order mirrors the engine's clause accumulation:
    # ((must_data + group(query + 2*join)) + 1.5*fast) + prefix_const
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
persc AS (
  SELECT tf.doc_id, tf.term,
         {idf}
         - {idf}
           / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         AS s
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
),
pref AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE 'win%'),
piv AS (
  SELECT doc_id,
         max(CASE WHEN term = 'data'  THEN s END) AS s_data,
         max(CASE WHEN term = 'query' THEN s END) AS s_query,
         max(CASE WHEN term = 'join'  THEN s END) AS s_join,
         max(CASE WHEN term = 'slow'  THEN s END) AS s_slow,
         max(CASE WHEN term = 'fast'  THEN s END) AS s_fast
  FROM persc GROUP BY doc_id
),
scored AS (
  SELECT piv.doc_id,
         s_data
         + (COALESCE(s_query, 0) + COALESCE(2 * s_join, 0))
         + COALESCE(1.5 * s_fast, 0)
         + CASE WHEN pref.doc_id IS NOT NULL THEN 1.0 ELSE 0 END AS score
  FROM piv LEFT JOIN pref ON pref.doc_id = piv.doc_id
  WHERE s_data IS NOT NULL
    AND (s_query IS NOT NULL OR s_join IS NOT NULL)
    AND s_slow IS NULL
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_term_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) for fixed terms — the ExactStatsCache surface
    (SURVEY.md §2.6 index-build aggregations)."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_index(sf_dir)
    stats = read_query_term_stats(idx, FT_STAT_TERMS)
    rows = [
        {"term": t, "df": stats.get(t, (0, 0))[0], "total_tf": stats.get(t, (0, 0))[1]}
        for t in sorted(FT_STAT_TERMS)
        if t in stats
    ]
    df = pd.DataFrame(rows, columns=["term", "df", "total_tf"])
    return df.astype({"df": np.int64, "total_tf": np.int64})


def q_ft_and_count(sf_dir: str) -> pd.DataFrame:
    """Conjunction cardinality: |docs containing ALL query terms| — the
    posting-intersection primitive (ConjunctionDISI, SURVEY.md §2.3),
    counted per partition and summed (no doc ships anywhere)."""
    idx = ensure_ft_index(sf_dir)
    root = read_root_manifest(idx)
    parts = [
        {"seg_dir": segment_dir(idx, pid)} for pid in range(root["num_partitions"])
    ]
    terms = FT_TERMS_AND

    def count_part(batch: pa.Table) -> pa.Table:
        total = 0
        for seg in batch["seg_dir"].to_pylist():
            r = SegmentReader(seg)
            sets = []
            ok = True
            for t in terms:
                o = r.lookup(t)
                if o < 0:
                    ok = False
                    break
                sets.append(r.postings(o).docids)
            if ok:
                inter = sets[0]
                for s in sets[1:]:
                    inter = np.intersect1d(inter, s, assume_unique=True)
                total += len(inter)
        return pa.table({"n_docs": pa.array([total], type=pa.int64())})

    ds = ray.data.from_items(parts).map_batches(count_part, batch_format="pyarrow")
    n = int(sum(b["n_docs"][0].as_py() for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")))
    return pd.DataFrame({"n_docs": [n]}).astype(np.int64)


def q_ft_index_stats(sf_dir: str) -> pd.DataFrame:
    """Corpus-level stats recorded at build time: N, sum_dl, global vocab."""
    idx = ensure_ft_index(sf_dir)
    root = read_root_manifest(idx)
    n_terms = ray.data.read_parquet(os.path.join(idx, "stats", "global_stats")).count()
    return pd.DataFrame(
        {
            "n_docs": [root["num_docs"]],
            "sum_dl": [root["sum_dl"]],
            "n_terms": [n_terms],
        }
    ).astype(np.int64)


def _ft_sql_common() -> str:
    lt_values = ",".join(f"({int(v)})" for v in np.unique(LENGTH_TABLE))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sdl FROM dl),
lt(v) AS (VALUES {lt_values}),
norml AS (
  SELECT dl.doc_id, (SELECT max(v) FROM lt WHERE v <= dl.dl) AS nl FROM dl
)
"""


def sql_ft_bm25_or_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def sql_ft_term_stats() -> str:
    terms = ",".join(f"'{t}'" for t in sorted(FT_STAT_TERMS))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term,
       count(DISTINCT doc_id) AS df,
       count(*) AS total_tf
FROM toks WHERE term IN ({terms})
GROUP BY term
"""


def sql_ft_and_count() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_AND)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(*) AS n_docs FROM (
  SELECT doc_id FROM toks WHERE term IN ({terms})
  GROUP BY doc_id HAVING count(DISTINCT term) = {len(FT_TERMS_AND)}
)
"""


def sql_ft_index_stats() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS n_docs,
       count(*) AS sum_dl,
       count(DISTINCT term) AS n_terms
FROM toks
"""


def q_ft_not_topk(sf_dir: str) -> pd.DataFrame:
    """SHOULD disjunction with a MUST_NOT clause (ReqExclScorer semantics,
    SURVEY.md §2.7): docs matching query|fast but never join."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": ["query", "fast"], "exclude": ["join"]}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_not_topk() -> str:
    return (
        _ft_sql_common()
        + """
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ('query', 'fast') GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'join')
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_msm_topk(sf_dir: str) -> pd.DataFrame:
    """Disjunction with minShouldMatch=2 (BooleanQuery minimumNumberShouldMatch,
    SURVEY.md §2.3)."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR, "min_should_match": 2}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_msm_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
  HAVING count(*) >= 2
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


FT_PHRASE = ["query", "join"]


def ensure_ft_pos_index(sf_dir: str) -> str:
    """Positions-enabled index over documents (for phrase queries); cached
    separately from the main ft index."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:pos"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key and root.get("store_positions"):
                return index_root
        except Exception:
            pass
    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=_docs_as_pages(sf_dir),
        fingerprint=key,
        store_positions=True,
    )
    return index_root


def q_ft_phrase_count(sf_dir: str) -> pd.DataFrame:
    """Exact PhraseQuery cardinality (SURVEY.md §2.3 ExactPhraseMatcher):
    docs containing the exact consecutive phrase, via the positions-enabled
    index + distributed phrase matcher."""
    idx = ensure_ft_pos_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "phrase", "terms": FT_PHRASE}],
        k=10**9,
        method="exhaustive",
    )
    return pd.DataFrame({"n_docs": [len(res)]}).astype(np.int64)


def sql_ft_phrase_count() -> str:
    phrase = " ".join(FT_PHRASE)
    return f"""
SELECT count(*) AS n_docs FROM documents
WHERE ' ' || text || ' ' LIKE '% {phrase} %'
"""


FT_DISMAX_TIE = 0.25  # exactly representable → float64 SQL parity holds
FT_MP_SLOT0 = "query"
FT_MP_VARIANTS = ["filter", "join"]


def q_ft_dismax_topk(sf_dir: str) -> pd.DataFrame:
    """DisjunctionMaxQuery top-10 (reference: lucene/core/.../search/
    DisjunctionMaxQuery.java + DisjunctionMaxScorer, branch_8x; SURVEY.md
    §2.3): three heterogeneous clauses (disjunction, single term,
    conjunction); per doc score = max(clause scores) + tie_breaker *
    (sum - max) over the clauses that match."""
    idx = ensure_ft_index(sf_dir)
    res = search(
        idx,
        [{
            "query_id": 0, "kind": "dis_max", "tie_breaker": FT_DISMAX_TIE,
            "clauses": [
                {"kind": "or", "terms": ["query", "fast"]},
                {"kind": "term", "terms": ["join"]},
                {"kind": "and", "terms": ["data", "window"]},
            ],
        }],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_dismax_topk() -> str:
    all_terms = ",".join(
        f"'{t}'" for t in ("query", "fast", "join", "data", "window"))
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({all_terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
ts AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
         - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         AS s
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
),
c1 AS (SELECT doc_id, sum(s) AS sc FROM ts
       WHERE term IN ('query','fast') GROUP BY doc_id),
c2 AS (SELECT doc_id, sum(s) AS sc FROM ts WHERE term = 'join' GROUP BY doc_id),
c3 AS (SELECT doc_id, sum(s) AS sc FROM ts
       WHERE term IN ('data','window') GROUP BY doc_id HAVING count(*) = 2),
allc AS (
  SELECT doc_id, sc FROM c1
  UNION ALL SELECT doc_id, sc FROM c2
  UNION ALL SELECT doc_id, sc FROM c3
),
dmx AS (
  SELECT doc_id, max(sc) + {FT_DISMAX_TIE} * (sum(sc) - max(sc)) AS score
  FROM allc GROUP BY doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM dmx
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_multiphrase_topk(sf_dir: str) -> pd.DataFrame:
    """MultiPhraseQuery top-10 (reference: lucene/core/.../search/
    MultiPhraseQuery.java + UnionPostingsEnum, branch_8x; SURVEY.md
    §2.3): slot 0 is a single term, slot 1 matches ANY of its variants
    (union-of-positions); phrase freq = count of distinct match start
    positions, weight = Σ idf over every variant, BM25 lossy-norm tf
    saturation — through the positions-enabled distributed index."""
    idx = ensure_ft_pos_index(sf_dir)
    res = search(
        idx,
        [{"query_id": 0, "kind": "multi_phrase",
          "positions": [[FT_MP_SLOT0], list(FT_MP_VARIANTS)]}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ft_multiphrase_topk() -> str:
    variants = ",".join(f"'{v}'" for v in FT_MP_VARIANTS)
    wterms = ",".join(f"'{t}'" for t in [FT_MP_SLOT0] + list(FT_MP_VARIANTS))
    return (
        _ft_sql_common()
        + f"""
, docs_l AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
postoks AS (
  SELECT doc_id, i AS pos, l[i] AS term
  FROM docs_l, UNNEST(range(1, len(l) + 1)) AS t(i)
),
mfreq AS (
  SELECT a.doc_id, count(DISTINCT a.pos) AS freq
  FROM postoks a
  JOIN postoks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{FT_MP_SLOT0}' AND b.term IN ({variants})
  GROUP BY a.doc_id
),
vdf AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ({wterms}) GROUP BY term
),
w AS (
  SELECT sum(ln(1 + (stats.n - vdf.df + 0.5) / (vdf.df + 0.5))) AS w
  FROM vdf CROSS JOIN stats
),
scored AS (
  SELECT mfreq.doc_id,
         w.w - w.w / (1 + mfreq.freq
           / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         AS score
  FROM mfreq
  JOIN norml ON norml.doc_id = mfreq.doc_id
  CROSS JOIN stats CROSS JOIN w
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


def q_ft_term_range_counts(sf_dir: str) -> pd.DataFrame:
    """TermRangeQuery (reference: lucene/core/.../search/TermRangeQuery
    .java, branch_8x; SURVEY.md §2.3 automaton∩dictionary family):
    lexicographic vocab ranges with inclusive/exclusive/open bounds,
    CONSTANT_SCORE_REWRITE — parsed from classic ``[a TO b]`` / ``{a TO
    b}`` syntax to prove the grammar path too."""
    from ..search.queryparser import parse_query

    idx = ensure_ft_index(sf_dir)
    specs = [
        ("incl_d_f", "[data TO fast]"),
        ("excl_d_f", "{data TO fast}"),
        ("open_hi_w", "[window TO *]"),
    ]
    res = search(
        idx,
        [{"query_id": i, **parse_query(s)} for i, (_, s) in enumerate(specs)],
        k=10**9,
        method="exhaustive",
    )
    rows = [
        {"range": label, "n_docs": int((res["query_id"] == i).sum())}
        for i, (label, _) in enumerate(specs)
    ]
    return pd.DataFrame(rows).astype({"n_docs": np.int64}).sort_values(
        "range"
    ).reset_index(drop=True)


def sql_ft_term_range_counts() -> str:
    return """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT * FROM (
  SELECT 'incl_d_f' AS range,
         count(DISTINCT doc_id) AS n_docs
  FROM tok WHERE term >= 'data' AND term <= 'fast'
  UNION ALL
  SELECT 'excl_d_f', count(DISTINCT doc_id)
  FROM tok WHERE term > 'data' AND term < 'fast'
  UNION ALL
  SELECT 'open_hi_w', count(DISTINCT doc_id)
  FROM tok WHERE term >= 'window'
) ORDER BY range
"""


def q_ft_span_counts(sf_dir: str) -> pd.DataFrame:
    """Span-query cardinalities (reference: lucene/core/src/java/org/
    apache/lucene/search/spans/SpanNearQuery.java + SpanFirstQuery.java,
    branch_8x; SURVEY.md §2.3): in-order proximity, unordered proximity
    (pair — minimal-window ≡ EXISTS-within-distance for k=2), and
    position-bounded SpanFirst, via the positions-enabled index."""
    idx = ensure_ft_pos_index(sf_dir)
    specs = [
        ("first_join_5", {"kind": "span_first", "terms": ["join"], "end": 5}),
        ("ordered_query_data_s4",
         {"kind": "span_near", "terms": ["query", "data"], "slop": 4,
          "in_order": True}),
        ("unordered_fast_slow_s3",
         {"kind": "span_near", "terms": ["fast", "slow"], "slop": 3,
          "in_order": False}),
    ]
    rows = []
    res = search(
        idx,
        [{"query_id": i, **node} for i, (_, node) in enumerate(specs)],
        k=10**9,
        method="exhaustive",
    )
    for i, (label, _) in enumerate(specs):
        rows.append({"span": label, "n_docs": int((res["query_id"] == i).sum())})
    return pd.DataFrame(rows).astype({"n_docs": np.int64}).sort_values(
        "span"
    ).reset_index(drop=True)


def sql_ft_span_counts() -> str:
    # generate_subscripts is 1-based: engine pos0 < 5  ⟺  pos1 <= 5;
    # width conditions (pN - p1 - 1 <= slop) are base-invariant
    return """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT * FROM (
  SELECT 'first_join_5' AS span,
         count(DISTINCT doc_id) AS n_docs
  FROM tok WHERE term = 'join' AND pos <= 5
  UNION ALL
  SELECT 'ordered_query_data_s4',
         count(DISTINCT a.doc_id)
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
  WHERE a.term = 'query' AND b.term = 'data'
    AND b.pos > a.pos AND b.pos - a.pos - 1 <= 4
  UNION ALL
  SELECT 'unordered_fast_slow_s3',
         count(DISTINCT a.doc_id)
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
  WHERE a.term = 'fast' AND b.term = 'slow'
    AND abs(b.pos - a.pos) - 1 <= 3
) ORDER BY span
"""


def q_ft_span_or_counts(sf_dir: str) -> pd.DataFrame:
    """SpanNear over SpanOr clauses (reference: lucene/core/.../search/
    spans/SpanOrQuery.java, branch_8x; SURVEY.md §2.3): slot alternatives
    match at the UNION of their variants' positions. Doc-level existence
    for a 2-slot ordered span ≡ EXISTS an ordered cross-variant pair
    within slop (greedy-minimal argument, same as the plain ordered
    contract), so the oracle is a positional self-join with IN lists."""
    idx = ensure_ft_pos_index(sf_dir)
    specs = [
        ("or_ordered_s4",
         {"kind": "span_near", "slots": [["query", "scan"], ["data", "join"]],
          "slop": 4, "in_order": True}),
        ("or_first_3",
         {"kind": "span_first", "slots": [["query", "join"]], "end": 3}),
    ]
    res = search(
        idx,
        [{"query_id": i, **node} for i, (_, node) in enumerate(specs)],
        k=10**9,
        method="exhaustive",
    )
    rows = [
        {"span": label, "n_docs": int((res["query_id"] == i).sum())}
        for i, (label, _) in enumerate(specs)
    ]
    return pd.DataFrame(rows).astype({"n_docs": np.int64}).sort_values(
        "span").reset_index(drop=True)


def sql_ft_span_or_counts() -> str:
    return """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT * FROM (
  SELECT 'or_ordered_s4' AS span,
         count(DISTINCT a.doc_id) AS n_docs
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id
  WHERE a.term IN ('query', 'scan') AND b.term IN ('data', 'join')
    AND b.pos > a.pos AND b.pos - a.pos - 1 <= 4
  UNION ALL
  SELECT 'or_first_3',
         count(DISTINCT doc_id)
  FROM tok WHERE term IN ('query', 'join') AND pos <= 3
) ORDER BY span
"""


def q_ft_span_not_counts(sf_dir: str) -> pd.DataFrame:
    """SpanNotQuery cardinalities (reference: lucene/core/src/java/org/
    apache/lucene/search/spans/SpanNotQuery.java, branch_8x; SURVEY.md
    §2.3): include spans that do NOT overlap an exclude-term occurrence,
    the overlap window widened ``pre`` before the span start / ``post``
    after its INCLUSIVE end. Includes: plain term (single-width spans)
    and ordered span_near (greedy-minimal chains — so the SQL oracle's
    min-next-position formulation is exact, same as ft_span_counts)."""
    idx = ensure_ft_pos_index(sf_dir)
    specs = [
        ("not_q_data_w1",
         {"kind": "span_not", "include": {"kind": "term", "terms": ["query"]},
          "exclude_terms": ["data"], "pre": 1, "post": 1}),
        ("not_fast_slow_p2",
         {"kind": "span_not", "include": {"kind": "term", "terms": ["fast"]},
          "exclude_terms": ["slow"], "pre": 0, "post": 2}),
        ("not_near_scan",
         {"kind": "span_not",
          "include": {"kind": "span_near", "terms": ["query", "data"],
                      "slop": 2, "in_order": True},
          "exclude_terms": ["scan"], "pre": 0, "post": 0}),
    ]
    res = search(
        idx,
        [{"query_id": i, **node} for i, (_, node) in enumerate(specs)],
        k=10**9,
        method="exhaustive",
    )
    rows = [
        {"span": label, "n_docs": int((res["query_id"] == i).sum())}
        for i, (label, _) in enumerate(specs)
    ]
    return pd.DataFrame(rows).astype({"n_docs": np.int64}).sort_values(
        "span").reset_index(drop=True)


def sql_ft_span_not_counts() -> str:
    # positions are 1-based here vs 0-based in the engine; every condition
    # is a RELATIVE window (BETWEEN pos±k), so the base cancels. Ordered
    # include spans = (query pos, MINIMAL next data pos) — the engine's
    # greedy-minimal chain, exactly as in sql_ft_span_counts.
    return """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT * FROM (
  SELECT 'not_q_data_w1' AS span, count(DISTINCT a.doc_id) AS n_docs
  FROM tok a
  WHERE a.term = 'query' AND NOT EXISTS (
    SELECT 1 FROM tok c WHERE c.doc_id = a.doc_id AND c.term = 'data'
      AND c.pos BETWEEN a.pos - 1 AND a.pos + 1)
  UNION ALL
  SELECT 'not_fast_slow_p2', count(DISTINCT a.doc_id)
  FROM tok a
  WHERE a.term = 'fast' AND NOT EXISTS (
    SELECT 1 FROM tok c WHERE c.doc_id = a.doc_id AND c.term = 'slow'
      AND c.pos BETWEEN a.pos AND a.pos + 2)
  UNION ALL
  SELECT 'not_near_scan', count(DISTINCT doc_id) FROM (
    SELECT a.doc_id, a.pos AS s,
           (SELECT min(b.pos) FROM tok b
            WHERE b.doc_id = a.doc_id AND b.term = 'data'
              AND b.pos > a.pos) AS e
    FROM tok a WHERE a.term = 'query'
  ) t
  WHERE e IS NOT NULL AND e - s - 1 <= 2
    AND NOT EXISTS (
      SELECT 1 FROM tok c WHERE c.doc_id = t.doc_id AND c.term = 'scan'
        AND c.pos BETWEEN t.s AND t.e)
) ORDER BY span
"""


FT_SHINGLE = "query join"


def ensure_ft_shingle_index(sf_dir: str) -> str:
    """Word-bigram (ShingleFilter analog) index over documents — shingling
    runs at tokenize time inside the analyzer actors (SURVEY.md §2.2;
    reference lucene/analysis/common/.../shingle/ShingleFilter.java,
    branch_8x); cached separately from the unigram ft index."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:shingle2"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass
    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=_docs_as_pages(sf_dir),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "filters": [
                "lowercase",
                {"name": "shingle", "min_shingle": 2, "max_shingle": 2},
            ],
        },
    )
    return index_root


def q_ft_shingle_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of the word-bigram shingle term plus corpus
    sum_dl. Shingles overlay unigrams at posIncr 0 (discountOverlaps), so
    sum_dl must equal the plain unigram token count — the oracle checks
    all three in one row."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_shingle_index(sf_dir)
    root = read_root_manifest(idx)
    stats = read_query_term_stats(idx, [FT_SHINGLE])
    df_, tf_ = stats.get(FT_SHINGLE, (0, 0))
    return pd.DataFrame(
        {"df": [df_], "total_tf": [tf_], "sum_dl": [root["sum_dl"]]}
    ).astype(np.int64)


def sql_ft_shingle_stats() -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
idx AS (SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM t),
sh AS (SELECT doc_id, a[i] || ' ' || a[i+1] AS term FROM idx),
m AS (SELECT count(DISTINCT doc_id) AS df, count(*) AS total_tf FROM sh
      WHERE term = '{FT_SHINGLE}'),
s AS (SELECT CAST(sum(len(a)) AS BIGINT) AS sum_dl FROM t)
SELECT m.df, m.total_tf, s.sum_dl FROM m, s
"""


FT_COMMONGRAM = "the_query"


def ensure_ft_commongrams_index(sf_dir: str) -> str:
    """documents index through the CommonGramsFilter analog (SURVEY.md
    §2.2; reference lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java, branch_8x): stopword-anchored bigrams overlay
    the unigrams at posIncr 0; cached separately from the unigram index."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:commongrams1"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass
    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=_docs_as_pages(sf_dir),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "filters": [
                "lowercase",
                {"name": "common_grams", "words": ["the", "a"]},
            ],
        },
    )
    return index_root


def q_ft_commongrams_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of one stopword-anchored common gram plus
    corpus sum_dl. Grams overlay unigrams at posIncr 0 (discountOverlaps),
    so sum_dl must equal the plain unigram token count."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_commongrams_index(sf_dir)
    root = read_root_manifest(idx)
    stats = read_query_term_stats(idx, [FT_COMMONGRAM])
    df_, tf_ = stats.get(FT_COMMONGRAM, (0, 0))
    return pd.DataFrame(
        {"df": [df_], "total_tf": [tf_], "sum_dl": [root["sum_dl"]]}
    ).astype(np.int64)


def sql_ft_commongrams_stats() -> str:
    return """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
idx AS (SELECT doc_id, a, unnest(range(1, len(a))) AS i FROM t),
cgr AS (SELECT doc_id, a[i] || '_' || a[i+1] AS term FROM idx
        WHERE a[i] IN ('the', 'a') OR a[i+1] IN ('the', 'a')),
m AS (SELECT count(DISTINCT doc_id) AS df, count(*) AS total_tf FROM cgr
      WHERE term = 'the_query'),
s AS (SELECT CAST(sum(len(a)) AS BIGINT) AS sum_dl FROM t)
SELECT m.df, m.total_tf, s.sum_dl FROM m, s
"""


# planted German surface forms and their Snowball-german stems (stem
# VALUES pinned by tests/test_analyzer_filters.py German goldens; the
# zz prefix keeps them disjoint from the natural corpus vocabulary)
GERMAN_PLANT = [
    ("zzHäuser", "zzhaus"),
    ("zzKatzen", "zzkatz"),
    ("zzLaufen", "zzlauf"),
    ("zzSchönheit", "zzschonheit"),
    ("zzMädchen", "zzmadch"),
]


def ensure_ft_german_index(sf_dir: str) -> str:
    """documents index through the ICU-lite language pack: lowercase →
    snowball german stemmer → icu folding (SURVEY.md §2.2 language packs;
    round-3 verdict task 10). Each doc gets ONE planted German token
    appended (by doc_id % 5) so the chain has non-ASCII work to do;
    cached separately from the unigram ft index."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:german1"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass

    base = _docs_as_pages(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        # urls are "doc://<doc_id>" in the pages mapping; recover the id
        ids = np.asarray(
            [int(u.rsplit("/", 1)[-1]) for u in batch["url"].to_pylist()],
            dtype=np.int64,
        )
        toks = [GERMAN_PLANT[int(i) % 5][0] for i in ids]
        text = pc.binary_join_element_wise(
            batch["text"], pa.array(toks, type=pa.string()), " "
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )

    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=base.map_batches(plant, batch_format="pyarrow"),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "filters": [
                "lowercase",
                {"name": "snowball_stem", "language": "german"},
                "icu_folding",
            ],
        },
    )
    return index_root


def q_ft_german_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of each planted German stem in the folded+
    stemmed index. The stem constants are pinned by the Snowball-german
    golden tests; the oracle recomputes the plant counts from doc_id —
    matching proves the language-pack chain (stemmer + ICU folding) ran
    over every document at build time."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_german_index(sf_dir)
    stems = [s for _, s in GERMAN_PLANT]
    stats = read_query_term_stats(idx, stems)
    rows = [
        {"stem": s, "df": stats.get(s, (0, 0))[0],
         "total_tf": stats.get(s, (0, 0))[1]}
        for s in stems
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def sql_ft_german_stem_stats() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{stem}'" for i, (_, stem) in enumerate(GERMAN_PLANT)
    )
    return f"""
SELECT CASE doc_id % 5 {cases} END AS stem,
       count(*) AS df, count(*) AS total_tf
FROM documents GROUP BY 1
"""


# (surface, metaphone code) plants — codes pinned by the metaphone goldens
# in tests/test_analyzer_filters.py. Unlike the stem contracts, the plant
# vocabulary REPLACES the document text: 4-char phonetic codes collide with
# the natural vocabulary by design (that is their purpose), so an appended
# plant's df would absorb corpus words sharing its code and the SQL oracle
# could not reproduce it.
# No zz prefix here (it would defeat the initial-pair rules: zzKnight
# codes SKNT, not NT) — safe because the plant vocabulary is exclusive.
METAPHONE_PLANT = [
    ("Knight", "NT"),
    ("School", "SKL"),
    ("Xylophone", "SLFN"),
    ("Thomas", "0MS"),
    ("Watches", "WXS"),
]


def ensure_ft_metaphone_index(sf_dir: str) -> str:
    """documents index through the phonetic pack (lowercase → metaphone,
    PhoneticFilter encoder=Metaphone analog): each doc's text becomes its
    planted surface word repeated (doc_id % 3 + 1) times, so df AND
    total_tf are oracle-derivable per plant."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:metaphone1"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass

    base = _docs_as_pages(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            [int(u.rsplit("/", 1)[-1]) for u in batch["url"].to_pylist()],
            dtype=np.int64,
        )
        text = pa.array(
            [
                " ".join([METAPHONE_PLANT[int(i) % 5][0]] * (int(i) % 3 + 1))
                for i in ids
            ],
            type=pa.string(),
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )

    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=base.map_batches(plant, batch_format="pyarrow"),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "filters": [
                "lowercase",
                {"name": "phonetic", "encoder": "metaphone"},
            ],
        },
    )
    return index_root


def q_ft_metaphone_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of each planted Metaphone code. The codes
    are pinned by the phonetic goldens; matching df AND tf (tf varies by
    doc_id % 3 + 1) proves the encoder ran over every token at build
    time (reference: lucene/analysis/phonetic PhoneticFilter, branch_8x,
    encoder=Metaphone)."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_metaphone_index(sf_dir)
    codes = [c for _, c in METAPHONE_PLANT]
    stats = read_query_term_stats(idx, codes)
    rows = [
        {"code": c, "df": stats.get(c, (0, 0))[0],
         "total_tf": stats.get(c, (0, 0))[1]}
        for c in codes
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def sql_ft_metaphone_stats() -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{code}'" for i, (_, code) in enumerate(METAPHONE_PLANT)
    )
    return f"""
SELECT CASE doc_id % 5 {cases} END AS code,
       count(*) AS df, sum(doc_id % 3 + 1) AS total_tf
FROM documents GROUP BY 1
"""


# (surface, stem) plants for the French / Spanish Snowball packs (round-5
# verdict task 6); stems pinned by tests/test_analyzer_filters.py goldens
FRENCH_PLANT = [
    ("zzAdoration", "zzador"),
    ("zzChevaux", "zzcheval"),
    ("zzContinuelle", "zzcontinuel"),
    ("zzFinissait", "zzfin"),
    ("zzSimplement", "zzsimpl"),
]
SPANISH_PLANT = [
    ("zzCanciones", "zzcancion"),
    ("zzTorturadora", "zztortur"),
    ("zzAtrevida", "zzatrev"),
    ("zzNacionalidad", "zznacional"),
    ("zzTrabajando", "zztrabaj"),
]
# post-icu_folding stems (all ASCII already); region offsets re-traced
# with the zz prefix — see tests/test_analyzer_filters.py
PORTUGUESE_PLANT = [
    ("zzComunicação", "zzcomunic"),
    ("zzFelizmente", "zzfeliz"),
    ("zzBandeira", "zzbandeir"),
    ("zzPensamento", "zzpensament"),
    ("zzAprendizado", "zzaprendiz"),
]
ITALIAN_PLANT = [
    ("zzOrganizzazione", "zzorganizz"),
    ("zzRapidamente", "zzrapid"),
    ("zzFelicità", "zzfelic"),
    ("zzGuardando", "zzguard"),
    ("zzDifferenza", "zzdifferent"),
]
# Cyrillic plants; stems chosen icu_fold-stable (no й/ё survives the stem)
RUSSIAN_PLANT = [
    ("zzКнигами", "zzкниг"),
    ("zzЧитавшие", "zzчита"),
    ("zzАктивность", "zzактивн"),
    ("zzНовейший", "zzнов"),
    ("zzСтранный", "zzстран"),
]
DUTCH_PLANT = [
    ("zzOpleiding", "zzopleid"),
    ("zzGemakkelijk", "zzgemak"),
    ("zzKatten", "zzkat"),
    ("zzOpenbare", "zzopen"),
    ("zzBoot", "zzbot"),
]
NORWEGIAN_PLANT = [
    ("zzBilene", "zzbil"),
    ("zzHuset", "zzhus"),
    ("zzVakkert", "zzvakker"),
    ("zzHemmelig", "zzhemm"),
    ("zzSendt", "zzsend"),
]
DANISH_PLANT = [
    ("zzBilerne", "zzbil"),
    ("zzVenligst", "zzven"),
    ("zzKattens", "zzkat"),
    ("zzTrygt", "zztryg"),
    ("zzDagens", "zzdag"),
]


def _ensure_ft_lang_index(
    sf_dir: str, language: str, plants, cache_tag: str, filters=None
) -> str:
    """documents index through a Snowball language pack (lowercase →
    snowball ``language`` → icu folding; ``filters`` overrides the chain),
    with one planted token per doc (by doc_id % len(plants)) so the pack
    has real work on every doc; cached per language (same shape as
    ensure_ft_german_index)."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:{cache_tag}"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass

    base = _docs_as_pages(sf_dir)
    m = len(plants)

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            [int(u.rsplit("/", 1)[-1]) for u in batch["url"].to_pylist()],
            dtype=np.int64,
        )
        toks = [plants[int(i) % m][0] for i in ids]
        text = pc.binary_join_element_wise(
            batch["text"], pa.array(toks, type=pa.string()), " "
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )

    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=base.map_batches(plant, batch_format="pyarrow"),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "filters": filters if filters is not None else [
                "lowercase",
                {"name": "snowball_stem", "language": language},
                "icu_folding",
            ],
        },
    )
    return index_root


def _q_lang_stem_stats(
    sf_dir: str, language: str, plants, cache_tag: str, filters=None
) -> pd.DataFrame:
    """Global (df, total_tf) of each planted stem — proves the language
    pack ran over every document at build time (same contract shape as
    ft_german_stem_stats)."""
    from ..index.stats import read_query_term_stats

    idx = _ensure_ft_lang_index(sf_dir, language, plants, cache_tag, filters)
    stems = [s for _, s in plants]
    stats = read_query_term_stats(idx, stems)
    rows = [
        {"stem": s, "df": stats.get(s, (0, 0))[0],
         "total_tf": stats.get(s, (0, 0))[1]}
        for s in stems
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def q_ft_french_stem_stats(sf_dir: str) -> pd.DataFrame:
    """French Snowball pack (analysis/french.py; reference: lucene/analysis/
    common/.../snowball/SnowballPorterFilterFactory.java language=French +
    org/tartarus/snowball/ext/FrenchStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "french", FRENCH_PLANT, "french1")


def q_ft_spanish_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Spanish Snowball pack (analysis/spanish.py; reference: .../ext/
    SpanishStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "spanish", SPANISH_PLANT, "spanish1")


def q_ft_portuguese_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Portuguese Snowball pack (analysis/portuguese.py; reference: .../ext/
    PortugueseStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(
        sf_dir, "portuguese", PORTUGUESE_PLANT, "portuguese1"
    )


def q_ft_italian_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Italian Snowball pack (analysis/italian.py; reference: .../ext/
    ItalianStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "italian", ITALIAN_PLANT, "italian1")


def q_ft_russian_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Russian Snowball pack (analysis/russian.py; reference: .../ext/
    RussianStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "russian", RUSSIAN_PLANT, "russian1")


def q_ft_dutch_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Dutch Snowball pack (analysis/dutch.py; reference: .../ext/
    DutchStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "dutch", DUTCH_PLANT, "dutch1")


def q_ft_norwegian_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Norwegian Snowball pack (analysis/norwegian.py; reference: .../ext/
    NorwegianStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(
        sf_dir, "norwegian", NORWEGIAN_PLANT, "norwegian1"
    )


def q_ft_danish_stem_stats(sf_dir: str) -> pd.DataFrame:
    """Danish Snowball pack (analysis/norwegian.py#danish_stem; reference:
    .../ext/DanishStemmer.java, branch_8x)."""
    return _q_lang_stem_stats(sf_dir, "danish", DANISH_PLANT, "danish1")


# CJK plants: (surface appended per doc_id % 5, expected bigram terms) —
# han run, katakana run, hangul run, a two-char han pair, a lone char
# (the CJKBigramFilter loneState unigram). Expected terms pinned by
# tests/test_cjk.py goldens.
CJK_PLANT = [
    ("日本語", ("日本", "本語")),
    ("テスト", ("テス", "スト")),
    ("한국어", ("한국", "국어")),
    ("水火", ("水火",)),
    ("茶", ("茶",)),
]


def q_ft_cjk_bigram_stats(sf_dir: str) -> pd.DataFrame:
    """CJK bigram pack (analysis/cjk.py; reference: lucene/analysis/
    common/.../cjk/CJKBigramFilter.java + CJKAnalyzer.java, branch_8x —
    SURVEY.md §2.2): documents indexed through lowercase + cjk_bigram;
    global (df, total_tf) of every planted bigram/lone-unigram term.
    Matching the per-residue doc counts proves the sequence filter ran
    vectorized over every document at build time."""
    from ..index.stats import read_query_term_stats

    idx = _ensure_ft_lang_index(
        sf_dir, "english", CJK_PLANT, "cjk1",
        filters=["lowercase", "cjk_bigram"],
    )
    terms = [t for _, ts in CJK_PLANT for t in ts]
    stats = read_query_term_stats(idx, terms)
    rows = [
        {"term": t, "df": stats.get(t, (0, 0))[0],
         "total_tf": stats.get(t, (0, 0))[1]}
        for t in terms
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def sql_ft_cjk_bigram_stats() -> str:
    vals = ",".join(
        f"({k}, '{t}')" for k, (_, ts) in enumerate(CJK_PLANT) for t in ts
    )
    return f"""
WITH c AS (SELECT doc_id % 5 AS k, count(*) AS n FROM documents GROUP BY 1),
m(k, term) AS (VALUES {vals})
SELECT m.term AS term, c.n AS df, c.n AS total_tf
FROM m JOIN c ON m.k = c.k
"""


# outputUnigrams=true plants: every unigram AND overlaid bigram of each
# run must be indexed (order/dl semantics pinned by tests/test_cjk.py)
CJK_UNI_PLANT = [
    ("日本語", ("日", "日本", "本", "本語", "語")),
    ("テスト", ("テ", "テス", "ス", "スト", "ト")),
    ("한국어", ("한", "한국", "국", "국어", "어")),
    ("水火", ("水", "水火", "火")),
    ("茶", ("茶",)),
]


def q_ft_cjk_unigram_stats(sf_dir: str) -> pd.DataFrame:
    """CJKBigramFilter outputUnigrams=true (reference: lucene/analysis/
    common/.../cjk/CJKBigramFilterFactory.java `outputUnigrams` arg,
    branch_8x): unigrams are primary, bigrams overlay at posInc 0 —
    BOTH must be searchable. Global (df, total_tf) of every planted
    unigram and bigram through a real build."""
    from ..index.stats import read_query_term_stats

    idx = _ensure_ft_lang_index(
        sf_dir, "english", CJK_UNI_PLANT, "cjkuni1",
        filters=["lowercase",
                 {"name": "cjk_bigram", "output_unigrams": True}],
    )
    terms = [t for _, ts in CJK_UNI_PLANT for t in ts]
    stats = read_query_term_stats(idx, terms)
    rows = [
        {"term": t, "df": stats.get(t, (0, 0))[0],
         "total_tf": stats.get(t, (0, 0))[1]}
        for t in terms
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def sql_ft_cjk_unigram_stats() -> str:
    vals = ",".join(
        f"({k}, '{t}')" for k, (_, ts) in enumerate(CJK_UNI_PLANT) for t in ts
    )
    return f"""
WITH c AS (SELECT doc_id % 5 AS k, count(*) AS n FROM documents GROUP BY 1),
m(k, term) AS (VALUES {vals})
SELECT m.term AS term, c.n AS df, c.n AS total_tf
FROM m JOIN c ON m.k = c.k
"""


def q_ft_cjk_bigram_topk(sf_dir: str) -> pd.DataFrame:
    """Full-depth BM25 search through the CJK bigram index: the query
    terms are WORDS (日本語, テスト) analyzed into bigram conjunctions at
    search time (pipelines/query.py#cjk_rewrite — the QueryBuilder-
    through-CJKAnalyzer shape), scored by distributed BM25 over the
    bigram vocabulary with plant-shifted doc lengths. Floored-e6 re-rank
    per the ranked-float contract convention."""
    idx = _ensure_ft_lang_index(
        sf_dir, "english", CJK_PLANT, "cjk1",
        filters=["lowercase", "cjk_bigram"],
    )
    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": ["日本語", "テスト"]}],
        k=20,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    df = pd.DataFrame(
        {
            "doc_id": _url_to_doc_id(res["url"]),
            "score_e6": np.floor(res["score"].to_numpy() * 1e6).astype(np.int64),
        }
    )
    df = (
        df.sort_values(["score_e6", "doc_id"], ascending=[False, True])
        .head(15)
        .reset_index(drop=True)
    )
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return df


def sql_ft_cjk_bigram_topk() -> str:
    lt_values = ",".join(f"({int(v)})" for v in np.unique(LENGTH_TABLE))
    emits = {k: len(ts) for k, (_, ts) in enumerate(CJK_PLANT)}
    emit_case = " ".join(f"WHEN {k} THEN {n}" for k, n in emits.items())
    idf = "ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
    return f"""
WITH dlb AS (
  SELECT doc_id, doc_id % 5 AS k,
         len(string_split(text, ' ')) AS bdl
  FROM documents
),
dl AS (
  SELECT doc_id, k, bdl + CASE k {emit_case} END AS dl FROM dlb
),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sdl FROM dl),
lt(v) AS (VALUES {lt_values}),
norml AS (
  SELECT dl.doc_id, dl.k, (SELECT max(v) FROM lt WHERE v <= dl.dl) AS nl
  FROM dl
),
dfs AS (SELECT k, count(*) AS df FROM dl WHERE k IN (0, 1) GROUP BY k),
scored AS (
  SELECT norml.doc_id,
         2 * ({idf}
              - {idf}
                / (1 + 1.0 / (1.2 * (1 - 0.75 + 0.75 * norml.nl
                                     / (stats.sdl / stats.n))))) AS score
  FROM norml
  JOIN dfs ON dfs.k = norml.k
  CROSS JOIN stats
)
SELECT row_number() OVER (ORDER BY score_e6 DESC, doc_id ASC) AS rank,
       doc_id, score_e6
FROM (SELECT doc_id, CAST(floor(score * 1000000) AS BIGINT) AS score_e6
      FROM scored)
ORDER BY score_e6 DESC, doc_id ASC
LIMIT 15
"""


# multi-script plants exercising the vectorized Unicode tokenize path
# (fast_tokenizer.tokenize_utf8_buffer): Cyrillic letters, a Han pair
# (single-codepoint tokens — querying 日 proves the split), a Katakana
# run, Latin-1 accents, and the Arabic decimal-separator MidNum join.
# Expected tokens pinned by tests/test_tokenizer.py goldens.
UNICODE_PLANT = [
    ("зЦензура", "зцензура"),
    ("日本", "日"),
    ("カタカナ", "カタカナ"),
    ("Ünïfied", "ünïfied"),
    ("٣٫٤", "٣٫٤"),
]


def q_ft_unicode_token_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of multi-script planted tokens indexed through
    the plain lowercase analyzer — every planted doc takes the vectorized
    Unicode tokenize path (analysis/fast_tokenizer.py#tokenize_utf8_buffer;
    reference semantics: lucene/core/.../analysis/standard/
    StandardTokenizer.java UAX#29 grammar, branch_8x). Matching the
    doc_id-derived oracle proves CJK single/run rules, Cyrillic runs and
    the MidNum digit join survive the whole build pipeline."""
    return _q_lang_stem_stats(
        sf_dir, "unicode", UNICODE_PLANT, "unicode1", filters=["lowercase"]
    )


def _sql_lang_stem_stats(plants) -> str:
    cases = " ".join(
        f"WHEN {i} THEN '{stem}'" for i, (_, stem) in enumerate(plants)
    )
    return f"""
SELECT CASE doc_id % {len(plants)} {cases} END AS stem,
       count(*) AS df, count(*) AS total_tf
FROM documents GROUP BY 1
"""


MLT_SRC_DOC = 7
MLT_MAX_TERMS = 10
MLT_MIN_DF = 2


def q_knn_mlt_docs(sf_dir: str) -> pd.DataFrame:
    """MoreLikeThis / term-based knn() stream (reference: solr/solrj/.../io/
    stream/KnnStream.java + lucene/queries/.../mlt/MoreLikeThis.java,
    branch_8x; SURVEY.md §2.8): re-analyze the source doc, rank its terms
    by tf·idf (idf = BM25 idf, min docFreq 2), take the top
    ``MLT_MAX_TERMS`` (tie → term asc), then BM25-OR search those terms
    over the whole index, excluding the source doc — top-10 similar docs.
    Term selection runs on global stats (point parquet lookups, no scan);
    the search is the ordinary distributed top-k."""
    from ..analysis.tokenizer import tokenize_lower
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_index(sf_dir)
    root = read_root_manifest(idx)
    n = float(root["num_docs"])

    import pyarrow.dataset as pads

    dset = pads.dataset(_docs_path(sf_dir))
    src = dset.to_table(filter=pc.field("doc_id") == MLT_SRC_DOC, columns=["text"])
    toks = tokenize_lower(src["text"][0].as_py())
    tf: Dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    stats = read_query_term_stats(idx, sorted(tf))
    scored = []
    for t, f in tf.items():
        df_ = stats.get(t, (0, 0))[0]
        if df_ < MLT_MIN_DF:
            continue
        idf = np.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))
        scored.append((-f * idf, t))
    terms = [t for _, t in sorted(scored)[:MLT_MAX_TERMS]]

    res = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": terms}],
        k=MLT_MAX_TERMS + 1,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    ids = _url_to_doc_id(res["url"])
    keep = ids != MLT_SRC_DOC
    out = pd.DataFrame(
        {
            "doc_id": ids[keep][:10],
            "score_e6": np.floor(res["score"].to_numpy()[keep][:10] * 1e6).astype(
                np.int64
            ),
        }
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


def sql_knn_mlt_docs() -> str:
    return (
        _ft_sql_common()
        + f"""
, src AS (
  SELECT term, count(*) AS tf FROM toks WHERE doc_id = {MLT_SRC_DOC} GROUP BY term
),
dfs_all AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
sel AS (
  SELECT src.term
  FROM src JOIN dfs_all USING (term) CROSS JOIN stats
  WHERE dfs_all.df >= {MLT_MIN_DF}
  ORDER BY src.tf * ln(1 + (stats.n - dfs_all.df + 0.5) / (dfs_all.df + 0.5)) DESC,
           src.term ASC
  LIMIT {MLT_MAX_TERMS}
),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN (SELECT term FROM sel) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE tf.doc_id <> {MLT_SRC_DOC}
  GROUP BY tf.doc_id
)
SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score * 1000000) AS BIGINT) AS score_e6
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 10
"""
    )


FT_PREFIX = "qu"


def q_ft_prefix_count(sf_dir: str) -> pd.DataFrame:
    """PrefixQuery cardinality via sorted-term-dictionary range scan per
    segment (SURVEY.md §2.3 PrefixQuery → range-scan over sorted term
    blocks), counted partition-side and summed."""
    idx = ensure_ft_index(sf_dir)
    root = read_root_manifest(idx)
    parts = [
        {"seg_dir": segment_dir(idx, pid)} for pid in range(root["num_partitions"])
    ]

    def count_part(batch: pa.Table) -> pa.Table:
        total = 0
        for seg in batch["seg_dir"].to_pylist():
            r = SegmentReader(seg)
            if r.num_docs == 0:
                continue
            matched = np.zeros(r.num_docs, dtype=bool)
            lo, hi = r.prefix_range(FT_PREFIX)
            for o in range(lo, hi):
                matched[r.postings(o).docids] = True
            total += int(matched.sum())
        return pa.table({"n_docs": pa.array([total], type=pa.int64())})

    ds = ray.data.from_items(parts).map_batches(count_part, batch_format="pyarrow")
    n = int(
        sum(
            b["n_docs"][0].as_py()
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        )
    )
    return pd.DataFrame({"n_docs": [n]}).astype(np.int64)


def sql_ft_prefix_count() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS n_docs FROM toks WHERE term LIKE '{FT_PREFIX}%'
"""


def q_ft_incremental_stats(sf_dir: str) -> pd.DataFrame:
    """Incremental lifecycle (SURVEY.md §2.10 NRT + §3.1 merge): build over
    the first half of documents, append the second half, forceMerge(1) —
    the merged index must hold exactly the full corpus (count + token sum
    checked against SQL over the whole table)."""
    import shutil
    import tempfile

    from ..index.merge import merge_index

    ds = _docs_as_pages(sf_dir)
    half = ds.map_batches(
        lambda t: t.append_column(
            "half", pa.array((_url_to_doc_id(t["url"].to_pylist()) % 2).astype(np.int8))
        ),
        batch_format="pyarrow",
    )
    tmp = tempfile.mkdtemp(prefix="lsr_incr_")
    try:
        a = half.filter(expr="half == 0").drop_columns(["half"])
        b = half.filter(expr="half == 1").drop_columns(["half"])
        idx = os.path.join(tmp, "idx")
        build_index([], idx, num_partitions=FT_PARTITIONS, lang=None,
                    dataset=a, fingerprint="incr-a")
        from ..pipelines.build import append_index

        append_index([], idx, lang=None, dataset=b, fingerprint="incr-b")
        root = merge_index(idx)
        return pd.DataFrame(
            {"n_docs": [root["num_live_docs"]], "sum_dl": [root["sum_dl"]]}
        ).astype(np.int64)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sql_ft_incremental_stats() -> str:
    return """
SELECT count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
FROM documents
"""


# ============================================================= text stats ==
def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens"]
    )
    return out


def sql_token_counts() -> str:
    return """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_doc_fingerprints(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"]
    )


def sql_doc_fingerprints() -> str:
    return "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def q_doc_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(doc_stats_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_unique", "max_freq"]
    )


def sql_doc_stats() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS f FROM toks GROUP BY doc_id, term)
SELECT doc_id,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       count(*) AS n_unique,
       CAST(max(f) AS BIGINT) AS max_freq
FROM tf GROUP BY doc_id
"""


def q_quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "mean_word_len_e6", "stopword_ratio_e6", "alpha_ratio_e6",
         "repetition_ratio_e6"]
    )


def q_ngram_repetition(sf_dir: str):
    """Gopher-style top n-gram repetition (fraction of tokens covered by
    the most frequent word bigram/trigram) — pretraining curation heuristic
    over the documents table, vectorized per batch (textstats.py)."""
    from ..functions.textstats import ngram_repetition_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        ngram_repetition_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "top_bigram_frac_e6", "top_trigram_frac_e6"])


def sql_ngram_repetition() -> str:
    return """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
pos AS (
  SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i FROM toks
),
bi AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g FROM pos WHERE i + 1 <= len(ts)
),
tri AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
  FROM pos WHERE i + 2 <= len(ts)
),
bmax AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
  ) GROUP BY doc_id
),
tmax AS (
  SELECT doc_id, max(c) AS mc FROM (
    SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g
  ) GROUP BY doc_id
),
n AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
)
SELECT n.doc_id,
       CAST(COALESCE(2 * bmax.mc, 0) * 1000000 // GREATEST(n.n, 1) AS BIGINT)
         AS top_bigram_frac_e6,
       CAST(COALESCE(3 * tmax.mc, 0) * 1000000 // GREATEST(n.n, 1) AS BIGINT)
         AS top_trigram_frac_e6
FROM n LEFT JOIN bmax USING (doc_id) LEFT JOIN tmax USING (doc_id)
"""


def q_url_normalize(sf_dir: str):
    """URL canonicalization (crawl-pipeline dedup-key normalization ahead
    of SignatureUpdateProcessor-style dedup): dirty URLs are synthesized
    deterministically from doc_id (mixed case, trailing slash, utm_*
    params, fragments) and normalized by the RE2-kernel chain in
    textstats.url_normalize_batch; the SQL oracle mirrors both the
    construction and every rule 1:1."""
    from ..functions.textstats import url_normalize_batch

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        s = np.char.mod("%d", ids)
        u = np.char.add("HTTPS://Site", np.char.mod("%d", ids % 97))
        u = np.char.add(u, ".Example/Path")
        u = np.char.add(u, s)
        u = np.char.add(u, np.where(ids % 3 == 0, "/", ""))
        u = np.char.add(u, np.char.add("?id=", s))
        u = np.char.add(
            u, np.where(ids % 2 == 0, "&utm_source=feed&utm_campaign=x", "")
        )
        u = np.char.add(u, np.where(ids % 5 == 0, "#frag", ""))
        return pa.table(
            {"doc_id": batch["doc_id"], "url": pa.array(u.tolist(), type=pa.string())}
        )

    return (
        ds.map_batches(mk, batch_format="pyarrow")
        .map_batches(url_normalize_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "url_norm"])
    )


def q_term_vectors_docs(sf_dir: str):
    """TermVectorComponent (SURVEY.md §2.6; reference solr/core/.../
    component/TermVectorComponent.java, branch_8x): per-doc term vectors
    (tf + first/last position) for the doc_id %% 97 == 0 slice, derived
    in one streaming map-side pass (textstats.term_vectors_batch) — the
    predicate prunes before tokenization, nothing shuffles."""
    from ..functions.textstats import term_vectors_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tv(t: pa.Table) -> pa.Table:
        keep = (t["doc_id"].to_numpy() % 97) == 0
        return term_vectors_batch(t.filter(pa.array(keep)))

    return ds.map_batches(tv, batch_format="pyarrow")


def sql_term_vectors_docs() -> str:
    # generate_subscripts is 1-based; engine positions are 0-based → -1
    return """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id % 97 = 0
)
SELECT doc_id, term, count(*) AS tf,
       min(pos) - 1 AS first_pos, max(pos) - 1 AS last_pos
FROM tok GROUP BY doc_id, term
"""


def q_facet_url_paths(sf_dir: str):
    """Hierarchical URL-path faceting through the PathHierarchyTokenizer
    analog (SURVEY.md §2.2; reference lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java, branch_8x): paths synthesized
    deterministically from doc_id at varying depth, exploded to
    cumulative prefixes by per-depth RE2 kernels
    (textstats.path_prefix_explode), then one facet count + top-25 by
    (count desc, prefix asc)."""
    from ..functions.textstats import path_prefix_explode

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        p = np.char.add("/cat", np.char.mod("%d", ids % 7))
        p = np.char.add(
            p, np.where(ids % 3 >= 1,
                        np.char.add("/sub", np.char.mod("%d", ids % 13)), ""))
        p = np.char.add(
            p, np.where(ids % 3 == 2,
                        np.char.add("/page", np.char.mod("%d", ids % 31)), ""))
        return pa.table({"path": pa.array(p.tolist(), type=pa.string())})

    ex = ds.map_batches(mk, batch_format="pyarrow").map_batches(
        lambda t: path_prefix_explode(t, "path"), batch_format="pyarrow"
    ).select_columns(["path_prefix"])
    counts = rel.facet_counts(ex, "path_prefix")
    return rel.top(counts, ["count", "path_prefix"], [True, False], 25)


def sql_facet_url_paths() -> str:
    return """
WITH paths AS (
  SELECT '/cat' || CAST(doc_id % 7 AS VARCHAR)
         || CASE WHEN doc_id % 3 >= 1
                 THEN '/sub' || CAST(doc_id % 13 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 3 = 2
                 THEN '/page' || CAST(doc_id % 31 AS VARCHAR) ELSE '' END
           AS path
  FROM documents
),
parts AS (SELECT path, string_split(path, '/') AS s FROM paths),
expl AS (
  SELECT array_to_string(s[1:d], '/') AS path_prefix
  FROM parts, unnest(range(1, length(s) + 1)) AS t(d)
)
SELECT path_prefix, count(*) AS count
FROM expl WHERE path_prefix <> ''
GROUP BY path_prefix
ORDER BY count DESC, path_prefix ASC
LIMIT 25
"""


def sql_url_normalize() -> str:
    return r"""
WITH dirty AS (
  SELECT doc_id,
         'HTTPS://Site' || CAST(doc_id % 97 AS VARCHAR) || '.Example/Path'
         || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
         || '?id=' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 0 THEN '&utm_source=feed&utm_campaign=x' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
  FROM documents
),
s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS url FROM dirty),
s2 AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.\-]*://')
              THEN lower(split_part(url, '://', 1)) || '://'
                   || lower(regexp_replace(split_part(url, '://', 2), '/.*$', ''))
                   || regexp_replace(split_part(url, '://', 2), '^[^/]*', '')
              ELSE url END AS url
  FROM s1
),
s3 AS (SELECT doc_id, regexp_replace(url, 'utm_[a-z]+=[^&#]*&', '', 'g') AS url FROM s2),
s4 AS (SELECT doc_id, regexp_replace(url, '[?&]utm_[a-z]+=[^&#]*$', '') AS url FROM s3)
SELECT doc_id, regexp_replace(url, '([^/])/$', '\1') AS url_norm FROM s4
"""


# --- HTML strip (HTMLStripCharFilter analog; SURVEY.md §2.1) -----------------

def q_html_strip_docs(sf_dir: str):
    """HTML → text extraction (reference: lucene/analysis/common/.../
    charfilter/HTMLStripCharFilter.java, branch_8x; SURVEY.md §2.1 — the
    webtext corpus's html:binary column is exactly this operator's
    input). HTML pages are synthesized deterministically from doc_id +
    text (script/style/comment bodies, inline vs block tags, named +
    numeric entities), stripped by the RE2-kernel chain in
    analysis/html.py, and whitespace-collapsed; the SQL oracle mirrors
    the construction AND runs the SAME pattern chain (both RE2)."""
    from ..analysis.html import html_strip_array

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def mk(batch: pa.Table) -> pa.Table:
        sid = pc.cast(batch["doc_id"], pa.string())
        html = pc.binary_join_element_wise(
            "<!DOCTYPE html><html><head><title>Doc ", sid,
            '</title><script type="text/javascript">if (1 &lt; 2) { x(); }'
            "</script><style>p { color: red; }</style></head>"
            "<body><h1>Title &amp; ", sid,
            "</h1><p>", batch["text"],
            ' s&#97;mple &quot;quoted&quot; A&amp;B</p><div>tail', sid,
            "</div><!-- hidden --></body></html>", "",
        )
        return pa.table({"doc_id": batch["doc_id"], "html": html})

    def strip(batch: pa.Table) -> pa.Table:
        clean = html_strip_array(batch["html"])
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(clean, pattern=r"\s+", replacement=" ")
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": clean,
                "n_chars": pc.cast(pc.utf8_length(clean), pa.int64()),
            }
        )

    return ds.map_batches(mk, batch_format="pyarrow").map_batches(
        strip, batch_format="pyarrow"
    )


def sql_html_strip_docs() -> str:
    from ..analysis.html import REPLACEMENTS

    expr = "html"
    for pat, repl in REPLACEMENTS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return f"""
WITH h AS (
  SELECT doc_id,
         '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
         || '</title><script type="text/javascript">if (1 &lt; 2) {{ x(); }}'
         || '</script><style>p {{ color: red; }}</style></head>'
         || '<body><h1>Title &amp; ' || CAST(doc_id AS VARCHAR)
         || '</h1><p>' || text
         || ' s&#97;mple &quot;quoted&quot; A&amp;B</p><div>tail'
         || CAST(doc_id AS VARCHAR)
         || '</div><!-- hidden --></body></html>' AS html
  FROM documents
),
s AS (SELECT doc_id, {expr} AS t FROM h),
-- planted entities only (text has none); &amp; decodes LAST so
-- '&amp;lt;'-style double decodes cannot happen, same as the engine
e AS (
  SELECT doc_id,
         replace(replace(replace(t, '&#97;', 'a'), '&quot;', '"'),
                 '&amp;', '&') AS t2
  FROM s
),
w AS (SELECT doc_id, trim(regexp_replace(t2, '\\s+', ' ', 'g')) AS clean_text FROM e)
SELECT doc_id, clean_text, CAST(length(clean_text) AS BIGINT) AS n_chars
FROM w
"""


# (markup snippet appended to the doc, token that must exist after
# html_strip + tokenize, slot). zqscriptgone must NOT exist (df 0): its
# only occurrence is inside a removed <script> body.
HTML_PLANT = [
    ("<b>zqinline</b><i>glue</i>", "zqinlineglue"),   # inline tags glue
    ("<p>zqblock</p>", "zqblock"),                    # block tag separates
    ("zq&#101;ntity", "zqentity"),                    # numeric entity
    ("<script>zqscriptgone()</script> zqkept", "zqkept"),
    ("&quot;zqquoted&quot;", "zqquoted"),             # named entity
]


def ensure_ft_html_index(sf_dir: str) -> str:
    """documents index through the html_strip char filter (SURVEY.md §2.1
    HTMLStripCharFilter): each doc gets ONE planted markup snippet
    appended (by doc_id % 5) so the char-filter slot has real work to do;
    cached separately from the unigram ft index."""
    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:html1"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            root = read_root_manifest(index_root)
            if root.get("input_fingerprint") == key:
                return index_root
        except Exception:
            pass

    base = _docs_as_pages(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            [int(u.rsplit("/", 1)[-1]) for u in batch["url"].to_pylist()],
            dtype=np.int64,
        )
        toks = [HTML_PLANT[int(i) % 5][0] for i in ids]
        text = pc.binary_join_element_wise(
            batch["text"], pa.array(toks, type=pa.string()), " "
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )

    build_index(
        [p],
        index_root,
        num_partitions=FT_PARTITIONS,
        lang=None,
        dataset=base.map_batches(plant, batch_format="pyarrow"),
        fingerprint=key,
        analyzer_spec={
            "tokenizer": "standard_uax29",
            "max_token_length": 255,
            "char_filters": ["html_strip"],
            "filters": ["lowercase"],
        },
    )
    return index_root


def q_ft_html_strip_stats(sf_dir: str) -> pd.DataFrame:
    """Global (df, total_tf) of each planted post-strip token in the
    char-filtered index — matching proves the html_strip char filter ran
    over every document at build time (inline-tag gluing, entity decode,
    script-body removal all exercised; zqscriptgone must be ABSENT)."""
    from ..index.stats import read_query_term_stats

    idx = ensure_ft_html_index(sf_dir)
    toks = sorted({t for _, t in HTML_PLANT} | {"zqscriptgone"})
    stats = read_query_term_stats(idx, toks)
    rows = [
        {"tok": t, "df": stats.get(t, (0, 0))[0],
         "total_tf": stats.get(t, (0, 0))[1]}
        for t in toks
    ]
    return pd.DataFrame(rows).astype({"df": np.int64, "total_tf": np.int64})


def sql_ft_html_strip_stats() -> str:
    vals = ", ".join(
        f"('{tok}', {slot})" for slot, (_, tok) in enumerate(HTML_PLANT)
    ) + ", ('zqscriptgone', -1)"
    return f"""
WITH plant(tok, slot) AS (VALUES {vals}),
c AS (SELECT doc_id % 5 AS slot, count(*) AS n FROM documents GROUP BY 1)
SELECT tok, COALESCE(n, 0) AS df, COALESCE(n, 0) AS total_tf
FROM plant LEFT JOIN c USING (slot)
"""


def sql_quality_scores() -> str:
    from ..functions.textstats import STOPWORDS

    stop = ",".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
agg AS (
  SELECT doc_id,
         count(*) AS n,
         sum(length(term)) AS sum_len,
         sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END) AS n_stop,
         count(DISTINCT term) AS n_uniq
  FROM toks GROUP BY doc_id
),
chars AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha
  FROM documents
)
SELECT agg.doc_id,
       CAST(sum_len * 1000000 // n AS BIGINT) AS mean_word_len_e6,
       CAST(n_stop * 1000000 // n AS BIGINT) AS stopword_ratio_e6,
       CAST(n_alpha * 1000000 // greatest(n_chars, 1) AS BIGINT) AS alpha_ratio_e6,
       CAST((n - n_uniq) * 1000000 // n AS BIGINT) AS repetition_ratio_e6
FROM agg JOIN chars USING (doc_id)
"""


def q_langid_eval(sf_dir: str):
    """n-gram language-ID prediction vs labeled lang — model-based, no SQL
    oracle (driver records rows-only)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    from ..functions.dedup import default_actor_concurrency

    pred = ds.map_batches(
        LangIdStage, batch_format="pyarrow",
        concurrency=default_actor_concurrency(),
    )
    return rel.rollup(pred, ["lang", "lang_pred"], {"doc_id": ["count"]})


# ================================================================== dedup ==
def q_dedup_exact(sf_dir: str):
    """SignatureUpdateProcessor exact dedup — only the survivor ids are
    needed here, so the NATIVE min-id aggregate runs over the vectorized
    128-bit content key (one polars hash call per batch; the per-row md5
    loop was the round-3 hot-path finding). Hash VALUES never cross the
    oracle boundary — survivor ids are hash-function-independent — so the
    contract compares ids only; ``doc_fingerprints`` remains the
    md5/MD5Signature byte-parity entry."""
    from ..functions.dedup import exact_dedup_ids

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ids = exact_dedup_ids(ds, id_col="doc_id", text_col="text")
    return ids.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )


def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id) AS doc_id
FROM documents GROUP BY text
"""


def q_dedup_fingerprint(sf_dir: str):
    """Word-order-insensitive dedup (FingerprintFilter / Solr
    FingerprintUpdateProcessor pattern): survivors = min(doc_id) per
    sorted-unique-token canonical string — "b a a c" ≡ "a b c". The
    canonicalization is one dictionary-rank lexsort + boundary dedup per
    batch (no per-row Python); the group key rides the 128-bit content
    hash so long vocabularies never shuffle as raw strings."""
    from ..functions.dedup import fingerprint_dedup_ids

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ids = fingerprint_dedup_ids(ds, id_col="doc_id", text_col="text")
    return ids.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )


def sql_dedup_fingerprint() -> str:
    return """
SELECT min(doc_id) AS doc_id
FROM documents
GROUP BY array_to_string(
    list_sort(list_distinct(string_split(text, ' '))), ' ')
"""


def q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs verified by n-gram Jaccard —
    not SQL-expressible (banding); deterministic seed, rows-only check.
    Candidate texts come back via the fetch() point-read pattern (the
    corpus parquet is re-readable here), the zero-shuffle verify path."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_dup_pairs(
        ds, threshold=0.5, fetch_texts_from=_docs_path(sf_dir)
    )


def q_dedup_simhash(sf_dir: str):
    """SimHash hamming-≤3 pairs via 16-bit-slice pigeonhole buckets —
    rows-only check (banding not SQL-expressible)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, max_hamming=3)


# ==================================================================== ann ==
def _query_matrix(sf_dir: str, n: int = 5):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist())
    sel = np.argsort(ids)[:n]
    Q = np.asarray([t["embedding"][int(i)].as_py() for i in sel], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    return Q / qn[:, None], ids[sel].tolist()


def q_ann_bruteforce(sf_dir: str):
    Q, qids = _query_matrix(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_cosine_topk(ds, ray.put(Q), qids, k=5)

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "query_id": batch["query_id"].astype(np.int64),
                "rank": batch["rank"].astype(np.int64),
                "vec_id": batch["vec_id"].astype(np.int64),
                "sim_e6": np.floor(batch["sim"].to_numpy() * 1e6).astype(np.int64),
            }
        )

    return out.map_batches(finalize, batch_format="pandas")


def sql_ann_bruteforce() -> str:
    return """
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings
  ORDER BY vec_id LIMIT 5
),
sims AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS sim
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.query_id
)
SELECT query_id,
       row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank,
       vec_id,
       CAST(floor(sim * 1000000) AS BIGINT) AS sim_e6
FROM sims
QUALIFY rank <= 5
"""


def q_ann_lsh_recall(sf_dir: str):
    """LSH-bucketed ANN vs brute force: per-query recall@5 (×100) —
    approximate by construction, rows-only check."""
    Q, qids = _query_matrix(sf_dir)
    ref = ray.put(Q)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bf = brute_force_cosine_topk(ds, ref, qids, k=5).to_pandas()
    ds2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    approx = lsh_cosine_topk(ds2, ref, qids, k=5, dim=Q.shape[1]).to_pandas()
    rows = []
    for q in qids:
        truth = set(bf[bf.query_id == q].vec_id)
        got = set(approx[approx.query_id == q].vec_id)
        rows.append(
            {"query_id": int(q), "recall_x100": int(100 * len(truth & got) / max(len(truth), 1))}
        )
    return pd.DataFrame(rows).astype(np.int64)


# ============================================================= multimodal ==
def q_binary_meta(sf_dir: str):
    """Opaque-binary column plumbing: documents.text re-encoded as a binary
    payload column, run through the (stubbed) media decode actor stage +
    metadata extraction; the SQL-checkable output is the byte length."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        payloads = [t.encode("utf-8") for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, type=pa.binary())}
        )

    from ..functions.dedup import default_actor_concurrency

    withp = ds.map_batches(to_payload, batch_format="pyarrow")
    meta = withp.map_batches(binary_meta_batch, batch_format="pyarrow")
    feats = meta.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs={"kind": "image", "fake": True},
        batch_format="pyarrow",
        batch_size=256,  # multi-MB payloads: small batches, many actors
        concurrency=default_actor_concurrency(),
    )
    return feats.select_columns(["doc_id", "n_bytes"])


def sql_binary_meta() -> str:
    # documents.text is ASCII → char length == byte length
    return "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes FROM documents"


def q_image_meta(sf_dir: str):
    """REAL image decode (container headers, no external libs): per doc, a
    byte-exact PNG/JPEG/GIF/BMP payload is synthesized from doc_id (format
    cycles by doc_id % 4, dimensions derive arithmetically), then the
    ImageMetaStage actor pool parses format/width/height/bit_depth back
    out of the BYTES. The oracle recomputes the planted dimensions from
    doc_id — matching proves the synthesizer↔parser round trip, i.e. the
    decoder actually reads the container headers."""
    from ..functions.dedup import default_actor_concurrency
    from ..functions.multimodal import (
        SUGGESTED_BINARY_BATCH_SIZE,
        ImageMetaStage,
        make_bmp,
        make_gif,
        make_jpeg,
        make_png,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    MAKERS = (make_png, make_jpeg, make_gif, make_bmp)

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        payloads = [
            MAKERS[int(i) % 4](int(i) % 640 + 1, int(i) % 480 + 1) for i in ids
        ]
        return pa.table(
            {"doc_id": batch["doc_id"],
             "payload": pa.array(payloads, type=pa.binary())}
        )

    return (
        ds.map_batches(mk, batch_format="pyarrow")
        .map_batches(
            ImageMetaStage,
            batch_format="pyarrow",
            batch_size=SUGGESTED_BINARY_BATCH_SIZE * 4,
            concurrency=default_actor_concurrency(),
        )
        .select_columns(["doc_id", "format", "width", "height", "bit_depth"])
    )


def sql_image_meta() -> str:
    # gif bit depth comes from the 8-bit color-resolution field; png
    # grayscale depth 8; jpeg precision 8; bmp 24-bit
    return """
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
       CAST(doc_id % 640 + 1 AS BIGINT) AS width,
       CAST(doc_id % 480 + 1 AS BIGINT) AS height,
       CAST(CASE doc_id % 4 WHEN 3 THEN 24 ELSE 8 END AS BIGINT) AS bit_depth
FROM documents
"""


# ============================================================== relational ==
def q_rollup_pricing(sf_dir: str):
    """TPC-H Q1-shaped rollup (RollupStream + SlotAcc aggregates)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy().astype(np.int64)
        cents = np.floor(batch["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": qty,
                "price_c": cents,
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = rel.rollup(
        prepped, ["l_returnflag", "l_linestatus"], {"qty": ["sum"], "price_c": ["sum", "count"]}
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_c", "count_order"]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def sql_rollup_pricing() -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum({_SQL_CENTS.format(col='l_extendedprice')}) AS BIGINT) AS sum_price_c,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_join_nation_revenue(sf_dir: str):
    """orders ⋈ customer (native hash join) ⋈ nation (broadcast hash join):
    revenue per nation (InnerJoinStream + HashJoinStream together)."""
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        _cents("o_totalprice"), batch_format="pyarrow"
    ).select_columns(["o_custkey", "o_totalprice_c"])
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = rel.inner_join(
        orders,
        customer.map_batches(
            lambda t: t.rename_columns(["o_custkey", "c_nationkey"]), batch_format="pyarrow"
        ),
        on=["o_custkey"],
    )
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nation = nation.rename_columns(
        ["c_nationkey" if c == "n_nationkey" else c for c in nation.column_names]
    )
    small_ref = ray.put(nation)
    enriched = rel.hash_join_broadcast(
        joined, small_ref, on="c_nationkey", select={"n_name": "n_name"}
    )
    agg = rel.rollup(enriched, ["n_name"], {"o_totalprice_c": ["sum", "count"]})
    return agg.map_batches(
        lambda t: t.rename_columns(["n_name", "revenue_c", "n_orders"]),
        batch_format="pyarrow",
    )


def sql_join_nation_revenue() -> str:
    return f"""
SELECT n.n_name,
       CAST(sum({_SQL_CENTS.format(col='o.o_totalprice')}) AS BIGINT) AS revenue_c,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_top_orders(sf_dir: str):
    """RankStream/top(): k best by (totalprice desc, orderkey asc)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
        _cents("o_totalprice"), batch_format="pyarrow"
    ).select_columns(["o_orderkey", "o_totalprice_c"])
    out = rel.top(ds, ["o_totalprice_c", "o_orderkey"], [True, False], 10)
    return out.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "total_c"]), batch_format="pyarrow"
    )


def sql_top_orders() -> str:
    return f"""
SELECT o_orderkey, {_SQL_CENTS.format(col='o_totalprice')} AS total_c
FROM orders
ORDER BY total_c DESC, o_orderkey ASC
LIMIT 10
"""


def q_facet_event_types(sf_dir: str):
    """FacetComponent term facet: count per event_type."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    return rel.facet_counts(ds, "event_type")


def sql_facet_event_types() -> str:
    return "SELECT event_type, count(*) AS count FROM events GROUP BY event_type"


def q_facet_top_terms(sf_dir: str):
    """Two-phase distributed facet refinement over a HIGH-cardinality Zipf
    field (the document token stream): every block overrequests its local
    top terms, the candidate union is broadcast, exact counts are refined
    for candidates only — top-10 terms by (count desc, term asc). The
    reference's FacetComponent overrequest→refine pattern (SURVEY.md §2.6);
    exact here because Zipf head terms lead every block."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def tokens(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch["text"]))
        return pa.table({"term": toks})

    terms = docs.map_batches(tokens, batch_format="pyarrow")
    return rel.facet_top_terms(terms, "term", topn=10)


def sql_facet_top_terms() -> str:
    return """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, count(*) AS count FROM toks
GROUP BY term ORDER BY count DESC, term LIMIT 10
"""


def q_facet_prefix_terms(sf_dir: str):
    """facet.prefix (reference: solr/core/.../request/SimpleFacets.java
    facet.prefix handling, branch_8x — the facet-driven autocomplete
    pattern): term facet counts restricted to a prefix BEFORE the
    count/refine work, so the prefix prune happens map-side on every
    block (only matching tokens enter the shuffle)."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def tokens(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(batch["text"]))
        return pa.table({"term": toks.filter(
            pc.starts_with(toks, "s"))})

    terms = docs.map_batches(tokens, batch_format="pyarrow")
    return rel.facet_top_terms(terms, "term", topn=8)


def sql_facet_prefix_terms() -> str:
    return """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, count(*) AS count FROM toks
WHERE term LIKE 's%'
GROUP BY term ORDER BY count DESC, term LIMIT 8
"""


def q_stats_extendedprice(sf_dir: str):
    """StatsComponent: global min/max/sum/count (cents)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"]).map_batches(
        _cents("l_extendedprice"), batch_format="pyarrow"
    ).select_columns(["l_extendedprice_c"])
    row = ds.aggregate(
        Min("l_extendedprice_c", alias_name="min_c"),
        Max("l_extendedprice_c", alias_name="max_c"),
        Sum("l_extendedprice_c", alias_name="sum_c"),
        # column-targeted: Ray 2.49's column-less global Count() can merge
        # to 0 nondeterministically when any block is empty
        Count("l_extendedprice_c", ignore_nulls=False, alias_name="n"),
    )
    return pd.DataFrame([row]).astype(np.int64)


def sql_stats_extendedprice() -> str:
    c = _SQL_CENTS.format(col="l_extendedprice")
    return f"""
SELECT min({c}) AS min_c, max({c}) AS max_c, CAST(sum({c}) AS BIGINT) AS sum_c, count(*) AS n
FROM lineitem
"""


def q_unique_mktsegment(sf_dir: str):
    """UniqueStream: distinct values."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])
    return rel.unique_stream(ds, "c_mktsegment")


def sql_unique_mktsegment() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer"


def q_collapse_latest_order(sf_dir: str):
    """CollapsingQParser: best row per group by (o_orderdate, o_orderkey)
    desc — via the NATIVE packed-key collapse (order columns bit-packed
    into one int64, Max per customer runs as an Arrow hash-agg; no
    per-group Python callable — the 1e8-groups scale path)."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def pack(batch: pa.Table) -> pa.Table:
        days = (
            batch["o_orderdate"].cast(pa.int64()).to_numpy() // 86_400_000_000
        )
        keys = batch["o_orderkey"].to_numpy()
        assert keys.max() < (1 << 40) and days.max() < (1 << 23)
        return batch.append_column("_packed", pa.array((days << 40) | keys))

    def unpack(batch: pa.Table) -> pa.Table:
        packed = batch["_packed"].to_numpy()
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": pa.array(packed & ((1 << 40) - 1)),
            }
        )

    return rel.collapse_packed(ds, "o_custkey", pack, unpack, mode="max")


def sql_collapse_latest_order() -> str:
    return """
SELECT o_custkey, o_orderkey FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
) = 1
"""


def q_expand_other_orders(sf_dir: str):
    """ExpandComponent paired with the collapse above: for each customer,
    up to 2 ADDITIONAL orders (the latest-order collapse winner excluded)
    by (o_orderdate, o_orderkey) desc. Bucketed combiner+merge top-n with
    the per-key leading row dropped in the merge — no per-group Python."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    out = rel.expand(
        ds, "o_custkey", ["o_orderdate", "o_orderkey"], [True, True], rows=2
    )
    return out.select_columns(["o_custkey", "o_orderkey"])


def sql_expand_other_orders() -> str:
    return """
SELECT o_custkey, o_orderkey FROM orders
QUALIFY row_number() OVER (
  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
) BETWEEN 2 AND 3
"""


def q_having_frequent_customers(sf_dir: str):
    """RollupStream + HavingStream: customers with >= 3 orders."""
    ds = _read(sf_dir, "orders", columns=["o_custkey"])
    counts = rel.rollup(ds, ["o_custkey"], {"o_custkey": ["count"]})
    counts = counts.map_batches(
        lambda t: t.rename_columns(["o_custkey", "n_orders"]), batch_format="pyarrow"
    )
    return rel.having(counts, lambda t: pc.greater_equal(t["n_orders"], 3))


def sql_having_frequent_customers() -> str:
    return """
SELECT o_custkey, count(*) AS n_orders FROM orders
GROUP BY o_custkey HAVING count(*) >= 3
"""


def q_range_shipdate(sf_dir: str):
    """PointRangeQuery analog: predicate pushed into the parquet read
    (row-group pruning at the source, SURVEY.md §2.3)."""
    import pyarrow.dataset  # noqa: F401

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_extendedprice"],
        filter=(
            (pc.field("l_shipdate") >= pa.scalar(np.datetime64("1995-01-01", "us")))
            & (pc.field("l_shipdate") < pa.scalar(np.datetime64("1996-01-01", "us")))
        ),
    )
    prepped = ds.map_batches(_cents("l_extendedprice"), batch_format="pyarrow")
    from ray.data.aggregate import Count, Sum

    row = prepped.aggregate(
        # column-targeted Count: the read-pushed filter can leave empty
        # blocks, where Ray 2.49's column-less Count() can merge to 0
        Count("l_extendedprice_c", ignore_nulls=False, alias_name="n"),
        Sum("l_extendedprice_c", alias_name="sum_c"),
    )
    return pd.DataFrame([row])[["n", "sum_c"]].astype(np.int64)


def sql_range_shipdate() -> str:
    c = _SQL_CENTS.format(col="l_extendedprice")
    return f"""
SELECT count(*) AS n, CAST(sum({c}) AS BIGINT) AS sum_c
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
"""


def q_semi_join_building(sf_dir: str):
    """{!join} semi-join: BUILDING-segment customers that have orders —
    Ray-native hash LEFT SEMI join, both sides distributed (SURVEY.md
    §2.5; no driver key-set — orders is unbounded at scale)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    filt = cust.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")),
        batch_format="pyarrow",
    )
    return rel.semi_join(
        filt, orders, on="c_custkey", right_on="o_custkey"
    ).select_columns(["c_custkey"])


def sql_semi_join_building() -> str:
    return """
SELECT c_custkey FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_window_user_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped; SURVEY.md §2.10 — the
    reference has no windows, this is the training-pipeline extension):
    events per (user, hour bucket) with value cents."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy()
        hour = us // 3_600_000_000
        vc = np.floor(batch["value"].to_numpy() * 100.0).astype(np.int64)
        return pa.table(
            {"user_id": batch["user_id"], "hour": hour.astype(np.int64), "value_c": vc}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = rel.rollup(prepped, ["user_id", "hour"], {"value_c": ["sum", "count"]})
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "hour", "sum_value_c", "n_events"]),
        batch_format="pyarrow",
    )


def sql_window_user_hourly() -> str:
    return """
SELECT user_id,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour,
       CAST(sum(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_c,
       count(*) AS n_events
FROM events
GROUP BY user_id, hour
"""


def q_union_order_status(sf_dir: str):
    """MergeStream: union of two filtered streams, re-aggregated."""
    a = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.less(t["o_orderdate"], pa.scalar(np.datetime64("1993-01-01", "us")))
        ),
        batch_format="pyarrow",
    )
    b = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["o_orderdate"], pa.scalar(np.datetime64("1997-01-01", "us")))
        ),
        batch_format="pyarrow",
    )
    u = rel.merge_union(a.select_columns(["o_orderstatus"]), b.select_columns(["o_orderstatus"]))
    return rel.facet_counts(u, "o_orderstatus")


def sql_union_order_status() -> str:
    return """
SELECT o_orderstatus, count(*) AS count FROM (
  SELECT o_orderstatus FROM orders WHERE o_orderdate < TIMESTAMP '1993-01-01'
  UNION ALL
  SELECT o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
)
GROUP BY o_orderstatus
"""


def q_export_sorted(sf_dir: str):
    """/export handler analog: filtered, sorted, projected stream (top 100
    by (l_shipdate desc, l_orderkey, l_linenumber))."""
    ds = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"]
    )
    out = ds.sort(
        ["l_shipdate", "l_orderkey", "l_linenumber"], descending=[True, False, False]
    ).limit(100)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"].cast(pa.int64()),
                "qty": batch["l_quantity"].to_numpy().astype(np.int64),
            }
        )

    return out.map_batches(prep, batch_format="pyarrow")


def sql_export_sorted() -> str:
    return """
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(l_quantity AS BIGINT) AS qty
FROM lineitem
ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


def q_significant_terms(sf_dir: str):
    """significantTerms stream analog (SURVEY.md §2.8): terms
    over-represented in the foreground set (docs containing 'query') —
    top-10 co-occurring terms by foreground doc count, term asc tie."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized: split → flatten with repeated doc_ids → local
        # DISTINCT (docs never span batches, so per-batch pair dedup IS
        # global pair dedup) — all Arrow C kernels, no Python per row
        toks = pc.split_pattern(pc.coalesce(batch["text"], ""), " ")
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        ids = np.repeat(batch["doc_id"].to_numpy(), n)
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "term": pc.list_flatten(toks)})
        t = t.filter(pc.not_equal(t["term"], ""))
        return t.group_by(["doc_id", "term"]).aggregate([])

    pairs = docs.map_batches(explode, batch_format="pyarrow")
    fg_ids = pairs.filter(expr="term == 'query'").select_columns(["doc_id"])
    fg_pairs = rel.semi_join(pairs, fg_ids, on="doc_id")
    counts = (
        fg_pairs.map_batches(
            lambda t: t.filter(pc.field("term") != "query"), batch_format="pyarrow"
        )
        .groupby("term")
        .count()
    )
    out = counts.sort(["count()", "term"], descending=[True, False]).limit(10)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"term": batch["term"], "fg_docs": batch["count()"].cast(pa.int64())}
        )

    return out.map_batches(rename, batch_format="pyarrow")


def sql_significant_terms() -> str:
    return """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
fg AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'query')
SELECT term, count(*) AS fg_docs
FROM toks JOIN fg USING (doc_id)
WHERE term <> 'query' AND term <> ''
GROUP BY term
ORDER BY fg_docs DESC, term ASC
LIMIT 10
"""


def q_cartesian_region_pairs(sf_dir: str):
    """cartesianProduct() stream (SURVEY.md §2.8) via flat_map: every
    ordered region pair."""
    regions = _read(sf_dir, "region", columns=["r_name"])
    names = sorted(
        n for b in regions.iter_batches(batch_size=None, batch_format="pyarrow")
        for n in b["r_name"].to_pylist()
    )
    ref = ray.put(names)

    def cross(batch: pa.Table) -> pa.Table:
        other = ray.get(ref)
        left, right = [], []
        for a in batch["r_name"].to_pylist():
            for b in other:
                left.append(a)
                right.append(b)
        return pa.table({"r_a": pa.array(left), "r_b": pa.array(right)})

    return regions.map_batches(cross, batch_format="pyarrow")


def sql_cartesian_region_pairs() -> str:
    return """
SELECT a.r_name AS r_a, b.r_name AS r_b FROM region a CROSS JOIN region b
"""


def _orders_custkeys_of_year(sf_dir: str, year: int):
    """Distributed key set: custkeys with ≥1 order in ``year`` (vectorized
    year extraction, filter pushed before the shuffle)."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def filt(batch: pa.Table) -> pa.Table:
        yrs = batch["o_orderdate"].to_numpy().astype("datetime64[Y]").astype(np.int64) + 1970
        return batch.filter(pa.array(yrs == year)).select(["o_custkey"])

    return orders.map_batches(filt, batch_format="pyarrow")


def q_intersect_customers(sf_dir: str):
    """intersect() stream (SURVEY.md §2.8): customers with orders in BOTH
    1995 and 1996 — chained native hash semi-joins, nothing on the
    driver (the old version iterated the orders table TWICE into Python
    sets)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    in_95 = rel.semi_join(
        cust, _orders_custkeys_of_year(sf_dir, 1995), on="c_custkey", right_on="o_custkey"
    )
    return rel.semi_join(
        in_95, _orders_custkeys_of_year(sf_dir, 1996), on="c_custkey", right_on="o_custkey"
    )


def sql_intersect_customers() -> str:
    return """
SELECT c_custkey FROM customer WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
"""


def q_complement_customers(sf_dir: str):
    """complement() stream (SURVEY.md §2.8): customers with no 1995
    orders — native hash LEFT ANTI join, both sides distributed."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    return rel.semi_join(
        cust, _orders_custkeys_of_year(sf_dir, 1995),
        on="c_custkey", right_on="o_custkey", anti=True,
    )


def sql_complement_customers() -> str:
    return """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
"""


def q_fetch_enrich_orders(sf_dir: str):
    """fetch() stream (SURVEY.md §2.5): enrich orders with customer
    mktsegment via a BROADCAST lookup (ray.put once, probed per batch —
    the HashJoinStream analog), first 20 orders by key."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    ref = rel.broadcast_table(
        cust.map_batches(
            lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
            batch_format="pyarrow",
        )
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = rel.hash_join_broadcast(
        orders, ref, on="o_custkey", select={"c_mktsegment": "mktsegment"}
    )
    return joined.sort("o_orderkey").limit(20).select_columns(
        ["o_orderkey", "o_custkey", "mktsegment"]
    )


def sql_fetch_enrich_orders() -> str:
    return """
SELECT o_orderkey, o_custkey, c_mktsegment AS mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey LIMIT 20
"""


def q_sort_by_function(sf_dir: str):
    """Sort-by-function-query (reference: solr sort=func() desc via
    FunctionQParser + ValueSourceParser, branch_8x; SURVEY.md §2.9): order
    the orders stream by a compiled value source ``div(o_totalprice,
    sum(o_custkey, 1))`` descending (tie → o_orderkey asc), top 15. The
    value source compiles ONCE to a vectorized float64 kernel; the sort is
    Ray's distributed sort over the computed column."""
    from ..functions.scalars import compile_value_source

    f = compile_value_source(["div", "o_totalprice", ["sum", "o_custkey", 1]])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_custkey"])

    def fn(batch: pa.Table) -> pa.Table:
        v = f(batch)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "f_e6": pa.array(np.floor(v * 1e6).astype(np.int64)),
                "neg_key": pa.array(-batch["o_orderkey"].to_numpy()),
            }
        )

    out = (
        orders.map_batches(fn, batch_format="pyarrow")
        .sort(["f_e6", "neg_key"], descending=True)
        .limit(15)
        .drop_columns(["neg_key"])
    )
    return out


def sql_sort_by_function() -> str:
    return """
SELECT o_orderkey,
       CAST(floor(o_totalprice / (o_custkey + 1) * 1000000) AS BIGINT) AS f_e6
FROM orders
ORDER BY f_e6 DESC, o_orderkey ASC
LIMIT 15
"""


def q_function_scale_recip(sf_dir: str):
    """Function-query scalars (SURVEY.md §2.9 ValueSourceParser: scale,
    recip): o_totalprice scaled to [0,1] and recip(1,1,1) of it, integer-
    scaled; first 15 orders by key. Two-pass: global min/max aggregate,
    then a vectorized map."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    agg = orders.aggregate(
        ray.data.aggregate.Min("o_totalprice"), ray.data.aggregate.Max("o_totalprice")
    )
    lo, hi = float(agg["min(o_totalprice)"]), float(agg["max(o_totalprice)"])

    def fn(batch: pa.Table) -> pa.Table:
        x = batch["o_totalprice"].to_numpy()
        scaled = (x - lo) / (hi - lo)
        recip = 1.0 / (1.0 * scaled + 1.0)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "scaled_e6": np.floor(scaled * 1e6).astype(np.int64),
                "recip_e6": np.floor(recip * 1e6).astype(np.int64),
            }
        )

    return orders.map_batches(fn, batch_format="pyarrow").sort("o_orderkey").limit(15)


def sql_function_scale_recip() -> str:
    return """
WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
SELECT o_orderkey,
       CAST(floor((o_totalprice - lo) / (hi - lo) * 1000000) AS BIGINT) AS scaled_e6,
       CAST(floor(1.0 / ((o_totalprice - lo) / (hi - lo) + 1.0) * 1000000) AS BIGINT) AS recip_e6
FROM orders CROSS JOIN mm
ORDER BY o_orderkey LIMIT 15
"""


def q_semdedup_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (Abbas et al. 2023; rows-only — k-means assignments are
    not SQL-expressible; planted-duplicate pytest in tests/test_cluster.py
    gates correctness): k-means the embeddings, cosine-dedup WITHIN each
    cluster (all-pairs confined per cluster — the published approximation
    that makes semantic dedup tractable at web scale). Returns drop
    decisions per vector."""
    from ..functions.cluster import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semdedup(ds, k=8, iters=4, threshold=0.35).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True).astype(
        {"vec_id": np.int64, "keep": bool, "cluster": np.int64}
    )


def q_dedup_minhash_clusters(sf_dir: str) -> pd.DataFrame:
    """Cluster-level near-dup dedup (rows-only — MinHash is not SQL-
    expressible; the CC step itself is oracle-checked via
    ``graph_components``): MinHash-LSH verified pairs → distributed
    connected components → (node, component) per clustered doc. Chains
    (A~B, B~C, A≁C) land in ONE cluster — the case pair-level dedup
    under-removes (pytest-gated in tests/test_cc.py)."""
    from ..functions.dedup import near_dup_clusters

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    comp = near_dup_clusters(
        docs, threshold=0.5, num_perm=64, bands=16, shingle_k=3,
        fetch_texts_from=_docs_path(sf_dir),
    ).to_pandas()
    if len(comp) == 0:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "component": pd.Series(dtype=np.int64)})
    return comp.sort_values("node").reset_index(drop=True)


def q_graph_components(sf_dir: str) -> pd.DataFrame:
    """Distributed connected components (functions/cc.py min-label
    propagation — the pair→cluster step near-dup dedup needs when
    candidate pairs CHAIN A~B, B~C; cf. Lee et al. 2022 dedup clusters):
    a deterministic chain graph over doc_ids (edge i—i+1 unless i+1 is a
    multiple of 7) whose components are 7-runs with diameter 6, so the
    result is only correct if propagation actually iterates to the
    fixpoint across shuffle rounds. component(n) = n − n%7."""
    from ..functions.cc import connected_components

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def to_edges(t: pa.Table) -> pa.Table:
        i = t["doc_id"].to_numpy().astype(np.int64)
        keep = (i + 1) % 7 != 0
        return pa.table({"a": pa.array(i[keep]), "b": pa.array(i[keep] + 1)})

    mx = int(docs.max("doc_id"))
    edges = docs.map_batches(to_edges, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pa.compute.less_equal(t["b"], mx)),
        batch_format="pyarrow",
    )
    comp = connected_components(edges).to_pandas()
    # CC covers only edge-incident nodes; a max doc_id ≡ 0 (mod 7) is
    # isolated (no incoming edge, outgoing pruned at mx) — emit singleton
    # components for any such ids so the frame covers every doc like the
    # oracle does
    all_ids = docs.to_pandas()["doc_id"]
    lonely = sorted(set(all_ids) - set(comp["node"]))
    if lonely:
        comp = pd.concat(
            [comp, pd.DataFrame({"node": lonely, "component": lonely})],
            ignore_index=True,
        )
    return comp.sort_values("node").reset_index(drop=True)


def sql_graph_components() -> str:
    return """
SELECT doc_id AS node, doc_id - doc_id % 7 AS component
FROM documents
ORDER BY node
"""


def q_facet_interval_price(sf_dir: str) -> pd.DataFrame:
    """facet.interval (IntervalFacets.java analog, branch_8x; SURVEY.md
    §2.6): explicit OVERLAPPING price intervals, each counted
    independently — map-side vectorized masks, ≤ n_intervals partial rows
    shuffled per block. Output order = request order (sorted here for the
    hash compare)."""
    from ..functions.relational import facet_intervals

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    iv = [
        ("all_low", 0, 100000, True, False),
        ("mid", 50000, 200000, True, True),       # overlaps both neighbors
        ("high", 150000, 10**9, False, True),
        ("exact_edge", 100000, 100000, True, True),
    ]
    df = facet_intervals(ds, "o_totalprice", iv)
    return df.sort_values("interval").reset_index(drop=True)


def sql_facet_interval_price() -> str:
    return """
SELECT * FROM (
  SELECT 'all_low' AS interval,
         count(*) FILTER (WHERE o_totalprice >= 0 AND o_totalprice < 100000) AS count
  FROM orders
  UNION ALL
  SELECT 'mid',
         count(*) FILTER (WHERE o_totalprice >= 50000 AND o_totalprice <= 200000)
  FROM orders
  UNION ALL
  SELECT 'high',
         count(*) FILTER (WHERE o_totalprice > 150000 AND o_totalprice <= 1000000000)
  FROM orders
  UNION ALL
  SELECT 'exact_edge',
         count(*) FILTER (WHERE o_totalprice = 100000)
  FROM orders
) ORDER BY interval
"""


def q_timeseries_orders(sf_dir: str) -> pd.DataFrame:
    """timeseries() streaming expression (reference: solr/solrj/.../io/
    stream/TimeSeriesStream.java ~450 LoC, branch_8x; SURVEY.md §2.8):
    month-bucketed count + cents-sum over a date range WITH GAP FILLING —
    empty buckets emit zero rows, the defining difference from a plain
    range facet. One groupby shuffle; the (tiny, bounded-by-calendar)
    bucket spine is generated driver-side."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
        _cents("o_totalprice"), batch_format="pyarrow"
    )

    def bucket(batch: pa.Table) -> pa.Table:
        d = batch["o_orderdate"].to_numpy().astype("datetime64[M]")
        return pa.table(
            {
                "month": pa.array(np.datetime_as_string(d, unit="M")),
                "o_totalprice_c": batch["o_totalprice_c"],
            }
        )

    df = (
        orders.map_batches(bucket, batch_format="pyarrow")
        .groupby("month")
        .aggregate(Count("o_totalprice_c", ignore_nulls=False, alias_name="n"),
                   Sum("o_totalprice_c", alias_name="sum_c"))
        .to_pandas()
    )
    lo, hi = df["month"].min(), df["month"].max()
    spine = pd.period_range(lo, hi, freq="M").astype(str)
    out = (
        pd.DataFrame({"month": spine})
        .merge(df, on="month", how="left")
        .fillna({"n": 0, "sum_c": 0})
    )
    return out.astype({"n": np.int64, "sum_c": np.int64}).sort_values(
        "month"
    ).reset_index(drop=True)


def sql_timeseries_orders() -> str:
    cents = _SQL_CENTS.format(col="o_totalprice")
    return f"""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         count(*) AS n,
         CAST(sum({cents}) AS BIGINT) AS sum_c
  FROM orders GROUP BY 1
),
spine AS (
  SELECT strftime(unnest(generate_series(
    (SELECT date_trunc('month', min(o_orderdate)) FROM orders),
    (SELECT date_trunc('month', max(o_orderdate)) FROM orders),
    INTERVAL 1 MONTH
  )), '%Y-%m') AS month
)
SELECT spine.month,
       COALESCE(m.n, 0) AS n,
       COALESCE(m.sum_c, 0) AS sum_c
FROM spine LEFT JOIN m USING (month)
ORDER BY spine.month
"""


def q_function_datemath(sf_dir: str):
    """DateMathParser value sources (SURVEY.md §2.9; reference solr/core/
    .../util/DateMathParser.java, branch_8x): per-row date rounding +
    calendar arithmetic compiled to vectorized numpy datetime64 kernels —
    month start (``/MONTH``), freshness bucket (``/DAY+7DAYS``), and
    next-month-end (``/MONTH+2MONTHS-1DAY``) as epoch millis; first 15
    orders by key."""
    from ..functions.scalars import compile_value_source

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    f_month = compile_value_source(["datemath", "o_orderdate", "/MONTH"])
    f_plus7 = compile_value_source(["datemath", "o_orderdate", "/DAY+7DAYS"])
    f_eom = compile_value_source(["datemath", "o_orderdate", "/MONTH+2MONTHS-1DAY"])

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "month_ms": pa.array(f_month(batch).astype(np.int64)),
                "plus7_ms": pa.array(f_plus7(batch).astype(np.int64)),
                "eom_ms": pa.array(f_eom(batch).astype(np.int64)),
            }
        )

    return orders.map_batches(fn, batch_format="pyarrow").sort("o_orderkey").limit(15)


def sql_function_datemath() -> str:
    return """
SELECT o_orderkey,
       CAST(epoch_ms(date_trunc('month', o_orderdate)) AS BIGINT) AS month_ms,
       CAST(epoch_ms(date_trunc('day', o_orderdate) + INTERVAL 7 DAY) AS BIGINT) AS plus7_ms,
       CAST(epoch_ms(date_trunc('month', o_orderdate) + INTERVAL 2 MONTH - INTERVAL 1 DAY) AS BIGINT) AS eom_ms
FROM orders ORDER BY o_orderkey LIMIT 15
"""


_HLL_P = 12  # 4096 registers


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def q_hll_distinct_custkey(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate distinct (SURVEY.md §2.6 hll/UniqueAgg):
    per-batch register maxima → groupby(register) max → driver estimate.
    Mergeable sketch; the shuffle moves 4096 rows regardless of scale.
    Rows-only driver check (an estimate has no SQL-exact oracle); the
    pytest suite asserts <2% error vs exact."""
    m = 1 << _HLL_P
    orders = _read(sf_dir, "orders", columns=["o_custkey"])

    def registers(batch: pa.Table) -> pa.Table:
        h = _splitmix64(batch["o_custkey"].to_numpy().astype(np.int64))
        reg = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
        rest = h << np.uint64(_HLL_P)
        # rho = leading zeros of remaining 64-P bits + 1
        lz = np.full(len(h), 64 - _HLL_P, dtype=np.int64)
        v = rest.copy()
        nz = v != 0
        shift = np.zeros(len(h), dtype=np.int64)
        vv = v[nz]
        cnt = np.zeros(vv.shape, dtype=np.int64)
        for b in (32, 16, 8, 4, 2, 1):
            mask = vv < (np.uint64(1) << np.uint64(64 - b))
            cnt[mask] += b
            vv[mask] = vv[mask] << np.uint64(b)
        lz[nz] = cnt
        rho = np.minimum(lz, 64 - _HLL_P) + 1
        t = pa.table({"reg": pa.array(reg), "rho": pa.array(rho)})
        agg = t.group_by("reg").aggregate([("rho", "max")])
        return agg.select(["reg", "rho_max"]).rename_columns(["reg", "rho"])

    regs = orders.map_batches(registers, batch_format="pyarrow")
    final = regs.groupby("reg").max("rho")
    M = np.zeros(m, dtype=np.float64)
    for b in final.iter_batches(batch_size=None, batch_format="pyarrow"):
        M[b["reg"].to_numpy()] = b["max(rho)"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m / np.sum(np.exp2(-M))
    zeros = int((M == 0).sum())
    if E <= 2.5 * m and zeros:
        E = m * np.log(m / zeros)  # linear counting, small-range correction
    return pd.DataFrame({"estimate": [int(E)]}).astype(np.int64)


def q_percentile_totalprice(sf_dir: str):
    """Discrete percentiles via TWO-PASS histogram refinement
    (functions/quantiles.py): every block reduces to a fixed 4096-bin
    histogram (driver sees B×4096 ints regardless of N or value-domain
    cardinality), then only the bin owning each rank is re-read and
    locally sorted — exact quantile_disc semantics with every exchange
    bounded. For approximate streaming quantiles use the t-digest in
    functions/sketches.py."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"]).map_batches(
        _cents("o_totalprice"), batch_format="pyarrow"
    ).select_columns(["o_totalprice_c"])

    from ..functions.quantiles import exact_quantiles

    qv = exact_quantiles(ds, "o_totalprice_c", [0.5, 0.9])
    return pd.DataFrame(
        [{"p50_c": qv[0.5], "p90_c": qv[0.9]}]
    ).astype(np.int64)


def sql_percentile_totalprice() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT quantile_disc({c}, 0.5) AS p50_c, quantile_disc({c}, 0.9) AS p90_c
FROM orders
"""




# ===================================================== multiterm queries ==
FT_WILDCARD = "s?an"          # matches scan/span-style terms
FT_REGEXP = "(s|p)lan|h.sh"   # full-match regexp over the vocab
FT_FUZZY = "quer"             # within Levenshtein 2, first char pinned


def _ft_expand_count(sf_dir: str, kind: str, pattern: str) -> pd.DataFrame:
    """Shared body for wildcard/regexp/fuzzy cardinality: expand the
    pattern against each segment's sorted term dictionary (multiterm.py),
    union matching postings, count docs partition-side, sum counts
    (SURVEY.md §2.3 AutomatonQuery ∩ term dict; constant-score rewrite)."""
    idx = ensure_ft_index(sf_dir)
    root = read_root_manifest(idx)
    parts = [
        {"seg_dir": segment_dir(idx, pid)} for pid in range(root["num_partitions"])
    ]

    def count_part(batch: pa.Table) -> pa.Table:
        from ..search.multiterm import expand_fuzzy, expand_regexp, expand_wildcard

        total = 0
        for seg in batch["seg_dir"].to_pylist():
            r = SegmentReader(seg)
            if r.num_docs == 0:
                continue
            if kind == "wildcard":
                ords = expand_wildcard(r, pattern)
            elif kind == "regexp":
                ords = expand_regexp(r, pattern)
            else:
                ords = expand_fuzzy(r, pattern, max_edits=2, prefix_len=1)
            matched = np.zeros(r.num_docs, dtype=bool)
            for o in ords:
                matched[r.postings(int(o)).docids] = True
            total += int(matched.sum())
        return pa.table({"n_docs": pa.array([total], type=pa.int64())})

    ds = ray.data.from_items(parts).map_batches(count_part, batch_format="pyarrow")
    n = int(
        sum(
            b["n_docs"][0].as_py()
            for b in ds.iter_batches(batch_size=None, batch_format="pyarrow")
        )
    )
    return pd.DataFrame({"n_docs": [n]}).astype(np.int64)


def q_ft_wildcard_count(sf_dir: str) -> pd.DataFrame:
    """WildcardQuery cardinality (SURVEY.md §2.3 WildcardQuery.java):
    literal-prefix range scan + vectorized regex over the vocab slice."""
    return _ft_expand_count(sf_dir, "wildcard", FT_WILDCARD)


def sql_ft_wildcard_count() -> str:
    like = FT_WILDCARD.replace("*", "%").replace("?", "_")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS n_docs FROM toks WHERE term LIKE '{like}'
"""


def q_ft_regexp_count(sf_dir: str) -> pd.DataFrame:
    """RegexpQuery cardinality (SURVEY.md §2.3 RegexpQuery.java): anchored
    RE2 over the whole sorted vocab, one vectorized kernel per segment."""
    return _ft_expand_count(sf_dir, "regexp", FT_REGEXP)


def sql_ft_regexp_count() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS n_docs FROM toks
WHERE regexp_full_match(term, '{FT_REGEXP}')
"""


def q_ft_fuzzy_count(sf_dir: str) -> pd.DataFrame:
    """FuzzyQuery cardinality (SURVEY.md §2.3 FuzzyQuery.java): vectorized
    banded Levenshtein over the prefix-narrowed vocab (maxEdits=2,
    prefixLength=1; plain Levenshtein, no transpositions — pinned by the
    SQL levenshtein() oracle)."""
    return _ft_expand_count(sf_dir, "fuzzy", FT_FUZZY)


def sql_ft_fuzzy_count() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS n_docs FROM toks
WHERE left(term, 1) = left('{FT_FUZZY}', 1)
  AND levenshtein(term, '{FT_FUZZY}') <= 2
"""


def q_ft_phrase_incremental(sf_dir: str) -> pd.DataFrame:
    """Contract for positions surviving the FULL lifecycle: build a
    positions index over the first half of documents, APPEND the second
    half, forceMerge(1), then run the exact phrase count — must equal the
    whole-corpus SQL phrase oracle (regression for the positions-dropped-
    on-append/merge bug)."""
    import pyarrow.parquet as pq_mod

    from ..index.merge import merge_index

    p = _docs_path(sf_dir)
    fp = f"{os.path.abspath(p)}:{os.path.getsize(p)}:posincr"
    key = hashlib.sha256(fp.encode()).hexdigest()[:16]
    index_root = os.path.join("/tmp", "lsr_ft_cache", key)
    manifest_path = os.path.join(index_root, "MANIFEST.json")
    # the manifest alone is NOT enough: build_index writes it before
    # append_index/merge_index run, so an interrupted first run would
    # leave a half-built index a later run silently accepts — validity
    # additionally requires the completion sentinel written after merge.
    sentinel = os.path.join(index_root, ".lifecycle_complete")
    ok = False
    if os.path.exists(manifest_path) and os.path.exists(sentinel):
        try:
            root = read_root_manifest(index_root)
            ok = root.get("input_fingerprint") == key and root.get("store_positions")
        except Exception:
            ok = False
    if not ok:
        t = pq_mod.read_table(p, columns=["doc_id"])
        cut = int(t["doc_id"].to_numpy().max() // 2)
        pages = _docs_as_pages(sf_dir)
        first = pages.map_batches(
            lambda b: b.filter(
                pa.array(_url_to_doc_id(b["url"].to_pylist()) <= cut)
            ),
            batch_format="pyarrow",
        )
        second = _docs_as_pages(sf_dir).map_batches(
            lambda b: b.filter(
                pa.array(_url_to_doc_id(b["url"].to_pylist()) > cut)
            ),
            batch_format="pyarrow",
        )
        build_index(
            [p], index_root, num_partitions=FT_PARTITIONS, lang=None,
            dataset=first, fingerprint=key, store_positions=True, resume=False,
        )
        append_index([p], index_root, lang=None, dataset=second, fingerprint=key + "a")
        merge_index(index_root)
        with open(sentinel, "w") as f:
            f.write("ok")
    res = search(
        index_root,
        [{"query_id": 0, "kind": "phrase", "terms": FT_PHRASE}],
        k=10**9,
        method="exhaustive",
    )
    return pd.DataFrame({"n_docs": [len(res)]}).astype(np.int64)


def sql_ft_phrase_incremental() -> str:
    phrase = " ".join(FT_PHRASE)
    return f"""
SELECT count(*) AS n_docs FROM documents
WHERE contains(' ' || text || ' ', ' {phrase} ')
"""


# ================================================ cheap surface operators ==
def q_random_sample_orders(sf_dir: str):
    """RandomSortField / random() sampling (SURVEY.md §2.7): deterministic
    hash-based sample (Knuth multiplicative hash on the key < frac·2^32) so
    the SQL oracle reproduces it exactly; ``ds.random_sample`` is the
    non-reproducible-across-engines alternative."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])

    def samp(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy().astype(np.uint64)
        h = (k * np.uint64(2654435761)) % np.uint64(1 << 32)
        return batch.filter(pa.array(h < np.uint64(int(0.05 * (1 << 32)))))

    return orders.map_batches(samp, batch_format="pyarrow")


def sql_random_sample_orders() -> str:
    return f"""
SELECT o_orderkey FROM orders
WHERE (o_orderkey * 2654435761) % 4294967296 < {int(0.05 * (1 << 32))}
"""


def q_asof_last_error(sf_dir: str):
    """AS-OF join (task-brief custom operator): for each click event, the
    latest error event of the same user at or before the click — one
    key-hash-bucket shuffle, one vectorized merge_asof(by=key) per bucket
    (relational.asof_join; partitioning assumption documented there)."""
    def side(ev_type, cols):
        ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
        return ds.map_batches(
            lambda t, e=ev_type, c=cols: t.filter(pc.equal(t["event_type"], e)).select(c),
            batch_format="pyarrow",
        )

    left = side("click", ["event_id", "user_id", "ts"])
    right = side("error", ["user_id", "ts"]).map_batches(
        lambda t: t.append_column("err_ts", t["ts"]), batch_format="pyarrow"
    )
    joined = rel.asof_join(left, right, key="user_id", ts_col="ts",
                           right_cols=["err_ts"])
    return joined.map_batches(
        lambda t: t.filter(pc.is_valid(t["err_ts"])).select(["event_id", "err_ts"]),
        batch_format="pyarrow",
    )


def sql_asof_last_error() -> str:
    return """
SELECT c.event_id, max(e.ts) AS err_ts
FROM events c
JOIN events e
  ON e.user_id = c.user_id AND e.event_type = 'error' AND e.ts <= c.ts
WHERE c.event_type = 'click'
GROUP BY c.event_id
"""


def q_quality_filter_p25(sf_dir: str):
    """Percentile-threshold quality filtering — the standard curation
    gate: keep documents whose stopword ratio is at or above the corpus
    25th percentile. Composes the vectorized quality kernel with the
    two-pass exact-quantile histogram (functions/quantiles.py — no global
    sort; the threshold is one scalar on the driver)."""
    from ..functions.quantiles import exact_quantiles

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scores = ds.map_batches(quality_score_batch, batch_format="pyarrow") \
        .select_columns(["doc_id", "stopword_ratio_e6"]).materialize()
    thr = exact_quantiles(scores, "stopword_ratio_e6", [0.25])[0.25]
    return scores.filter(expr=f"stopword_ratio_e6 >= {int(thr)}")


def sql_quality_filter_p25() -> str:
    from ..functions.textstats import STOPWORDS

    stop = ",".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
scores AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END) * 1000000
              // count(*) AS BIGINT) AS stopword_ratio_e6
  FROM toks GROUP BY doc_id
),
q AS (SELECT quantile_disc(stopword_ratio_e6, 0.25) AS thr FROM scores)
SELECT s.doc_id, s.stopword_ratio_e6
FROM scores s, q WHERE s.stopword_ratio_e6 >= q.thr
"""


def q_kmeans_clusters(sf_dir: str):
    """Distributed full-corpus k-means over the embeddings table
    (SemDeDup-style corpus clustering; functions/cluster.py). Each Lloyd
    iteration is one streaming pass emitting ≤k partial rows per batch;
    the driver touches k×(d+2) numbers per iteration. No SQL oracle
    (iterative float algorithm) — tests/test_cluster.py gates label
    purity ≥0.95 against the planted ground-truth labels and
    non-increasing inertia."""
    from ray.data.aggregate import Count

    from lucene_solr_ray.functions.cluster import kmeans_assign, kmeans_fit

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    C, _ = kmeans_fit(ds, "embedding", k=10, iters=6)
    assigned = kmeans_assign(ds, C, "vec_id", "embedding")
    return (assigned.groupby("cluster")
            .aggregate(Count(alias_name="n_members")))


def q_span_dedup_docs(sf_dir: str):
    """Exact-substring span dedup (Lee et al. 2022 analog): per doc, the
    number of 8-token spans that occur more than once anywhere in the
    corpus (functions/dedup.span_dedup_counts — Rabin-Karp rolling hash,
    one count shuffle + one join back; 64-bit hash stands in for the
    exact string, collision risk documented)."""
    from lucene_solr_ray.functions.dedup import span_dedup_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return span_dedup_counts(ds, "doc_id", "text", window=8)


def sql_span_dedup_docs() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
n AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
win AS (
  SELECT t.doc_id, t.pos,
         string_agg(tok, ' ') OVER (PARTITION BY t.doc_id ORDER BY t.pos
             ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS span
  FROM toks t
),
full_w AS (
  -- pos is 1-based: an 8-token window fits while pos <= n - 7
  SELECT w.doc_id, w.span FROM win w JOIN n ON w.doc_id = n.doc_id
  WHERE w.pos <= n.n - 7
),
c AS (SELECT span, count(*) AS c FROM full_w GROUP BY span)
SELECT f.doc_id, count(*) AS n_dup_spans
FROM full_w f JOIN c ON f.span = c.span
WHERE c.c > 1
GROUP BY f.doc_id
"""


def q_lm_rare_bigrams(sf_dir: str):
    """Corpus-bigram-LM curation signal, integer-exact slice: per doc the
    total bigram count and how many bigrams are corpus-rare (count <= 2).
    Same distributed explode + count + co-partitioned-join machinery as
    the float LM scorer (functions/lm.py; the float mean-log-prob variant
    is pytest-gated because float sum order is engine-specific)."""
    from lucene_solr_ray.functions.lm import rare_bigram_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return rare_bigram_stats(ds, "doc_id", "text", rare_max=2)


def sql_lm_rare_bigrams() -> str:
    return """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
bg AS (
  SELECT doc_id, tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
bgc AS (SELECT w1, w2, count(*) AS c12 FROM bg2 GROUP BY w1, w2)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(CASE WHEN c.c12 <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
FROM bg2 b JOIN bgc c ON b.w1 = c.w1 AND b.w2 = c.w2
GROUP BY b.doc_id
"""


def q_lm_score_docs(sf_dir: str):
    """Mean bigram log-probability per doc (CCNet-style LM quality score;
    add-0.5 smoothing over corpus-trained bigram counts). No SQL oracle —
    float sum order is engine-specific — the math is pytest-gated against
    a single-process numpy reference (tests/test_lm.py); the integer
    slice of the same pipeline is oracle-checked as lm_rare_bigrams."""
    from lucene_solr_ray.functions.lm import lm_score_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lm_score_docs(ds, "doc_id", "text")


def q_topk_tokens_sketch(sf_dir: str):
    """Misra-Gries heavy hitters: approximate top-10 most frequent tokens
    across the documents corpus (mergeable bounded-memory summaries —
    each batch ships at most `capacity` rows into one small groupby-sum
    shuffle; sketches.heavy_hitters). On this corpus the vocabulary fits
    within capacity, so the sketch is exact and DuckDB-checkable; the
    compression path is pytest-gated with the N/(capacity+1) bound."""
    from lucene_solr_ray.functions.sketches import heavy_hitters

    ds = _read(sf_dir, "documents", columns=["text"])
    return heavy_hitters(ds, "text", capacity=256, k=10)


def sql_topk_tokens_sketch() -> str:
    return """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, count(*) AS cnt
FROM toks GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 10
"""


def q_hopping_window_events(sf_dir: str):
    """Hopping (sliding) window aggregate — the overlapping-window variant
    of window_user_hourly (SURVEY.md §2.10: the reference has no windows;
    training-pipeline extension): events per (user, 6h window hopping by
    1h). Each event belongs to exactly size/hop = 6 windows; the
    replication is one vectorized repeat/arange per batch (map-side, no
    extra shuffle beyond the final rollup)."""
    HOP = 3_600_000_000
    NW = 6
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def replicate(batch: pa.Table) -> pa.Table:
        hour = batch["ts"].cast(pa.int64()).to_numpy() // HOP
        n = batch.num_rows
        user = np.repeat(batch["user_id"].to_numpy(zero_copy_only=False), NW)
        # window start index k matches t iff k <= t_hour < k + NW
        win = np.repeat(hour, NW) - np.tile(np.arange(NW, dtype=np.int64), n)
        return pa.table({"user_id": user, "win": win})

    rep = ds.map_batches(replicate, batch_format="pyarrow")
    out = rel.rollup(rep, ["user_id", "win"], {"win": ["count"]})
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "win", "n_events"]),
        batch_format="pyarrow",
    )


def sql_hopping_window_events() -> str:
    return """
SELECT e.user_id,
       CAST(epoch_us(e.ts) // 3600000000 AS BIGINT) - k.k AS win,
       count(*) AS n_events
FROM events e, (SELECT unnest(range(6)) AS k) k
GROUP BY e.user_id, win
"""


def q_range_join_windows(sf_dir: str):
    """RANGE join (task-brief custom operator, no equi-key): count ALL
    events (any user) that fall inside each user's first-6-hours activity
    window. Intervals are derived distributed (per-user min ts), then
    relational.range_join quantizes time into 6h buckets, replicates each
    interval to the buckets it overlaps, and matches per bucket with two
    binary searches over sorted left values (partitioning assumption
    documented there)."""
    SIX_H = 6 * 3600 * 1_000_000
    ev = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "ts_us": t["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()  # feeds both the window derivation and the join's left side
    win = rel.rollup(ev, ["user_id"], {"ts_us": ["min"]}).map_batches(
        lambda t: pa.table({
            "wuser": t["user_id"],
            "lo": t["min_ts_us"],
            "hi": pc.add(t["min_ts_us"], SIX_H),
        }),
        batch_format="pyarrow",
    )
    pairs = rel.range_join(ev, "ts_us", win, "lo", "hi",
                           left_cols=[], right_cols=["wuser"],
                           bucket_width=SIX_H)
    out = rel.rollup(pairs, ["wuser"], {"wuser": ["count"]})
    return out.map_batches(
        lambda t: t.rename_columns(["wuser", "n_events"]), batch_format="pyarrow"
    )


def sql_range_join_windows() -> str:
    return """
WITH w AS (
  SELECT user_id AS wuser,
         epoch_us(min(ts)) AS lo,
         epoch_us(min(ts)) + 21600000000 AS hi
  FROM events GROUP BY user_id
)
SELECT w.wuser, count(*) AS n_events
FROM w JOIN events e ON epoch_us(e.ts) >= w.lo AND epoch_us(e.ts) < w.hi
GROUP BY w.wuser
"""


def q_session_windows_users(sf_dir: str):
    """Gap-based session windows (streaming-shaped training-pipeline
    extension; the reference has no windows — SURVEY.md §2.10): split each
    user's event stream into sessions at >30-minute gaps, one row per
    session with start/end/count. ONE key-hash-bucket shuffle; per-bucket
    numpy lexsort + diff + cumsum + C-path groupby
    (relational.session_windows; partitioning assumption documented there)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    out = rel.session_windows(ds, key="user_id", ts_col="ts",
                              gap_us=30 * 60 * 1_000_000)
    return out.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "session_start": t["session_start"].cast(pa.timestamp("us")),
            "session_end": t["session_end"].cast(pa.timestamp("us")),
            "n_events": t["n_events"],
        }),
        batch_format="pyarrow",
    )


def sql_session_windows_users() -> str:
    return """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) <= 1800000000
              THEN 0 ELSE 1 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_stratified_sample_docs(sf_dir: str):
    """Per-stratum deterministic sampling (training-data mixture
    rebalancing: keep 50% en, 20% de, 5% of everything else) — one
    streaming filter pass, thresholds looked up per batch via Arrow
    index_in; hash identical to the flat sampler so the SQL oracle
    reproduces rows exactly."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return rel.stratified_sample(
        ds, "lang", "doc_id", {"en": 0.5, "de": 0.2}, default_frac=0.05
    )


def sql_stratified_sample_docs() -> str:
    t_en = int(0.5 * (1 << 32))
    t_de = int(0.2 * (1 << 32))
    t_def = int(0.05 * (1 << 32))
    return f"""
SELECT doc_id, lang FROM documents
WHERE (doc_id * 2654435761) % 4294967296 <
      CASE lang WHEN 'en' THEN {t_en} WHEN 'de' THEN {t_de} ELSE {t_def} END
"""


def q_cursor_page_orders(sf_dir: str):
    """cursorMark deep paging: fetch page 1 (k=20) by (totalprice_c desc,
    orderkey asc), then page 2 via the KEYSET cursor — returns page 2,
    which must equal OFFSET 20 LIMIT 20 of the total order."""
    def prep(sf=sf_dir):
        return _read(sf, "orders", columns=["o_orderkey", "o_totalprice"]).map_batches(
            _cents("o_totalprice"), batch_format="pyarrow"
        ).select_columns(["o_orderkey", "o_totalprice_c"])

    page1 = rel.cursor_page(
        prep(), "o_totalprice_c", "o_orderkey", k=20, descending=True
    ).to_pandas()
    last = page1.iloc[-1]
    cursor = (int(last["o_totalprice_c"]), int(last["o_orderkey"]))
    return rel.cursor_page(
        prep(), "o_totalprice_c", "o_orderkey", k=20, cursor=cursor, descending=True
    )


def sql_cursor_page_orders() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT o_orderkey, {c} AS o_totalprice_c FROM orders
ORDER BY o_totalprice_c DESC, o_orderkey ASC
LIMIT 20 OFFSET 20
"""


def q_left_outer_region_nations(sf_dir: str):
    """leftOuterJoin stream: regions left-joined to their nation count —
    every region appears, even with zero nations (null-safe count)."""
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    joined = rel.left_outer_join(
        region, nation, on="r_regionkey", right_on="n_regionkey"
    )

    def agg_prep(batch: pa.Table) -> pa.Table:
        has = pc.is_valid(batch["n_nationkey"]).cast(pa.int64())
        return pa.table(
            {"r_name": batch["r_name"], "has_nation": has}
        )

    out = joined.map_batches(agg_prep, batch_format="pyarrow").groupby(
        "r_name"
    ).sum("has_nation")
    return out.map_batches(
        lambda t: t.rename_columns(["r_name", "n_nations"]), batch_format="pyarrow"
    )


def sql_left_outer_region_nations() -> str:
    return """
SELECT r_name, count(n_nationkey) AS n_nations
FROM region LEFT OUTER JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
"""


def q_csv_json_loaders(sf_dir: str):
    """JSON/CSV doc loaders (SURVEY.md §2.1 JsonLoader/CSVLoader):
    round-trip the region table through CSV and JSON files and read both
    back with ray.data.read_csv / read_json — the union must contain each
    region exactly twice."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq_mod

    t = pq_mod.read_table(os.path.join(sf_dir, "region.parquet"),
                          columns=["r_regionkey", "r_name"])
    tmpdir = os.path.join("/tmp", "lsr_loader_cache",
                          hashlib.sha256(sf_dir.encode()).hexdigest()[:12])
    os.makedirs(tmpdir, exist_ok=True)
    csv_path = os.path.join(tmpdir, "region.csv")
    json_path = os.path.join(tmpdir, "region.json")
    pacsv.write_csv(t, csv_path)
    t.to_pandas().to_json(json_path, orient="records", lines=True)
    csv_ds = ray.data.read_csv(csv_path)
    json_ds = ray.data.read_json(json_path).map_batches(
        lambda b: b.select(["r_regionkey", "r_name"]).cast(
            pa.schema([("r_regionkey", pa.int64()), ("r_name", pa.string())])
        ),
        batch_format="pyarrow",
    )
    both = csv_ds.map_batches(
        lambda b: b.cast(pa.schema([("r_regionkey", pa.int64()), ("r_name", pa.string())])),
        batch_format="pyarrow",
    ).union(json_ds)
    return rel.rollup(both, ["r_regionkey", "r_name"], {"r_regionkey": ["count"]}).map_batches(
        lambda t: t.rename_columns(["r_regionkey", "r_name", "n_copies"]),
        batch_format="pyarrow",
    )


def sql_csv_json_loaders() -> str:
    return """
SELECT CAST(r_regionkey AS BIGINT) AS r_regionkey, r_name, 2::BIGINT AS n_copies
FROM region
"""


def q_xml_loader(sf_dir: str):
    """Solr XML update-payload loader (SURVEY.md §2.1 XMLLoader): the
    nation table rendered as TWO <add> payload files (XML-escaped field
    values), streamed back through read_update_xml with a typed schema —
    every nation must come back exactly once with its key intact."""
    import xml.sax.saxutils as sx

    import pyarrow.parquet as pq_mod

    from ..sources.xmlloader import read_update_xml

    t = pq_mod.read_table(os.path.join(sf_dir, "nation.parquet"),
                          columns=["n_nationkey", "n_name"])
    tmpdir = os.path.join("/tmp", "lsr_loader_cache",
                          hashlib.sha256(sf_dir.encode()).hexdigest()[:12])
    os.makedirs(tmpdir, exist_ok=True)
    rows = list(zip(t["n_nationkey"].to_pylist(), t["n_name"].to_pylist()))
    paths = []
    for part in range(2):
        chunk = rows[part::2]
        body = "".join(
            f'<doc><field name="n_nationkey">{k}</field>'
            f'<field name="n_name">{sx.escape(v)}</field></doc>'
            for k, v in chunk
        )
        p = os.path.join(tmpdir, f"nation-{part}.xml")
        with open(p, "w") as f:
            f.write(f"<add>{body}</add>")
        paths.append(p)
    ds = read_update_xml(
        paths,
        schema=pa.schema([("n_nationkey", pa.int64()), ("n_name", pa.string())]),
    )
    return rel.rollup(ds, ["n_nationkey", "n_name"], {"n_nationkey": ["count"]}).map_batches(
        lambda t: t.rename_columns(["n_nationkey", "n_name", "n_copies"]),
        batch_format="pyarrow",
    )


def sql_xml_loader() -> str:
    return """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, 1::BIGINT AS n_copies
FROM nation
"""


def q_realtime_get(sf_dir: str):
    """realtime get (SURVEY.md §2.10 RealTimeGetComponent): point lookups
    of fixed urls against the live index — returns (doc_id, dl); dl must
    equal the token count of the doc's text."""
    from .query import realtime_get

    idx = ensure_ft_index(sf_dir)
    urls = [f"doc://{i:012d}" for i in (0, 7, 123, 456)]
    res = realtime_get(idx, urls)
    return pd.DataFrame(
        {
            "doc_id": _url_to_doc_id(res["url"]),
            "dl": res["dl"].astype(np.int64),
        }
    )


def sql_realtime_get() -> str:
    return """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
FROM documents WHERE doc_id IN (0, 7, 123, 456)
"""




def q_urp_chain(sf_dir: str):
    """UpdateRequestProcessor chain (SURVEY.md §2.2/§2.11, stages/urp.py):
    a declarative named-stage pipeline — regex_replace → trim →
    min_token_filter → field_length — applied as chained vectorized
    map_batches stages over the documents table."""
    from ..stages.urp import build_stage_chain

    spec = [
        {"name": "regex_replace", "col": "text", "pattern": "data", "replacement": "info"},
        {"name": "trim", "col": "text"},
        {"name": "min_token_filter", "col": "text", "min_tokens": 50},
        {"name": "field_length", "col": "text", "dst": "text_chars"},
    ]
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    for fn in build_stage_chain(spec):
        ds = ds.map_batches(fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_chars"])


def sql_urp_chain() -> str:
    return """
WITH x AS (
  SELECT doc_id, trim(regexp_replace(text, 'data', 'info', 'g')) AS t FROM documents
)
SELECT doc_id, CAST(length(t) AS BIGINT) AS text_chars FROM x
WHERE len(string_split_regex(t, '\\s+')) >= 50
"""




def q_function_registry(sf_dir: str):
    """ValueSourceParser registry breadth (SURVEY.md §2.9): a nested
    function-query tree — if/gt conditionals, clamp via min/max, recip,
    log, linear, strdist — compiled once (functions/scalars.py) and
    evaluated vectorized per batch; first 15 orders by key."""
    from ..functions.scalars import compile_value_source

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
    specs = {
        "clamp_e2": ["min", ["max", "o_totalprice", 50000], 200000],
        "urgent_bonus_e2": ["if", ["gt", "o_totalprice", 100000],
                            ["linear", "o_totalprice", 1.1, 0], "o_totalprice"],
        "log_recip_e6": ["sum", ["log", "o_totalprice"],
                         ["recip", "o_orderkey", 1, 1000, 1000]],
        "prio_sim_e6": ["strdist", "o_orderpriority", "1-URGENT", "levenshtein"],
    }
    fns = {name: compile_value_source(s) for name, s in specs.items()}

    def ev(batch: pa.Table) -> pa.Table:
        out = {"o_orderkey": batch["o_orderkey"]}
        for name, fn in fns.items():
            scalepow = 100.0 if name.endswith("_e2") else 1e6
            out[name] = pa.array(
                np.floor(fn(batch) * scalepow + 0.5).astype(np.int64)
            )
        return pa.table(out)

    return orders.map_batches(ev, batch_format="pyarrow").sort("o_orderkey").limit(15)


def sql_function_registry() -> str:
    return """
SELECT o_orderkey,
       CAST(floor(least(greatest(o_totalprice, 50000), 200000) * 100.0 + 0.5) AS BIGINT)
         AS clamp_e2,
       CAST(floor((CASE WHEN o_totalprice > 100000
                        THEN 1.1 * o_totalprice ELSE o_totalprice END) * 100.0 + 0.5) AS BIGINT)
         AS urgent_bonus_e2,
       CAST(floor((log10(o_totalprice) + 1000.0 / (o_orderkey + 1000)) * 1000000 + 0.5) AS BIGINT)
         AS log_recip_e6,
       CAST(floor((1.0 - levenshtein(o_orderpriority, '1-URGENT')
                         / CAST(greatest(length(o_orderpriority), 8) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
         AS prio_sim_e6
FROM orders ORDER BY o_orderkey LIMIT 15
"""


def q_executor_stream_orders(sf_dir: str):
    """executor() stream analog (SURVEY.md §2.8; [8x] solr/solrj/.../io/
    stream/ExecutorStream.java): five stored JSON table expressions — one
    per order priority, each a pushdown count+sum-cents job — executed in
    parallel by an actor pool (one worker slot per stored expression, the
    Solr thread-pool shape); results stream back tagged expr_id. Solr
    discards inner results; streaming them back is the documented
    extension that makes the operator oracle-checkable."""
    import json as _json

    import ray.data

    from ..functions.streams import executor_stream

    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    meta = ray.data.from_items([
        {"id": i, "expr_s": _json.dumps({
            "table": "orders",
            "where": [["o_orderpriority", "==", p]],
            "aggs": {"n": ["count"],
                     "sum_price_c": ["sum_cents", "o_totalprice"],
                     "max_price_c": ["max_cents", "o_totalprice"]},
        })} for i, p in enumerate(prios)
    ])
    return executor_stream(meta, sf_dir, concurrency=4).sort("expr_id")


def sql_executor_stream_orders() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    parts = [
        f"""SELECT CAST({i} AS BIGINT) AS expr_id, count(*) AS n,
       CAST(sum({c}) AS BIGINT) AS sum_price_c,
       max({c}) AS max_price_c
FROM orders WHERE o_orderpriority = '{p}'"""
        for i, p in enumerate(prios)
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY expr_id"


def q_eval_stream_orders(sf_dir: str):
    """eval() stream analog (SURVEY.md §2.8; [8x] .../io/stream/
    EvalStream.java): the FIRST tuple of the underlying stream carries a
    JSON table expression in expr_s; eval compiles it and emits ITS
    tuples through the full Dataset engine (streaming groupby over
    integer cents, map-side filter, pruned read)."""
    import json as _json

    import ray.data

    from ..functions.streams import eval_stream

    meta = ray.data.from_items([{"expr_s": _json.dumps({
        "table": "orders",
        "where": [["o_totalprice", ">", 150000.0]],
        "groupby": ["o_orderstatus", "o_orderpriority"],
        "aggs": {"n": ["count"],
                 "sum_price_c": ["sum_cents", "o_totalprice"]},
        "sort": [["o_orderstatus", "asc"], ["o_orderpriority", "asc"]],
    })}])
    return eval_stream(meta, sf_dir)


def sql_eval_stream_orders() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum({c}) AS BIGINT) AS sum_price_c
FROM orders WHERE o_totalprice > 150000.0
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_stream_evaluators_docs(sf_dir: str):
    """Stream evaluators (SURVEY.md §2.9 registry 2; [8x] solr/solrj/...
    /io/eval/ — Analyze/Length/ValueAt/Asc/Desc/Rev evaluators): one
    vectorized select() computing evaluator trees per tuple — analyze()
    runs the real analyzer chain (once per unique token), asc/desc sort
    each list with ONE global lexsort, valueAt is an offsets gather."""
    from ..functions.evaluators import select_with_evaluators

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks = ["analyze", "text", {"filters": ["lowercase"]}]
    out = select_with_evaluators(docs, {
        "n_tokens": ["length", toks],
        "first_tok": ["valueAt", ["asc", toks], 0],
        "last_tok": ["valueAt", ["desc", toks], 0],
        "rev_first": ["valueAt", ["rev", toks], 0],
    }, keep=["doc_id"])
    return out.sort("doc_id")


def sql_stream_evaluators_docs() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         string_split(lower(text), ' ') AS raw,
         list_sort(string_split(lower(text), ' ')) AS toks
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       toks[1] AS first_tok,
       toks[len(toks)] AS last_tok,
       raw[len(raw)] AS rev_first
FROM t ORDER BY doc_id
"""


def q_stream_evaluators_ts(sf_dir: str):
    """Time-series / vector stream evaluators (SURVEY.md §2.9 registry 2;
    [8x] solr/solrj/.../io/eval/ MovingAverage / MovingMedian / Normalize
    ("zscores") / Covariance ("cov") / DotProduct / CosineSimilarity /
    EuclideanDistance ("distance") evaluators, branch_8x): per-order
    4-element INTEGER vectors (distinct offsets keep variance > 0, the
    oracle-parity float convention — exact sums → one correctly rounded
    sqrt/divide, then floor-e6 on both sides)."""
    from ..functions.evaluators import select_with_evaluators

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def prep(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch["o_orderkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = pc.cast(batch["o_custkey"], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "o_orderkey": pa.array(k),
            "va": pa.array((k % 97).astype(np.float64)),
            "vb": pa.array((c % 89 + 100).astype(np.float64)),
            "vc": pa.array((k % 7 + 200).astype(np.float64)),
            "vd": pa.array(((k + c) % 83 + 300).astype(np.float64)),
        })

    x = ["array", "va", "vb", "vc", "vd"]
    y = ["array", "vd", "vc", "vb", "va"]
    out = select_with_evaluators(orders.map_batches(
        prep, batch_format="pyarrow"), {
        "mavg2": ["valueAt", ["movingAvg", x, 2], 1],
        "mmed3": ["valueAt", ["movingMedian", x, 3], 0],
        "z0": ["valueAt", ["zscores", x], 0],
        "cov_xy": ["cov", x, y],
        "dot_xy": ["dotProduct", x, y],
        "cos_xy": ["cosineSimilarity", x, y],
        "dist_xy": ["distance", x, y],
    }, keep=["o_orderkey"])

    def e6(batch: pa.Table) -> pa.Table:
        cols = {"o_orderkey": batch["o_orderkey"]}
        for name in ("mavg2", "mmed3", "z0", "cov_xy", "dot_xy",
                     "cos_xy", "dist_xy"):
            v = batch[name].to_numpy(zero_copy_only=False)
            cols[f"{name}_e6"] = pa.array(
                np.floor(v * 1e6).astype(np.int64))
        return pa.table(cols)

    return out.map_batches(e6, batch_format="pyarrow").sort("o_orderkey")


def sql_stream_evaluators_ts() -> str:
    # identical float64 op ORDER as the evaluator kernels: integer sums
    # are exact, so mean/var/sqrt/divide round identically bit-for-bit
    return """
WITH v AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 97 AS DOUBLE)                 AS a,
         CAST(o_custkey % 89 + 100 AS DOUBLE)            AS b,
         CAST(o_orderkey % 7 + 200 AS DOUBLE)            AS c,
         CAST((o_orderkey + o_custkey) % 83 + 300 AS DOUBLE) AS d
  FROM orders
),
s AS (
  SELECT o_orderkey, a, b, c, d,
         a + b + c + d                                   AS sx,
         a*a + b*b + c*c + d*d                           AS sxx,
         d + c + b + a                                   AS sy,
         d*d + c*c + b*b + a*a                           AS syy,
         a*d + b*c + c*b + d*a                           AS sxy
  FROM v
)
SELECT o_orderkey,
       CAST(floor(((b + c) / 2.0) * 1000000) AS BIGINT)  AS mavg2_e6,
       CAST(floor((a + b + c - greatest(a, b, c) - least(a, b, c))
                  * 1000000) AS BIGINT)                  AS mmed3_e6,
       CAST(floor(((a - sx / 4.0)
                   / sqrt((sxx - sx * sx / 4.0) / 3.0)) * 1000000)
            AS BIGINT)                                   AS z0_e6,
       CAST(floor(((sxy - sx * sy / 4.0) / 3.0) * 1000000)
            AS BIGINT)                                   AS cov_xy_e6,
       CAST(floor(sxy * 1000000) AS BIGINT)              AS dot_xy_e6,
       CAST(floor((sxy / (sqrt(sxx) * sqrt(syy))) * 1000000)
            AS BIGINT)                                   AS cos_xy_e6,
       CAST(floor(sqrt((a-d)*(a-d) + (b-c)*(b-c) + (c-b)*(c-b)
                       + (d-a)*(d-a)) * 1000000) AS BIGINT)
                                                         AS dist_xy_e6
FROM s ORDER BY o_orderkey
"""


def q_function_string_pack(sf_dir: str):
    """String/ordinal value sources (SURVEY.md §2.9: ValueSourceParser
    "concat" → ConcatStringFunction, "ord"/"rord" → OrdFieldSource/
    ReverseOrdFieldSource, strdist levenshtein — branch_8x): concat is a
    string-valued source; ord/rord need the field's global sorted value
    dictionary (two-pass, the field-cache analog — gathered here with one
    tiny distinct aggregate and passed via stats, never reshuffled)."""
    from ..functions.scalars import compile_value_source

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    segs = sorted(cust.unique("c_mktsegment"))
    stats = {"ord_c_mktsegment": segs}
    f_cat = compile_value_source(["concat", "seg:", "c_mktsegment"])
    f_ord = compile_value_source(["ord", "c_mktsegment"], stats)
    f_rord = compile_value_source(["rord", "c_mktsegment"], stats)
    f_sim = compile_value_source(
        ["strdist", "c_mktsegment", "AUTOMOBILE", "levenshtein"])

    def ev(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(pc.cast(batch["c_custkey"], pa.int64()), 40)
        batch = batch.filter(keep)
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "cat": pa.array(list(f_cat(batch)), type=pa.string()),
            "ord_seg": pa.array(f_ord(batch).astype(np.int64)),
            "rord_seg": pa.array(f_rord(batch).astype(np.int64)),
            "sim_e6": pa.array(
                np.floor(f_sim(batch) * 1e6 + 0.5).astype(np.int64)),
        })

    return cust.map_batches(ev, batch_format="pyarrow").sort("c_custkey")


def sql_function_string_pack() -> str:
    return """
WITH u AS (SELECT DISTINCT c_mktsegment FROM customer),
o AS (SELECT c_mktsegment,
             CAST(dense_rank() OVER (ORDER BY c_mktsegment) AS BIGINT) AS ord_seg,
             CAST(count(*) OVER ()
                  - dense_rank() OVER (ORDER BY c_mktsegment) + 1 AS BIGINT) AS rord_seg
      FROM u)
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey,
       'seg:' || c.c_mktsegment AS cat,
       o.ord_seg, o.rord_seg,
       CAST(floor((1.0 - CAST(levenshtein(c.c_mktsegment, 'AUTOMOBILE') AS DOUBLE)
                         / greatest(length(c.c_mktsegment), 10)) * 1000000 + 0.5) AS BIGINT)
         AS sim_e6
FROM customer c JOIN o USING (c_mktsegment)
WHERE c.c_custkey <= 40 ORDER BY c_custkey
"""


def q_function_geodist(sf_dir: str):
    """geodist()/dist() value sources (SURVEY.md §2.9; ValueSourceParser
    "geodist" → HaversineFunction, "dist" → VectorDistanceFunction):
    deterministic per-customer lat/lon derived from keys, haversine km to
    Paris plus manhattan distance in coordinate space, both on the e3
    integer grid; 20 nearest by (geodist_e3, c_custkey)."""
    from ..functions.scalars import compile_value_source

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    lat = ["sub", ["div", ["mod", "c_custkey", 17000], 100.0], 85.0]
    lon = ["sub", ["div", ["mod", ["sum", ["product", "c_custkey", 7],
                                   "c_nationkey"], 36000], 100.0], 180.0]
    f_geo = compile_value_source(["geodist", lat, lon, 48.8566, 2.3522])
    f_man = compile_value_source(["dist", 1, lat, lon, 48.8566, 2.3522])

    def ev(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": batch["c_custkey"],
            "geodist_e3": pa.array(
                np.floor(f_geo(batch) * 1e3 + 0.5).astype(np.int64)),
            "manhattan_e3": pa.array(
                np.floor(f_man(batch) * 1e3 + 0.5).astype(np.int64)),
        })

    return (cust.map_batches(ev, batch_format="pyarrow")
            .sort(["geodist_e3", "c_custkey"]).limit(20))


def sql_function_geodist() -> str:
    return """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 17000) / 100.0 - 85.0 AS lat,
         ((c_custkey * 7 + c_nationkey) % 36000) / 100.0 - 180.0 AS lon
  FROM customer
), d AS (
  SELECT c_custkey,
         2.0 * 6371.0087714 * asin(sqrt(least(
             -- op order mirrors the engine exactly (radians per arg, THEN
             -- subtract): radians(a-b) differs from radians(a)-radians(b)
             -- in the last ulp and asin amplifies near the antipode
             sin((radians(48.8566) - radians(lat)) * 0.5)
               * sin((radians(48.8566) - radians(lat)) * 0.5)
             + cos(radians(lat)) * cos(radians(48.8566))
               * sin((radians(2.3522) - radians(lon)) * 0.5)
               * sin((radians(2.3522) - radians(lon)) * 0.5),
             1.0))) AS geo,
         abs(lat - 48.8566) + abs(lon - 2.3522) AS man
  FROM pts
)
SELECT c_custkey,
       CAST(floor(geo * 1000.0 + 0.5) AS BIGINT) AS geodist_e3,
       CAST(floor(man * 1000.0 + 0.5) AS BIGINT) AS manhattan_e3
FROM d ORDER BY geodist_e3, c_custkey LIMIT 20
"""


def q_geofilt_customers(sf_dir: str):
    """{!geofilt} spatial filter (reference: solr/core/.../search/
    SpatialFilterQParserPlugin.java + LatLonType#createSpatialQuery,
    branch_8x; SURVEY.md §2.9 spatial value sources): customers within
    d=3000 km of Paris — lat/lon derived from a Knuth-scrambled key so
    points cover the globe at EVERY scale (the raw-key derivation
    collapses small tables onto one latitude band), filtered ON THE E3
    INTEGER GRID (both sides — a raw float cutoff could flake in the
    last ulp), then count + nearest per nation."""
    from ray.data.aggregate import Count, Min

    from ..functions.scalars import compile_value_source

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    f_geo = compile_value_source(["geodist", "lat", "lon", 48.8566, 2.3522])

    def ev(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy().astype(np.int64)
        nk = batch["c_nationkey"].to_numpy().astype(np.int64)
        k2 = (ck * 2654435761) % 4294967296
        ll = pa.table({
            "lat": (k2 % 17000) / 100.0 - 85.0,
            "lon": ((k2 // 7 + nk) % 36000) / 100.0 - 180.0,
        })
        e3 = np.floor(f_geo(ll) * 1e3 + 0.5).astype(np.int64)
        keep = e3 <= 3_000_000
        return pa.table({
            "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()).filter(
                pa.array(keep)),
            "geodist_e3": pa.array(e3[keep]),
        })

    agg = (
        cust.map_batches(ev, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count("geodist_e3", ignore_nulls=False), Min("geodist_e3"))
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": batch["c_nationkey"],
            "n_within": pc.cast(batch["count(geodist_e3)"], pa.int64()),
            "nearest_e3": batch["min(geodist_e3)"],
        })

    return agg.map_batches(rename, batch_format="pyarrow")


import math as _math

_BBOX_LAT0, _BBOX_LON0, _BBOX_D_KM = 48.8566, 2.3522, 2000.0
_BBOX_R = 6371.0087714
_BBOX_DLAT = _math.degrees(_BBOX_D_KM / _BBOX_R)
_BBOX_DLON = _math.degrees(
    _BBOX_D_KM / (_BBOX_R * _math.cos(_math.radians(_BBOX_LAT0))))
_BBOX = (_BBOX_LAT0 - _BBOX_DLAT, _BBOX_LAT0 + _BBOX_DLAT,
         _BBOX_LON0 - _BBOX_DLON, _BBOX_LON0 + _BBOX_DLON)


def q_bbox_customers(sf_dir: str):
    """{!bbox} spatial filter (reference: solr/core/.../search/
    SpatialBoxQParserPlugin.java + LatLonType bbox path, branch_8x): the
    rectangle around (Paris, d=2000 km). The box edges are computed ONCE
    in Python and the SAME float64 literals are inlined into the SQL
    oracle, so the filter is ulp-identical by construction (no trig runs
    in either engine at query time); per-nation count + min lat on the
    integer e6 grid."""
    from ray.data.aggregate import Count, Min

    lo_lat, hi_lat, lo_lon, hi_lon = _BBOX
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def ev(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy().astype(np.int64)
        nk = batch["c_nationkey"].to_numpy().astype(np.int64)
        k2 = (ck * 2654435761) % 4294967296
        lat = (k2 % 17000) / 100.0 - 85.0
        lon = ((k2 // 7 + nk) % 36000) / 100.0 - 180.0
        keep = ((lat >= lo_lat) & (lat <= hi_lat)
                & (lon >= lo_lon) & (lon <= hi_lon))
        lat_e6 = np.floor(lat[keep] * 1e6 + 0.5).astype(np.int64)
        return pa.table({
            "c_nationkey": pa.array(nk[keep]),
            "lat_e6": pa.array(lat_e6),
        })

    agg = (
        cust.map_batches(ev, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count("lat_e6", ignore_nulls=False), Min("lat_e6"))
    )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64()),
            "n_in_box": pc.cast(batch["count(lat_e6)"], pa.int64()),
            "min_lat_e6": pc.cast(batch["min(lat_e6)"], pa.int64()),
        })

    return agg.map_batches(out, batch_format="pyarrow").sort("c_nationkey")


def sql_bbox_customers() -> str:
    lo_lat, hi_lat, lo_lon, hi_lon = (repr(v) for v in _BBOX)
    return f"""
WITH k AS (
  SELECT c_nationkey, ((c_custkey * 2654435761) % 4294967296) AS k2
  FROM customer
), pts AS (
  SELECT c_nationkey,
         (k2 % 17000) / 100.0 - 85.0 AS lat,
         ((k2 // 7 + c_nationkey) % 36000) / 100.0 - 180.0 AS lon
  FROM k
), inbox AS (
  SELECT c_nationkey,
         CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS lat_e6
  FROM pts
  WHERE lat >= {lo_lat} AND lat <= {hi_lat}
    AND lon >= {lo_lon} AND lon <= {hi_lon}
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(count(*) AS BIGINT) AS n_in_box,
       CAST(min(lat_e6) AS BIGINT) AS min_lat_e6
FROM inbox GROUP BY c_nationkey ORDER BY c_nationkey
"""


def sql_geofilt_customers() -> str:
    return """
WITH k AS (
  SELECT c_nationkey, ((c_custkey * 2654435761) % 4294967296) AS k2
  FROM customer
), pts AS (
  SELECT c_nationkey,
         (k2 % 17000) / 100.0 - 85.0 AS lat,
         ((k2 // 7 + c_nationkey) % 36000) / 100.0 - 180.0 AS lon
  FROM k
), d AS (
  SELECT c_nationkey,
         CAST(floor(2.0 * 6371.0087714 * asin(sqrt(least(
             sin((radians(48.8566) - radians(lat)) * 0.5)
               * sin((radians(48.8566) - radians(lat)) * 0.5)
             + cos(radians(lat)) * cos(radians(48.8566))
               * sin((radians(2.3522) - radians(lon)) * 0.5)
               * sin((radians(2.3522) - radians(lon)) * 0.5),
             1.0))) * 1000.0 + 0.5) AS BIGINT) AS geodist_e3
  FROM pts
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS n_within, min(geodist_e3) AS nearest_e3
FROM d WHERE geodist_e3 <= 3000000 GROUP BY 1
"""


def q_score_join_customers(sf_dir: str):
    """Score join (SURVEY.md §2.5 JoinUtil, ScoreMode.Max): customers
    joined to the MAX totalprice (cents) of their orders — per-key score
    aggregation + hash join, the global-ordinal map re-expressed."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
        _cents("o_totalprice"), batch_format="pyarrow"
    ).select_columns(["o_custkey", "o_totalprice_c"])
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    out = rel.score_join(
        orders, cust, from_key="o_custkey", to_key="c_custkey",
        score_col="o_totalprice_c", mode="max",
    )
    return out.select_columns(["c_custkey", "max_o_totalprice_c"])


def sql_score_join_customers() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT c_custkey, CAST(max({c}) AS BIGINT) AS max_o_totalprice_c
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_block_join_orders(sf_dir: str):
    """Block join to parents (SURVEY.md §2.5 ToParentBlockJoinQuery):
    orders (parents) with ≥1 lineitem (child) of quantity ≥ 45, scored by
    the max child quantity — parent-key co-location replaces Lucene's
    index-contiguous doc blocks."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.append_column(
            "l_quantity_i", pc.cast(pc.round(t["l_quantity"]), pa.int64())
        ),
        batch_format="pyarrow",
    ).select_columns(["l_orderkey", "l_quantity_i"])
    out = rel.block_join_parents(
        li, "l_orderkey",
        parent_pred_fn=lambda t: pc.greater_equal(t["l_quantity_i"], 45),
        score_col="l_quantity_i", mode="max",
    )
    return out.select_columns(["l_orderkey", "max_l_quantity_i"])


def sql_block_join_orders() -> str:
    return """
SELECT l_orderkey,
       CAST(max(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS max_l_quantity_i
FROM lineitem
WHERE CAST(round(l_quantity) AS BIGINT) >= 45
GROUP BY l_orderkey
"""


def q_child_docs_orders(sf_dir: str):
    """[child] ChildDocTransformer (SURVEY.md §2.2 document transformers;
    reference solr/core/.../transform/ChildDocTransformerFactory.java,
    branch_8x): every order returns flattened with its top-2 matching
    children (childFilter quantity ≥ 49), children ranked by
    (extendedprice desc, linenumber asc) — the deterministic stand-in
    for Solr's index order, limit=2."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice"],
    ).map_batches(
        lambda t: t.append_column(
            "l_quantity_i", pc.cast(pc.round(t["l_quantity"]), pa.int64())
        ).append_column(
            "l_extendedprice_c",
            pc.cast(pc.floor(pc.add(pc.multiply(
                t["l_extendedprice"], 100.0), 0.5)), pa.int64()),
        ),
        batch_format="pyarrow",
    ).select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity_i", "l_extendedprice_c"])
    out = rel.child_doc_transform(
        orders, li, parent_key="o_orderkey", child_parent_key="l_orderkey",
        child_filter_fn=lambda t: pc.greater_equal(t["l_quantity_i"], 49),
        child_order=["l_extendedprice_c", "l_linenumber"],
        descending=[True, False], limit=2,
    )
    return out.select_columns(
        ["o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity_i",
         "l_extendedprice_c"]
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("l_linenumber"), "l_linenumber",
            pc.cast(t["l_linenumber"], pa.int64())),
        batch_format="pyarrow",
    )


def sql_child_docs_orders() -> str:
    return """
WITH ch AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(round(l_quantity) AS BIGINT) AS l_quantity_i,
         CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           AS l_extendedprice_c,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                      DESC,
                    l_linenumber ASC) AS rn
  FROM lineitem
  WHERE CAST(round(l_quantity) AS BIGINT) >= 49
)
SELECT o.o_orderkey, o.o_orderstatus,
       c.l_linenumber, c.l_quantity_i, c.l_extendedprice_c
FROM orders o JOIN ch c ON c.l_orderkey = o.o_orderkey
WHERE c.rn <= 2
"""


GRAPH_START_PART = 1


def q_graph_2hop_parts(sf_dir: str):
    """{!graph} traversal (SURVEY.md §2.5 GraphQuery): parts within 2 hops
    of part 1 on the bipartite lineitem graph (part→order→part) —
    iterative distributed semi-joins; the frontier never leaves the
    cluster. Node ids are namespaced ('p:'/'o:') so the two key spaces
    can't collide."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ns(batch: pa.Table) -> pa.Table:
        # Namespace in the low bit: parts are even, orders odd — keys stay
        # int64 so every hop's shuffle moves fixed-width ints, not strings.
        o = batch["l_orderkey"].to_numpy().astype(np.int64) * 2 + 1
        p = batch["l_partkey"].to_numpy().astype(np.int64) * 2
        return pa.table({
            "src": pa.array(np.concatenate([p, o])),
            "dst": pa.array(np.concatenate([o, p])),
        })

    edges_ds = li.map_batches(ns, batch_format="pyarrow").materialize()

    reach = rel.graph_traverse(
        lambda: edges_ds, "src", "dst", [GRAPH_START_PART * 2], max_hops=2
    )

    def parts_only(batch: pa.Table) -> pa.Table:
        d = batch["dst"].to_numpy()
        return pa.table({"partkey": pa.array(d[d % 2 == 0] // 2)})

    return reach.map_batches(parts_only, batch_format="pyarrow")


def sql_graph_2hop_parts() -> str:
    return f"""
SELECT DISTINCT l2.l_partkey AS partkey
FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
WHERE l1.l_partkey = {GRAPH_START_PART}
"""




def q_ann_ivf_recall(sf_dir: str):
    """IVF-flat ANN vs brute force: per-query recall@5 (×100) — the
    data-adaptive coarse-quantizer scale path beside the LSH variant
    (task-brief "IVF or LSH-bucketed variant"); approximate by
    construction, rows-only check."""
    from ..functions.ann import ivf_cosine_topk

    Q, qids = _query_matrix(sf_dir)
    ref = ray.put(Q)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bf = brute_force_cosine_topk(ds, ref, qids, k=5).to_pandas()
    ds2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    approx = ivf_cosine_topk(ds2, ref, qids, k=5, n_centroids=16, nprobe=8).to_pandas()
    rows = []
    for q in qids:
        truth = set(bf[bf.query_id == q].vec_id)
        got = set(approx[approx.query_id == q].vec_id)
        rows.append(
            {"query_id": int(q), "recall_x100": int(100 * len(truth & got) / max(len(truth), 1))}
        )
    return pd.DataFrame(rows).astype(np.int64)


def q_dedup_embed(sf_dir: str):
    """Embedding-cosine near-duplicate removal (exact kernel): keep every
    vector with no smaller-id neighbor at cosine >= 0.35 — the min-id
    survivor convention shared by dedup_exact/minhash. Runs the DISTRIBUTED
    block-pair sweep (object-store blocks + per-pair matmul tasks + anti
    join; no driver-side corpus materialization); the LSH-bucketed scale
    variant is recall-gated in ``dedup_embed_lsh_recall``."""
    from ..functions.dedup import embedding_neardup_remove

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    kept = embedding_neardup_remove(ds, threshold=0.35)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": batch["vec_id"].cast(pa.int64()),
                "label": batch["label"].cast(pa.int64()),
            }
        )

    return kept.map_batches(finalize, batch_format="pyarrow")


def sql_dedup_embed() -> str:
    return """
WITH rm AS (
  SELECT DISTINCT b.vec_id
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label
FROM embeddings e
WHERE e.vec_id NOT IN (SELECT vec_id FROM rm)
"""


def q_dedup_embed_lsh_recall(sf_dir: str):
    """LSH-bucketed embedding near-dup vs the exact kernel: the sf
    embeddings carry no true near-duplicates (max pairwise cosine ~0.6),
    so plant them deterministically — one slightly-perturbed copy of each
    of the first 40 vectors (cosine ~0.99 to its source, new ids above the
    id space) — then remove at threshold 0.95 with both paths and report
    removed-set recall. Approximate by construction: rows-only check,
    gated by the pytest accuracy assertion like ann_lsh/ivf_recall."""
    import pyarrow.parquet as pq_mod

    from ..functions.ann import decode_fixed_dim
    from ..functions.dedup import embedding_neardup_lsh_pairs, embedding_neardup_remove

    t = pq_mod.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    X = decode_fixed_dim(t["embedding"].combine_chunks())
    norms = np.linalg.norm(X, axis=1)
    norms[norms == 0] = 1.0
    Xn = X / norms[:, None]
    n_plant = min(40, len(ids))
    rng = np.random.default_rng(7)
    src = np.argsort(ids)[:n_plant]
    # per-dim noise 0.02 over 64 dims → |noise| ≈ 0.16 → cosine ≈ 0.987
    # to the source: safely above the 0.95 removal threshold
    dup = Xn[src] + 0.02 * rng.standard_normal((n_plant, X.shape[1]))
    dup_ids = ids.max() + 1 + np.arange(n_plant, dtype=np.int64)
    all_ids = np.concatenate([ids, dup_ids])
    all_vecs = np.concatenate([Xn, dup]).astype(np.float32)
    d = all_vecs.shape[1]
    off = np.arange(len(all_ids) + 1, dtype=np.int64) * d
    tab = pa.table(
        {
            "vec_id": pa.array(all_ids),
            "embedding": pa.LargeListArray.from_arrays(
                pa.array(off), pa.array(all_vecs.reshape(-1))
            ),
        }
    )
    ds = ray.data.from_arrow(tab)
    kept_exact = set(
        embedding_neardup_remove(ds, threshold=0.95).to_pandas()["vec_id"]
    )
    removed_exact = set(all_ids.tolist()) - kept_exact
    pairs = embedding_neardup_lsh_pairs(
        ray.data.from_arrow(tab), threshold=0.95, dim=d
    ).to_pandas()
    removed_lsh = set(pairs["b"].tolist()) if "b" in pairs.columns else set()
    inter = removed_exact & removed_lsh
    return pd.DataFrame(
        {
            "n_total": [len(all_ids)],
            "n_removed_exact": [len(removed_exact)],
            "n_removed_lsh": [len(removed_lsh)],
            "recall_x100": [int(100 * len(inter) / max(len(removed_exact), 1))],
        }
    ).astype(np.int64)


SUGGEST_PREFIXES = ["d", "jo", "s"]


def q_suggest_terms(sf_dir: str) -> pd.DataFrame:
    """Prefix suggester over the index's global term stats (TermsComponent
    / SuggestComponent analog, SURVEY.md §2 suggester row; reference:
    solr/core/.../component/TermsComponent.java, branch_8x). The
    dictionary IS the distributed stats table; lookups push the prefix
    range into read_parquet and merge per-block top-k."""
    from ..search.suggest import suggest

    idx = ensure_ft_index(sf_dir)
    res = suggest(idx, SUGGEST_PREFIXES, k=5, weight="total_tf")
    return res.astype(
        {"rank": np.int64, "df": np.int64, "total_tf": np.int64}
    )


def sql_suggest_terms() -> str:
    pfx = ",".join(f"('{p}')" for p in SUGGEST_PREFIXES)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
ts AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
  FROM toks GROUP BY term
),
pfx(prefix) AS (VALUES {pfx}),
ranked AS (
  SELECT pfx.prefix, ts.term, ts.df, ts.total_tf,
         row_number() OVER (
           PARTITION BY pfx.prefix
           ORDER BY ts.total_tf DESC, ts.term ASC
         ) AS rank
  FROM pfx JOIN ts ON ts.term LIKE pfx.prefix || '%'
)
SELECT prefix, rank, term, df, total_tf FROM ranked
WHERE rank <= 5 ORDER BY prefix, rank
"""


TERMS_REGEX_PATTERN = "qu.*|.*oin|s.an"


def q_terms_regex_list(sf_dir: str) -> pd.DataFrame:
    """TermsComponent terms.regex (reference: solr/core/.../component/
    TermsComponent.java, branch_8x): vocabulary terms fully matching the
    pattern, terms.sort=count (df desc, term asc), limit 10 — one RE2
    streaming pass over the distributed stats dictionary."""
    from ..search.suggest import terms_regex

    idx = ensure_ft_index(sf_dir)
    res = terms_regex(idx, TERMS_REGEX_PATTERN, limit=10, sort="count")
    return res.astype({"rank": np.int64, "df": np.int64,
                       "total_tf": np.int64})


def sql_terms_regex_list() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
ts AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
  FROM toks GROUP BY term
),
m AS (
  SELECT term, df, total_tf,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rank
  FROM ts WHERE regexp_full_match(term, '(?:{TERMS_REGEX_PATTERN})')
)
SELECT rank, term, df, total_tf FROM m WHERE rank <= 10 ORDER BY rank
"""


INFIX_LOOKUPS = ["oin", "dow", "ue"]


def q_suggest_infix_terms(sf_dir: str) -> pd.DataFrame:
    """Infix suggester (AnalyzingInfixSuggester analog, reference:
    lucene/suggest/.../analyzing/AnalyzingInfixSuggester.java, branch_8x):
    the lookup matches ANYWHERE in the dictionary term. No range pushdown
    exists for a substring, so the distributed stats table is scanned
    once with the match_substring C kernel; per-block top-k then a tiny
    driver merge, exactly like the prefix path."""
    from ..search.suggest import suggest

    idx = ensure_ft_index(sf_dir)
    res = suggest(idx, INFIX_LOOKUPS, k=5, weight="total_tf", match="infix")
    return res.astype(
        {"rank": np.int64, "df": np.int64, "total_tf": np.int64}
    )


def sql_suggest_infix_terms() -> str:
    pfx = ",".join(f"('{p}')" for p in INFIX_LOOKUPS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
ts AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS total_tf
  FROM toks GROUP BY term
),
pfx(prefix) AS (VALUES {pfx}),
ranked AS (
  SELECT pfx.prefix, ts.term, ts.df, ts.total_tf,
         row_number() OVER (
           PARTITION BY pfx.prefix
           ORDER BY ts.total_tf DESC, ts.term ASC
         ) AS rank
  FROM pfx JOIN ts ON instr(ts.term, pfx.prefix) > 0
)
SELECT prefix, rank, term, df, total_tf FROM ranked
WHERE rank <= 5 ORDER BY prefix, rank
"""


SPELL_INPUTS = ["quary", "joyn", "windoe"]


def q_spellcheck_terms(sf_dir: str) -> pd.DataFrame:
    """DirectSpellChecker analog over the index vocabulary (reference:
    lucene/suggest/.../spell/DirectSpellChecker.java, branch_8x): edit
    distance ≤ 2, first letter pinned (prefix_len=1), ranked
    (distance asc, df desc, term asc)."""
    from ..search.spellcheck import spellcheck

    idx = ensure_ft_index(sf_dir)
    res = spellcheck(idx, SPELL_INPUTS, max_edits=2, topn=3, prefix_len=1)
    return res.astype({"rank": np.int64, "distance": np.int64, "df": np.int64})


def sql_spellcheck_terms() -> str:
    vals = ",".join(f"('{t}')" for t in SPELL_INPUTS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
inp(input) AS (VALUES {vals}),
cand AS (
  SELECT inp.input, vocab.term AS suggestion,
         levenshtein(vocab.term, inp.input) AS distance, vocab.df
  FROM inp JOIN vocab
    ON substr(vocab.term, 1, 1) = substr(inp.input, 1, 1)
   AND abs(length(vocab.term) - length(inp.input)) <= 2
   AND vocab.term <> inp.input
),
ranked AS (
  SELECT input, suggestion, distance, df,
         row_number() OVER (
           PARTITION BY input
           ORDER BY distance ASC, df DESC, suggestion ASC
         ) AS rank
  FROM cand WHERE distance <= 2
)
SELECT input, rank, suggestion, distance, df FROM ranked
WHERE rank <= 3 ORDER BY input, rank
"""


def q_ltr_rerank_topk(sf_dir: str) -> pd.DataFrame:
    """LTR rescoring window (reference: solr/contrib/ltr/.../LTRRescorer
    .java, branch_8x): BM25 top-50 first pass, distributed per-partition
    feature probe (dl, tf_sum, matched_frac from postings), linear-model
    rerank to top-10."""
    from ..search.ltr import ltr_rerank

    idx = ensure_ft_index(sf_dir)
    res = ltr_rerank(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=10,
        rerank_k=50,
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score2_e6": np.floor(res["score2"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ltr_rerank_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    n_terms = len(FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS bm25,
         sum(tf.freq) AS tf_sum,
         count(DISTINCT tf.term) AS n_matched
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
cand AS (
  SELECT scored.*, dl.dl FROM scored JOIN dl USING (doc_id)
  ORDER BY bm25 DESC, doc_id ASC LIMIT 50
),
rescored AS (
  SELECT doc_id,
         0.0 + 1.0 * bm25 + (-0.25) * ln(1.0 + dl) + 0.03125 * tf_sum
             + 0.5 * (n_matched / {n_terms}.0) AS score2
  FROM cand
)
SELECT row_number() OVER (ORDER BY score2 DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score2 * 1000000) AS BIGINT) AS score2_e6
FROM rescored
ORDER BY score2 DESC, doc_id ASC
LIMIT 10
"""
    )


def q_highlight_snippets(sf_dir: str) -> pd.DataFrame:
    """UnifiedHighlighter analog (reference: lucene/highlighter/.../
    uhighlight/UnifiedHighlighter.java, branch_8x): snippets for the BM25
    top-10 — docs filtered distributed by hit keys, ±2-token window
    anchored at the first occurrence of the highest-priority query term."""
    from ..search.highlight import highlight

    hits = q_ft_bm25_or_topk(sf_dir)
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    res = highlight(
        docs,
        hits["doc_id"].tolist(),
        FT_TERMS_OR,
        window=2,
        key_col="doc_id",
        text_col="text",
        mark=None,
    )
    return res.astype({"doc_id": np.int64, "pos": np.int64})


def q_highlight_phrase_snippets(sf_dir: str) -> pd.DataFrame:
    """Phrase highlighting (UnifiedHighlighter phrase passages, reference:
    lucene/highlighter/.../uhighlight/PhraseHelper.java, branch_8x): every
    doc matching the exact phrase gets a ±2-token snippet anchored at the
    phrase's FIRST start position, the whole span marked. Hits come from
    the positions-enabled distributed index (the same path ft_phrase_count
    scores); the doc bodies are filtered distributed by hit key."""
    from ..search.highlight import highlight

    idx = ensure_ft_pos_index(sf_dir)
    hits = search(
        idx, [{"query_id": 0, "kind": "phrase", "terms": FT_PHRASE}],
        k=10 ** 9, method="exhaustive",
    )
    keys = _url_to_doc_id(hits["url"]).tolist()
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    res = highlight(
        docs, keys, [list(FT_PHRASE)], window=2,
        key_col="doc_id", text_col="text", mark=None,
    )
    return (res.astype({"doc_id": np.int64, "pos": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


def sql_highlight_phrase_snippets() -> str:
    # first phrase start via a positional self-join (generate_subscripts is
    # 1-based → engine pos = p - 1); snippet = tokens[p-2 .. p+3] (list_slice
    # 1-based inclusive, phrase span = 2 tokens, window = 2)
    t0, t1 = FT_PHRASE
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS p
  FROM documents
),
starts AS (
  SELECT a.doc_id, min(a.p) AS p
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1
  WHERE a.term = '{t0}' AND b.term = '{t1}'
  GROUP BY a.doc_id
)
SELECT s.doc_id,
       '{t0} {t1}' AS term,
       CAST(s.p - 1 AS BIGINT) AS pos,
       array_to_string(
         list_slice(string_split(d.text, ' '),
                    greatest(1, s.p - 2), s.p + 3), ' ') AS snippet
FROM starts s JOIN documents d USING (doc_id)
ORDER BY s.doc_id
"""


def sql_highlight_snippets() -> str:
    # anchor = first query term (priority order) present; pos is its first
    # occurrence (list_position is 1-based → pos = lp - 1, 0-based like the
    # engine); snippet = tokens[pos-2 .. pos+2] (list_slice is 1-based
    # inclusive)
    t0, t1, t2 = FT_TERMS_OR
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sdl FROM dl),
lt(v) AS (VALUES {",".join(f"({int(v)})" for v in np.unique(LENGTH_TABLE))}),
norml AS (
  SELECT dl.doc_id, (SELECT max(v) FROM lt WHERE v <= dl.dl) AS nl FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ('{t0}', '{t1}', '{t2}') GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
top10 AS (
  SELECT doc_id FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
),
anch AS (
  SELECT d.doc_id,
         string_split(d.text, ' ') AS l,
         list_position(string_split(d.text, ' '), '{t0}') AS p0,
         list_position(string_split(d.text, ' '), '{t1}') AS p1,
         list_position(string_split(d.text, ' '), '{t2}') AS p2
  FROM documents d JOIN top10 USING (doc_id)
),
pick AS (
  SELECT doc_id, l,
         CASE WHEN p0 > 0 THEN '{t0}' WHEN p1 > 0 THEN '{t1}'
              WHEN p2 > 0 THEN '{t2}' END AS term,
         CASE WHEN p0 > 0 THEN p0 WHEN p1 > 0 THEN p1
              WHEN p2 > 0 THEN p2 END AS lp
  FROM anch
)
SELECT doc_id, term, CAST(lp - 1 AS BIGINT) AS pos,
       array_to_string(list_slice(l, greatest(lp - 2, 1), lp + 2), ' ') AS snippet
FROM pick WHERE term IS NOT NULL
ORDER BY doc_id
"""


def q_highlight_multi_snippets(sf_dir: str) -> pd.DataFrame:
    """hl.snippets > 1 (UnifiedHighlighter maxPassages; [8x] lucene/
    highlighter/.../uhighlight/UnifiedHighlighter.java): up to 2
    passages per doc anchored at the first two occurrences of the
    winning term — first 20 docs (by id) containing 'query'."""
    from ..search.highlight import highlight

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def haskey(batch: pa.Table) -> pa.Table:
        t = batch["text"]
        m = pc.or_(
            pc.or_(pc.match_substring(t, " query "),
                   pc.starts_with(t, "query ")),
            pc.or_(pc.ends_with(t, " query"), pc.equal(t, "query")),
        )
        return batch.select(["doc_id"]).filter(m)

    keys = (docs.map_batches(haskey, batch_format="pyarrow")
            .sort("doc_id").limit(20).to_pandas()["doc_id"].tolist())
    res = highlight(docs, keys, ["query"], window=2, mark=None,
                    snippets=2)
    return res.astype({"doc_id": np.int64, "pos": np.int64})


def sql_highlight_multi_snippets() -> str:
    return """
WITH l AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
hit AS (
  SELECT doc_id FROM l WHERE list_contains(l, 'query')
  ORDER BY doc_id LIMIT 20
),
posu AS (
  SELECT l.doc_id, l.l, unnest(l.l) AS tok,
         unnest(range(1, len(l.l) + 1)) AS i
  FROM l JOIN hit USING (doc_id)
),
occ AS (
  SELECT doc_id, l, i,
         row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM posu WHERE tok = 'query'
)
SELECT doc_id, 'query' AS term, CAST(i - 1 AS BIGINT) AS pos,
       array_to_string(list_slice(l, greatest(1, i - 2), i + 2), ' ')
         AS snippet
FROM occ WHERE rn <= 2
ORDER BY doc_id, pos
"""


def q_facet_pivot_orders(sf_dir: str) -> pd.DataFrame:
    """facet.pivot (reference: solr/core/.../component/PivotFacetProcessor
    .java, branch_8x): top-3 order statuses, nested top-3 priorities in
    each; counts pre-aggregated map-side per block."""
    from ..functions.relational import facet_pivot

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    res = facet_pivot(ds, "o_orderstatus", "o_orderpriority", topn_a=3, topn_b=3)
    res = res.rename(columns={"count": "n"})
    return res.astype({"n": np.int64})


def sql_facet_pivot_orders() -> str:
    return """
WITH pc AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
at AS (
  SELECT o_orderstatus, sum(n) AS tot FROM pc GROUP BY o_orderstatus
  ORDER BY tot DESC, o_orderstatus ASC LIMIT 3
),
ranked AS (
  SELECT pc.o_orderstatus, pc.o_orderpriority, pc.n,
         row_number() OVER (
           PARTITION BY pc.o_orderstatus
           ORDER BY pc.n DESC, pc.o_orderpriority ASC
         ) AS r
  FROM pc JOIN at USING (o_orderstatus)
)
SELECT o_orderstatus, o_orderpriority, n FROM ranked WHERE r <= 3
"""


def q_facet_range_totalprice(sf_dir: str) -> pd.DataFrame:
    """facet.range (reference: solr/core/.../component/RangeFacetProcessor
    .java, branch_8x): 50k-wide totalprice buckets over [0, 600k),
    zero-filled, partial counts pre-aggregated map-side."""
    from ..functions.relational import facet_range

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])
    res = facet_range(ds, "o_totalprice", 0.0, 600_000.0, 50_000.0)
    return pd.DataFrame(
        {
            "bucket_lo": res["bucket_lo"].to_numpy().astype(np.int64),
            "n": res["count"].astype(np.int64),
        }
    )


def sql_facet_range_totalprice() -> str:
    return """
WITH b AS (
  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket
  FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 600000
),
g(bucket) AS (SELECT * FROM generate_series(0, 11))
SELECT g.bucket * 50000 AS bucket_lo, count(b.bucket) AS n
FROM g LEFT JOIN b USING (bucket)
GROUP BY g.bucket ORDER BY g.bucket
"""


def q_group_top_orders(sf_dir: str) -> pd.DataFrame:
    """Result grouping, group.limit=3 (reference: solr/core/.../search/
    Grouping.java + lucene/grouping, branch_8x): top-3 orders per status
    by (totalprice desc, orderkey asc); blocks prune to their local top-3
    per group before the shuffle."""
    from ..functions.relational import group_topk

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderkey", "o_totalprice"]
    ).map_batches(_cents("o_totalprice"), batch_format="pyarrow")
    res = group_topk(
        ds, "o_orderstatus", ["o_totalprice_c", "o_orderkey"], [True, False], 3
    )
    df = res.to_pandas()[["o_orderstatus", "o_orderkey", "o_totalprice_c"]]
    return df.sort_values(
        ["o_orderstatus", "o_totalprice_c", "o_orderkey"],
        ascending=[True, False, True],
    ).reset_index(drop=True).astype(
        {"o_orderkey": np.int64, "o_totalprice_c": np.int64}
    )


def sql_group_top_orders() -> str:
    cents = _SQL_CENTS.format(col="o_totalprice")
    return f"""
WITH c AS (
  SELECT o_orderstatus, o_orderkey, {cents} AS o_totalprice_c FROM orders
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderstatus
    ORDER BY o_totalprice_c DESC, o_orderkey ASC
  ) AS r FROM c
)
SELECT o_orderstatus, o_orderkey, o_totalprice_c FROM ranked
WHERE r <= 3 ORDER BY o_orderstatus, o_totalprice_c DESC, o_orderkey
"""


def q_pii_scrub_docs(sf_dir: str) -> pd.DataFrame:
    """PII redaction URP stage over webtext (SURVEY.md §2.2 URP chain +
    training-data curation): deterministic synthetic PII is injected per
    doc, then the vectorized RE2 scrub chain masks it; the full masked
    text value-hashes against the SQL oracle."""
    from ..stages.urp import build_stage_chain

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["doc_id"], 200))
        ids = batch["doc_id"].to_numpy()
        extra = [
            f" contact user{i}@mail{i % 7}.com from 192.168.{i % 256}.{i % 250}"
            f" call 555-867-5309"
            for i in ids
        ]
        txt = pc.binary_join_element_wise(
            batch["text"], pa.array(extra, type=pa.string()), ""
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", txt
        )

    (scrub,) = build_stage_chain([{"name": "pii_scrub", "col": "text"}])
    out = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        scrub, batch_format="pyarrow"
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df.astype({"doc_id": np.int64})


def sql_pii_scrub_docs() -> str:
    from ..stages.urp import PII_PATTERNS

    (p_email, r_email), (p_ip, r_ip), (p_phone, r_phone) = PII_PATTERNS
    return f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
    text || ' contact user' || doc_id || '@mail' || (doc_id % 7)
         || '.com from 192.168.' || (doc_id % 256) || '.' || (doc_id % 250)
         || ' call 555-867-5309',
    '{p_email}', '{r_email}', 'g'),
    '{p_ip}', '{r_ip}', 'g'),
    '{p_phone}', '{r_phone}', 'g') AS text
FROM documents WHERE doc_id < 200 ORDER BY doc_id
"""


def q_facet_range_dates(sf_dir: str) -> pd.DataFrame:
    """facet.range with a date-math gap (RangeFacetProcessor + DateMath,
    SURVEY.md §2.6/§2.9): daily event counts — the datemath /DAY value
    source feeds a single-key count aggregate (map-side combined)."""
    from ..functions.scalars import compile_value_source

    ds = _read(sf_dir, "events", columns=["ts"])
    vs = compile_value_source(["datemath", "ts", "/DAY"])

    def bucket(batch: pa.Table) -> pa.Table:
        return pa.table({"day_ms": pa.array(vs(batch), type=pa.int64())})

    agg = ds.map_batches(bucket, batch_format="pyarrow").groupby(
        "day_ms"
    ).count()
    df = agg.to_pandas().rename(columns={"count()": "n"})
    df = df.sort_values("day_ms").reset_index(drop=True)
    return df.astype({"day_ms": np.int64, "n": np.int64})


def sql_facet_range_dates() -> str:
    return """
SELECT CAST(epoch_ms(date_trunc('day', ts)) AS BIGINT) AS day_ms,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def q_elevate_topk(sf_dir: str) -> pd.DataFrame:
    """QueryElevationComponent (reference: solr/core/.../component/
    QueryElevationComponent.java, branch_8x): the BM25 top-10 with the
    rank-5 and rank-9 docs pinned to the top (config order) and the
    rank-2 doc excluded; remaining docs keep score order."""
    from ..search.elevate import elevate

    idx = ensure_ft_index(sf_dir)
    first = search(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        k=10,
        method="exhaustive",
        sim_config={"dtype": "float64", "mode": "div"},
    )
    by_rank = dict(zip(first["rank"], first["url"]))
    res = elevate(
        first, elevated=[by_rank[5], by_rank[9]], excluded=[by_rank[2]]
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
        }
    )


def sql_elevate_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS score
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
top10 AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (
         ORDER BY CASE r WHEN 5 THEN 0 WHEN 9 THEN 1 ELSE 2 END, r
       ) AS rank,
       doc_id
FROM top10 WHERE r <> 2
ORDER BY rank
"""
    )


def q_json_facet_orders(sf_dir: str) -> pd.DataFrame:
    """json.facet DSL (reference: solr/core/.../search/facet/FacetRequest
    .java + SlotAcc.java, branch_8x; SURVEY.md §2.6): nested terms facet —
    top-3 statuses with a sum stat, top-2 priorities within each — one
    groupby per level, flattened to rows for the oracle compare."""
    from ..functions.json_facet import json_facet

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]
    ).map_batches(_cents("o_totalprice"), batch_format="pyarrow")
    res = json_facet(
        ds,
        {
            "by_status": {
                "type": "terms", "field": "o_orderstatus", "limit": 3,
                "facet": {
                    "sum_price_c": "sum(o_totalprice_c)",
                    "by_prio": {
                        "type": "terms", "field": "o_orderpriority", "limit": 2,
                    },
                },
            }
        },
    )
    rows = []
    for b in res["by_status"]["buckets"]:
        for sb in b["by_prio"]["buckets"]:
            rows.append(
                {
                    "o_orderstatus": b["val"], "n": b["count"],
                    "sum_price_c": int(b["sum_price_c"]),
                    "o_orderpriority": sb["val"], "pn": sb["count"],
                }
            )
    return pd.DataFrame(
        rows, columns=["o_orderstatus", "n", "sum_price_c", "o_orderpriority", "pn"]
    ).astype({"n": np.int64, "sum_price_c": np.int64, "pn": np.int64})


def q_json_facet_unique_pct(sf_dir: str) -> pd.DataFrame:
    """json.facet ``unique``/``percentile`` bucket aggs (UniqueAgg.java +
    PercentileAgg.java analogs, branch_8x; SURVEY.md §2.6): top statuses
    with exact distinct customers (two-phase native distinct, no value
    collection) and the median order price per bucket."""
    from ..functions.json_facet import json_facet

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_custkey", "o_totalprice"]
    ).map_batches(_cents("o_totalprice"), batch_format="pyarrow")
    res = json_facet(
        ds,
        {
            "by_status": {
                "type": "terms", "field": "o_orderstatus", "limit": 3,
                "facet": {
                    "uniq_cust": "unique(o_custkey)",
                    "p50_price_c": "percentile(o_totalprice_c, 50)",
                },
            }
        },
    )
    rows = [
        {
            "o_orderstatus": b["val"], "n": b["count"],
            "uniq_cust": int(b["uniq_cust"]),
            "p50_price_c": float(b["p50_price_c"]),
        }
        for b in res["by_status"]["buckets"]
    ]
    return pd.DataFrame(
        rows, columns=["o_orderstatus", "n", "uniq_cust", "p50_price_c"]
    ).astype({"n": np.int64, "uniq_cust": np.int64, "p50_price_c": np.float64})


def q_json_facet_variance(sf_dir: str) -> pd.DataFrame:
    """json.facet sumsq/variance/missing/countvals bucket aggs (reference:
    solr/core/.../search/facet/SlotAcc.java VarianceAgg + CountValsAgg +
    MissingAgg, branch_8x; SURVEY.md §2.6 JSON Facet aggs row): variance
    from exact Sum/Sumsq/Count partials — quantities are small ints, so
    float64 partial sums are exact and the var_samp expression matches the
    oracle bit-for-bit. ``missing`` counts nulls (quantity 1 nulled out to
    synthesize them; TPC-H has none natively)."""
    from ..functions.json_facet import json_facet

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.float64)
        import pyarrow.compute as _pc

        qn = pa.array(np.where(q == 1.0, np.nan, q))
        qn = _pc.if_else(_pc.is_nan(qn), pa.nulls(len(t), pa.float64()), qn)
        return t.append_column("q_null", qn)

    res = json_facet(
        ds.map_batches(prep, batch_format="pyarrow"),
        {
            "by_flag": {
                "type": "terms", "field": "l_returnflag", "limit": 3,
                "facet": {
                    "sumsq_q": "sumsq(l_quantity)",
                    "var_q": "variance(l_quantity)",
                    "n_missing": "missing(q_null)",
                    "n_vals": "countvals(q_null)",
                },
            }
        },
    )
    rows = [
        {
            "l_returnflag": b["val"], "n": b["count"],
            "sumsq_q": int(b["sumsq_q"]),
            "var_e6": int(np.floor(b["var_q"] * 1e6)),
            "n_missing": int(b["n_missing"]),
            "n_vals": int(b["n_vals"]),
        }
        for b in res["by_flag"]["buckets"]
    ]
    return pd.DataFrame(
        rows,
        columns=["l_returnflag", "n", "sumsq_q", "var_e6", "n_missing", "n_vals"],
    ).astype({c: np.int64 for c in ["n", "sumsq_q", "var_e6", "n_missing", "n_vals"]})


def sql_json_facet_variance() -> str:
    return """
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(l_quantity * l_quantity) AS BIGINT) AS sumsq_q,
       CAST(floor(
         (CAST(sum(l_quantity * l_quantity) AS DOUBLE)
          - CAST(sum(l_quantity) AS DOUBLE) * CAST(sum(l_quantity) AS DOUBLE)
            / CAST(count(l_quantity) AS DOUBLE))
         / (CAST(count(l_quantity) AS DOUBLE) - 1) * 1000000
       ) AS BIGINT) AS var_e6,
       count(*) FILTER (WHERE l_quantity = 1) AS n_missing,
       count(*) FILTER (WHERE l_quantity <> 1) AS n_vals
FROM lineitem
GROUP BY l_returnflag
ORDER BY n DESC, l_returnflag
LIMIT 3
"""


def q_json_facet_query(sf_dir: str) -> pd.DataFrame:
    """json.facet ``query`` facet type (reference: solr/core/.../search/
    facet/FacetQuery.java, branch_8x; SURVEY.md §2.6): a filtered bucket
    nested under a terms facet — per top status, the count and cents-sum
    of high-value orders. One filtered groupby serves all parent buckets
    (never a query per bucket)."""
    from ..functions.json_facet import json_facet

    ds = _read(
        sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"]
    ).map_batches(_cents("o_totalprice"), batch_format="pyarrow")
    hi_q = {"col": "o_totalprice_c", "op": ">", "value": 15000000}
    res = json_facet(
        ds,
        {
            "by_status": {
                "type": "terms", "field": "o_orderstatus", "limit": 3,
                "facet": {
                    "hi": {"type": "query", "q": hi_q,
                           "facet": {"sum_c": "sum(o_totalprice_c)"}},
                },
            }
        },
    )
    rows = [
        {
            "o_orderstatus": b["val"],
            "n": b["count"],
            "hi_n": b["hi"]["count"],
            "hi_sum_c": int(b["hi"]["sum_c"] or 0),
        }
        for b in res["by_status"]["buckets"]
    ]
    return pd.DataFrame(
        rows, columns=["o_orderstatus", "n", "hi_n", "hi_sum_c"]
    ).astype({"n": np.int64, "hi_n": np.int64, "hi_sum_c": np.int64})


def sql_json_facet_query() -> str:
    cents = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT o_orderstatus,
       count(*) AS n,
       count(*) FILTER (WHERE {cents} > 15000000) AS hi_n,
       CAST(COALESCE(sum({cents}) FILTER (WHERE {cents} > 15000000), 0) AS BIGINT)
         AS hi_sum_c
FROM orders
GROUP BY o_orderstatus
ORDER BY n DESC, o_orderstatus
LIMIT 3
"""


def sql_json_facet_unique_pct() -> str:
    cents = _SQL_CENTS.format(col="o_totalprice")
    return f"""
SELECT o_orderstatus,
       count(*) AS n,
       count(DISTINCT o_custkey) AS uniq_cust,
       quantile_cont({cents}, 0.5) AS p50_price_c
FROM orders
GROUP BY o_orderstatus
ORDER BY n DESC, o_orderstatus ASC
LIMIT 3
"""


def sql_json_facet_orders() -> str:
    cents = _SQL_CENTS.format(col="o_totalprice")
    return f"""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, {cents} AS pc FROM orders
),
st AS (
  SELECT o_orderstatus, count(*) AS n, CAST(sum(pc) AS BIGINT) AS sum_price_c
  FROM c GROUP BY o_orderstatus
  ORDER BY n DESC, o_orderstatus ASC LIMIT 3
),
pr AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS pn,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY count(*) DESC, o_orderpriority ASC
         ) AS r
  FROM c GROUP BY o_orderstatus, o_orderpriority
)
SELECT st.o_orderstatus, st.n, st.sum_price_c, pr.o_orderpriority, pr.pn
FROM st JOIN pr USING (o_orderstatus)
WHERE pr.r <= 2
ORDER BY st.n DESC, st.o_orderstatus, pr.pn DESC, pr.o_orderpriority
"""


def q_pack_token_windows(sf_dir: str) -> pd.DataFrame:
    """Sequence packing for pretraining (training-data extension): docs
    concatenate in doc_id order and cut into 1024-token windows; each doc
    learns its global token span and first/last window id via a two-pass
    scan (per-block totals → prefix offsets → broadcast), no shuffle."""
    from ..functions.packing import pack_token_windows

    ds = pack_token_windows(
        _docs_path(sf_dir), window=1024, id_col="doc_id", text_col="text"
    )
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return df.astype(
        {c: np.int64 for c in
         ["doc_id", "n_tokens", "tok_start", "pack_first", "pack_last"]}
    )


def sql_pack_token_windows() -> str:
    return """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_start
  FROM t
)
SELECT doc_id, n_tokens, tok_start,
       tok_start // 1024 AS pack_first,
       (tok_start + greatest(n_tokens, 1) - 1) // 1024 AS pack_last
FROM c ORDER BY doc_id
"""


CLASSIFY_TERMS = ["query", "join", "slow", "fast"]
# intercept first; every weight a binary fraction so logit = m·0.25 is an
# EXACT float64 in both engines (multiplication/summation order irrelevant)
CLASSIFY_WEIGHTS = [-1.5, 2.25, 1.5, -2.0, 0.5]


def q_classify_docs(sf_dir: str):
    """classify() stream (SURVEY.md §2.8 ClassifyStream): score every doc
    against a fixed logistic model — one streaming map_batches pass, model
    broadcast in the closure. Binary-fraction weights × integer tf make the
    logit exact float64, so the contract is integer-exact end to end."""
    from ..functions.textml import classify

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = classify(docs, CLASSIFY_TERMS, CLASSIFY_WEIGHTS)

    def fixpt(batch: pa.Table) -> pa.Table:
        z = batch["logit"].to_numpy()
        return pa.table({
            "doc_id": batch["doc_id"],
            "logit_e6": pa.array(np.floor(z * 1e6).astype(np.int64)),
            "predicted": batch["predicted"],
        })

    return scored.map_batches(fixpt, batch_format="pyarrow")


def sql_classify_docs() -> str:
    model = ", ".join(
        f"('{t}', {w!r})" for t, w in zip(CLASSIFY_TERMS, CLASSIFY_WEIGHTS[1:])
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m(term, w) AS (VALUES {model}),
s AS (
  SELECT t.doc_id, sum(m.w) AS ws
  FROM toks t JOIN m ON t.term = m.term GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(floor(({CLASSIFY_WEIGHTS[0]!r} + coalesce(s.ws, 0)) * 1e6) AS BIGINT)
         AS logit_e6,
       CAST(({CLASSIFY_WEIGHTS[0]!r} + coalesce(s.ws, 0)) > 0 AS BIGINT)
         AS predicted
FROM documents d LEFT JOIN s USING (doc_id)
ORDER BY doc_id
"""


def q_features_ig_docs(sf_dir: str):
    """features() stream (SURVEY.md §2.8 FeaturesSelectionStream): top-15
    terms by information gain against the binary label lang='es'. Distinct
    (doc, term) pairs explode vectorized; per-term class counts ride the
    bucketed combiner+merge shuffle; IG is floor-e6 fixed-point so the
    top-k ORDERING is ulp-stable across engines."""
    from ..functions.textml import features_ig

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "lab": pc.cast(pc.equal(pc.coalesce(batch["lang"], ""), "es"),
                           pa.int64()),
        })

    labeled = docs.map_batches(lab, batch_format="pyarrow")
    return features_ig(labeled, "lab", top_k=15)


def sql_features_ig_docs() -> str:
    return """
WITH lab AS (
  SELECT doc_id, CASE WHEN lang = 'es' THEN 1 ELSE 0 END AS lab FROM documents
),
toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
c AS (
  SELECT t.term, sum(l.lab) AS pos_docs, count(*) AS docs
  FROM toks t JOIN lab l USING (doc_id)
  WHERE t.term <> '' GROUP BY t.term
),
tot AS (SELECT count(*) AS n, sum(lab) AS np FROM lab)
SELECT term, pos_docs, docs,
  CAST(floor(greatest(
    (CASE WHEN np <= 0 OR np >= n THEN 0 ELSE
       -((np*1.0/n) * log2(np*1.0/n) + (1 - np*1.0/n) * log2(1 - np*1.0/n))
     END)
    - (docs*1.0/n) *
      (CASE WHEN pos_docs*1.0/docs <= 0 OR pos_docs*1.0/docs >= 1 THEN 0 ELSE
         -((pos_docs*1.0/docs) * log2(pos_docs*1.0/docs)
           + (1 - pos_docs*1.0/docs) * log2(1 - pos_docs*1.0/docs))
       END)
    - (1 - docs*1.0/n) *
      (CASE WHEN n - docs = 0 OR (np - pos_docs)*1.0/(n - docs) <= 0
                 OR (np - pos_docs)*1.0/(n - docs) >= 1 THEN 0 ELSE
         -(((np - pos_docs)*1.0/(n - docs)) * log2((np - pos_docs)*1.0/(n - docs))
           + (1 - (np - pos_docs)*1.0/(n - docs))
             * log2(1 - (np - pos_docs)*1.0/(n - docs)))
       END)
  , 0) * 1e6) AS BIGINT) AS ig_e6
FROM c, tot
ORDER BY ig_e6 DESC, term ASC
LIMIT 15
"""


def q_shortest_path_parts(sf_dir: str):
    """shortestPath() stream (SURVEY.md §2.8 ShortestPathStream): BFS
    distances from part GRAPH_START_PART over the bipartite
    part↔order lineitem graph (namespaced into one int64 key space: parts
    even, orders odd), max 4 hops. Each hop is one distributed semi-join +
    bucketed min-parent aggregate; first discovery is minimum distance."""
    from ..functions.textml import shortest_path

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ns(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy().astype(np.int64) * 2 + 1
        p = batch["l_partkey"].to_numpy().astype(np.int64) * 2
        return pa.table({
            "src": pa.array(np.concatenate([p, o])),
            "dst": pa.array(np.concatenate([o, p])),
        })

    edges_ds = li.map_batches(ns, batch_format="pyarrow").materialize()
    dist_ds, _ = shortest_path(
        lambda: edges_ds, "src", "dst", GRAPH_START_PART * 2, max_hops=4
    )
    return dist_ds.select_columns(["node", "dist"]).sort("node")


def sql_shortest_path_parts() -> str:
    return f"""
WITH RECURSIVE e AS (
  SELECT l_partkey * 2 AS src, l_orderkey * 2 + 1 AS dst FROM lineitem
  UNION ALL
  SELECT l_orderkey * 2 + 1, l_partkey * 2 FROM lineitem
),
bfs(node, dist) AS (
  SELECT CAST({GRAPH_START_PART * 2} AS BIGINT), 0
  UNION
  SELECT e.dst, b.dist + 1 FROM bfs b JOIN e ON e.src = b.node WHERE b.dist < 4
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
ORDER BY node
"""


def q_ft_term_set_counts(sf_dir: str) -> pd.DataFrame:
    """TermInSetQuery (reference: lucene/core/.../search/TermInSetQuery
    .java, branch_8x; Solr {!terms} TermsQParserPlugin; SURVEY.md §2.3):
    constant-score union over an explicit term set — standalone, as a
    bool FILTER clause (non-scoring), and with a ghost term that must
    change nothing."""
    idx = ensure_ft_index(sf_dir)
    qs = [
        {"query_id": 0, "kind": "term_set",
         "terms": ["query", "window", "zzghostterm"]},
        {"query_id": 1, "kind": "bool",
         "must": [{"kind": "term", "terms": ["join"]}],
         "filter": [{"kind": "term_set", "terms": ["query", "window"]}]},
    ]
    res = search(idx, qs, k=10**9, method="exhaustive")
    rows = [
        {"set": "union_3", "n_docs": int((res["query_id"] == 0).sum())},
        {"set": "filtered_join", "n_docs": int((res["query_id"] == 1).sum())},
    ]
    return pd.DataFrame(rows).astype({"n_docs": np.int64}).sort_values(
        "set").reset_index(drop=True)


def sql_ft_term_set_counts() -> str:
    return """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT * FROM (
  SELECT 'union_3' AS "set", count(DISTINCT doc_id) AS n_docs
  FROM tok WHERE term IN ('query', 'window', 'zzghostterm')
  UNION ALL
  SELECT 'filtered_join', count(DISTINCT t1.doc_id)
  FROM tok t1
  WHERE t1.term = 'join'
    AND t1.doc_id IN (SELECT doc_id FROM tok
                      WHERE term IN ('query', 'window'))
)
ORDER BY "set"
"""


def q_ft_atomic_update_stats(sf_dir: str) -> pd.DataFrame:
    """Atomic updates (SURVEY.md §2.10 AtomicUpdateDocumentMerger +
    RTG + _version_ bump): build over the documents-as-pages corpus,
    atomically SET doc 0's text and ADD (append) to doc 1's, forceMerge,
    and report live-doc count, token sum and planted-term hits — all three
    only come out right if the modifier merge resolved the CURRENT stored
    version, the bumped version won last-wins dedup, and the merge
    reclaimed the tombstoned originals."""
    import shutil
    import tempfile

    from ..index.merge import merge_index
    from ..pipelines.update import atomic_update

    ds = _docs_as_pages(sf_dir)
    tmp = tempfile.mkdtemp(prefix="lsr_atomic_")
    try:
        idx = os.path.join(tmp, "idx")
        build_index([], idx, num_partitions=FT_PARTITIONS, lang=None,
                    dataset=ds, fingerprint="atomic-base")
        atomic_update(idx, [
            {"url": "doc://000000000000",
             "ops": {"text": {"set": "zzatomic zzatomic query"}}},
            {"url": "doc://000000000001",
             "ops": {"text": {"add": "zzatomic"}}},
        ], dataset=_docs_as_pages(sf_dir), lang=None)
        root = merge_index(idx)
        hits = search(idx, [{"query_id": 0, "kind": "term",
                             "terms": ["zzatomic"]}], k=10)
        return pd.DataFrame({
            "n_docs": [root["num_live_docs"]],
            "sum_dl": [root["sum_dl"]],
            "zz_hits": [len(hits)],
        }).astype(np.int64)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sql_ft_atomic_update_stats() -> str:
    return """
WITH mod AS (
  SELECT doc_id,
         CASE WHEN doc_id = 0 THEN 'zzatomic zzatomic query'
              WHEN doc_id = 1 THEN text || ' zzatomic'
              ELSE text END AS text
  FROM documents
)
SELECT count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl,
       (SELECT count(*) FROM mod
         WHERE list_contains(string_split(text, ' '), 'zzatomic')) AS zz_hits
FROM mod
"""


def q_score_nodes_parts(sf_dir: str):
    """gatherNodes()+scoreNodes() streams (SURVEY.md §2.8 GatherNodesStream
    / ScoreNodesStream): gather part nodes one hop from customer 1's
    orders over the lineitem edge table (count(*) aggregation), then rank
    them tf-idf style — gathered · ln(N/df) with df computed ONLY for the
    gathered nodes (collection semi-joined first, never a full-vocab
    frequency table). floor-e6 fixed point keeps ln() ulp-stable."""
    from ..functions.textml import gather_nodes, score_nodes

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    starts = [
        r["o_orderkey"]
        for r in orders.filter(expr="o_custkey == 1")
        .select_columns(["o_orderkey"]).take_all()
    ]
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    gathered = gather_nodes(li, "l_orderkey", "l_partkey", starts)
    scored = score_nodes(
        gathered, li.select_columns(["l_partkey"]), "l_partkey")
    return scored.sort(["score_e6", "node"], descending=[True, False])


def sql_score_nodes_parts() -> str:
    return """
WITH starts AS (SELECT o_orderkey FROM orders WHERE o_custkey = 1),
g AS (
  SELECT l_partkey AS node, count(*) AS gathered
  FROM lineitem JOIN starts ON l_orderkey = o_orderkey
  GROUP BY l_partkey
),
d AS (
  SELECT l_partkey AS node, count(*) AS df FROM lineitem
  WHERE l_partkey IN (SELECT node FROM g) GROUP BY l_partkey
),
n AS (SELECT count(*) AS nd FROM lineitem)
SELECT g.node, g.gathered, d.df,
  CAST(floor(g.gathered * ln(nd * 1.0 / df) * 1e6) AS BIGINT) AS score_e6
FROM g JOIN d USING (node), n
ORDER BY score_e6 DESC, node ASC
"""


def q_bpe_merges_docs(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE vocabulary induction (training-data extension,
    Sennrich et al. 2016): the corpus collapses once to a word-frequency
    table (bucketed combiner+merge), then each merge round is one
    vectorized pair-count pass + one tiny argmax shuffle + one vectorized
    rewrite of the symbol table — corpus rows never move after round 0.
    Returns the learned merge sequence. No SQL oracle (iterative argmax
    loop) — pinned bit-exactly against the single-process reference
    implementation in tests/test_bpe.py instead."""
    from ..functions.bpe import train_bpe

    docs = _read(sf_dir, "documents", columns=["text"])
    merges_df, _ = train_bpe(docs, num_merges=20)
    return merges_df.astype({"step": np.int64, "pair_count": np.int64})


def q_bpe_encode_docs(sf_dir: str):
    """BPE tokenizer APPLICATION (the other half of bpe_merges_docs):
    train 20 merges, then one streaming zero-shuffle encode pass — per
    document, the subword token count under the trained vocabulary (what
    an LLM pipeline packs/budgets by). Merges are ray.put once; each
    actor dictionary-encodes its batch so only DISTINCT words are
    segmented (cached across batches). No SQL oracle (merge application
    is iterative) — bit-exact vs the single-process segment_words
    reference in tests/test_bpe.py."""
    from ..functions.bpe import bpe_encode, train_bpe

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges_df, _ = train_bpe(
        _read(sf_dir, "documents", columns=["text"]), num_merges=20
    )
    merges = list(merges_df[["left", "right"]].itertuples(index=False, name=None))
    return bpe_encode(docs, merges)


def q_train_logit_docs(sf_dir: str) -> pd.DataFrame:
    """train() stream (SURVEY.md §2.8 TextLogitStream): distributed
    logistic-regression training — per iteration one streaming pass emits
    ONE partial-gradient row per block; the driver sums partials and
    updates the broadcast weights, exactly the reference's shard-partial /
    coordinator-sum loop. Emits the per-iteration tuples the stream does.
    No SQL oracle (iterative float training; block-order summation) —
    pytest-gated against a single-process numpy reference instead
    (tests/test_textml.py)."""
    from ..functions.textml import train_logit

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": batch["text"],
            "lab": pc.cast(pc.equal(pc.coalesce(batch["lang"], ""), "es"),
                           pa.int64()),
        })

    labeled = docs.map_batches(lab, batch_format="pyarrow")
    _, history = train_logit(
        labeled, ["query", "join", "fast", "slow", "scan", "merge"],
        "lab", iterations=8,
    )
    return history


def q_sql_select_orders(sf_dir: str):
    """/sql handler analog, plain projection (SURVEY.md §2.8; [8x]
    solr/core/.../handler/sql/ — Calcite planner → streaming
    expressions): SELECT with conjunctive WHERE, ORDER BY, LIMIT parsed
    by functions/sql.py and planned onto the table-expression engine
    (pruned read + pushdown filter)."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 150000 "
        "ORDER BY o_orderkey LIMIT 50")


def sql_sql_select_orders() -> str:
    return """
SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 150000
ORDER BY o_orderkey LIMIT 50
"""


def q_sql_group_events(sf_dir: str):
    """/sql GROUP BY aggregates: COUNT/MIN/MAX per event_type —
    order-independent kernels, hash-exact vs the oracle."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT event_type, COUNT(*) AS n, MIN(value) AS min_v, "
        "MAX(value) AS max_v FROM events GROUP BY event_type "
        "ORDER BY event_type")


def sql_sql_group_events() -> str:
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       min(value) AS min_v, max(value) AS max_v
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_sql_having_avg_customers(sf_dir: str):
    """/sql HAVING over an aggregate alias + AVG on an integer column
    (exact: integer partials, one double division)."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT c_mktsegment, COUNT(*) AS n, AVG(c_nationkey) AS avg_nk "
        "FROM customer GROUP BY c_mktsegment HAVING n >= 10 "
        "ORDER BY n DESC, c_mktsegment")


def sql_sql_having_avg_customers() -> str:
    return """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
       avg(c_nationkey) AS avg_nk
FROM customer GROUP BY c_mktsegment HAVING count(*) >= 10
ORDER BY n DESC, c_mktsegment
"""


def q_sql_in_like_parts(sf_dir: str):
    """/sql IN-list + LIKE predicates (lowered onto the streams engine's
    is_in / match_like kernels; IN pushes down to the scan)."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT p_partkey, p_brand, p_type FROM part "
        "WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4') AND p_type LIKE '%O%' "
        "ORDER BY p_partkey LIMIT 100")


def sql_sql_in_like_parts() -> str:
    return """
SELECT p_partkey, p_brand, p_type FROM part
WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4') AND p_type LIKE '%O%'
ORDER BY p_partkey LIMIT 100
"""


def q_sql_distinct_lineitem(sf_dir: str):
    """/sql SELECT DISTINCT → two-phase native distinct (groupby with a
    dropped count), the JSON-facet-unique engine path."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem "
        "ORDER BY l_returnflag, l_linestatus")


def sql_sql_distinct_lineitem() -> str:
    return """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


def q_sql_global_lineitem(sf_dir: str):
    """/sql global (ungrouped) aggregate with a timestamp WHERE literal
    bound against the parquet schema."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT COUNT(*) AS n, SUM(l_linenumber) AS sum_ln, "
        "MAX(l_quantity) AS max_qty FROM lineitem "
        "WHERE l_shipdate >= '1995-06-01'")


def sql_sql_global_lineitem() -> str:
    return """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
       max(l_quantity) AS max_qty
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01'
"""


def q_sql_or_where_orders(sf_dir: str):
    """/sql boolean WHERE: standard AND/OR precedence with parens,
    lowered to DNF — one or-clause slot in the engine's AND list; each
    pushdown-able branch still reaches the scan filter."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT o_orderkey, o_orderstatus FROM orders "
        "WHERE (o_orderstatus = 'F' AND o_totalprice > 100000) "
        "OR (o_orderstatus = 'O' AND o_totalprice < 50000) "
        "ORDER BY o_orderkey LIMIT 60")


def sql_sql_or_where_orders() -> str:
    return """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE (o_orderstatus = 'F' AND o_totalprice > 100000)
   OR (o_orderstatus = 'O' AND o_totalprice < 50000)
ORDER BY o_orderkey LIMIT 60
"""


def q_sql_count_distinct_events(sf_dir: str):
    """/sql COUNT(DISTINCT col): two-phase — native distinct groupby,
    then a per-key count (the map_reduce 'unique' metric shape)."""
    from ..functions.sql import sql_query

    return sql_query(
        sf_dir,
        "SELECT event_type, COUNT(DISTINCT user_id) AS uu FROM events "
        "GROUP BY event_type ORDER BY event_type")


def sql_sql_count_distinct_events() -> str:
    return """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS uu
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_audio_meta(sf_dir: str):
    """REAL audio header decode (SURVEY.md multimodal columns; the audio
    sibling of image_meta): per doc a byte-exact WAV/FLAC/MP3 payload is
    synthesized from doc_id (format cycles doc_id % 3, rate/channels/
    sample-count derive arithmetically), then the AudioMetaStage actor
    pool parses rate/channels/bits/duration back out of the BYTES. The
    oracle recomputes the planted fields from doc_id — matching proves
    the synthesizer↔parser round trip reads the RIFF walk, the FLAC
    STREAMINFO bit fields and the MP3 frame header."""
    from ..functions.dedup import default_actor_concurrency
    from ..functions.multimodal import (
        SUGGESTED_BINARY_BATCH_SIZE,
        AudioMetaStage,
        make_flac,
        make_mp3_frame,
        make_wav,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    RATES = (8000, 16000, 22050, 44100, 48000)
    MP3_RATES = (44100, 48000, 32000)

    def mk(batch: pa.Table) -> pa.Table:
        payloads = []
        for i in batch["doc_id"].to_numpy():
            i = int(i)
            ch = i % 2 + 1
            n = i % 200 + 50
            f = i % 3
            if f == 0:
                payloads.append(make_wav(RATES[i % 5], ch, n))
            elif f == 1:
                payloads.append(make_flac(RATES[i % 5], ch, 16, n))
            else:
                payloads.append(
                    make_mp3_frame(MP3_RATES[(i // 3) % 3], ch))
        return pa.table(
            {"doc_id": batch["doc_id"],
             "payload": pa.array(payloads, type=pa.binary())}
        )

    return (
        ds.map_batches(mk, batch_format="pyarrow")
        .map_batches(
            AudioMetaStage,
            batch_format="pyarrow",
            batch_size=SUGGESTED_BINARY_BATCH_SIZE * 4,
            concurrency=default_actor_concurrency(),
        )
        .select_columns(
            ["doc_id", "format", "sample_rate", "channels", "bits",
             "duration_ms"])
        # mp3 rows carry NULL bits/duration (frame formats have
        # neither); the hash compare can't equate NaNs, so the CONTRACT
        # coalesces to -1 on both sides — the stage itself keeps nulls
        .map_batches(
            lambda b: pa.table({
                **{c: b[c] for c in
                   ("doc_id", "format", "sample_rate", "channels")},
                "bits": pc.fill_null(b["bits"], -1),
                "duration_ms": pc.fill_null(b["duration_ms"], -1),
            }),
            batch_format="pyarrow")
    )


def sql_audio_meta() -> str:
    return """
WITH d AS (
  SELECT doc_id,
         doc_id % 3 AS f,
         doc_id % 2 + 1 AS ch,
         doc_id % 200 + 50 AS n,
         (CASE doc_id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 16000
               WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END) AS wr,
         (CASE (doc_id // 3) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
               ELSE 32000 END) AS mr
  FROM documents
)
SELECT doc_id,
       CASE f WHEN 0 THEN 'wav' WHEN 1 THEN 'flac' ELSE 'mp3' END
         AS format,
       CAST(CASE WHEN f = 2 THEN mr ELSE wr END AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS channels,
       CASE WHEN f = 2 THEN -1 ELSE CAST(16 AS BIGINT) END AS bits,
       CASE WHEN f = 2 THEN -1
            ELSE CAST((1000 * n) // wr AS BIGINT) END AS duration_ms
FROM d
"""


# WordBreak contract: query terms + the candidate enumeration shared
# VERBATIM between engine and oracle (same split loop, min_break=3)
_WB_TERMS = ["fastjoin", "sortmerge", "cus", "tomer"]


def _wb_candidates():
    cands = []
    for t in _WB_TERMS:
        for i in range(3, len(t) - 3 + 1):
            cands.append(("break", t, t[:i], t[i:], f"{t[:i]} {t[i:]}"))
    for t1, t2 in zip(_WB_TERMS, _WB_TERMS[1:]):
        cands.append(("combine", f"{t1} {t2}", t1 + t2, None, t1 + t2))
    return cands


def q_word_break_terms(sf_dir: str) -> pd.DataFrame:
    """WordBreakSolrSpellChecker analog (SURVEY.md §2 spellcheck row;
    [8x] lucene/suggest/.../spell/WordBreakSpellChecker.java): break
    unknown terms into two dictionary words / combine adjacent terms
    into one — membership + df from the index stats dictionary in ONE
    pruned is_in pass."""
    from ..search.spellcheck import word_break

    idx = ensure_ft_index(sf_dir)
    out = word_break(idx, _WB_TERMS, min_break=3)
    return out.astype({"freq": np.int64})


def sql_word_break_terms() -> str:
    vals = ",\n    ".join(
        f"('{k}', '{o}', '{a}', "
        + (f"'{b}'" if b is not None else "NULL")
        + f", '{s}')"
        for k, o, a, b, s in _wb_candidates())
    return (
        _ft_sql_common()
        + f"""
, vocab AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term
),
cand(kind, original, a, b, suggestion) AS (VALUES
    {vals}
)
SELECT cand.kind, cand.original, cand.suggestion,
       CAST(CASE WHEN cand.b IS NULL THEN va.df
                 ELSE least(va.df, vb.df) END AS BIGINT) AS freq
FROM cand
JOIN vocab va ON va.term = cand.a
LEFT JOIN vocab vb ON vb.term = cand.b
WHERE cand.b IS NULL OR vb.term IS NOT NULL
ORDER BY original, kind, freq DESC, suggestion
"""
    )


def q_group_func_orders(sf_dir: str):
    """group.func analog (SURVEY.md §2.6 grouping; [8x] solr/core/.../
    search/Grouping.java — grouping by a FUNCTION QUERY instead of a
    field): the group key is a compiled value source (floor(totalprice /
    50000), integerized) evaluated vectorized per batch, then the same
    bucketed combiner+merge top-n that group.field uses — top-2 orders
    per price band by (totalprice desc, orderkey asc)."""
    from ..functions.relational import group_topk
    from ..functions.scalars import compile_value_source

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    vs = compile_value_source(["floor", ["div", "o_totalprice", 50000.0]])

    def key(batch: pa.Table) -> pa.Table:
        band = vs(batch).astype(np.int64)
        c = np.floor(batch["o_totalprice"].to_numpy() * 100.0
                     + 0.5).astype(np.int64)
        return pa.table({
            "price_band": pa.array(band),
            "o_orderkey": batch["o_orderkey"],
            "price_c": pa.array(c),
        })

    top = group_topk(
        orders.map_batches(key, batch_format="pyarrow"),
        "price_band", ["price_c", "o_orderkey"], [True, False], 2)
    return top.sort(["price_band", "price_c", "o_orderkey"],
                    descending=[False, True, False])


def sql_group_func_orders() -> str:
    c = _SQL_CENTS.format(col="o_totalprice")
    return f"""
WITH banded AS (
  SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS price_band,
         o_orderkey, {c} AS price_c
  FROM orders
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY price_band ORDER BY price_c DESC, o_orderkey ASC
  ) AS rn FROM banded
)
SELECT price_band, o_orderkey, price_c
FROM ranked WHERE rn <= 2
ORDER BY price_band, price_c DESC, o_orderkey
"""


def q_video_meta(sf_dir: str):
    """REAL video header decode (multimodal triad, video leg): per doc a
    byte-exact MP4 (ISO-BMFF moov/mvhd/tkhd) or AVI (RIFF hdrl/avih)
    payload synthesized from doc_id, parsed back by the VideoMetaStage
    actor pool; oracle recomputes the planted width/height/duration
    arithmetically — round trip proves the box/chunk walks."""
    from ..functions.dedup import default_actor_concurrency
    from ..functions.multimodal import (
        SUGGESTED_BINARY_BATCH_SIZE,
        VideoMetaStage,
        make_avi,
        make_mp4,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def mk(batch: pa.Table) -> pa.Table:
        payloads = []
        for i in batch["doc_id"].to_numpy():
            i = int(i)
            w, h = i % 1920 + 16, i % 1080 + 16
            if i % 2 == 0:
                payloads.append(make_mp4(w, h, i % 100000 + 1000))
            else:
                payloads.append(make_avi(w, h, i % 500 + 25))
        return pa.table(
            {"doc_id": batch["doc_id"],
             "payload": pa.array(payloads, type=pa.binary())}
        )

    return (
        ds.map_batches(mk, batch_format="pyarrow")
        .map_batches(
            VideoMetaStage,
            batch_format="pyarrow",
            batch_size=SUGGESTED_BINARY_BATCH_SIZE * 4,
            concurrency=default_actor_concurrency(),
        )
        .select_columns(
            ["doc_id", "format", "width", "height", "duration_ms"])
    )


def sql_video_meta() -> str:
    # avi duration = us_per_frame (40000) * frames // 1000
    return """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS format,
       CAST(doc_id % 1920 + 16 AS BIGINT) AS width,
       CAST(doc_id % 1080 + 16 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 100000 + 1000
                 ELSE 40000 * (doc_id % 500 + 25) // 1000 END
            AS BIGINT) AS duration_ms
FROM documents
"""


# MultipleAdditiveTreesModel contract: a fixed 2-tree ensemble over the
# FeatureLogger features; every threshold/leaf/weight binary-exact so
# the engine's np.where cascade and the oracle's CASE WHEN agree bit-
# for-bit (branch on <= like the reference)
_LTR_TREES_MODEL = {
    "type": "trees",
    "trees": [
        {"weight": 1.0, "root": {
            "feature": "bm25", "threshold": 2.0,
            "left": {"value": 0.25},
            "right": {"feature": "tf_sum", "threshold": 4.0,
                      "left": {"value": 0.5}, "right": {"value": 1.0}}}},
        {"weight": 0.5, "root": {
            "feature": "log_dl", "threshold": 4.5,
            "left": {"feature": "matched_frac", "threshold": 0.75,
                     "left": {"value": -0.5}, "right": {"value": 0.5}},
            "right": {"value": -0.25}}},
    ],
}


def q_ltr_trees_rerank_topk(sf_dir: str) -> pd.DataFrame:
    """LTR MultipleAdditiveTreesModel (SURVEY.md §2.4 LTR row; [8x]
    solr/contrib/ltr/.../model/MultipleAdditiveTreesModel.java — the
    LambdaMART ensemble): same rescoring window as ltr_rerank_topk, but
    score2 = Σ tree.weight × leaf, branching left on feature ≤
    threshold; vectorized np.where cascade (search/ltr.py#eval_trees)."""
    from ..search.ltr import ltr_rerank

    idx = ensure_ft_index(sf_dir)
    res = ltr_rerank(
        idx,
        [{"query_id": 0, "kind": "or", "terms": FT_TERMS_OR}],
        model=_LTR_TREES_MODEL,
        k=10,
        rerank_k=50,
        sim_config={"dtype": "float64", "mode": "div"},
    )
    return pd.DataFrame(
        {
            "rank": res["rank"].astype(np.int64),
            "doc_id": _url_to_doc_id(res["url"]),
            "score2_e6": np.floor(
                res["score2"].to_numpy() * 1e6).astype(np.int64),
        }
    )


def sql_ltr_trees_rerank_topk() -> str:
    terms = ",".join(f"'{t}'" for t in FT_TERMS_OR)
    n_terms = len(FT_TERMS_OR)
    return (
        _ft_sql_common()
        + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS freq FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           - ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             / (1 + tf.freq / (1.2 * (1 - 0.75 + 0.75 * norml.nl / (stats.sdl / stats.n))))
         ) AS bm25,
         sum(tf.freq) AS tf_sum,
         count(DISTINCT tf.term) AS n_matched
  FROM tf
  JOIN dfs USING (term)
  JOIN norml ON norml.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
cand AS (
  SELECT scored.*, dl.dl FROM scored JOIN dl USING (doc_id)
  ORDER BY bm25 DESC, doc_id ASC LIMIT 50
),
rescored AS (
  SELECT doc_id,
         (CASE WHEN bm25 <= 2.0 THEN 0.25
               ELSE CASE WHEN tf_sum <= 4.0 THEN 0.5 ELSE 1.0 END END)
         + 0.5 * (CASE WHEN ln(1.0 + dl) <= 4.5
                  THEN CASE WHEN (n_matched / {n_terms}.0) <= 0.75
                       THEN -0.5 ELSE 0.5 END
                  ELSE -0.25 END) AS score2
  FROM cand
)
SELECT row_number() OVER (ORDER BY score2 DESC, doc_id ASC) AS rank,
       doc_id,
       CAST(floor(score2 * 1000000) AS BIGINT) AS score2_e6
FROM rescored
ORDER BY score2 DESC, doc_id ASC
LIMIT 10
"""
    )


# facet.heatmap contract geometry: one box + grid shared VERBATIM (full
# -precision repr literals) by the Ray kernel and the DuckDB oracle so
# every float op is bit-identical by construction (the {!bbox} idiom)
_HM_BOX = (-60.0, 70.0, -160.0, 160.0)
_HM_ROWS, _HM_COLS = 6, 8
_HM_CELL_H = (_HM_BOX[1] - _HM_BOX[0]) / _HM_ROWS
_HM_CELL_W = (_HM_BOX[3] - _HM_BOX[2]) / _HM_COLS


def q_facet_heatmap_customers(sf_dir: str):
    """facet.heatmap analog (SURVEY.md §2.6; [8x] solr/core/.../component/
    SpatialHeatmapFacets.java + HeatmapFacetCounter): per-grid-cell
    counts over a box, row 0 at the top (maxY) like counts_ints2D —
    customer points from the Knuth-scrambled key derivation (the
    geofilt grid), nonzero cells only, row-major order."""
    from ..functions.relational import facet_heatmap

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def pts(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy().astype(np.int64)
        nk = batch["c_nationkey"].to_numpy().astype(np.int64)
        k2 = (ck * 2654435761) % 4294967296
        return pa.table({
            "lat": (k2 % 17000) / 100.0 - 85.0,
            "lon": ((k2 // 7 + nk) % 36000) / 100.0 - 180.0,
        })

    return facet_heatmap(
        cust.map_batches(pts, batch_format="pyarrow"),
        "lat", "lon", _HM_BOX, _HM_ROWS, _HM_COLS)


def sql_facet_heatmap_customers() -> str:
    lat_lo, lat_hi, lon_lo, lon_hi = _HM_BOX
    return f"""
WITH k AS (
  SELECT c_nationkey, ((c_custkey * 2654435761) % 4294967296) AS k2
  FROM customer
), pts AS (
  SELECT (k2 % 17000) / 100.0 - 85.0 AS lat,
         ((k2 // 7 + c_nationkey) % 36000) / 100.0 - 180.0 AS lon
  FROM k
), cells AS (
  SELECT CAST(least(floor(({lat_hi!r} - lat) / {_HM_CELL_H!r}),
                    {_HM_ROWS - 1}) AS BIGINT) AS grid_row,
         CAST(least(floor((lon - {lon_lo!r}) / {_HM_CELL_W!r}),
                    {_HM_COLS - 1}) AS BIGINT) AS grid_col
  FROM pts
  WHERE lat >= {lat_lo!r} AND lat <= {lat_hi!r}
    AND lon >= {lon_lo!r} AND lon <= {lon_hi!r}
)
SELECT grid_row, grid_col, count(*) AS n
FROM cells GROUP BY 1, 2 ORDER BY 1, 2
"""


# =============================================================== registry ==
QUERIES = {
    # fulltext core (SURVEY.md §2.3/§2.6/§2.7/§3.2)
    "ft_bm25_or_topk": q_ft_bm25_or_topk,
    "ft_subquery_topk": q_ft_subquery_topk,
    "ft_bool_nested_topk": q_ft_bool_nested_topk,
    "ft_parser_topk": q_ft_parser_topk,
    "ft_filter_topk": q_ft_filter_topk,
    "ft_function_boost_topk": q_ft_function_boost_topk,
    "ft_frange_topk": q_ft_frange_topk,
    "ft_rerank_topk": q_ft_rerank_topk,
    "ft_classic_topk": q_ft_classic_topk,
    "ft_delete_topk": q_ft_delete_topk,
    "decontaminate_docs": q_decontaminate_docs,
    "json_facet_query": q_json_facet_query,
    "json_facet_variance": q_json_facet_variance,
    "sort_by_function": q_sort_by_function,
    "timeseries_orders": q_timeseries_orders,
    "facet_interval_price": q_facet_interval_price,
    "graph_components": q_graph_components,
    "dedup_minhash_clusters": q_dedup_minhash_clusters,
    "semdedup_embeddings": q_semdedup_embeddings,
    "ft_span_counts": q_ft_span_counts,
    "ft_term_range_counts": q_ft_term_range_counts,
    "ft_term_stats": q_ft_term_stats,
    "ft_and_count": q_ft_and_count,
    "ft_index_stats": q_ft_index_stats,
    "ft_not_topk": q_ft_not_topk,
    "ft_msm_topk": q_ft_msm_topk,
    "ft_prefix_count": q_ft_prefix_count,
    "ft_phrase_count": q_ft_phrase_count,
    "ft_dismax_topk": q_ft_dismax_topk,
    "ft_multiphrase_topk": q_ft_multiphrase_topk,
    "ft_incremental_stats": q_ft_incremental_stats,
    "ft_wildcard_count": q_ft_wildcard_count,
    "ft_regexp_count": q_ft_regexp_count,
    "ft_fuzzy_count": q_ft_fuzzy_count,
    "ft_phrase_incremental": q_ft_phrase_incremental,
    "realtime_get": q_realtime_get,
    # text analysis (§2.2 + training-data extensions)
    "token_counts": q_token_counts,
    "doc_fingerprints": q_doc_fingerprints,
    "doc_stats": q_doc_stats,
    "quality_scores": q_quality_scores,
    "ngram_repetition": q_ngram_repetition,
    "url_normalize": q_url_normalize,
    "facet_url_paths": q_facet_url_paths,
    "term_vectors_docs": q_term_vectors_docs,
    "html_strip_docs": q_html_strip_docs,
    "ft_html_strip_stats": q_ft_html_strip_stats,
    "langid_eval": q_langid_eval,
    # dedup (§2.7 SignatureUpdateProcessor + extensions)
    "dedup_exact": q_dedup_exact,
    "dedup_fingerprint": q_dedup_fingerprint,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embed": q_dedup_embed,
    "dedup_embed_lsh_recall": q_dedup_embed_lsh_recall,
    # similarity search
    "ann_bruteforce": q_ann_bruteforce,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf_recall": q_ann_ivf_recall,
    # multimodal plumbing
    "binary_meta": q_binary_meta,
    "image_meta": q_image_meta,
    # relational / streaming-expression surface (§2.5-§2.8)
    "rollup_pricing": q_rollup_pricing,
    "join_nation_revenue": q_join_nation_revenue,
    "top_orders": q_top_orders,
    "facet_event_types": q_facet_event_types,
    "facet_top_terms": q_facet_top_terms,
    "facet_prefix_terms": q_facet_prefix_terms,
    "ft_shingle_stats": q_ft_shingle_stats,
    "ft_commongrams_stats": q_ft_commongrams_stats,
    "ft_german_stem_stats": q_ft_german_stem_stats,
    "ft_metaphone_stats": q_ft_metaphone_stats,
    "ft_french_stem_stats": q_ft_french_stem_stats,
    "ft_spanish_stem_stats": q_ft_spanish_stem_stats,
    "ft_portuguese_stem_stats": q_ft_portuguese_stem_stats,
    "ft_italian_stem_stats": q_ft_italian_stem_stats,
    "ft_russian_stem_stats": q_ft_russian_stem_stats,
    "ft_cjk_bigram_stats": q_ft_cjk_bigram_stats,
    "ft_cjk_unigram_stats": q_ft_cjk_unigram_stats,
    "ft_cjk_bigram_topk": q_ft_cjk_bigram_topk,
    "ft_dutch_stem_stats": q_ft_dutch_stem_stats,
    "ft_norwegian_stem_stats": q_ft_norwegian_stem_stats,
    "ft_danish_stem_stats": q_ft_danish_stem_stats,
    "ft_unicode_token_stats": q_ft_unicode_token_stats,
    "knn_mlt_docs": q_knn_mlt_docs,
    "suggest_terms": q_suggest_terms,
    "suggest_infix_terms": q_suggest_infix_terms,
    "terms_regex_list": q_terms_regex_list,
    "spellcheck_terms": q_spellcheck_terms,
    "ltr_rerank_topk": q_ltr_rerank_topk,
    "highlight_snippets": q_highlight_snippets,
    "highlight_phrase_snippets": q_highlight_phrase_snippets,
    "facet_pivot_orders": q_facet_pivot_orders,
    "facet_range_totalprice": q_facet_range_totalprice,
    "group_top_orders": q_group_top_orders,
    "pii_scrub_docs": q_pii_scrub_docs,
    "facet_range_dates": q_facet_range_dates,
    "elevate_topk": q_elevate_topk,
    "json_facet_orders": q_json_facet_orders,
    "json_facet_unique_pct": q_json_facet_unique_pct,
    "pack_token_windows": q_pack_token_windows,
    "stats_extendedprice": q_stats_extendedprice,
    "unique_mktsegment": q_unique_mktsegment,
    "collapse_latest_order": q_collapse_latest_order,
    "expand_other_orders": q_expand_other_orders,
    "having_frequent_customers": q_having_frequent_customers,
    "range_shipdate": q_range_shipdate,
    "semi_join_building": q_semi_join_building,
    "window_user_hourly": q_window_user_hourly,
    "union_order_status": q_union_order_status,
    "export_sorted": q_export_sorted,
    "percentile_totalprice": q_percentile_totalprice,
    "significant_terms": q_significant_terms,
    "cartesian_region_pairs": q_cartesian_region_pairs,
    "intersect_customers": q_intersect_customers,
    "complement_customers": q_complement_customers,
    "fetch_enrich_orders": q_fetch_enrich_orders,
    "function_scale_recip": q_function_scale_recip,
    "function_datemath": q_function_datemath,
    "hll_distinct_custkey": q_hll_distinct_custkey,
    "random_sample_orders": q_random_sample_orders,
    "stratified_sample_docs": q_stratified_sample_docs,
    "asof_last_error": q_asof_last_error,
    "session_windows_users": q_session_windows_users,
    "range_join_windows": q_range_join_windows,
    "hopping_window_events": q_hopping_window_events,
    "topk_tokens_sketch": q_topk_tokens_sketch,
    "lm_rare_bigrams": q_lm_rare_bigrams,
    "span_dedup_docs": q_span_dedup_docs,
    "kmeans_clusters": q_kmeans_clusters,
    "quality_filter_p25": q_quality_filter_p25,
    "lm_score_docs": q_lm_score_docs,
    "cursor_page_orders": q_cursor_page_orders,
    "left_outer_region_nations": q_left_outer_region_nations,
    "csv_json_loaders": q_csv_json_loaders,
    "xml_loader": q_xml_loader,
    "urp_chain": q_urp_chain,
    "function_registry": q_function_registry,
    "function_geodist": q_function_geodist,
    "function_string_pack": q_function_string_pack,
    "executor_stream_orders": q_executor_stream_orders,
    "eval_stream_orders": q_eval_stream_orders,
    "stream_evaluators_docs": q_stream_evaluators_docs,
    "stream_evaluators_ts": q_stream_evaluators_ts,
    "geofilt_customers": q_geofilt_customers,
    "bbox_customers": q_bbox_customers,
    "score_join_customers": q_score_join_customers,
    "block_join_orders": q_block_join_orders,
    "child_docs_orders": q_child_docs_orders,
    "graph_2hop_parts": q_graph_2hop_parts,
    # §2.8 ML / graph streams (functions/textml.py)
    "classify_docs": q_classify_docs,
    "features_ig_docs": q_features_ig_docs,
    "shortest_path_parts": q_shortest_path_parts,
    "score_nodes_parts": q_score_nodes_parts,
    "ft_atomic_update_stats": q_ft_atomic_update_stats,
    "ft_term_set_counts": q_ft_term_set_counts,
    "ft_span_or_counts": q_ft_span_or_counts,
    "ft_span_not_counts": q_ft_span_not_counts,
    "train_logit_docs": q_train_logit_docs,
    "bpe_merges_docs": q_bpe_merges_docs,
    "bpe_encode_docs": q_bpe_encode_docs,
    # §2.8 Parallel SQL handler analog (functions/sql.py)
    "sql_select_orders": q_sql_select_orders,
    "sql_group_events": q_sql_group_events,
    "sql_having_avg_customers": q_sql_having_avg_customers,
    "sql_in_like_parts": q_sql_in_like_parts,
    "sql_distinct_lineitem": q_sql_distinct_lineitem,
    "sql_global_lineitem": q_sql_global_lineitem,
    "sql_or_where_orders": q_sql_or_where_orders,
    "sql_count_distinct_events": q_sql_count_distinct_events,
    "facet_heatmap_customers": q_facet_heatmap_customers,
    "ltr_trees_rerank_topk": q_ltr_trees_rerank_topk,
    "audio_meta": q_audio_meta,
    "video_meta": q_video_meta,
    "group_func_orders": q_group_func_orders,
    "word_break_terms": q_word_break_terms,
    "highlight_multi_snippets": q_highlight_multi_snippets,
}

ORACLES = {
    "ft_bm25_or_topk": sql_ft_bm25_or_topk(),
    "ft_subquery_topk": sql_ft_subquery_topk(),
    "ft_bool_nested_topk": sql_ft_bool_nested_topk(),
    "ft_parser_topk": sql_ft_parser_topk(),
    "ft_filter_topk": sql_ft_filter_topk(),
    "ft_function_boost_topk": sql_ft_function_boost_topk(),
    "ft_frange_topk": sql_ft_frange_topk(),
    "ft_rerank_topk": sql_ft_rerank_topk(),
    "ft_classic_topk": sql_ft_classic_topk(),
    "ft_delete_topk": sql_ft_delete_topk(),
    "decontaminate_docs": sql_decontaminate_docs(),
    "json_facet_query": sql_json_facet_query(),
    "json_facet_variance": sql_json_facet_variance(),
    "sort_by_function": sql_sort_by_function(),
    "timeseries_orders": sql_timeseries_orders(),
    "facet_interval_price": sql_facet_interval_price(),
    "graph_components": sql_graph_components(),
    "ft_span_counts": sql_ft_span_counts(),
    "ft_term_range_counts": sql_ft_term_range_counts(),
    "ft_term_stats": sql_ft_term_stats(),
    "ft_and_count": sql_ft_and_count(),
    "ft_index_stats": sql_ft_index_stats(),
    "ft_not_topk": sql_ft_not_topk(),
    "ft_msm_topk": sql_ft_msm_topk(),
    "ft_prefix_count": sql_ft_prefix_count(),
    "ft_phrase_count": sql_ft_phrase_count(),
    "ft_dismax_topk": sql_ft_dismax_topk(),
    "ft_multiphrase_topk": sql_ft_multiphrase_topk(),
    "ft_incremental_stats": sql_ft_incremental_stats(),
    "ft_wildcard_count": sql_ft_wildcard_count(),
    "ft_regexp_count": sql_ft_regexp_count(),
    "ft_fuzzy_count": sql_ft_fuzzy_count(),
    "ft_phrase_incremental": sql_ft_phrase_incremental(),
    "realtime_get": sql_realtime_get(),
    "token_counts": sql_token_counts(),
    "doc_fingerprints": sql_doc_fingerprints(),
    "doc_stats": sql_doc_stats(),
    "quality_scores": sql_quality_scores(),
    "ngram_repetition": sql_ngram_repetition(),
    "url_normalize": sql_url_normalize(),
    "facet_url_paths": sql_facet_url_paths(),
    "term_vectors_docs": sql_term_vectors_docs(),
    "html_strip_docs": sql_html_strip_docs(),
    "ft_html_strip_stats": sql_ft_html_strip_stats(),
    "dedup_exact": sql_dedup_exact(),
    "dedup_fingerprint": sql_dedup_fingerprint(),
    "dedup_embed": sql_dedup_embed(),
    "ann_bruteforce": sql_ann_bruteforce(),
    "binary_meta": sql_binary_meta(),
    "image_meta": sql_image_meta(),
    "rollup_pricing": sql_rollup_pricing(),
    "join_nation_revenue": sql_join_nation_revenue(),
    "top_orders": sql_top_orders(),
    "facet_event_types": sql_facet_event_types(),
    "facet_top_terms": sql_facet_top_terms(),
    "facet_prefix_terms": sql_facet_prefix_terms(),
    "ft_shingle_stats": sql_ft_shingle_stats(),
    "ft_commongrams_stats": sql_ft_commongrams_stats(),
    "ft_german_stem_stats": sql_ft_german_stem_stats(),
    "ft_metaphone_stats": sql_ft_metaphone_stats(),
    "ft_french_stem_stats": _sql_lang_stem_stats(FRENCH_PLANT),
    "ft_spanish_stem_stats": _sql_lang_stem_stats(SPANISH_PLANT),
    "ft_portuguese_stem_stats": _sql_lang_stem_stats(PORTUGUESE_PLANT),
    "ft_italian_stem_stats": _sql_lang_stem_stats(ITALIAN_PLANT),
    "ft_russian_stem_stats": _sql_lang_stem_stats(RUSSIAN_PLANT),
    "ft_cjk_bigram_stats": sql_ft_cjk_bigram_stats(),
    "ft_cjk_unigram_stats": sql_ft_cjk_unigram_stats(),
    "ft_cjk_bigram_topk": sql_ft_cjk_bigram_topk(),
    "ft_dutch_stem_stats": _sql_lang_stem_stats(DUTCH_PLANT),
    "ft_norwegian_stem_stats": _sql_lang_stem_stats(NORWEGIAN_PLANT),
    "ft_danish_stem_stats": _sql_lang_stem_stats(DANISH_PLANT),
    "ft_unicode_token_stats": _sql_lang_stem_stats(UNICODE_PLANT),
    "knn_mlt_docs": sql_knn_mlt_docs(),
    "suggest_terms": sql_suggest_terms(),
    "suggest_infix_terms": sql_suggest_infix_terms(),
    "terms_regex_list": sql_terms_regex_list(),
    "spellcheck_terms": sql_spellcheck_terms(),
    "ltr_rerank_topk": sql_ltr_rerank_topk(),
    "highlight_snippets": sql_highlight_snippets(),
    "highlight_phrase_snippets": sql_highlight_phrase_snippets(),
    "facet_pivot_orders": sql_facet_pivot_orders(),
    "facet_range_totalprice": sql_facet_range_totalprice(),
    "group_top_orders": sql_group_top_orders(),
    "pii_scrub_docs": sql_pii_scrub_docs(),
    "facet_range_dates": sql_facet_range_dates(),
    "elevate_topk": sql_elevate_topk(),
    "json_facet_orders": sql_json_facet_orders(),
    "json_facet_unique_pct": sql_json_facet_unique_pct(),
    "pack_token_windows": sql_pack_token_windows(),
    "stats_extendedprice": sql_stats_extendedprice(),
    "unique_mktsegment": sql_unique_mktsegment(),
    "collapse_latest_order": sql_collapse_latest_order(),
    "expand_other_orders": sql_expand_other_orders(),
    "having_frequent_customers": sql_having_frequent_customers(),
    "range_shipdate": sql_range_shipdate(),
    "semi_join_building": sql_semi_join_building(),
    "window_user_hourly": sql_window_user_hourly(),
    "union_order_status": sql_union_order_status(),
    "export_sorted": sql_export_sorted(),
    "percentile_totalprice": sql_percentile_totalprice(),
    "significant_terms": sql_significant_terms(),
    "cartesian_region_pairs": sql_cartesian_region_pairs(),
    "intersect_customers": sql_intersect_customers(),
    "complement_customers": sql_complement_customers(),
    "fetch_enrich_orders": sql_fetch_enrich_orders(),
    "function_scale_recip": sql_function_scale_recip(),
    "function_datemath": sql_function_datemath(),
    "random_sample_orders": sql_random_sample_orders(),
    "stratified_sample_docs": sql_stratified_sample_docs(),
    "asof_last_error": sql_asof_last_error(),
    "session_windows_users": sql_session_windows_users(),
    "range_join_windows": sql_range_join_windows(),
    "hopping_window_events": sql_hopping_window_events(),
    "topk_tokens_sketch": sql_topk_tokens_sketch(),
    "lm_rare_bigrams": sql_lm_rare_bigrams(),
    "span_dedup_docs": sql_span_dedup_docs(),
    "quality_filter_p25": sql_quality_filter_p25(),
    "cursor_page_orders": sql_cursor_page_orders(),
    "left_outer_region_nations": sql_left_outer_region_nations(),
    "csv_json_loaders": sql_csv_json_loaders(),
    "xml_loader": sql_xml_loader(),
    "urp_chain": sql_urp_chain(),
    "function_registry": sql_function_registry(),
    "function_geodist": sql_function_geodist(),
    "function_string_pack": sql_function_string_pack(),
    "executor_stream_orders": sql_executor_stream_orders(),
    "eval_stream_orders": sql_eval_stream_orders(),
    "stream_evaluators_docs": sql_stream_evaluators_docs(),
    "stream_evaluators_ts": sql_stream_evaluators_ts(),
    "geofilt_customers": sql_geofilt_customers(),
    "bbox_customers": sql_bbox_customers(),
    "score_join_customers": sql_score_join_customers(),
    "block_join_orders": sql_block_join_orders(),
    "child_docs_orders": sql_child_docs_orders(),
    "graph_2hop_parts": sql_graph_2hop_parts(),
    "classify_docs": sql_classify_docs(),
    "features_ig_docs": sql_features_ig_docs(),
    "shortest_path_parts": sql_shortest_path_parts(),
    "score_nodes_parts": sql_score_nodes_parts(),
    "ft_atomic_update_stats": sql_ft_atomic_update_stats(),
    "ft_term_set_counts": sql_ft_term_set_counts(),
    "ft_span_or_counts": sql_ft_span_or_counts(),
    "ft_span_not_counts": sql_ft_span_not_counts(),
    # train_logit_docs: no SQL oracle (iterative float training) — rows-only
    "sql_select_orders": sql_sql_select_orders(),
    "sql_group_events": sql_sql_group_events(),
    "sql_having_avg_customers": sql_sql_having_avg_customers(),
    "sql_in_like_parts": sql_sql_in_like_parts(),
    "sql_distinct_lineitem": sql_sql_distinct_lineitem(),
    "sql_global_lineitem": sql_sql_global_lineitem(),
    "sql_or_where_orders": sql_sql_or_where_orders(),
    "sql_count_distinct_events": sql_sql_count_distinct_events(),
    "facet_heatmap_customers": sql_facet_heatmap_customers(),
    "ltr_trees_rerank_topk": sql_ltr_trees_rerank_topk(),
    "audio_meta": sql_audio_meta(),
    "video_meta": sql_video_meta(),
    "group_func_orders": sql_group_func_orders(),
    "word_break_terms": sql_word_break_terms(),
    "highlight_multi_snippets": sql_highlight_multi_snippets(),
}
