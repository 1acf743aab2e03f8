"""Jobs CLI (`python -m lucene_solr_ray.jobs …`, the `ray job submit`
entry point): every subcommand prints exactly one JSON line. Driven
in-process via jobs.main() under the shared pytest Ray session; covers
the round-5 training-data subcommands (dedup exact/minhash/simhash,
curate) plus analyze / build / search / check."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray import jobs


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    base = tmp_path_factory.mktemp("jobs_cli")
    texts = [
        "the quick brown fox jumps",
        "der schnelle braune fuchs",
        "the quick brown fox jumps",
        "les enfants de la patrie",
        "ray data streams blocks fast",
    ] * 8
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
        }),
        str(base / "docs.parquet"),
    )
    pq.write_table(
        pa.table({
            "url": [f"u://{i:03d}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }),
        str(base / "pages.parquet"),
    )
    return base


def _run(capsys, argv):
    jobs.main(argv)
    out = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]
    return out


def test_dedup_exact_cli(ray_session, corpus, capsys):
    out = _run(capsys, [
        "dedup", "--input", str(corpus / "docs.parquet"),
        "--out", str(corpus / "exact"), "--algo", "exact",
    ])
    res = json.loads(out[-1])
    assert res == {"algo": "exact", "rows": 4, "out": str(corpus / "exact")}
    import pyarrow.dataset as pads

    t = pads.dataset(str(corpus / "exact")).to_table()
    assert sorted(t.column_names) == ["content_hash", "doc_id", "text"]
    assert sorted(t["text"].to_pylist()) == sorted({
        "the quick brown fox jumps", "der schnelle braune fuchs",
        "les enfants de la patrie", "ray data streams blocks fast"})


def test_dedup_minhash_cli(ray_session, corpus, capsys):
    out = _run(capsys, [
        "dedup", "--input", str(corpus / "docs.parquet"),
        "--out", str(corpus / "mh"), "--algo", "minhash",
        "--threshold", "0.9",
    ])
    res = json.loads(out[-1])
    # 5-text cycle x8: one text appears 16 times, three appear 8 times —
    # all-identical pairs survive any threshold: C(16,2) + 3*C(8,2)
    assert res["rows"] == 120 + 3 * 28
    assert res["algo"] == "minhash"


def test_curate_cli(ray_session, corpus, capsys):
    out = _run(capsys, [
        "curate", "--input", str(corpus / "docs.parquet"),
        "--out", str(corpus / "cur"),
        "--ops", "tokens,quality,stats,repetition,langid",
    ])
    res = json.loads(out[-1])
    assert res["rows"] == 40
    import pyarrow.dataset as pads

    t = pads.dataset(str(corpus / "cur")).to_table()
    names = t.column_names
    assert len(set(names)) == len(names), "duplicate signal columns"
    for col in ("n_tokens", "stopword_ratio_e6", "n_unique",
                "top_bigram_frac_e6", "lang_pred"):
        assert col in names, col
    langs = dict(zip(t["doc_id"].to_pylist(), t["lang_pred"].to_pylist()))
    assert langs[0] == "en" and langs[1] == "de"


def test_curate_rejects_unknown_op(ray_session, corpus):
    with pytest.raises(SystemExit):
        jobs.main([
            "curate", "--input", str(corpus / "docs.parquet"),
            "--out", str(corpus / "nope"), "--ops", "tokens,bogus",
        ])


def test_analyze_build_search_check_cli(ray_session, corpus, capsys):
    out = _run(capsys, [
        "analyze", "--text", "The Quick FOXES",
        "--spec-json", json.dumps({"filters": ["lowercase", "porter_stem"]}),
    ])
    assert json.loads(out[-1]) == {"tokens": ["the", "quick", "fox"]}

    idx = str(corpus / "idx")
    out = _run(capsys, [
        "build", "--input", str(corpus / "pages.parquet"),
        "--index-root", idx, "--partitions", "2",
    ])
    built = json.loads(out[-1])
    assert built["num_docs"] == 40 and built["num_partitions"] == 2

    res_path = str(corpus / "hits.jsonl")
    out = _run(capsys, [
        "search", "--index-root", idx,
        "--queries", json.dumps(
            [{"query_id": 0, "kind": "term", "terms": ["fox"]}]),
        "--k", "5", "--out", res_path, "--format", "jsonl",
    ])
    assert json.loads(out[-1])["rows"] == 5  # 16 fox docs, k=5

    with pytest.raises(SystemExit) as ei:
        jobs.main(["check", "--index-root", idx])
    assert ei.value.code == 0
    errors = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines() if ln][-1])
    assert errors == {"errors": []}


def test_suggest_terms_cli(ray_session, corpus, capsys):
    idx = str(corpus / "idx2")
    _run(capsys, [
        "build", "--input", str(corpus / "pages.parquet"),
        "--index-root", idx, "--partitions", "2",
    ])
    out = _run(capsys, [
        "suggest", "--index-root", idx, "--lookups", "fo", "qu",
        "--k", "3",
    ])
    rows = json.loads(out[-1])
    assert {"fox", "quick"} <= {r["term"] for r in rows}
    out = _run(capsys, [
        "suggest", "--index-root", idx, "--lookups", "ow", "--match", "infix",
    ])
    assert {r["term"] for r in json.loads(out[-1])} == {"brown"}
    out = _run(capsys, [
        "terms", "--index-root", idx, "--regex", "f.*|.*ck",
    ])
    assert {r["term"] for r in json.loads(out[-1])} >= {
        "fox", "fuchs", "quick"}


def test_curate_fingerprint_op(ray_session, corpus, capsys):
    out = _run(capsys, [
        "curate", "--input", str(corpus / "docs.parquet"),
        "--out", str(corpus / "fp"), "--ops", "fingerprint",
    ])
    assert json.loads(out[-1])["rows"] == 40
    import pyarrow.dataset as pads

    t = pads.dataset(str(corpus / "fp")).to_table().to_pandas()
    fp_col = [c for c in t.columns if "fingerprint" in c or "fp" in c]
    assert fp_col, t.columns
    # identical texts => identical fingerprints; distinct texts differ
    g = t.groupby("text")[fp_col[0]].nunique()
    assert (g == 1).all()
    assert t[fp_col[0]].nunique() == t["text"].nunique()


def test_atomic_update_cli(ray_session, corpus, capsys):
    idx = str(corpus / "idx_atomic")
    _run(capsys, [
        "build", "--input", str(corpus / "pages.parquet"),
        "--index-root", idx, "--partitions", "2",
    ])
    out = _run(capsys, [
        "atomic-update", "--index-root", idx,
        "--source", str(corpus / "pages.parquet"),
        "--updates", json.dumps([
            {"url": "u://003", "ops": {"text": {"set": "zzcli marker"}}},
            {"url": "u://nope", "ops": {"text": {"set": "x"}}},
        ]),
    ])
    res = json.loads(out[-1])
    assert res["updated"] == 1 and res["missing"] == ["u://nope"]

    hits_path = str(corpus / "atomic_hits.jsonl")
    out = _run(capsys, [
        "search", "--index-root", idx,
        "--queries", json.dumps(
            [{"query_id": 0, "kind": "term", "terms": ["zzcli"]}]),
        "--k", "5", "--out", hits_path, "--format", "jsonl",
    ])
    assert json.loads(out[-1])["rows"] == 1
    with open(hits_path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    assert rows[0]["url"] == "u://003"


def test_sql_cli(ray_session, corpus, capsys, tmp_path):
    """`jobs sql` (the /sql handler analog): stdout table render and
    --out file writes, counts verified against duckdb on the same
    parquet."""
    import duckdb

    sf = str(corpus)
    # docs.parquet has 40 rows over 4 distinct texts, doc_id 0..39
    out = _run(capsys, [
        "sql", "--sf-dir", sf,
        "--query", "SELECT COUNT(DISTINCT text) AS dt "
                   "FROM docs WHERE doc_id >= 10 OR doc_id < 5",
        "--out", str(tmp_path / "r.csv"), "--format", "csv",
    ])
    res = json.loads(out[-1])
    assert res["rows"] == 1
    want = duckdb.sql(
        f"SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS dt "
        f"FROM read_parquet('{sf}/docs.parquet') "
        f"WHERE doc_id >= 10 OR doc_id < 5").fetchdf()
    import pandas as pd

    got = pd.read_csv(tmp_path / "r.csv")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
