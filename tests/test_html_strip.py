"""HTMLStripCharFilter analog: goldens, entity decode, analyzer chain and
end-to-end build+search through the char_filters spec slot (SURVEY.md §2.1)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.analysis.html import (
    REPLACEMENTS,
    build_char_filter_chain,
    html_strip,
    html_strip_array,
)
from lucene_solr_ray.stages.analyzer import AnalyzerStage, analyze

GOLDEN = [
    # inline tags glue, block tags separate
    ("<b>bold</b>face", "boldface"),
    ("one<p>two", "one two"),
    ("a<br/>b", "a b"),
    ("<a href='x'>link</a>next", "linknext"),
    ("<IMG SRC='y'>glue", "glue"),
    # content-bearing elements removed including bodies
    ("keep<script>var x = '<p>';</script>kept", "keep kept"),
    ("x<style>p{color:red}</style>y", "x y"),
    ("x<ScRiPt>bad()</sCrIpT>ok", "x ok"),
    # comments / doctype / processing instructions
    ("a<!-- <b>gone</b> -->b", "a b"),
    ("<!DOCTYPE html>doc", " doc"),
    ("<?xml version='1.0'?>pi", " pi"),
    # entities: named, decimal, hex; &amp; decodes without double-decode
    ("a &lt; b &gt; c", "a < b > c"),
    ("&#97;nd &#x41;", "and A"),
    ("&quot;q&quot; &#39;s&#39;", "\"q\" 's'"),
    ("&amp;lt; stays literal", "&lt; stays literal"),
    ("R&amp;D", "R&D"),
    ("caf&eacute;", "café"),
    # attributes, self-closing, uppercase
    ('<p class="x" id="y">attr</p>', " attr "),
    ("no markup", "no markup"),
    ("", ""),
]


@pytest.mark.parametrize("raw,expected", GOLDEN)
def test_golden(raw, expected):
    assert html_strip(raw) == expected


def test_array_matches_scalar_and_binary_input():
    raws = [g[0] for g in GOLDEN] + [None]
    arr = html_strip_array(pa.array(raws, type=pa.string()))
    assert arr.to_pylist() == [g[1] for g in GOLDEN] + [None]
    # binary (the corpus html column type) casts through
    b = pa.array([r.encode("utf-8") if r else b"" for r in raws[:-1]],
                 type=pa.binary())
    assert html_strip_array(b).to_pylist() == [g[1] for g in GOLDEN]


def test_duckdb_chain_parity():
    """The exported REPLACEMENTS chain produces the same pre-entity text
    in DuckDB regexp_replace — the html_strip_docs oracle's foundation."""
    import duckdb

    import pyarrow.compute as pc

    expr = "s"
    for pat, repl in REPLACEMENTS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    con = duckdb.connect()
    for raw, _ in GOLDEN:
        want = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [raw]).fetchone()[0]
        arr = pa.array([raw], type=pa.string())
        for pat, repl in REPLACEMENTS:
            arr = pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
        assert arr[0].as_py() == want, raw


def test_char_filter_chain_spi():
    chain = build_char_filter_chain(["html_strip"])
    assert chain(pa.array(["<b>x</b>y"]))[0].as_py() == "xy"
    assert build_char_filter_chain([]) is None
    assert build_char_filter_chain(None) is None
    with pytest.raises(ValueError):
        build_char_filter_chain(["nope"])


def test_analyze_with_char_filter():
    spec = {"char_filters": ["html_strip"], "filters": ["lowercase"]}
    assert analyze("<h1>Hello &amp; World</h1><b>Bold</b>Text", spec) == [
        "hello", "world", "boldtext"]
    # char filter composes with downstream filters
    spec2 = {"char_filters": ["html_strip"],
             "filters": ["lowercase", "porter_stem"]}
    assert analyze("<p>running</p>", spec2) == ["run"]


def test_analyzer_stage_mixed_batch():
    """ASCII and non-ASCII rows both pass through the char filter (it runs
    on the whole column before the fast/regex path split)."""
    spec = {"char_filters": ["html_strip"], "filters": ["lowercase"]}
    st = AnalyzerStage(2, spec=spec)
    t = pa.table({
        "url": ["doc://0", "doc://1", "doc://2"],
        "warc_ts": pa.array(np.array([0, 1, 2], dtype="datetime64[us]")),
        "text": ["<b>Keep</b>Together plain",
                 "caf&eacute; <p>münchen</p>",
                 "<script>gone()</script>stays"],
    })
    out = st(t)
    assert out["terms"].to_pylist() == [
        ["keeptogether", "plain"], ["café", "münchen"], ["stays"]]
    assert out["dl"].to_pylist() == [2, 2, 1]


def test_build_search_through_char_filter(ray_session, tmp_path):
    """End-to-end: an index built with char_filters=["html_strip"] matches
    entity-decoded / tag-glued terms and does NOT index script bodies."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    texts = [
        "<b>zq</b><i>glued</i> first",
        "zq&#103;lued second",                      # same term via entity
        "<script>zqhidden()</script> other",
        "plain zqglued third",
    ]
    t = pa.table({
        "url": [f"u://{i:04d}" for i in range(len(texts))],
        "warc_ts": pa.array(
            np.arange(len(texts), dtype=np.int64).astype("datetime64[us]")),
        "html": pa.array([None] * len(texts), type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(["en"] * len(texts), type=pa.string()),
    })
    src = tmp_path / "pages.parquet"
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    build_index(
        [str(src)], idx, num_partitions=2,
        analyzer_spec={"tokenizer": "standard_uax29",
                       "max_token_length": 255,
                       "char_filters": ["html_strip"],
                       "filters": ["lowercase"]},
    )
    hits = search(idx, [{"query_id": 0, "kind": "term", "terms": ["zqglued"]}], k=10)
    assert sorted(hits["url"]) == ["u://0000", "u://0001", "u://0003"]
    none = search(idx, [{"query_id": 0, "kind": "term", "terms": ["zqhidden"]}], k=10)
    assert len(none) == 0
