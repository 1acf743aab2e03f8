"""Solr XML update-payload loader: parse semantics (multivalued collect,
last-wins repeats, escaping, CDATA-free text), typed schema casts, and
the distributed read path."""

import pyarrow as pa
import pytest

from lucene_solr_ray.sources.xmlloader import parse_update_xml, read_update_xml


def test_parse_basic_and_escapes():
    docs = parse_update_xml(
        '<add><doc><field name="id">1</field>'
        '<field name="t">a &amp; b &lt;x&gt;</field></doc>'
        '<doc><field name="id">2</field><field name="t"></field></doc></add>'
    )
    assert docs == [{"id": "1", "t": "a & b <x>"}, {"id": "2", "t": ""}]


def test_parse_multivalued_and_last_wins():
    payload = (
        '<add><doc><field name="id">1</field>'
        '<field name="tag">a</field><field name="tag">b</field></doc></add>'
    )
    assert parse_update_xml(payload, multivalued=["tag"]) == [
        {"id": "1", "tag": ["a", "b"]}
    ]
    # un-declared repeats: last value wins (SolrInputDocument.setField)
    assert parse_update_xml(payload) == [{"id": "1", "tag": "b"}]


def test_parse_rejects_wrong_root_and_anonymous_field():
    with pytest.raises(ValueError, match="add"):
        parse_update_xml("<delete><id>1</id></delete>")
    with pytest.raises(ValueError, match="name"):
        parse_update_xml("<add><doc><field>x</field></doc></add>")


def test_read_update_xml_typed(ray_session, tmp_path):
    for i in range(3):
        body = "".join(
            f'<doc><field name="k">{i * 10 + j}</field>'
            f'<field name="v">row{i}-{j}</field></doc>'
            for j in range(4)
        )
        (tmp_path / f"up-{i}.xml").write_text(f"<add>{body}</add>")
    ds = read_update_xml(
        [str(tmp_path / f"up-{i}.xml") for i in range(3)],
        schema=pa.schema([("k", pa.int64()), ("v", pa.string())]),
    )
    df = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(df) == 12
    assert df["k"].tolist() == sorted(i * 10 + j for i in range(3) for j in range(4))
    assert str(df["k"].dtype) == "int64"
    assert df.loc[0, "v"] == "row0-0"
