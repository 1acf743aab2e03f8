"""Suggester over global term stats: prefix pruning, weight ordering,
multi-prefix merge, min_df."""

import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.pipelines.build import build_index
from lucene_solr_ray.search.suggest import suggest


def _mk_index(tmp_path):
    texts = [
        "search searching searched sort",
        "search sorted sorting",
        "search apple sort sort sort",
        "apple banana",
    ]
    pages = pa.table(
        {
            "url": [f"u://{i:03d}" for i in range(len(texts))],
            "warc_ts": pa.array(range(len(texts)), type=pa.timestamp("us")),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_partitions=2)
    return idx


def test_suggest_ordering_and_prune(ray_session, tmp_path):
    idx = _mk_index(tmp_path)
    res = suggest(idx, ["s", "so", "zz"], k=3, weight="total_tf")
    s = res[res["prefix"] == "s"]
    # total_tf: sort=4, search=3, sorted/sorting/searching/searched=1
    assert list(s["term"]) == ["sort", "search", "searched"]
    assert list(s["total_tf"]) == [4, 3, 1]
    assert list(s["rank"]) == [1, 2, 3]
    so = res[res["prefix"] == "so"]
    assert list(so["term"]) == ["sort", "sorted", "sorting"]
    assert (res["prefix"] == "zz").sum() == 0  # no completions

    # df weight reorders: search df=3 > sort df=2
    by_df = suggest(idx, ["s"], k=2, weight="df")
    assert list(by_df["term"]) == ["search", "sort"]

    # min_df prunes the singletons
    md = suggest(idx, ["s"], k=10, weight="total_tf", min_df=2)
    assert set(md["term"]) == {"sort", "search"}


def test_word_break_split_and_combine(ray_session, built_indexes):
    """WordBreakSolrSpellChecker analog: break resolves both split
    sides against the dictionary (min_break floors the sides), combine
    checks the concatenation; freq = min(df_a, df_b) for breaks."""
    from lucene_solr_ray.search.spellcheck import word_break

    idx = built_indexes[1]  # P=4 index over the pages corpus
    # pages vocab contains 'search' etc.; use a term we know splits —
    # derive two vocab words from the dictionary itself
    import os

    import pyarrow.parquet as pq

    stats = pq.read_table(
        os.path.join(idx, "stats", "global_stats"),
        columns=["term", "df"]).to_pandas()
    vocab = dict(zip(stats["term"], stats["df"].astype(int)))
    words = sorted(w for w in vocab if len(w) >= 3 and w.isalpha())[:6]
    a, b = words[0], words[1]
    out = word_break(idx, [a + b, "zz"], min_break=3)
    row = out[(out["kind"] == "break")
              & (out["suggestion"] == f"{a} {b}")]
    assert len(row) == 1
    assert int(row["freq"].iloc[0]) == min(vocab[a], vocab[b])
    # combine: adjacent pair whose concat is a vocab word
    target = next(w for w in vocab if len(w) >= 6 and w.isalpha())
    out2 = word_break(idx, [target[:3], target[3:]], min_break=3)
    comb = out2[out2["kind"] == "combine"]
    assert len(comb) == 1 and comb["suggestion"].iloc[0] == target
    assert int(comb["freq"].iloc[0]) == vocab[target]
    # no dictionary hits → empty frame with the stable schema
    empty = word_break(idx, ["qqqxyzzz"], min_break=3)
    assert list(empty.columns) == ["kind", "original", "suggestion", "freq"]
    assert len(empty) == 0
