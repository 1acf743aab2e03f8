"""Corpus-trained bigram language-model scoring — the CCNet-style
curation signal (score each document by how typical its token
transitions are for the corpus; low scores flag boilerplate/noise).

No reference analog (SURVEY.md training-data extensions). Scale shape:
the LM is NOT broadcast — bigram counts stay a distributed table and
documents' exploded bigrams reach them via two co-partitioned hash
joins (bigram key, then context key), so vocabulary size is unbounded.
All per-batch work is vectorized Arrow/numpy; the only Python per group
is the final per-doc aggregate, which is Ray's native Sum/Count.

Float caveat (why the oracle-checked contract is integer-exact): the
mean log-probability sums float64 logs, and summation order differs
between engines, so ``lm_score_docs`` is pytest-gated against a
single-process numpy reference instead of DuckDB; the integer
rare-bigram statistics (``rare_bigram_stats``) run the SAME explode +
count + join machinery and ARE DuckDB-oracle-checked exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["explode_bigrams", "bigram_counts", "rare_bigram_stats", "lm_score_docs"]

_SEP = "\x1f"


def explode_bigrams(ds, id_col: str, text_col: str, split: str = " "):
    """One row per (doc, adjacent token pair): ``(id, w1, key)`` where
    ``key = w1 + SEP + w2`` (single-column shuffle/join key)."""

    def fn(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch[text_col], split)
        lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
        flat = pc.list_flatten(parts).combine_chunks()
        total = int(lens.sum())
        if total == 0:
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "w1": pa.array([], type=pa.string()),
                             "key": pa.array([], type=pa.string())})
        mask = np.ones(total, dtype=bool)
        ends = np.cumsum(lens) - 1
        mask[ends[lens > 0]] = False  # last token of each doc starts no bigram
        idx = np.nonzero(mask)[0]
        w1 = flat.take(pa.array(idx))
        w2 = flat.take(pa.array(idx + 1))
        key = pc.binary_join_element_wise(w1, w2, _SEP)
        ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lens)[idx]
        return pa.table({id_col: pa.array(ids), "w1": w1, "key": key})

    return ds.map_batches(fn, batch_format="pyarrow")


def bigram_counts(bigrams, id_col: str):
    """Distributed LM training: ``(key, c12)`` bigram counts and
    ``(w1, c1)`` context counts (c1 = number of bigrams starting w1).
    Bigram keys are vocabulary²-cardinality — counted with the bucketed
    combiner+merge (relational.bucketed_agg), not a per-key exchange."""
    from .relational import bucketed_agg

    bgc = bucketed_agg(bigrams.select_columns(["key"]), "key",
                       [("key", "count")], ["c12"])
    ctx = bucketed_agg(bigrams.select_columns(["w1"]), "w1",
                       [("w1", "count")], ["c1"])
    return bgc, ctx


def _joined(ds, id_col: str, text_col: str, num_partitions=None):
    from .relational import default_shuffle_partitions

    P = default_shuffle_partitions(num_partitions)
    # the exploded bigrams feed THREE consumers (bigram counts, context
    # counts, join probe) — materialize once so Ray doesn't re-execute the
    # read+explode lineage per consumer; blocks live in the object store
    # and spill, never on the driver
    bg = explode_bigrams(ds, id_col, text_col).materialize()
    bgc, ctx = bigram_counts(bg, id_col)
    # heal block schemas before joining: the bucketed-count lineage emits
    # schema-less empty bundles on tiny inputs (ray-data notes)
    bgc = bgc.repartition(P)
    ctx = ctx.repartition(P)
    j = bg.join(bgc, join_type="inner", num_partitions=P, on=("key",))
    return j.join(ctx, join_type="inner", num_partitions=P, on=("w1",))


def rare_bigram_stats(ds, id_col: str, text_col: str, rare_max: int = 2,
                      num_partitions=None):
    """Integer-exact curation signal: per doc, total bigrams and how many
    are corpus-rare (bigram count ≤ ``rare_max``). High rare fraction =
    atypical/noisy text.

    Shape (vs the shared ``_joined`` helper, which this deliberately does
    NOT use): the context (w1) counts are never needed here, so the w1
    aggregation and the second full-corpus shuffle join are skipped
    entirely; the one remaining join probes only the RARE slice of the
    bigram-count table (the instance-volume minority), and per-doc totals
    come straight off the exploded bigrams with an id-keyed bucketed
    count. Docs whose every bigram is non-rare re-enter via a doc-level
    left join with n_rare filled to 0 — doc cardinality, not bigram
    cardinality."""
    from .relational import bucketed_agg, default_shuffle_partitions

    import ray.data

    P = default_shuffle_partitions(num_partitions)
    bg = explode_bigrams(ds, id_col, text_col).materialize()
    sch = bg.schema()
    id_type = sch.types[sch.names.index(id_col)]
    if bg.count() == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "n_bigrams": pa.array([], type=pa.int64()),
            "n_rare": pa.array([], type=pa.int64()),
        }))
    bgc = bucketed_agg(bg.select_columns(["key"]), "key",
                       [("key", "count")], ["c12"])

    def only_rare(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t["c12"], rare_max)).select(["key"])

    # materialized so the emptiness branch below doesn't re-run the count
    # lineage; a distributed materialize of the distinct-rare key list
    # (object-store blocks, spillable), never a driver collect
    rare_keys = (bgc.map_batches(only_rare, batch_format="pyarrow")
                 .repartition(P).materialize())

    _empty_out = pa.table({
        id_col: pa.array([], type=id_type),
        "n_bigrams": pa.array([], type=pa.int64()),
        "n_rare": pa.array([], type=pa.int64()),
    })

    def _tag(count_col: str):
        # bucketed-agg merge lineage ships schema-less empty bundles —
        # return a TYPED empty so downstream stages see a schema
        def tag(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _empty_out
            zeros = pa.array(np.zeros(t.num_rows, dtype=np.int64))
            cols = {id_col: t[id_col],
                    "n_bigrams": t[count_col] if count_col == "n_bigrams" else zeros,
                    "n_rare": t[count_col] if count_col == "n_rare" else zeros}
            return pa.table(cols)

        return tag

    n_big = bucketed_agg(bg.select_columns([id_col]), id_col,
                         [(id_col, "count")], ["n_bigrams"])
    big_rows = n_big.map_batches(_tag("n_bigrams"),
                                 batch_format="pyarrow")
    if rare_keys.count() == 0:
        # every bigram is corpus-common (small-vocab corpora); skip the
        # probe join entirely — n_rare is identically 0
        return big_rows
    matched = bg.select_columns([id_col, "key"]).join(
        rare_keys, join_type="inner", num_partitions=P, on=("key",))
    n_rare = bucketed_agg(matched.select_columns([id_col]), id_col,
                          [(id_col, "count")], ["n_rare"])
    rare_rows = n_rare.map_batches(_tag("n_rare"),
                                   batch_format="pyarrow")
    # docs with zero rare bigrams appear only on the n_big side; one
    # doc-cardinality bucketed sum-merge replaces a doc-level hash join
    return bucketed_agg(
        big_rows.union(rare_rows), id_col,
        [("n_bigrams", "sum"), ("n_rare", "sum")], ["n_bigrams", "n_rare"],
    )


def lm_score_docs(ds, id_col: str, text_col: str, alpha: float = 0.5,
                  num_partitions=None):
    """Per-doc mean bigram log-probability with add-``alpha`` smoothing:
    ``mean over bigrams of ln((c12 + a) / (c1 + a*V))`` for corpus vocab
    size V. Float sums are order-dependent — gate with the pytest numpy
    reference, not a SQL hash (see module docstring)."""
    from ray.data.aggregate import Mean

    from .relational import bucketed_agg

    # V = distinct tokens across the corpus (incl. doc-final tokens) —
    # vocabulary-cardinality key, bucketed distinct
    def toks(batch: pa.Table) -> pa.Table:
        return pa.table({"tok": pc.list_flatten(
            pc.split_pattern(batch[text_col], " "))})

    V = bucketed_agg(
        ds.map_batches(toks, batch_format="pyarrow"), "tok",
        [("tok", "count")], ["_c"],
    ).count()

    j = _joined(ds, id_col, text_col, num_partitions)

    def logprob(batch: pa.Table) -> pa.Table:
        c12 = batch["c12"].to_numpy().astype(np.float64)
        c1 = batch["c1"].to_numpy().astype(np.float64)
        lp = np.log((c12 + alpha) / (c1 + alpha * V))
        return pa.table({id_col: batch[id_col], "lp": pa.array(lp)})

    scored = j.map_batches(logprob, batch_format="pyarrow")
    return scored.groupby(id_col).aggregate(Mean("lp", alias_name="lm_score"))
