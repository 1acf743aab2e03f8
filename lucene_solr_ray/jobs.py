"""``ray job submit`` entry points for the index lifecycle.

The north_rule requires the build to run "via ray job submit on a
fixed-size multi-node Ray cluster". On a cluster:

    ray job submit --working-dir . -- \
        python -m lucene_solr_ray.jobs build \
            --input '/data/pages/*.parquet' --index-root /data/index --partitions 4096

Subcommands: build | append | merge | search | check | bench. Each owns
its Ray session (guarded init: inside ``ray job submit`` the cluster
address comes from the environment; standalone it starts local).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto" if "RAY_JOB_ID" in os.environ else "local"))
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def _expand(patterns):
    paths = []
    for p in patterns:
        hits = sorted(glob.glob(p))
        paths.extend(hits if hits else [p])
    return paths


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lucene_solr_ray.jobs")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full index build (resumable)")
    b.add_argument("--input", nargs="+", required=True)
    b.add_argument("--index-root", required=True)
    b.add_argument("--partitions", type=int, required=True)
    b.add_argument("--lang", default="en")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--check-extraction", action="store_true")

    a = sub.add_parser("append", help="incremental ingest (NRT analog)")
    a.add_argument("--input", nargs="+", required=True)
    a.add_argument("--index-root", required=True)
    a.add_argument("--lang", default="en")
    a.add_argument("--max-segments", type=int, default=None,
                   help="auto-merge partitions above this segment count")

    m = sub.add_parser("merge", help="forceMerge(1) every partition, or "
                       "--tiered for TieredMergePolicy partial merges")
    m.add_argument("--index-root", required=True)
    m.add_argument("--tiered", action="store_true")
    m.add_argument("--segs-per-tier", type=int, default=10)
    m.add_argument("--max-merge-at-once", type=int, default=10)

    s = sub.add_parser("search", help="run a query file, write results")
    s.add_argument("--index-root", required=True)
    s.add_argument("--queries", required=True, help="JSON list of query dicts")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--out", default=None)
    s.add_argument("--format", choices=["parquet", "csv", "jsonl"],
                   default="parquet",
                   help="output format (the /export handler streams "
                        "JSON/CSV too)")

    dl = sub.add_parser("delete", help="deleteByQuery / deleteById tombstoning")
    dl.add_argument("--index-root", required=True)
    dl.add_argument("--query", help="JSON query spec (same shape as search) "
                    "or a classic query string with --parse")
    dl.add_argument("--parse", action="store_true",
                    help="treat --query as classic parser syntax")
    dl.add_argument("--ids", nargs="*", help="urls to deleteById")

    au = sub.add_parser("atomic-update",
                        help="partial document updates (set/add/inc/remove "
                             "field modifiers, RTG-resolved, version-bumped)")
    au.add_argument("--index-root", required=True)
    au.add_argument("--source", nargs="+", required=True,
                    help="stored-field parquet (the corpus the index was "
                         "built from)")
    au.add_argument("--updates", required=True,
                    help='JSON list: [{"url": u, "ops": {field: {op: v}}}] '
                         "or a path to such a file")
    au.add_argument("--lang", default=None)

    c = sub.add_parser("check", help="CheckIndex invariants")
    c.add_argument("--index-root", required=True)

    an = sub.add_parser(
        "analyze",
        help="run an analyzer spec over text (FieldAnalysisRequestHandler "
             "analog); spec from --spec-json or an index root's manifest",
    )
    an.add_argument("--text", required=True)
    an.add_argument("--spec-json", default=None,
                    help="inline JSON analyzer spec")
    an.add_argument("--index-root", default=None,
                    help="take the spec from this index's manifest")

    d = sub.add_parser("delta", help="DIH-style watermark delta import")
    d.add_argument("--input", nargs="+", required=True)
    d.add_argument("--index-root", required=True)
    d.add_argument("--lang", default="en")
    d.add_argument("--since", type=int, default=None,
                   help="seed watermark (epoch micros) if none stored yet")

    r = sub.add_parser("replicate", help="master→replica segment pull")
    r.add_argument("--src", required=True)
    r.add_argument("--dst", required=True)

    dd = sub.add_parser(
        "dedup",
        help="training-data dedup over a parquet corpus: exact writes the "
             "SURVIVING rows (min-id per content hash), minhash/simhash "
             "write verified candidate PAIRS (a, b, ...) for the curation "
             "policy to act on — both as partitioned parquet",
    )
    dd.add_argument("--input", nargs="+", required=True)
    dd.add_argument("--out", required=True, help="output parquet directory")
    dd.add_argument("--algo", choices=["exact", "minhash", "simhash"],
                    default="exact")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--threshold", type=float, default=0.8,
                    help="minhash: exact-Jaccard verify threshold")
    dd.add_argument("--max-hamming", type=int, default=3,
                    help="simhash: max Hamming distance")

    cu = sub.add_parser(
        "curate",
        help="training-data curation signals over a parquet corpus "
             "(vectorized map_batches; langid is an actor-pool stage); "
             "writes the corpus + signal columns as partitioned parquet",
    )
    cu.add_argument("--input", nargs="+", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--ops", default="tokens,quality",
                    help="comma list of tokens|quality|stats|repetition|"
                         "fingerprint|langid")

    sg = sub.add_parser(
        "suggest",
        help="prefix/infix completions from the index's stats dictionary "
             "(TermsComponent / AnalyzingInfixSuggester analogs)",
    )
    sg.add_argument("--index-root", required=True)
    sg.add_argument("--lookups", nargs="+", required=True)
    sg.add_argument("--k", type=int, default=10)
    sg.add_argument("--match", choices=["prefix", "infix"], default="prefix")
    sg.add_argument("--weight", choices=["total_tf", "df"], default="total_tf")

    tm = sub.add_parser(
        "terms",
        help="terms.regex vocabulary listing (TermsComponent analog)",
    )
    tm.add_argument("--index-root", required=True)
    tm.add_argument("--regex", required=True)
    tm.add_argument("--limit", type=int, default=20)
    tm.add_argument("--sort", choices=["index", "count"], default="count")

    hm = sub.add_parser(
        "heatmap",
        help="facet.heatmap analog: grid-cell counts over a lat/lon box",
    )
    hm.add_argument("--sf-dir", required=True)
    hm.add_argument("--table", required=True)
    hm.add_argument("--lat-col", default="lat")
    hm.add_argument("--lon-col", default="lon")
    hm.add_argument("--box", nargs=4, type=float, required=True,
                    metavar=("LAT_LO", "LAT_HI", "LON_LO", "LON_HI"))
    hm.add_argument("--rows", type=int, default=8)
    hm.add_argument("--cols", type=int, default=8)

    sq = sub.add_parser(
        "sql",
        help="/sql handler analog: run a SQL subset over the parquet "
             "tables through the streaming-expression engine",
    )
    sq.add_argument("--sf-dir", required=True,
                    help="directory holding <table>.parquet files")
    sq.add_argument("--query", required=True)
    sq.add_argument("--out", default="")
    sq.add_argument("--format", choices=["csv", "jsonl", "parquet"],
                    default="csv")

    args = ap.parse_args(argv)

    if args.cmd == "analyze":  # pure driver-side; no Ray session needed
        from .stages.analyzer import analyze

        spec = None
        if args.spec_json:
            spec = json.loads(args.spec_json)
        elif args.index_root:
            from .state.manifest import read_root_manifest

            spec = read_root_manifest(args.index_root).get("analyzer_spec")
        print(json.dumps({"tokens": analyze(args.text, spec)}, ensure_ascii=False))
        return

    _init_ray()

    if args.cmd == "build":
        from .pipelines.build import build_index

        root = build_index(
            _expand(args.input),
            args.index_root,
            num_partitions=args.partitions,
            lang=None if args.lang in ("", "none") else args.lang,
            resume=not args.no_resume,
            check_extraction=args.check_extraction,
        )
        print(json.dumps({k: root[k] for k in
                          ("num_docs", "num_live_docs", "sum_dl", "num_partitions",
                           "build_wall_sec", "resumed_partitions")}))
    elif args.cmd == "append":
        from .pipelines.build import append_index

        root = append_index(
            _expand(args.input),
            args.index_root,
            lang=None if args.lang in ("", "none") else args.lang,
            max_segments_per_partition=args.max_segments,
        )
        print(json.dumps({k: root[k] for k in
                          ("num_docs", "num_live_docs", "build_wall_sec")}))
    elif args.cmd == "merge":
        if args.tiered:
            from .index.merge import tiered_merge_index

            res = tiered_merge_index(
                args.index_root,
                segs_per_tier=args.segs_per_tier,
                max_merge_at_once=args.max_merge_at_once,
            )
            print(json.dumps(res))
        else:
            from .index.merge import merge_index

            root = merge_index(args.index_root)
            print(json.dumps({k: root[k] for k in
                              ("num_docs", "num_live_docs", "partitions_merged")}))
    elif args.cmd == "search":
        from .pipelines.query import search

        if args.queries.lstrip().startswith("["):
            queries = json.loads(args.queries)  # inline JSON list
        else:
            with open(args.queries) as f:
                queries = json.load(f)
        res = search(args.index_root, queries, k=args.k)
        if args.out:
            if args.format == "csv":
                res.to_csv(args.out, index=False)
            elif args.format == "jsonl":
                res.to_json(args.out, orient="records", lines=True)
            else:
                res.to_parquet(args.out, index=False)
            print(json.dumps({"rows": len(res), "out": args.out,
                              "format": args.format}))
        else:
            print(res.to_string())
    elif args.cmd == "delta":
        from .pipelines.replicate import delta_import

        res = delta_import(
            _expand(args.input),
            args.index_root,
            lang=None if args.lang in ("", "none") else args.lang,
            since=args.since,
        )
        print(json.dumps({k: res.get(k) for k in
                          ("imported_docs", "delta_watermark", "noop")}))
    elif args.cmd == "replicate":
        from .pipelines.replicate import replicate_index

        res = replicate_index(args.src, args.dst)
        print(json.dumps({"fetched": len(res["fetched"]),
                          "skipped": len(res["skipped"])}))
    elif args.cmd == "delete":
        if bool(args.ids) == bool(args.query):
            raise SystemExit("delete: exactly one of --query / --ids required")
        if args.ids:
            from .pipelines.update import delete_by_id

            res = delete_by_id(args.index_root, args.ids)
        else:
            from .pipelines.update import delete_by_query

            if args.parse:
                from .search.queryparser import parse_query

                q = parse_query(args.query)
            else:
                q = json.loads(args.query)
            res = delete_by_query(args.index_root, q)
        print(json.dumps(res))
    elif args.cmd == "atomic-update":
        import os as _os

        from .pipelines.update import atomic_update

        spec = args.updates
        if _os.path.exists(spec):
            with open(spec) as f:
                spec = f.read()
        res = atomic_update(args.index_root, json.loads(spec),
                            source_paths=_expand(args.source),
                            lang=args.lang)
        print(json.dumps(res))
    elif args.cmd == "dedup":
        import ray.data

        ds = ray.data.read_parquet(_expand(args.input))
        if args.algo == "exact":
            from .functions.dedup import exact_dedup

            out = exact_dedup(ds, id_col=args.id_col, text_col=args.text_col)
        elif args.algo == "minhash":
            from .functions.dedup import minhash_near_dup_pairs

            src = args.input[0] if len(args.input) == 1 else None
            out = minhash_near_dup_pairs(
                ds, threshold=args.threshold,
                id_col=args.id_col, text_col=args.text_col,
                fetch_texts_from=src,
            )
        else:
            from .functions.dedup import simhash_near_dup_pairs

            out = simhash_near_dup_pairs(
                ds, max_hamming=args.max_hamming,
                id_col=args.id_col, text_col=args.text_col,
            )
        out.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out).count_rows()
        print(json.dumps({"algo": args.algo, "rows": n, "out": args.out}))
    elif args.cmd == "curate":
        import ray.data

        from .functions import textstats as ts

        ops = [o.strip() for o in args.ops.split(",") if o.strip()]
        batch_fns = {"tokens": ts.token_count_batch,
                     "quality": ts.quality_score_batch,
                     "stats": ts.doc_stats_batch,
                     "repetition": ts.ngram_repetition_batch,
                     "fingerprint": ts.fingerprint_batch}
        bad = [o for o in ops if o not in (*batch_fns, "langid")]
        if bad:
            raise SystemExit(f"curate: unknown ops {bad}")
        def _dedup_cols(t):
            # ops share signal names (tokens and stats both emit n_tokens):
            # first op wins, duplicates are dropped so the chain composes
            seen, keep = set(), []
            for i, nm in enumerate(t.column_names):
                if nm not in seen:
                    seen.add(nm)
                    keep.append(i)
            return t.select(keep) if len(keep) != t.num_columns else t

        ds = ray.data.read_parquet(_expand(args.input))
        for op in ops:
            if op == "langid":
                from .functions.dedup import default_actor_concurrency

                ds = ds.map_batches(
                    ts.LangIdStage,
                    fn_constructor_kwargs={"text_col": args.text_col},
                    batch_format="pyarrow",
                    concurrency=default_actor_concurrency(None),
                )
            else:
                ds = ds.map_batches(
                    lambda b, fn=batch_fns[op]: _dedup_cols(fn(b, args.text_col)),
                    batch_format="pyarrow",
                )
        ds.write_parquet(args.out)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out).count_rows()
        print(json.dumps({"ops": ops, "rows": n, "out": args.out}))
    elif args.cmd == "suggest":
        from .search.suggest import suggest

        res = suggest(args.index_root, args.lookups, k=args.k,
                      weight=args.weight, match=args.match)
        print(res.to_json(orient="records"))
    elif args.cmd == "terms":
        from .search.suggest import terms_regex

        res = terms_regex(args.index_root, args.regex,
                          limit=args.limit, sort=args.sort)
        print(res.to_json(orient="records"))
    elif args.cmd == "heatmap":
        import os as _os

        import ray.data as _rd

        from .functions.relational import facet_heatmap

        ds = _rd.read_parquet(
            _os.path.join(args.sf_dir, f"{args.table}.parquet"),
            columns=list(dict.fromkeys([args.lat_col, args.lon_col])))
        res = facet_heatmap(ds, args.lat_col, args.lon_col,
                            tuple(args.box), args.rows, args.cols)
        print(res.to_pandas().to_json(orient="records"))
    elif args.cmd == "sql":
        from .functions.sql import sql_query

        res = sql_query(args.sf_dir, args.query).to_pandas()
        if args.out:
            if args.format == "csv":
                res.to_csv(args.out, index=False)
            elif args.format == "jsonl":
                res.to_json(args.out, orient="records", lines=True)
            else:
                res.to_parquet(args.out, index=False)
            print(json.dumps({"rows": len(res), "out": args.out,
                              "format": args.format}))
        else:
            print(res.to_string())
    elif args.cmd == "check":
        from .index.checkindex import check_index

        errors = check_index(args.index_root)
        print(json.dumps({"errors": errors}))
        sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
